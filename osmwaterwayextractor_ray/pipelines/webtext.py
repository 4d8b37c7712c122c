"""Web-scale text-curation operators (wave 5) over the ``documents`` table.

All four operators are oracle-checked (exact DuckDB SQL in __ray_entry__):

  * pii_scrub       — PII detection + redaction (emails / phones / IPv4)
                      over a deterministically PII-planted corpus; counts
                      and post-redaction length are exact integers.
  * dup_span_stats  — cross-document duplicated n-gram span coverage (the
                      distributed primitive behind substring-level dedup à
                      la Lee et al. 2022 "Deduplicating Training Data
                      Makes Language Models Better": find n-grams shared
                      by >= 2 docs, measure how much of each doc they
                      cover).
  * bm25_search     — ranked retrieval: BM25 top-k docs per query term
                      (Robertson/Spärck Jones; k1=1.2, b=0.75). Output is
                      integer ranks, so the oracle is exact — within a
                      term the idf factor is a positive constant and
                      cannot change the ordering, so both sides rank by
                      the tf/length component only, computed with the
                      IDENTICAL float64 expression.
  * phrase_search   — exact positional phrase retrieval (wave 17): the
                      k-way positional-posting intersect as ONE
                      pair_counts shuffle (see its docstring).
  * weighted_sample — deterministic weighted Bernoulli sampling
                      (p ∝ n_chars) via an integer hash-threshold
                      comparison — no floats anywhere, exactly
                      reproducible in SQL and independent of block
                      structure.

Scale notes (100 TB bar): pii_scrub and weighted_sample are stateless
single-pass map_batches (no shuffle). dup_span_stats shuffles postings by
gram hash (the same posting-list plan as ngram_jaccard_neardup) and
returns to per-doc grouping with one more bucketed shuffle — no all-pairs
stage, no driver materialization. bm25_search reduces the corpus to a
skinny (docs-with-hits × 6 ints) stats table, collects only O(num_blocks)
partial aggregate rows and O(k × num_blocks) top-k candidate rows on the
driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join

# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

# RE2-compatible by construction (no lookarounds/backrefs) so the DuckDB
# oracle runs the IDENTICAL patterns; parity spot-checked for overlap and
# boundary cases in tests/test_webtext.py.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_RE_EMAIL = re.compile(PII_EMAIL)
_RE_PHONE = re.compile(PII_PHONE)
_RE_IP = re.compile(PII_IP)

# Deterministic planting: the synthetic corpus has no PII, so the operator
# (and its oracle) run over a derived corpus where docs get appended
# synthetic PII as a pure function of doc_id — the same device as the
# planted near-dup corpus (textops._corpus_with_planted_dups).
_PII_EMAIL_MOD = 5
_PII_PHONE_MOD = 7
_PII_IP_MOD = 11


def _plant_pii(doc_id: int, text: str) -> str:
    if doc_id % _PII_EMAIL_MOD == 0:
        text += f" contact bob{doc_id}@example.com"
    if doc_id % _PII_PHONE_MOD == 0:
        text += f" call +1-555-{100 + doc_id % 900}-0199"
    if doc_id % _PII_IP_MOD == 0:
        text += f" node 10.{doc_id % 256}.0.{doc_id % 250}"
    return text


def pii_scrub(sf_dir: str):
    """Detect and redact PII over the planted corpus. Returns one row per
    doc: (doc_id, n_emails, n_phones, n_ips, clean_len) where clean_len is
    the length after replacing matches with <EMAIL>/<PHONE>/<IP> in that
    fixed order. Stateless vectorized-per-batch map_batches — no shuffle,
    scale-safe by construction; the regexes are module-level compiled
    (warm-task idiom, no actor pool needed for constant state)."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        n_e, n_p, n_i, clen = [], [], [], []
        for did, t in zip(ids.tolist(), texts):
            t = _plant_pii(did, t)
            n_e.append(len(_RE_EMAIL.findall(t)))
            n_p.append(len(_RE_PHONE.findall(t)))
            n_i.append(len(_RE_IP.findall(t)))
            clean = _RE_IP.sub(
                "<IP>", _RE_PHONE.sub("<PHONE>", _RE_EMAIL.sub("<EMAIL>", t))
            )
            clen.append(len(clean))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pa.array(n_e, type=pa.int64()),
                "n_phones": pa.array(n_p, type=pa.int64()),
                "n_ips": pa.array(n_i, type=pa.int64()),
                "clean_len": pa.array(clen, type=pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=8192)


def _pii_sql() -> str:
    # identical patterns; single quotes need no escaping (none present)
    planted = (
        "text"
        f" || CASE WHEN doc_id % {_PII_EMAIL_MOD} = 0 THEN ' contact bob' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END"
        f" || CASE WHEN doc_id % {_PII_PHONE_MOD} = 0 THEN ' call +1-555-' || CAST(100 + doc_id % 900 AS VARCHAR) || '-0199' ELSE '' END"
        f" || CASE WHEN doc_id % {_PII_IP_MOD} = 0 THEN ' node 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END"
    )
    return f"""
WITH planted AS (SELECT doc_id, {planted} AS t FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(t, '{PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(t, '{PII_IP}')) AS n_ips,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
            '{PII_EMAIL}', '<EMAIL>', 'g'),
            '{PII_PHONE}', '<PHONE>', 'g'),
            '{PII_IP}', '<IP>', 'g')) AS BIGINT) AS clean_len
FROM planted
"""


PII_SCRUB_SQL = _pii_sql()


# ---------------------------------------------------------------------------
# Cross-document duplicated n-gram span coverage
# ---------------------------------------------------------------------------

_SPAN_N = 3  # words per gram (word trigrams, same granularity as ngram_jaccard)


def dup_span_stats(sf_dir: str):
    """Per-doc duplicated-span accounting: positions whose word
    {_SPAN_N}-gram also occurs in at least one OTHER document, and the
    number of word positions covered by the union of those gram spans —
    the signal substring-level dedup thresholds on.

    Plan (all bounded, no all-pairs; THREE shuffles total):
      1. postings scan: (doc_id, pos, gram) string trigrams
      2. shared-gram set in one gram-keyed shuffle: per-batch partial
         distinct of (gram, doc), per-bucket dedupe + count, df >= 2
      3. semi-join postings against shared grams (bucketed lookup_join —
         one gram-hash shuffle, Arrow-native per bucket)
      4. coverage + attach in one doc-keyed cogroup: per-doc numpy
         interval-union reduction (sorted starts; clipped consecutive
         gaps) computed inside the zero-fill attach kernel

    Output: (doc_id, n_words, n_gram_positions, n_dup_positions,
    n_covered_words) — all exact integers, full SQL oracle."""
    num_parts = 16

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out_id, out_pos, out_gram = [], [], []
        for did, t in zip(ids.tolist(), texts):
            ws = t.split(" ")
            for i in range(len(ws) - _SPAN_N + 1):
                out_id.append(did)
                out_pos.append(i)
                out_gram.append(" ".join(ws[i : i + _SPAN_N]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "pos": pa.array(out_pos, type=pa.int64()),
                "gram": pa.array(out_gram, type=pa.string()),
            }
        )

    from osmwaterwayextractor_ray.stages.pin import pin as _pin

    # pinned: the posting scan feeds the shared-gram pass AND the
    # semi-join left side (A/B measured faster pinned, NOTES_r4)
    post = _pin(
        _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            postings, batch_format="pyarrow", batch_size=8192
        ),
        "dup_span_stats_post",
    )

    # document frequency per gram in ONE gram-keyed shuffle: per-batch
    # partial distinct of (gram, doc) pairs (a gram CAN repeat within a
    # doc), then a per-bucket dedupe + count + df>=2 filter — fusing the
    # former distinct + grouped_agg pair (two shuffles) into one
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl

    def gramdoc_partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(["gram", "doc_id"])
            .group_by(["gram", "doc_id"], use_threads=False)
            .aggregate([])
        )
        return t.append_column(
            "__part", pa.array(_bucket_tbl(t, ["gram"], num_parts), type=pa.int64())
        )

    def shared_grams(g: pa.Table) -> pa.Table:
        pairs = (
            g.select(["gram", "doc_id"])
            .group_by(["gram", "doc_id"], use_threads=False)
            .aggregate([])
        )
        df = pairs.group_by(["gram"], use_threads=False).aggregate([("doc_id", "count")])
        return df.filter(pc.greater_equal(df["doc_id_count"], 2)).select(["gram"])

    shared = (
        post.map_batches(gramdoc_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(shared_grams, batch_format="pyarrow")
    )

    # semi-join: keep postings whose gram is shared (right side unique)
    shared_schema = pa.schema([("gram", pa.string())])
    post_schema = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("gram", pa.string())]
    )
    dup_post = lookup_join(
        post, shared, "gram", "gram", take_cols={},
        num_parts=num_parts, left_schema=post_schema, right_schema=shared_schema,
    ).map_batches(lambda t: t.select(["doc_id", "pos"]), batch_format="pyarrow")

    # base stats (second streaming scan — cheaper than pinning the corpus)
    def base(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        n_w = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_w, type=pa.int64()),
                "n_gram_positions": pa.array(
                    np.maximum(n_w - (_SPAN_N - 1), 0), type=pa.int64()
                ),
            }
        )

    base_ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        base, batch_format="pyarrow", batch_size=8192
    )

    # coverage + attach in ONE doc-keyed shuffle: co-group the base stats
    # with the RAW duplicated positions and run the numpy interval-union
    # reduction inside the attach kernel (formerly a separate doc-hash
    # groupby produced per-doc stats that a second cogroup then attached)
    from osmwaterwayextractor_ray.stages.fastagg import cogroup

    base_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()), ("n_gram_positions", pa.int64())]
    )
    pos_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
    grouped, split = cogroup(
        base_ds, dup_post, ["doc_id"], num_parts=num_parts,
        left_schema=base_schema, right_schema=pos_schema,
    )

    def attach(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        lk = lg.column("doc_id").to_numpy(zero_copy_only=False)
        nd = np.zeros(len(lk), dtype=np.int64)
        nc = np.zeros(len(lk), dtype=np.int64)
        if len(rg):
            ids = rg.column("doc_id").to_numpy(zero_copy_only=False)
            pos = rg.column("pos").to_numpy(zero_copy_only=False)
            order = np.lexsort((pos, ids))
            ids, pos = ids[order], pos[order]
            seg = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            n_dup = np.diff(np.r_[seg, len(ids)])
            # union of [pos, pos+N-1] intervals per doc: clipped
            # consecutive gaps + N for each doc's last interval (the
            # cross-doc boundary entries are zeroed by `same`)
            gap = np.minimum(pos[1:] - pos[:-1], _SPAN_N)
            same = ids[1:] == ids[:-1]
            contrib = np.where(same, gap, 0).astype(np.int64)
            covered = np.add.reduceat(np.r_[contrib, 0], seg) + _SPAN_N
            rk = ids[seg]
            idx = np.searchsorted(rk, lk)
            idx_c = np.clip(idx, 0, max(len(rk) - 1, 0))
            hit = rk[idx_c] == lk
            nd[hit] = n_dup[idx_c[hit]]
            nc[hit] = covered[idx_c[hit]]
        return pa.table(
            {
                "doc_id": lg["doc_id"],
                "n_words": lg["n_words"],
                "n_gram_positions": lg["n_gram_positions"],
                "n_dup_positions": pa.array(nd, type=pa.int64()),
                "n_covered_words": pa.array(nc, type=pa.int64()),
            }
        )

    return grouped.map_groups(attach, batch_format="pyarrow")


DUP_SPAN_STATS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), ex AS (
  SELECT doc_id, i, array_to_string(ws[i:i+{_SPAN_N - 1}], ' ') AS gram
  FROM w, UNNEST(range(1, greatest(len(ws) - {_SPAN_N - 2}, 1))) AS t(i)
), df AS (
  SELECT gram FROM ex GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), dup AS (
  SELECT ex.doc_id, ex.i FROM ex JOIN df USING (gram)
), cov AS (
  SELECT DISTINCT d.doc_id, d.i + o.o AS j
  FROM dup d, UNNEST([{", ".join(str(i) for i in range(_SPAN_N))}]) AS o(o)
), dupstats AS (
  SELECT doc_id, count(*) AS n_dup_positions FROM dup GROUP BY doc_id
), covstats AS (
  SELECT doc_id, count(*) AS n_covered_words FROM cov GROUP BY doc_id
)
SELECT w.doc_id,
       len(ws) AS n_words,
       greatest(len(ws) - {_SPAN_N - 1}, 0) AS n_gram_positions,
       COALESCE(d.n_dup_positions, 0) AS n_dup_positions,
       COALESCE(c.n_covered_words, 0) AS n_covered_words
FROM w LEFT JOIN dupstats d ON w.doc_id = d.doc_id
       LEFT JOIN covstats c ON w.doc_id = c.doc_id
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (top-k per query term)
# ---------------------------------------------------------------------------

BM25_TERMS = ("scan", "merge", "window", "dup")
_BM25_K = 10
_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_search(sf_dir: str, terms: tuple[str, ...] = BM25_TERMS, k: int = _BM25_K):
    """BM25 top-k docs per query term. Two streaming passes:

    pass 1 — corpus scalars: per-batch partial (sum_dl, n_docs) rows,
    O(num_blocks) rows reduced on the driver (avgdl).
    pass 2 — per-batch tf/dl, score, and a per-term partial top-k; the
    O(k × num_blocks) candidate rows take one tiny per-term final merge.

    Output (term, rank, doc_id, tf, dl) is all-integer: within a term the
    BM25 idf factor is a positive per-term constant, so ranking by the
    length-normalized tf component tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    gives exactly the BM25 order; the oracle computes the bit-identical
    float64 expression. Ties break by doc_id ascending."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    term_list = list(terms)

    def tf_dl(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        dl = np.empty(len(texts), dtype=np.int64)
        tf = np.zeros((len(texts), len(term_list)), dtype=np.int64)
        tset = {t: j for j, t in enumerate(term_list)}
        for r, t in enumerate(texts):
            ws = t.split(" ")
            dl[r] = len(ws)
            for w in ws:
                j = tset.get(w)
                if j is not None:
                    tf[r, j] += 1
        cols = {"doc_id": pa.array(ids, type=pa.int64()), "dl": pa.array(dl, type=pa.int64())}
        for j, t in enumerate(term_list):
            cols[f"tf_{j}"] = pa.array(tf[:, j], type=pa.int64())
        return pa.table(cols)

    # pass 1: avgdl (partial rows -> driver; O(num_blocks) tiny rows)
    def dl_partial(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        n = len(texts)
        s = sum(len(t.split(" ")) for t in texts)
        return pa.table(
            {"sum_dl": pa.array([s], type=pa.int64()), "n": pa.array([n], type=pa.int64())}
        )

    parts = ds.map_batches(dl_partial, batch_format="pyarrow", batch_size=8192).take_all()
    sum_dl = sum(r["sum_dl"] for r in parts)
    n_docs = sum(r["n"] for r in parts)
    avgdl = np.float64(sum_dl) / np.float64(n_docs)

    # pass 2: score + per-batch per-term partial top-k
    def score_topk(batch: pa.Table) -> pa.Table:
        t = tf_dl(batch)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dli = t.column("dl").to_numpy(zero_copy_only=False)
        denom_tail = _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * (dl / avgdl))
        out_term, out_id, out_tf, out_dl, out_s = [], [], [], [], []
        for j, term in enumerate(term_list):
            tf = t.column(f"tf_{j}").to_numpy(zero_copy_only=False)
            hit = tf > 0
            if not hit.any():
                continue
            tff = tf[hit].astype(np.float64)
            s = tff * (_BM25_K1 + 1.0) / (tff + denom_tail[hit])
            hid = ids[hit]
            order = np.lexsort((hid, -s))[:k]
            out_term.extend([term] * len(order))
            out_id.extend(hid[order].tolist())
            out_tf.extend(tf[hit][order].tolist())
            out_dl.extend(dli[hit][order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "term": pa.array(out_term, type=pa.string()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "tf": pa.array(out_tf, type=pa.int64()),
                "dl": pa.array(out_dl, type=pa.int64()),
                "s": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(score_topk, batch_format="pyarrow", batch_size=8192)

    def final(g: pa.Table) -> pa.Table:
        s = g.column("s").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "term": g.column("term").take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
                "doc_id": g.column("doc_id").take(pa.array(order)),
                "tf": g.column("tf").take(pa.array(order)),
                "dl": g.column("dl").take(pa.array(order)),
            }
        )

    return cand.groupby("term").map_groups(final, batch_format="pyarrow")


def _bm25_sql(terms: tuple[str, ...] = BM25_TERMS, k: int = _BM25_K) -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH st AS (
  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS dl
  FROM documents
), g AS (
  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM st
), terms(term) AS (VALUES {vals}),
tf AS (
  SELECT t.term, s.doc_id, len(list_filter(s.ws, x -> x = t.term)) AS tf, s.dl
  FROM st s CROSS JOIN terms t
), sc AS (
  SELECT term, doc_id, tf, dl,
         CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0)
           / (CAST(tf AS DOUBLE) + {_BM25_K1} * ((1.0 - {_BM25_B}) + {_BM25_B} * (CAST(dl AS DOUBLE) / avgdl))) AS s
  FROM tf, g WHERE tf > 0
)
SELECT term, rank, doc_id, tf, dl FROM (
  SELECT term, doc_id, tf, dl,
         row_number() OVER (PARTITION BY term ORDER BY s DESC, doc_id) AS rank
  FROM sc
) WHERE rank <= {k}
"""


BM25_SEARCH_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# Positional phrase search (inverted positional-index intersect)
# ---------------------------------------------------------------------------

PHRASE = ("big", "data")  # default phrase query (k tokens, adjacency exact)


def phrase_search(sf_dir: str, phrase: tuple[str, ...] = PHRASE):
    """Exact phrase retrieval — docs containing the adjacent token
    sequence, with occurrence counts: the positional-posting plan every
    search engine runs, expressed distributed.

    Plan: the scan emits a posting (doc_id, base = pos - j) for every
    position ``pos`` where token == phrase[j] (only phrase terms leave
    the scan — the pruned-read discipline). A full match at base b needs
    every slot j to contribute, and slots are distinct by construction,
    so ONE ``pair_counts`` shuffle over (doc_id, base) + a count==k
    filter IS the k-way positional intersect — no per-term join chain,
    repeated-word phrases included. A final grouped count per doc yields
    n_occurrences. O(phrase-term postings) rows total; driver sees
    nothing. Returns (doc_id, n_occurrences), n >= 1."""
    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, pair_counts

    k = len(phrase)
    slot = {}
    for j, w in enumerate(phrase):
        slot.setdefault(w, []).append(j)

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        d_out, b_out = [], []
        for did, text in zip(ids.tolist(), texts):
            for pos, tok in enumerate(tokenize(text or "")):
                for j in slot.get(tok, ()):
                    d_out.append(did)
                    b_out.append(pos - j)
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "base": pa.array(b_out, type=pa.int64()),
            }
        )

    post = ds.map_batches(postings, batch_format="pyarrow", batch_size=2048)
    counted = pair_counts(post, "doc_id", "base", "c", num_parts=16)

    import pyarrow.compute as pc

    matches = counted.map_batches(
        lambda t: t.filter(pc.equal(t["c"], k)).select(["doc_id", "base"]),
        batch_format="pyarrow",
    )
    return grouped_agg(
        matches, ["doc_id"], {"n_occurrences": ("base", "count")}, num_parts=16
    )


def _phrase_sql(phrase: tuple[str, ...] = PHRASE) -> str:
    k = len(phrase)
    conds = " AND ".join(f"sp[i + {j}] = '{w}'" for j, w in enumerate(phrase))
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                     x -> x <> '') AS sp
  FROM documents
),
occ AS (
  SELECT doc_id, i
  FROM toks, LATERAL UNNEST(generate_series(1, len(sp) - {k - 1})) AS t(i)
  WHERE {conds}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences FROM occ GROUP BY 1
"""


PHRASE_SEARCH_SQL = _phrase_sql()


# ---------------------------------------------------------------------------
# Deterministic weighted Bernoulli sampling
# ---------------------------------------------------------------------------

_WS_HASH_MULT = 2654435761  # Knuth multiplicative (same as stratified_sample)
_WS_SCALE = 6_000_000       # P(include) = min(1, n_chars * SCALE / 2^32)


def weighted_sample(sf_dir: str):
    """Weighted Bernoulli sample, p ∝ n_chars: include a doc iff
    (doc_id · 2654435761) mod 2³² < n_chars · SCALE — pure int64
    comparisons, so the sample is bit-reproducible in SQL, independent of
    block structure, and needs no RNG state. The standard deterministic
    source-reweighting primitive (down/up-weighting corpus slices by a
    per-row weight). Single streaming filter pass, no shuffle."""
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, ["doc_id", "source", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * _WS_HASH_MULT) % 4294967296
        keep = h < w * _WS_SCALE
        return batch.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=65536)


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE (doc_id * {_WS_HASH_MULT}) % 4294967296 < n_chars * {_WS_SCALE}
"""


# ---------------------------------------------------------------------------
# temperature-based source mixing (wave 9)
# ---------------------------------------------------------------------------

_STM_HASH_MULT = 2246822519  # xxhash PRIME32_2 — decorrelated from _WS_HASH_MULT
# temperature is FIXED at alpha = 0.5: rate_s = sqrt(m_min / mass_s).
# sqrt (unlike pow) is IEEE-correctly-rounded, which is what makes the
# engine and the DuckDB oracle agree bit-for-bit — a tunable alpha would
# need pow() on both sides with no rounding guarantee.


def stm_thresholds(sources, masses) -> tuple[list, np.ndarray]:
    """The tempered-mix integer thresholds shared by
    source_temperature_mix and webgraph.curate_web_corpus: keep doc iff
    (doc_id * _STM_HASH_MULT) % 2^32 < floor(sqrt(m_min/mass_s) * 2^32).
    One definition so the hash/threshold scheme can't diverge between
    the standalone op and the curation chain (their SQL twins both spell
    the same formula)."""
    import math

    masses = [int(m) for m in masses]
    m_min = min(masses)
    thr = np.fromiter(
        (math.floor(math.sqrt(m_min / float(m)) * 4294967296) for m in masses),
        dtype=np.int64,
        count=len(masses),
    )
    return list(sources), thr


def source_temperature_mix(sf_dir: str):
    """Temperature-based source mixing (the GLaM / Llama data-mixing
    primitive): flatten the source distribution by sampling source s at
    rate (m_min / mass_s)^(1-alpha), where mass_s = sum(n_chars) over the
    source and m_min the smallest source's mass — the lightest source
    keeps everything, heavy sources are downsampled toward the alpha-
    tempered distribution. With alpha = 0.5 the rate is sqrt(m_min/mass_s):
    sqrt is IEEE-correctly-rounded, so engine (numpy) and oracle (DuckDB)
    compute the identical double, and the integer threshold
    floor(rate * 2^32) makes the per-doc keep decision an exact int64
    comparison against a doc_id hash (the weighted_sample device) —
    bit-reproducible, block-structure-invariant, no RNG state.

    Shape: per-batch partial (source, mass) sums -> O(sources) combine
    shuffle -> O(sources) driver thresholds -> broadcast -> ONE streaming
    filter pass (vectorized pc.index_in source -> threshold lookup). The
    corpus never shuffles. Returns the kept (doc_id, source) rows."""
    import pyarrow.compute as pc
    import ray

    ds = _read_documents(sf_dir, ["doc_id", "source", "n_chars"])

    def mass_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "mass": batch.column("n_chars"),
            }
        )
        return (
            t.group_by("source", use_threads=False)
            .aggregate([("mass", "sum")])
            .rename_columns(["source", "mass"])
        )

    masses = (
        grouped_agg(
            ds.map_batches(mass_partial, batch_format="pyarrow", batch_size=65536),
            ["source"],
            {"mass": ("mass", "sum")},
            num_parts=2,
        )
        .to_pandas()  # O(sources) rows
    )
    srcs, thr_arr = stm_thresholds(masses["source"], masses["mass"])
    src_arr = pa.array(srcs, type=pa.string())
    ref = ray.put((src_arr, thr_arr))

    def pick(batch: pa.Table) -> pa.Table:
        src_a, thr_a = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        si = (
            pc.index_in(batch.column("source"), value_set=src_a)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        h = (ids * _STM_HASH_MULT) % 4294967296
        keep = h < thr_a[si]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "source": pc.take(
                    batch.column("source").combine_chunks(),
                    pa.array(np.flatnonzero(keep), type=pa.int64()),
                ),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=65536)


SOURCE_TEMPERATURE_MIX_SQL = f"""
WITH m AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY source
),
mn AS (SELECT min(mass) AS m_min FROM m),
t AS (
  SELECT source,
         CAST(floor(sqrt(CAST(m_min AS DOUBLE) / CAST(mass AS DOUBLE))
                    * 4294967296) AS BIGINT) AS thr
  FROM m, mn
)
SELECT d.doc_id, d.source
FROM documents d JOIN t USING (source)
WHERE (d.doc_id * {_STM_HASH_MULT}) % 4294967296 < t.thr
"""


# ---------------------------------------------------------------------------
# unigram LM quality scoring (wave 7)
# ---------------------------------------------------------------------------

_LM_SLICE_MOD = 10  # LM trains on docs with doc_id % 10 == 0
_LM_V_CAP = 65536  # vocabulary cap (count desc, token asc tie-break)
_LM_SCALE = 1_000_000  # micro-nats per token cost unit


def lm_quality(sf_dir: str):
    """Unigram language-model quality scoring — the classic perplexity
    filter shape: train unigram counts on a deterministic slice
    (doc_id % 10 == 0), keep the top-V vocabulary, broadcast the
    per-token cost table, and score every document in one streaming
    pass. Costs are INTEGER micro-nats (floor(-ln(c/T)·1e6), OOV =
    floor(ln(T+1)·1e6), both computed with libm log on scalar doubles in
    engine AND oracle), so per-doc sums are exact int64 and the result
    is bit-identical under any block structure.

    Shape: one token-hash shuffle over the SLICE's (token, count)
    partials (grouped_agg); the counts table is pinned (WWX_PIN_MODE)
    and consumed twice — per-block partial top-V + O(V) driver merge
    (the heavy_users exact plan) and the O(distinct) total T; the corpus
    side then streams with a vectorized pc.index_in membership lookup
    against the broadcast vocab (no corpus shuffle). At 100 TB the
    vocab cap bounds the broadcast; the counts shuffle moves O(distinct
    tokens in the slice), not the corpus. Returns (doc_id, n_tokens,
    lm_cost, n_oov) for docs with >= 1 token."""
    import math

    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def slice_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        toks: list[str] = []
        for did, t in zip(ids.tolist(), texts):
            if did % _LM_SLICE_MOD == 0:
                toks.extend(tokenize(t))
        tbl = pa.table({"tok": pa.array(toks, type=pa.string())})
        return tbl.group_by("tok", use_threads=False).aggregate([("tok", "count")]).rename_columns(["tok", "n"])

    counts = pin(
        grouped_agg(
            ds.map_batches(slice_partial, batch_format="pyarrow", batch_size=8192),
            ["tok"],
            {"c": ("n", "sum")},
            num_parts=16,
        ),
        "lm_quality_counts",
    )

    # total slice tokens T: exact int64 over ALL counts (vocab + tail)
    from ray.data.aggregate import Sum

    T = int(counts.aggregate(Sum("c", alias_name="t"))["t"])

    def partial_topv(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch.column("tok").to_pylist(), dtype=object)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        o = np.lexsort((tok, -c))[:_LM_V_CAP]
        return pa.table(
            {
                "tok": pa.array(tok[o].tolist(), type=pa.string()),
                "c": pa.array(c[o], type=pa.int64()),
            }
        )

    pdf = counts.map_batches(partial_topv, batch_format="pyarrow").to_pandas()
    tok_all = pdf["tok"].to_numpy(dtype=object)
    c_all = pdf["c"].to_numpy(dtype=np.int64)
    o = np.lexsort((tok_all, -c_all))[:_LM_V_CAP]
    vocab_tok, vocab_c = tok_all[o], c_all[o]
    # libm log on scalar doubles — matches DuckDB's ln() bit-for-bit
    q_vals = np.fromiter(
        (math.floor(-math.log(int(c) / T) * _LM_SCALE) for c in vocab_c),
        dtype=np.int64,
        count=len(vocab_c),
    )
    q_oov = math.floor(math.log(T + 1) * _LM_SCALE)
    ref = ray.put((pa.array(vocab_tok.tolist(), type=pa.string()), q_vals))

    def score(batch: pa.Table) -> pa.Table:
        vocab_arr, qv_tab = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        flat: list[str] = []
        nt = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tk = tokenize(t)
            nt[i] = len(tk)
            flat.extend(tk)
        keep = nt > 0
        ids_k, nt_k = ids[keep], nt[keep]
        if not len(ids_k):
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "lm_cost": pa.array([], type=pa.int64()),
                    "n_oov": pa.array([], type=pa.int64()),
                }
            )
        idx = pc.index_in(pa.array(flat, type=pa.string()), value_set=vocab_arr)
        iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        qv = np.where(iv >= 0, qv_tab[np.maximum(iv, 0)], q_oov)
        oov = (iv < 0).astype(np.int64)
        starts = np.cumsum(nt_k) - nt_k
        return pa.table(
            {
                "doc_id": pa.array(ids_k, type=pa.int64()),
                "n_tokens": pa.array(nt_k, type=pa.int64()),
                "lm_cost": pa.array(np.add.reduceat(qv, starts), type=pa.int64()),
                "n_oov": pa.array(np.add.reduceat(oov, starts), type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=8192)


LM_QUALITY_SQL = f"""
WITH slice_toks AS (
  SELECT u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
  WHERE doc_id % {_LM_SLICE_MOD} = 0
),
counts AS (SELECT tok, count(*) AS c FROM slice_toks GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM counts),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT {_LM_V_CAP}),
q AS (
  SELECT tok,
         CAST(floor(-ln(CAST(c AS DOUBLE) / T) * {_LM_SCALE}) AS BIGINT) AS q
  FROM vocab, tot
),
oovq AS (
  SELECT CAST(floor(ln(CAST(T + 1 AS DOUBLE)) * {_LM_SCALE}) AS BIGINT) AS q
  FROM tot
),
doc_toks AS (
  SELECT doc_id, u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
)
SELECT d.doc_id, count(*) AS n_tokens,
       CAST(sum(coalesce(q.q, (SELECT q FROM oovq))) AS BIGINT) AS lm_cost,
       CAST(sum(CASE WHEN q.q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM doc_toks d LEFT JOIN q ON d.tok = q.tok
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# line-level boilerplate dedup (wave 8)
# ---------------------------------------------------------------------------

_LD_W = 6  # words per derived line
_LD_K = 5  # a line occurring in >= K distinct docs is boilerplate

# Planted boilerplate: the synthetic corpus is single-line word streams, so
# lines are DERIVED deterministically (chunk the word list into _LD_W-word
# lines) and docs with even doc_id get a prepended boilerplate line (5
# variants) — the same pure-function planting device as _plant_pii. The
# boilerplate string is exactly _LD_W words so the original text chunks the
# same way with or without it.
_LD_BOILER = "subscribe variant {v} newsletter now click"


def line_dedup(sf_dir: str):
    """Line-level exact dedup (RefinedWeb/CCNet-style boilerplate
    removal): drop every line that occurs verbatim in >= _LD_K distinct
    documents, and rebuild each document's text from its surviving lines
    in order. Returns (doc_id, n_lines, n_removed, clean_text) — the
    clean_text string is exact, so the oracle hash-compares it.

    Plan (fully distributed, TWO shuffles, no driver state, no broadcast
    smallness assumption — unlike the contamination screen there is no
    bound on how many distinct boilerplate lines a 100 TB crawl has):
      1. derive (doc_id, line_no, line) rows, hash-partition by LINE so
         every occurrence of a line co-locates; per bucket, document
         frequency via pyarrow's C++ hash aggregate and a keep flag via
         pc.index_in against the bucket-local heavy set (exact: df is
         global because the partition key is the line itself)
      2. re-partition the flagged rows by DOC; per bucket, one lexsort +
         reduceat pass computes per-doc counts and a LargeListArray +
         pc.binary_join rebuilds clean_text vectorized (no per-row
         Python string assembly)
    Skew note: a planet-scale boilerplate line lands in one bucket, but
    the kernel is linear (hash-agg + take) — no pairwise blow-up; the
    doc-side shuffle is uniform in doc_id."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl

    num_parts = 16
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def lines(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out_id, out_no, out_line = [], [], []
        for did, t in zip(ids.tolist(), texts):
            ws = t.split(" ")
            if did % 2 == 0:
                ws = _LD_BOILER.format(v=did % 5).split(" ") + ws
            for i in range(0, len(ws), _LD_W):
                out_id.append(did)
                out_no.append(i // _LD_W)
                out_line.append(" ".join(ws[i : i + _LD_W]))
        t = pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "line_no": pa.array(out_no, type=pa.int64()),
                "line": pa.array(out_line, type=pa.string()),
            }
        )
        return t.append_column(
            "__part", pa.array(_bucket_tbl(t, ["line"], num_parts), type=pa.int64())
        )

    line_rows = ds.map_batches(lines, batch_format="pyarrow", batch_size=8192)

    def flag(g: pa.Table) -> pa.Table:
        pairs = (
            g.select(["line", "doc_id"])
            .group_by(["line", "doc_id"], use_threads=False)
            .aggregate([])
        )
        dfc = pairs.group_by(["line"], use_threads=False).aggregate(
            [("doc_id", "count")]
        )
        heavy = dfc.filter(pc.greater_equal(dfc["doc_id_count"], _LD_K)).column("line")
        if isinstance(heavy, pa.ChunkedArray):
            heavy = heavy.combine_chunks()
        keep = pc.is_null(pc.index_in(g.column("line"), value_set=heavy))
        out = g.select(["doc_id", "line_no", "line"]).append_column("keep", keep)
        return out.append_column(
            "__part", pa.array(_bucket_tbl(out, ["doc_id"], num_parts), type=pa.int64())
        )

    flagged = line_rows.groupby("__part").map_groups(flag, batch_format="pyarrow")

    def rebuild(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_lines": pa.array([], type=pa.int64()),
                    "n_removed": pa.array([], type=pa.int64()),
                    "clean_text": pa.array([], type=pa.string()),
                }
            )
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        ln = g.column("line_no").to_numpy(zero_copy_only=False)
        kp = g.column("keep").to_numpy(zero_copy_only=False).astype(bool)
        line_col = g.column("line")
        if isinstance(line_col, pa.ChunkedArray):
            line_col = line_col.combine_chunks()
        order = np.lexsort((ln, ids))
        ids, kp = ids[order], kp[order]
        lines_sorted = line_col.take(pa.array(order, type=pa.int64()))
        seg = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        n_lines = np.diff(np.r_[seg, len(ids)])
        n_kept = np.add.reduceat(kp.astype(np.int64), seg)
        kept_lines = lines_sorted.filter(pa.array(kp))
        kept_ids = ids[kp]
        uids = ids[seg]
        offsets = np.r_[np.searchsorted(kept_ids, uids), len(kept_ids)]
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept_lines
        )
        return pa.table(
            {
                "doc_id": pa.array(uids, type=pa.int64()),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "n_removed": pa.array(n_lines - n_kept, type=pa.int64()),
                "clean_text": pc.binary_join(lst, "\n"),
            }
        )

    return flagged.groupby("__part").map_groups(rebuild, batch_format="pyarrow")


LINE_DEDUP_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'subscribe variant ' || CAST(doc_id % 5 AS VARCHAR)
                   || ' newsletter now click ' || text
              ELSE text END AS t
  FROM documents
), w AS (
  SELECT doc_id, string_split(t, ' ') AS ws FROM base
), l AS (
  SELECT doc_id, i AS line_no,
         array_to_string(ws[i*{_LD_W}+1:i*{_LD_W}+{_LD_W}], ' ') AS line
  FROM w, UNNEST(range((len(ws) + {_LD_W - 1}) // {_LD_W})) AS t(i)
), heavy AS (
  SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= {_LD_K}
), k AS (
  SELECT l.doc_id, l.line_no, l.line, heavy.line IS NOT NULL AS hv
  FROM l LEFT JOIN heavy USING (line)
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN hv THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN NOT hv THEN line END, chr(10)
                           ORDER BY line_no), '') AS clean_text
FROM k GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# per-host document quota (wave 8)
# ---------------------------------------------------------------------------

_HQ_HOSTS = 20  # host = site{doc_id % 20}.test (the webgraph convention)
_HQ_CAP = 15  # keep at most this many docs per host


def topcap_by_key(
    ids: np.ndarray, nc: np.ndarray, h: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-key top-``cap`` selection by (n_chars DESC, doc_id ASC) — the
    quota kernel shared by host_quota and curate_web_corpus. Returns
    (idx, pos): indices into the input arrays of the kept rows (so any
    payload column can be gathered alongside) and each kept row's
    0-based rank within its key. One lexsort + run-position filter;
    the (nc DESC, ids ASC) key is total, so the selection is
    block-structure-invariant."""
    if not len(ids):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    o = np.lexsort((ids, -nc, h))
    hs = h[o]
    seg = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
    pos = np.arange(len(hs)) - np.repeat(seg, np.diff(np.r_[seg, len(hs)]))
    keep = pos < cap
    return o[keep], pos[keep]


def host_quota(sf_dir: str):
    """Per-host document cap — the crawl-curation quota stage (keep at
    most _HQ_CAP docs per host so no single site dominates the corpus).
    Priority inside a host: n_chars DESC, doc_id ASC (a total key — ties
    in n_chars exist in the data, so the doc_id tiebreak is what makes
    the result block-structure-invariant). Returns
    (doc_id, host, n_chars, host_rank), host_rank in 1.._HQ_CAP.

    Plan: per-block PARTIAL top-cap per host (one lexsort + run-position
    filter — each block emits <= cap rows per host it sees, and the
    global per-host top-cap is contained in the union of per-block
    top-caps), then ONE shuffle of the surviving <= cap x hosts-per-block
    rows hash-partitioned by host, final per-bucket top-cap + rank. The
    corpus itself never shuffles; the moved volume is bounded by
    cap x distinct-hosts, independent of corpus size."""
    num_parts = 8
    ds = _read_documents(sf_dir, ["doc_id", "n_chars"])

    def _topcap(ids: np.ndarray, nc: np.ndarray):
        idx, pos = topcap_by_key(ids, nc, ids % _HQ_HOSTS, _HQ_CAP)
        return ids[idx], nc[idx], (ids % _HQ_HOSTS)[idx], pos

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        idss, ncs, hs, _ = _topcap(ids, nc)
        return pa.table(
            {
                "doc_id": pa.array(idss, type=pa.int64()),
                "n_chars": pa.array(ncs, type=pa.int64()),
                "__part": pa.array(hs % num_parts, type=pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nc = g.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        idss, ncs, hs, pos = _topcap(ids, nc)
        return pa.table(
            {
                "doc_id": pa.array(idss, type=pa.int64()),
                "host": pa.array([f"site{v}.test" for v in hs.tolist()], type=pa.string()),
                "n_chars": pa.array(ncs, type=pa.int64()),
                "host_rank": pa.array(pos + 1, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


HOST_QUOTA_SQL = f"""
SELECT doc_id, host, n_chars, host_rank FROM (
  SELECT doc_id,
         'site' || CAST(doc_id % {_HQ_HOSTS} AS VARCHAR) || '.test' AS host,
         n_chars,
         row_number() OVER (PARTITION BY doc_id % {_HQ_HOSTS}
                            ORDER BY n_chars DESC, doc_id) AS host_rank
  FROM documents
) WHERE host_rank <= {_HQ_CAP}
"""


# ---------------------------------------------------------------------------
# exact document-length histogram (wave 8)
# ---------------------------------------------------------------------------

_DLH_BIN = 50  # n_chars bin width


def doc_length_hist(sf_dir: str):
    """Exact binned length histogram over the corpus — the standard
    pre-training length-distribution audit. Bucket = n_chars // _DLH_BIN;
    returns (bucket, lo_chars, n_docs, sum_chars, min_chars, max_chars).
    Partial-aggregate inside map_batches + one O(buckets) combine shuffle
    (stages/fastagg.grouped_agg) — the corpus never shuffles."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_documents(sf_dir, ["n_chars"])

    def tag(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(nc // _DLH_BIN, type=pa.int64()),
                "n_chars": pa.array(nc, type=pa.int64()),
            }
        )

    agg = grouped_agg(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536),
        ["bucket"],
        {
            "n_docs": ("n_chars", "count"),
            "sum_chars": ("n_chars", "sum"),
            "min_chars": ("n_chars", "min"),
            "max_chars": ("n_chars", "max"),
        },
        num_parts=4,
    )

    def widen(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("lo_chars", pa.array(b * _DLH_BIN, type=pa.int64()))

    return agg.map_batches(widen, batch_format="pyarrow")


DOC_LENGTH_HIST_SQL = f"""
SELECT n_chars // {_DLH_BIN} AS bucket,
       (n_chars // {_DLH_BIN}) * {_DLH_BIN} AS lo_chars,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (wave 8)
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"  # target distribution = the English slice
_DSIR_V_CAP = 65536  # joint vocabulary cap (raw count desc, token asc)
_DSIR_SCALE = 1_000_000  # micro-nats


def dsir_weights(sf_dir: str):
    """Data Selection via Importance Resampling (Xie et al. 2023) with a
    vocab-restricted unigram feature space: per document,
    dsir_weight = sum over in-vocab tokens of
    floor((ln((ct+1)/(Tt+V)) - ln((cr+1)/(Tr+V))) * 1e6), where ct/cr are
    the token's counts in the TARGET slice (lang = 'en') and the RAW
    corpus, Tt/Tr the in-vocab totals and V the vocab size (add-one
    smoothing). Positive weight = looks like the target distribution.
    Costs are INTEGER micro-nats computed with libm ln on identical
    float64 expressions in engine and oracle, so per-doc sums are exact
    int64 and block-structure-invariant (the lm_quality device).

    Shape (lm_quality's): one token-hash shuffle of (token, ct, cr)
    partials; per-block partial top-V + O(V) driver merge; the corpus
    then streams through a vectorized pc.index_in lookup against the
    broadcast weight table — no corpus shuffle, broadcast bounded by the
    vocab cap. Returns (doc_id, n_tokens, dsir_weight) for docs with
    >= 1 token."""
    import math

    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"])

    def count_partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        toks: list[str] = []
        is_t: list[int] = []
        for lg, t in zip(langs, texts):
            tk = tokenize(t)
            toks.extend(tk)
            is_t.extend([1 if lg == _DSIR_TARGET_LANG else 0] * len(tk))
        tbl = pa.table(
            {
                "tok": pa.array(toks, type=pa.string()),
                "ct": pa.array(is_t, type=pa.int64()),
                "cr": pa.array(np.ones(len(toks), dtype=np.int64)),
            }
        )
        return (
            tbl.group_by("tok", use_threads=False)
            .aggregate([("ct", "sum"), ("cr", "sum")])
            .rename_columns(["tok", "ct", "cr"])
        )

    counts = pin(
        grouped_agg(
            ds.map_batches(count_partial, batch_format="pyarrow", batch_size=8192),
            ["tok"],
            {"ct": ("ct", "sum"), "cr": ("cr", "sum")},
            num_parts=16,
        ),
        "dsir_counts",
    )

    def partial_topv(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch.column("tok").to_pylist(), dtype=object)
        ct = batch.column("ct").to_numpy(zero_copy_only=False)
        cr = batch.column("cr").to_numpy(zero_copy_only=False)
        o = np.lexsort((tok, -cr))[:_DSIR_V_CAP]
        return pa.table(
            {
                "tok": pa.array(tok[o].tolist(), type=pa.string()),
                "ct": pa.array(ct[o], type=pa.int64()),
                "cr": pa.array(cr[o], type=pa.int64()),
            }
        )

    pdf = counts.map_batches(partial_topv, batch_format="pyarrow").to_pandas()
    tok_all = pdf["tok"].to_numpy(dtype=object)
    ct_all = pdf["ct"].to_numpy(dtype=np.int64)
    cr_all = pdf["cr"].to_numpy(dtype=np.int64)
    o = np.lexsort((tok_all, -cr_all))[:_DSIR_V_CAP]
    vocab_tok, vocab_ct, vocab_cr = tok_all[o], ct_all[o], cr_all[o]
    V = len(vocab_tok)
    Tt = int(vocab_ct.sum())
    Tr = int(vocab_cr.sum())
    # libm ln on identical scalar-double expressions — matches DuckDB
    w_vals = np.fromiter(
        (
            math.floor(
                (math.log((int(ct) + 1) / (Tt + V)) - math.log((int(cr) + 1) / (Tr + V)))
                * _DSIR_SCALE
            )
            for ct, cr in zip(vocab_ct, vocab_cr)
        ),
        dtype=np.int64,
        count=V,
    )
    ref = ray.put((pa.array(vocab_tok.tolist(), type=pa.string()), w_vals))

    def score(batch: pa.Table) -> pa.Table:
        vocab_arr, wv = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        flat: list[str] = []
        nt = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tk = tokenize(t)
            nt[i] = len(tk)
            flat.extend(tk)
        keep = nt > 0
        ids_k, nt_k = ids[keep], nt[keep]
        if not len(ids_k):
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "dsir_weight": pa.array([], type=pa.int64()),
                }
            )
        idx = pc.index_in(pa.array(flat, type=pa.string()), value_set=vocab_arr)
        iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        tw = np.where(iv >= 0, wv[np.maximum(iv, 0)], 0)
        starts = np.cumsum(nt_k) - nt_k
        return pa.table(
            {
                "doc_id": pa.array(ids_k, type=pa.int64()),
                "n_tokens": pa.array(nt_k, type=pa.int64()),
                "dsir_weight": pa.array(np.add.reduceat(tw, starts), type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=8192)


DSIR_WEIGHTS_SQL = f"""
WITH all_toks AS (
  SELECT doc_id, lang, u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
),
counts AS (
  SELECT tok,
         CAST(sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         count(*) AS cr
  FROM all_toks GROUP BY tok
),
vocab AS (SELECT tok, ct, cr FROM counts ORDER BY cr DESC, tok LIMIT {_DSIR_V_CAP}),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS Tt, CAST(sum(cr) AS BIGINT) AS Tr,
         count(*) AS V
  FROM vocab
),
w AS (
  SELECT tok,
         CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(Tt + V AS DOUBLE))
                     - ln(CAST(cr + 1 AS DOUBLE) / CAST(Tr + V AS DOUBLE)))
                    * {_DSIR_SCALE}) AS BIGINT) AS w
  FROM vocab, tot
)
SELECT a.doc_id, count(*) AS n_tokens,
       CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS dsir_weight
FROM all_toks a LEFT JOIN w ON a.tok = w.tok
GROUP BY a.doc_id
"""


# ---- canonical text normalization (wave 13) ----


def normalize_text(sf_dir: str):
    """The canonical preprocessing pass every curation chain starts
    with: lowercase, collapse whitespace runs to single spaces, strip
    leading/trailing whitespace. Stateless vectorized single pass
    (pyarrow utf8 kernels, zero shuffles); clean_text is exact so the
    oracle hash-compares it. Returns (doc_id, norm_text, n_chars_norm)."""
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t, "")
        out = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(t), r"[ \t\n\r\f\v]+", " "
            ),
            " ",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": out,
                "n_chars_norm": pc.cast(pc.utf8_length(out), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=8192)


NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f\v]+', ' ', 'g'), ' ')
         AS norm_text,
       CAST(length(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f\v]+', ' ', 'g'), ' '))
            AS BIGINT) AS n_chars_norm
FROM documents
"""


# ---- multi-epoch source upsampling (wave 12) ----

_SE_HASH_MULT = 3266489917  # xxhash PRIME32_3 — decorrelated from the
                            # weighted_sample / temperature-mix multipliers
_SE_DEN = 4                 # epoch factors are quarters: 1.0 .. 2.0 epochs


def source_epochs(sf_dir: str):
    """Multi-epoch data scheduling (the Llama/GPT-3 mixing table: some
    sources repeat for >1 epoch per training run): each document emits
    floor(e_s) full copies plus one extra copy with probability
    frac(e_s), decided by an integer hash threshold — so the realized
    epoch count is deterministic, bit-reproducible in SQL, and the
    EXPECTED copy count per source is exactly e_s. The per-source factor
    here derives from the source id's trailing digits k (e_s =
    (4 + k mod 5)/4 — 1.0, 1.25, .. 2.0 epochs; no digits -> k = 0); a
    production run would broadcast a configured table instead, same
    shape. Emits (doc_id, source, epoch_idx) — a shuffle-free vectorized
    flat map (np.repeat), the pack_sequences device."""
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, ["doc_id", "source"])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        # bounded capture ({1,9} digits): the int64 cast can't overflow,
        # and RE2 takes the LAST <=9 digits on both sides (same anchor)
        digits = pc.extract_regex(src, r"(?P<k>[0-9]{1,9})$")
        k = (
            pc.cast(
                pc.fill_null(pc.struct_field(digits, "k"), "0"), pa.int64()
            ).to_numpy(zero_copy_only=False)
        )
        num = 4 + (k % 5)
        h = (ids * _SE_HASH_MULT) % 4294967296
        extra = h < (num % _SE_DEN) * (4294967296 // _SE_DEN)
        copies = num // _SE_DEN + extra.astype(np.int64)
        total = int(copies.sum())
        doc_rep = np.repeat(ids, copies)
        src_rep = src.take(pa.array(np.repeat(np.arange(len(ids)), copies)))
        epoch_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(copies) - copies, copies
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, type=pa.int64()),
                "source": src_rep,
                "epoch_idx": pa.array(epoch_idx, type=pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=65536)


SOURCE_EPOCHS_SQL = f"""
WITH s AS (
  SELECT doc_id, source,
         4 + COALESCE(TRY_CAST(regexp_extract(source, '([0-9]{{1,9}})$', 1) AS BIGINT), 0) % 5 AS num
  FROM documents
), c AS (
  SELECT doc_id, source,
         num // {_SE_DEN}
         + CASE WHEN (doc_id * {_SE_HASH_MULT}) % 4294967296
                     < (num % {_SE_DEN}) * {4294967296 // _SE_DEN}
                THEN 1 ELSE 0 END AS copies
  FROM s
)
SELECT doc_id, source, CAST(t.e AS BIGINT) AS epoch_idx
FROM c, UNNEST(generate_series(0, copies - 1)) AS t(e)
"""


# ---- CCNet-style perplexity buckets (wave 11) ----

_PB_SHIFT = 10    # per-token mean cost quantized to 2^-10 micro-nats
_PB_COARSE = 16   # coarse counting bucket = ppl_key >> 16 (rank device)


def perplexity_buckets(sf_dir: str):
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    2020): score every document with the unigram LM (the lm_quality
    device — integer micro-nat costs, exact), normalize to a per-token
    key ppl_key = lm_cost·2^10 // n_tokens (pure integer division, so
    engine and oracle agree bit-for-bit), and split each LANGUAGE into
    equal thirds by rank under (ppl_key, doc_id) — head = best third.

    The per-language rank is fully distributed (the train_shards
    device): docs bucket by (lang, ppl_key >> {_PB_COARSE}); per-bucket
    counts — O(langs x occupied buckets) integers, not O(docs) — reach
    the driver to form exclusive offsets; each bucket sorts locally and
    adds its offset. The corpus text never shuffles — only the skinny
    (doc_id, lang, key) score rows move."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join
    from osmwaterwayextractor_ray.stages.pin import pin

    scores = lm_quality(sf_dir)
    score_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("lm_cost", pa.int64()),
            ("n_oov", pa.int64()),
        ]
    )
    langs = _read_documents(sf_dir, ["doc_id", "lang"])
    lang_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    with_lang = lookup_join(
        scores, langs, "doc_id", "doc_id", take_cols={"lang": "lang"},
        num_parts=16, left_schema=score_schema, right_schema=lang_schema,
    )

    def keyed(batch: pa.Table) -> pa.Table:
        cost = batch.column("lm_cost").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        key = (cost << _PB_SHIFT) // nt
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "ppl_key": pa.array(key, type=pa.int64()),
                "__b": pa.array(key >> _PB_COARSE, type=pa.int64()),
            }
        )

    rows = pin(
        with_lang.map_batches(keyed, batch_format="pyarrow", batch_size=65536),
        "perplexity_buckets_rows",
    )

    counts = grouped_agg(
        rows.map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "__b": b["__b"],
                    "one": pa.array(np.ones(len(b), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        ["lang", "__b"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()
    # per-lang totals + exclusive offsets per coarse bucket (driver sees
    # O(langs x occupied buckets) integers)
    counts = counts.sort_values(["lang", "__b"])
    n_lang = counts.groupby("lang")["n"].sum().to_dict()
    offs: dict[tuple[str, int], int] = {}
    for lang, grp in counts.groupby("lang"):
        c = grp["n"].to_numpy()
        ex = np.cumsum(c) - c
        for b, o in zip(grp["__b"].to_numpy(), ex):
            offs[(lang, int(b))] = int(o)

    def rank(g: pa.Table) -> pa.Table:
        lang = g.column("lang")[0].as_py()
        b = int(g.column("__b")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        key = g.column("ppl_key").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))
        rn = offs[(lang, b)] + np.arange(len(ids), dtype=np.int64)  # 0-based
        n = n_lang[lang]
        tier = (3 * rn) // n
        labels = np.array(["head", "middle", "tail"], dtype=object)[tier]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "lang": pa.array(np.full(len(ids), lang, dtype=object)),
                "ppl_key": pa.array(key[order], type=pa.int64()),
                "bucket": pa.array(labels, type=pa.string()),
            }
        )

    return rows.groupby(["lang", "__b"]).map_groups(rank, batch_format="pyarrow")


PERPLEXITY_BUCKETS_SQL = f"""
WITH lm AS ({LM_QUALITY_SQL}),
k AS (
  SELECT lm.doc_id, d.lang, (lm.lm_cost * {1 << _PB_SHIFT}) // lm.n_tokens AS ppl_key
  FROM lm JOIN documents d USING (doc_id)
),
r AS (
  SELECT doc_id, lang, ppl_key,
         row_number() OVER (PARTITION BY lang ORDER BY ppl_key, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM k
)
SELECT doc_id, lang, ppl_key,
       CASE (3 * (rn - 1)) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""


# ---- substring-level dedup REWRITE (wave 11) ----

# pack (doc_id, pos) into one int64 so "global first occurrence" is a
# single min; assumes pos < 2^20 words per document (a 100 TB crawl doc
# is far below 1M words; the constant is shared with the SQL twin)
_DS_POS_BITS = 20


def dedup_spans(sf_dir: str):
    """Substring-level deduplication that actually REWRITES the corpus
    (the action to dup_span_stats' audit; Lee et al. 2022): every word
    position covered by a cross-document duplicated {_SPAN_N}-gram span
    is removed, EXCEPT the gram's global first occurrence — min packed
    (doc_id, pos) — so the canonical copy of a shared span is spared
    (overlapping removal spans of OTHER shared grams may still clip it;
    coverage is a per-position union, exactly as the SQL twin computes).
    Returns (doc_id, n_words, n_removed_words, clean_text); clean_text
    is exact, so the oracle hash-compares it.

    Plan (same bounded posting shape as dup_span_stats; THREE shuffles):
      1. postings scan -> (doc_id, pos, gram), hash-bucketed by gram
      2. per gram bucket: document frequency (distinct docs) + global
         min packed key in one C++ hash-agg pass; keep df >= 2
      3. lookup_join postings -> shared grams (attach minkey); a
         duplicated occurrence is one whose packed key != minkey
      4. one doc-keyed cogroup: per-doc diff-array interval union marks
         covered word positions; the survivors rebuild vectorized via
         LargeListArray + pc.binary_join (the line_dedup device)

    Scale: no all-pairs stage; the gram shuffle moves O(positions) skinny
    rows, the rebuild shuffle moves the corpus ONCE (it must — the output
    is a rewritten corpus). A planet-scale boilerplate gram lands in one
    bucket but the kernel is linear in its occurrences."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl, cogroup, lookup_join
    from osmwaterwayextractor_ray.stages.pin import pin

    num_parts = 16
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out_id, out_pos, out_gram = [], [], []
        for did, t in zip(ids.tolist(), texts):
            ws = t.split(" ")
            for i in range(len(ws) - _SPAN_N + 1):
                out_id.append(did)
                out_pos.append(i)
                out_gram.append(" ".join(ws[i : i + _SPAN_N]))
        t = pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "pos": pa.array(out_pos, type=pa.int64()),
                "gram": pa.array(out_gram, type=pa.string()),
            }
        )
        return t.append_column(
            "__part", pa.array(_bucket_tbl(t, ["gram"], num_parts), type=pa.int64())
        )

    # pinned: the per-word posting extraction (the op's costliest scan)
    # feeds BOTH the shared-gram pass and the lookup_join left side —
    # A/B measured faster pinned (NOTES_r4)
    post = pin(
        ds.map_batches(postings, batch_format="pyarrow", batch_size=8192),
        "dedup_spans_post",
    )

    def shared_grams(g: pa.Table) -> pa.Table:
        packed = pc.add(
            pc.shift_left(g.column("doc_id"), _DS_POS_BITS), g.column("pos")
        )
        t = pa.table(
            {"gram": g["gram"], "doc_id": g["doc_id"], "packed": packed}
        )
        per_doc = t.group_by(["gram", "doc_id"], use_threads=False).aggregate(
            [("packed", "min")]
        )
        agg = per_doc.group_by(["gram"], use_threads=False).aggregate(
            [("doc_id", "count"), ("packed_min", "min")]
        )
        shared = agg.filter(pc.greater_equal(agg["doc_id_count"], 2))
        return pa.table(
            {"gram": shared["gram"], "minkey": shared["packed_min_min"]}
        )

    shared = post.groupby("__part").map_groups(shared_grams, batch_format="pyarrow")

    post_schema = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int64()), ("gram", pa.string())]
    )
    shared_schema = pa.schema([("gram", pa.string()), ("minkey", pa.int64())])
    joined = lookup_join(
        post.map_batches(
            lambda t: t.select(["doc_id", "pos", "gram"]), batch_format="pyarrow"
        ),
        shared,
        "gram",
        "gram",
        take_cols={"minkey": "minkey"},
        num_parts=num_parts,
        left_schema=post_schema,
        right_schema=shared_schema,
    )

    def removals(batch: pa.Table) -> pa.Table:
        packed = pc.add(
            pc.shift_left(batch.column("doc_id"), _DS_POS_BITS), batch.column("pos")
        )
        out = batch.select(["doc_id", "pos"]).filter(
            pc.not_equal(packed, batch.column("minkey"))
        )
        return out

    rem = joined.map_batches(removals, batch_format="pyarrow")

    rem_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
    doc_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    grouped, split = cogroup(
        ds, rem, ["doc_id"], num_parts=num_parts,
        left_schema=doc_schema, right_schema=rem_schema,
    )

    def rewrite(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        if len(lg) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_words": pa.array([], type=pa.int64()),
                    "n_removed_words": pa.array([], type=pa.int64()),
                    "clean_text": pa.array([], type=pa.string()),
                }
            )
        ids = lg.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in lg.column("text").to_pylist()]
        order = np.argsort(ids)
        ids = ids[order]
        texts = [texts[i] for i in order]
        # flat word-index space over the group's docs (in doc_id order)
        nw = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
        doc_off = np.r_[0, np.cumsum(nw)]
        delta = np.zeros(int(doc_off[-1]) + 1, dtype=np.int64)
        if len(rg):
            rid = rg.column("doc_id").to_numpy(zero_copy_only=False)
            rpos = rg.column("pos").to_numpy(zero_copy_only=False)
            di = np.searchsorted(ids, rid)
            starts = doc_off[di] + rpos
            ends = np.minimum(rpos + _SPAN_N, nw[di]) + doc_off[di]
            np.add.at(delta, starts, 1)
            np.add.at(delta, ends, -1)
        covered = np.cumsum(delta[:-1]) > 0
        # vectorized rebuild: flat word array + keep mask + per-doc offsets
        all_words = pa.array(
            [w for t in texts for w in t.split(" ")], type=pa.string()
        )
        keep = ~covered
        kept_words = all_words.filter(pa.array(keep))
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), doc_off[:-1])
        offsets = np.r_[0, np.cumsum(kept_per_doc)]
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept_words
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_words": pa.array(nw, type=pa.int64()),
                "n_removed_words": pa.array(nw - kept_per_doc, type=pa.int64()),
                "clean_text": pc.binary_join(lst, " "),
            }
        )

    return grouped.map_groups(rewrite, batch_format="pyarrow")


DEDUP_SPANS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
), ex AS (
  SELECT doc_id, i, array_to_string(ws[i:i+{_SPAN_N - 1}], ' ') AS gram
  FROM w, UNNEST(range(1, greatest(len(ws) - {_SPAN_N - 2}, 1))) AS t(i)
), g AS (
  SELECT gram, count(DISTINCT doc_id) AS dfc,
         min(doc_id * {1 << _DS_POS_BITS} + i) AS mk
  FROM ex GROUP BY gram
), rem AS (
  SELECT ex.doc_id, ex.i FROM ex JOIN g USING (gram)
  WHERE g.dfc >= 2 AND ex.doc_id * {1 << _DS_POS_BITS} + ex.i <> g.mk
), cov AS (
  SELECT DISTINCT doc_id, i + o.o AS j
  FROM rem, UNNEST([{", ".join(str(i) for i in range(_SPAN_N))}]) AS o(o)
), uw AS (
  SELECT doc_id, CAST(t.j AS BIGINT) AS j, ws[t.j] AS word
  FROM w, UNNEST(range(1, len(ws) + 1)) AS t(j)
), kept AS (
  SELECT uw.doc_id, uw.j, uw.word
  FROM uw LEFT JOIN cov ON cov.doc_id = uw.doc_id AND cov.j = uw.j
  WHERE cov.j IS NULL
), agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(word, ' ' ORDER BY j) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ws) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed_words,
       COALESCE(a.clean_text, '') AS clean_text
FROM w LEFT JOIN agg a ON a.doc_id = w.doc_id
"""


# ---- Gopher-style composite quality filter (wave 10) ----

# Rule constants, tuned so each rule bites on this corpus (sf0.01 keep
# rates ~83% / ~80% / ~78%; composite ~55%). All thresholds are integers
# and every comparison is cross-multiplied, so the keep set is exact in
# both engines — no float ratios anywhere.
_GF_MIN_WORDS, _GF_MAX_WORDS = 20, 90
# mean word length in [4.2, 4.8]: 21·nw <= 5·sl AND 5·sl <= 24·nw
_GF_MWL_LO_NUM, _GF_MWL_LO_DEN = 21, 5
_GF_MWL_HI_NUM, _GF_MWL_HI_DEN = 24, 5
_GF_STOPWORDS = ("the", "a")
_GF_MIN_STOP_HITS = 2


def gopher_filter(sf_dir: str):
    """Composite document-quality screen in the style of the Gopher
    rules (Rae et al. 2021, arXiv:2112.11446 — word-count bounds, mean-
    word-length bounds, minimum stop-word presence), the standard "rule
    cascade" stage of a pretraining curation pipeline. A doc survives iff

      MIN_WORDS <= n_words <= MAX_WORDS
      4.2 <= sum_wordlen / n_words <= 4.8   (cross-multiplied integers)
      stop_hits >= 2                        (occurrences of 'the'/'a')

    Fully vectorized single streaming pass, no shuffle: pyarrow
    split_pattern_regex + np.add.reduceat over the flattened word array
    computes n_words / stop_hits; sum_wordlen is len(text minus
    whitespace) — identical to the oracle's list_sum over split words
    because the split class and the strip class are the same. Returns
    the surviving docs with the metrics the rules used."""
    import pyarrow.compute as pc

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def screen(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(text, r"[ \t\n\r\f\v]+")
        flat = words.values
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lo = offs[0]
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        stop = pc.is_in(
            flat, value_set=pa.array(_GF_STOPWORDS)
        ).to_numpy(zero_copy_only=False)
        n = len(batch)
        # per-row sums over the flat word array (empty rows guarded by
        # clipping reduceat indices into the flat range)
        idx = np.minimum(offs[:-1] - lo, max(len(nonempty) - 1, 0))
        if len(nonempty):
            nw = np.add.reduceat(nonempty.astype(np.int64), idx)
            sh = np.add.reduceat((nonempty & stop).astype(np.int64), idx)
            empty_rows = (offs[1:] - offs[:-1]) == 0
            nw[empty_rows] = 0
            sh[empty_rows] = 0
        else:
            nw = np.zeros(n, dtype=np.int64)
            sh = np.zeros(n, dtype=np.int64)
        stripped = pc.replace_substring_regex(text, r"[ \t\n\r\f\v]", "")
        sl = pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (
            (nw >= _GF_MIN_WORDS)
            & (nw <= _GF_MAX_WORDS)
            & (_GF_MWL_LO_NUM * nw <= _GF_MWL_LO_DEN * sl)
            & (_GF_MWL_HI_DEN * sl <= _GF_MWL_HI_NUM * nw)
            & (sh >= _GF_MIN_STOP_HITS)
        )
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(nw, type=pa.int64()),
                "sum_wordlen": pa.array(sl, type=pa.int64()),
                "stop_hits": pa.array(sh, type=pa.int64()),
            }
        )
        return out.filter(pa.array(keep))

    return ds.map_batches(screen, batch_format="pyarrow", batch_size=8192)


GOPHER_FILTER_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '[ \\t\\n\\r\\f\\v]+'),
                     x -> x <> '') AS ws
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT)
           AS sum_wordlen,
         CAST(len(list_filter(ws, x -> x IN ({", ".join(f"'{s}'" for s in _GF_STOPWORDS)})))
           AS BIGINT) AS stop_hits
  FROM w
)
SELECT doc_id, n_words, sum_wordlen, stop_hits FROM s
WHERE n_words BETWEEN {_GF_MIN_WORDS} AND {_GF_MAX_WORDS}
  AND {_GF_MWL_LO_NUM} * n_words <= {_GF_MWL_LO_DEN} * sum_wordlen
  AND {_GF_MWL_HI_DEN} * sum_wordlen <= {_GF_MWL_HI_NUM} * n_words
  AND stop_hits >= {_GF_MIN_STOP_HITS}
"""


# ---------------------------------------------------------------------------
# train/val/test split, sentence segmentation, parse quarantine (wave 20)
# ---------------------------------------------------------------------------

# xxhash PRIME32_3 — decorrelated from the weighted_sample / temperature-mix
# hash multipliers so the eval split is independent of those samples
_SPLIT_MULT = 3266489917
_SPLIT_COARSE = 24  # coarse bucket = h >> 24 (256 buckets per stratum)


def data_split(sf_dir: str):
    """Deterministic stratified train/val/test split — the universal
    eval-holdout primitive: within every (lang, source) stratum, rank
    docs by the total order (h, doc_id) with h = (doc_id·PRIME32_3) mod
    2³², then the first n//10 are 'val', the next n//10 'test', the rest
    'train'. EXACT per-stratum proportions (a plain hash threshold only
    hits 10% in expectation), bit-reproducible, no RNG state.

    The per-stratum rank is fully distributed (the perplexity_buckets
    device): rows bucket by (lang, source, h >> _SPLIT_COARSE = 24); the
    driver sees only O(strata × occupied buckets) count integers to form
    exclusive offsets; each bucket sorts locally and adds its offset.
    Only skinny (doc_id, lang, source, h) rows ever shuffle. NULL lang or
    source coalesces to '' on BOTH sides (grouped_agg drops null keys, and
    merging NULL with '' is the documented stratum semantics)."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.pin import pin

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = (ids * _SPLIT_MULT) % 4294967296
        empty = pa.scalar("", type=pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": pc.coalesce(batch["lang"], empty),
                "source": pc.coalesce(batch["source"], empty),
                "h": pa.array(h, type=pa.int64()),
                "__b": pa.array(h >> _SPLIT_COARSE, type=pa.int64()),
            }
        )

    rows = pin(
        _read_documents(sf_dir, ["doc_id", "lang", "source"]).map_batches(
            keyed, batch_format="pyarrow", batch_size=65536
        ),
        "data_split_rows",
    )

    counts = grouped_agg(
        rows.map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "source": b["source"],
                    "__b": b["__b"],
                    "one": pa.array(np.ones(len(b), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        ["lang", "source", "__b"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()
    counts = counts.sort_values(["lang", "source", "__b"])
    n_stratum = counts.groupby(["lang", "source"])["n"].sum().to_dict()
    offs: dict[tuple[str, str, int], int] = {}
    for (lang, src), grp in counts.groupby(["lang", "source"]):
        c = grp["n"].to_numpy()
        ex = np.cumsum(c) - c
        for b, o in zip(grp["__b"].to_numpy(), ex):
            offs[(lang, src, int(b))] = int(o)

    def assign(g: pa.Table) -> pa.Table:
        lang = g.column("lang")[0].as_py()
        src = g.column("source")[0].as_py()
        b = int(g.column("__b")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        h = g.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        rn = offs[(lang, src, b)] + np.arange(len(ids), dtype=np.int64)
        n = n_stratum[(lang, src)]
        tenth = n // 10
        labels = np.where(
            rn < tenth, "val", np.where(rn < 2 * tenth, "test", "train")
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "lang": pa.array(np.full(len(ids), lang, dtype=object)),
                "source": pa.array(np.full(len(ids), src, dtype=object)),
                "split": pa.array(labels.astype(object)),
            }
        )

    return rows.groupby(["lang", "source", "__b"]).map_groups(
        assign, batch_format="pyarrow"
    )


DATA_SPLIT_SQL = f"""
WITH h AS (
  SELECT doc_id, COALESCE(lang, '') AS lang, COALESCE(source, '') AS source,
         (doc_id * {_SPLIT_MULT}) % 4294967296 AS h
  FROM documents
),
r AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source ORDER BY h, doc_id) - 1
           AS rn,
         count(*) OVER (PARTITION BY lang, source) AS n
  FROM h
)
SELECT doc_id, lang, source,
       CASE WHEN rn < n // 10 THEN 'val'
            WHEN rn < 2 * (n // 10) THEN 'test'
            ELSE 'train' END AS split
FROM r
"""


_SENT_RE = re.compile(r"[.!?]+")
_SENT_STRIP = " \t\n\r"


def sentence_stats(sf_dir: str):
    """Per-document sentence segmentation stats (the CCNet/quality-filter
    preprocessing step): split on runs of sentence-ending punctuation
    ([.!?]+), trim each segment, and report the count of non-empty
    sentences plus total/max trimmed sentence length — all exact
    integers, with the segmentation semantics shared verbatim with the
    DuckDB twin (regexp_split_to_array + the same trim set). Stateless
    compiled-regex map_batches, no shuffle."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_sent, total, mx = [], [], []
        for t in texts:
            segs = [s.strip(_SENT_STRIP) for s in _SENT_RE.split(t or "")]
            lens = [len(s) for s in segs if s]
            n_sent.append(len(lens))
            total.append(sum(lens))
            mx.append(max(lens) if lens else 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_sentences": pa.array(n_sent, type=pa.int64()),
                "total_sent_chars": pa.array(total, type=pa.int64()),
                "max_sent_chars": pa.array(mx, type=pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=4096)


SENTENCE_STATS_SQL = r"""
WITH segs AS (
  SELECT doc_id,
         list_transform(
           regexp_split_to_array(COALESCE(text, ''), '[.!?]+'),
           s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))
         ) AS parts
  FROM documents
),
kept AS (
  SELECT doc_id,
         list_transform(
           list_filter(parts, s -> length(s) > 0), s -> length(s)
         ) AS lens
  FROM segs
)
SELECT doc_id,
       CAST(len(lens) AS BIGINT) AS n_sentences,
       CAST(COALESCE(list_sum(lens), 0) AS BIGINT) AS total_sent_chars,
       CAST(COALESCE(list_max(lens), 0) AS BIGINT) AS max_sent_chars
FROM kept
"""


_PQ_RE = re.compile(r"views=([0-9a-z/]+)")


def _plant_meta(ids: np.ndarray) -> list[str]:
    """Deterministic semi-structured metadata plant (the PII-plant
    device): most docs carry a well-formed views counter, doc_id % 7 == 3
    carries a non-numeric value, doc_id % 11 == 5 omits the field."""
    out = []
    for d in ids.tolist():
        if d % 11 == 5:
            out.append("src=web")
        elif d % 7 == 3:
            out.append("src=web;views=n/a")
        else:
            out.append(f"src=web;views={(d * 37) % 100000}")
    return out


def parse_quarantine(sf_dir: str):
    """Typed field extraction with a dead-letter quarantine path — the
    ingestion pattern every production pipeline needs: parse a
    semi-structured metadata string, route rows whose field is missing
    ('missing') or non-numeric ('bad_value') to quarantine with a reason
    code instead of crashing or silently dropping, views = -1 sentinel
    for both (keeps the schema non-null for exact hash comparison).
    Stateless compiled-regex map_batches; the oracle reproduces the
    plant arithmetically and parses with regexp_extract + TRY_CAST."""
    ds = _read_documents(sf_dir, ["doc_id"])

    def parse(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        metas = _plant_meta(ids)
        status, views = [], []
        for m in metas:
            hit = _PQ_RE.search(m)
            if hit is None:
                status.append("missing")
                views.append(-1)
            elif hit.group(1).isdigit():
                status.append("ok")
                views.append(int(hit.group(1)))
            else:
                status.append("bad_value")
                views.append(-1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "status": pa.array(status, type=pa.string()),
                "views": pa.array(views, type=pa.int64()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=65536)


PARSE_QUARANTINE_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 5 THEN 'src=web'
              WHEN doc_id % 7 = 3 THEN 'src=web;views=n/a'
              ELSE 'src=web;views=' || CAST((doc_id * 37) % 100000 AS VARCHAR)
         END AS meta
  FROM documents
),
p AS (SELECT doc_id, regexp_extract(meta, 'views=([0-9a-z/]+)', 1) AS v FROM m)
SELECT doc_id,
       CASE WHEN v = '' THEN 'missing'
            WHEN TRY_CAST(v AS BIGINT) IS NULL THEN 'bad_value'
            ELSE 'ok' END AS status,
       COALESCE(TRY_CAST(v AS BIGINT), -1) AS views
FROM p
"""


# ---------------------------------------------------------------------------
# per-source TF-IDF keywords (wave 22)
# ---------------------------------------------------------------------------

_KW_K = 5
_KW_Q = 10**6


def host_keywords(sf_dir: str, k: int = _KW_K):
    """Per-source top-k TF-IDF keywords — the corpus-slice summarization
    primitive (what characterizes each crawl source). Scores are exact
    int64: score = tf(source, tok) · idf_q(tok) with
    idf_q = floor(ln(N / df) · 1e6) — N/df as float64 division + libm ln,
    the shared-float-expression device (token_pmi precedent), so numpy
    and DuckDB agree bit-for-bit. Ties break by token (UTF-8 order, where
    Python and DuckDB binary collation agree). Returns
    (source, tok, tf, idf_q, score, rank), rank 1..k per source.

    Scale shape (100 TB bar): per-batch Counter partials compress to
    distinct (source, tok) / per-doc-distinct df rows before ONE
    grouped-sum shuffle; the O(vocab) df side attaches by partitioned
    lookup; per-block partial top-k per source (sound: each (source, tok)
    row is unique after the join) cuts the final per-source shuffle to
    O(blocks · k · sources) rows. The driver sees one O(1) count.
    NULL source coalesces to '' on both sides (the data_split
    convention). int64 bound: tf·idf_q needs tf < ~3e11 at the idf cap
    (ln(N)·1e6) — widen per the tfidf HUGEINT convention beyond that."""
    from osmwaterwayextractor_ray.stages.fastagg import (
        _bucket_tbl,
        grouped_agg,
        lookup_join,
    )
    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.pin import pin

    docs = _read_documents(sf_dir, ["doc_id", "text", "source"])
    n_docs = _read_documents(sf_dir, ["doc_id"]).count()

    def partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        tf: Counter = Counter()
        df: Counter = Counter()
        srcs = ["" if s is None else s for s in batch.column("source").to_pylist()]
        for src, text in zip(srcs, batch.column("text").to_pylist()):
            toks = tokenize(text or "")
            for t in toks:
                tf[(src, t)] += 1
            df.update(set(toks))
        ks, kt, kc, kk = [], [], [], []
        for (s, t), c in tf.items():
            ks.append(s); kt.append(t); kc.append(c); kk.append(0)
        for t, c in df.items():
            ks.append(""); kt.append(t); kc.append(c); kk.append(1)
        return pa.table(
            {
                "kind": pa.array(kk, type=pa.int64()),
                "source": pa.array(ks, type=pa.string()),
                "tok": pa.array(kt, type=pa.string()),
                "c": pa.array(kc, type=pa.int64()),
            }
        )

    counts = pin(
        grouped_agg(
            docs.map_batches(partials, batch_format="pyarrow", batch_size=512),
            ["kind", "source", "tok"],
            {"c": ("c", "sum")},
            num_parts=16,
        ),
        "kw_counts",
    )

    import pyarrow.compute as pc_

    tf_tbl = counts.map_batches(
        lambda t: t.filter(pc_.equal(t["kind"], 0)).select(["source", "tok", "c"]),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.rename_columns(["source", "tok", "tf"]), batch_format="pyarrow"
    )
    df_tbl = counts.map_batches(
        lambda t: t.filter(pc_.equal(t["kind"], 1)).select(["tok", "c"]),
        batch_format="pyarrow",
    )
    tf_schema = pa.schema(
        [("source", pa.string()), ("tok", pa.string()), ("tf", pa.int64())]
    )
    joined = lookup_join(
        tf_tbl, df_tbl, "tok", "tok", {"c": "df"},
        num_parts=16, left_schema=tf_schema,
        right_schema=pa.schema([("tok", pa.string()), ("c", pa.int64())]),
    )

    def score_and_partial_topk(t: pa.Table) -> pa.Table:
        dfv = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        tfv = t.column("tf").to_numpy(zero_copy_only=False)
        # expression shape shared with the SQL oracle — do not reorder
        idf = np.floor(np.log(np.float64(n_docs) / dfv) * _KW_Q).astype(np.int64)
        score = tfv * idf
        srcs = np.asarray(t.column("source").to_pylist(), dtype=object)
        toks = np.asarray(t.column("tok").to_pylist(), dtype=object)
        sel, _ = topcap_by_key(toks, score, srcs, k)
        out = pa.table(
            {
                "source": pa.array(srcs[sel], type=pa.string()),
                "tok": pa.array(toks[sel], type=pa.string()),
                "tf": pa.array(tfv[sel], type=pa.int64()),
                "idf_q": pa.array(idf[sel], type=pa.int64()),
                "score": pa.array(score[sel], type=pa.int64()),
            }
        )
        return out.append_column(
            "__part", pa.array(_bucket_tbl(out, ["source"], 8), type=pa.int64())
        )

    cands = joined.map_batches(
        score_and_partial_topk, batch_format="pyarrow", batch_size=65536
    )

    def final_topk(g: pa.Table) -> pa.Table:
        srcs = np.asarray(g.column("source").to_pylist(), dtype=object)
        toks = np.asarray(g.column("tok").to_pylist(), dtype=object)
        tfv = g.column("tf").to_numpy(zero_copy_only=False)
        idf = g.column("idf_q").to_numpy(zero_copy_only=False)
        score = g.column("score").to_numpy(zero_copy_only=False)
        sel, pos = topcap_by_key(toks, score, srcs, k)
        return pa.table(
            {
                "source": pa.array(srcs[sel], type=pa.string()),
                "tok": pa.array(toks[sel], type=pa.string()),
                "tf": pa.array(tfv[sel], type=pa.int64()),
                "idf_q": pa.array(idf[sel], type=pa.int64()),
                "score": pa.array(score[sel], type=pa.int64()),
                "rank": pa.array(pos + 1, type=pa.int64()),
            }
        )

    return cands.groupby("__part").map_groups(final_topk, batch_format="pyarrow")


HOST_KEYWORDS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, COALESCE(source, '') AS source,
         list_filter(string_split_regex(COALESCE(text, ''),
                     '[ \t\n\r\f\v]+'), x -> x <> '') AS sp
  FROM documents
),
tf AS (
  SELECT source, u AS tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT source, UNNEST(sp) AS u FROM toks) GROUP BY 1, 2
),
df AS (
  SELECT u AS tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT doc_id, UNNEST(sp) AS u FROM toks) GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
sc AS (
  SELECT tf.source, tf.tok, tf.tf,
         CAST(floor(ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE))
              * {_KW_Q}) AS BIGINT) AS idf_q
  FROM tf JOIN df USING (tok) CROSS JOIN n
),
r AS (
  SELECT source, tok, tf, idf_q, tf * idf_q AS score,
         row_number() OVER (PARTITION BY source
                            ORDER BY tf * idf_q DESC, tok) AS rank
  FROM sc
)
SELECT source, tok, tf, idf_q, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {_KW_K}
"""


# ---------------------------------------------------------------------------
# readability scoring (wave 23)
# ---------------------------------------------------------------------------

_VOWEL_RE = re.compile(r"[aeiouAEIOU]+")


def readability(sf_dir: str):
    """Flesch-style readability score on an exact integer grid — the
    classic text-difficulty quality signal (Flesch 1948; vowel-group
    runs stand in for syllables, the standard fast proxy):

      flesch_m = 206835 − (1015·w)//s − (84600·v)//w    (milli-points)

    with w = whitespace tokens, s = non-empty sentences (the
    sentence_stats segmentation), v = vowel-group runs. Both //-terms
    are int64 floor divisions, so engine and DuckDB agree bit-for-bit;
    docs with no words or no sentences report flesch_m = 0. Returns
    (doc_id, n_words, n_sentences, n_vowel_groups, flesch_m) — one
    stateless compiled-regex pass, no shuffle."""
    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        w_out, s_out, v_out, f_out = [], [], [], []
        for t in texts:
            t = t or ""
            w = len(tokenize(t))
            segs = [s.strip(_SENT_STRIP) for s in _SENT_RE.split(t)]
            s = sum(1 for x in segs if x)
            v = len(_VOWEL_RE.findall(t))
            f = 206835 - (1015 * w) // s - (84600 * v) // w if w and s else 0
            w_out.append(w); s_out.append(s); v_out.append(v); f_out.append(f)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(w_out, type=pa.int64()),
                "n_sentences": pa.array(s_out, type=pa.int64()),
                "n_vowel_groups": pa.array(v_out, type=pa.int64()),
                "flesch_m": pa.array(f_out, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)


READABILITY_SQL = r"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(COALESCE(text, ''),
             '[ \t\n\r\f\v]+'), x -> x <> '')) AS w,
         len(list_filter(list_transform(
             regexp_split_to_array(COALESCE(text, ''), '[.!?]+'),
             s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))),
             s -> length(s) > 0)) AS s,
         len(regexp_extract_all(COALESCE(text, ''), '[aeiouAEIOU]+')) AS v
  FROM documents
)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(v AS BIGINT) AS n_vowel_groups,
       CAST(CASE WHEN w > 0 AND s > 0
                 THEN 206835 - (1015 * w) // s - (84600 * v) // w
                 ELSE 0 END AS BIGINT) AS flesch_m
FROM base
"""


def _read_documents(sf_dir: str, columns):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# inverted index export (wave 26)
# ---------------------------------------------------------------------------

_II_CAP = 64  # postings string keeps the first _II_CAP doc ids per token


def inverted_index(sf_dir: str):
    """Materialized inverted index over ``documents`` — the export twin
    of the bm25/phrase retrieval ops: one row per token with its exact
    document frequency (df), collection frequency (cf) and a postings
    string of the first ``_II_CAP`` (doc_id ASC) ``doc:tf`` entries.
    The CAP keeps a stop-token's output row bounded at 100 TB (the full
    posting list of 'the' would be one corpus-sized string cell); df/cf
    stay exact over ALL postings — only the sample string truncates, and
    the oracle truncates identically.

    Plan: per-batch (doc_id, token, tf) Counter rows (the bm25 tf
    device, whitespace-regex tokens shared with top_tokens), then ONE
    hash-bucket shuffle by token; each bucket resolves df/cf/postings
    with one lexsort + reduceat + a vectorized LargeListArray +
    binary_join string build (no per-token Python assembly)."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl

    num_parts = 16
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def tf_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_tok, out_tf = [], [], []
        for did, t in zip(ids.tolist(), batch.column("text").to_pylist()):
            c = Counter(tokenize(t or ""))
            out_id.extend([did] * len(c))
            out_tok.extend(c.keys())
            out_tf.extend(c.values())
        t = pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "token": pa.array(out_tok, type=pa.string()),
                "tf": pa.array(out_tf, type=pa.int64()),
            }
        )
        return t.append_column(
            "__part", pa.array(_bucket_tbl(t, ["token"], num_parts), type=pa.int64())
        )

    rows = ds.map_batches(tf_rows, batch_format="pyarrow", batch_size=4096)

    def build(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                    "cf": pa.array([], type=pa.int64()),
                    "postings": pa.array([], type=pa.string()),
                }
            )
        tok = g.column("token")
        tok = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        # token runs sorted by (token, doc_id): tokens are strings — sort
        # indices via Arrow (total order), then numpy over the run layout
        order = pc.sort_indices(
            g.select(["token", "doc_id"]),
            sort_keys=[("token", "ascending"), ("doc_id", "ascending")],
        ).to_numpy(zero_copy_only=False)
        tok_s = tok.take(pa.array(order, type=pa.int64()))
        ids_s, tf_s = ids[order], tf[order]
        neq = np.nonzero(
            pc.not_equal(tok_s.slice(1), tok_s.slice(0, len(tok_s) - 1)).to_numpy(
                zero_copy_only=False
            )
        )[0]
        seg = np.r_[0, neq + 1]
        df = np.diff(np.r_[seg, len(ids_s)])
        cf = np.add.reduceat(tf_s, seg)
        # postings sample: positions within the first _II_CAP of each run
        pos = np.arange(len(ids_s)) - np.repeat(seg, df)
        keep = pos < _II_CAP
        entry = pc.binary_join_element_wise(
            pc.cast(pa.array(ids_s[keep], type=pa.int64()), pa.string()),
            pc.cast(pa.array(tf_s[keep], type=pa.int64()), pa.string()),
            ":",
        )
        kept_per = np.minimum(df, _II_CAP)
        offs = np.r_[0, np.cumsum(kept_per)]
        lst = pa.LargeListArray.from_arrays(pa.array(offs, type=pa.int64()), entry)
        return pa.table(
            {
                "token": tok_s.take(pa.array(seg, type=pa.int64())),
                "df": pa.array(df, type=pa.int64()),
                "cf": pa.array(cf, type=pa.int64()),
                "postings": pc.binary_join(lst, ","),
            }
        )

    return rows.groupby("__part").map_groups(build, batch_format="pyarrow")


INVERTED_INDEX_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
tfr AS (
  SELECT *, row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn FROM tf
)
SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(CASE WHEN rn <= {_II_CAP} THEN doc_id || ':' || tf END, ','
                  ORDER BY doc_id) AS postings
FROM tfr GROUP BY token
"""


# ---------------------------------------------------------------------------
# Naive Bayes language classifier (wave 29)
# ---------------------------------------------------------------------------

_NB_SLICE_MOD = 10  # trains on docs with doc_id % 10 == 0 (the lm_quality slice)
_NB_V_CAP = 65536  # vocabulary cap (global count desc, token asc tie-break)
_NB_SCALE = 1_000_000  # micro-nats per cost unit


def nb_langid(sf_dir: str):
    """Multinomial Naive Bayes language classifier — the fastText-style
    labeled-classifier shape of an LLM curation pipeline (quality / lang
    / topic routing): train on the deterministic doc_id % 10 == 0 slice
    with the ``lang`` column as the label, score every held-out doc, and
    return the confusion matrix (lang, pred_lang, n_docs).

    All probabilities are Laplace-smoothed rationals of exact integer
    counts, turned into INTEGER micro-nat costs with the IDENTICAL
    float64 expression in engine and oracle (the lm_quality device):

      cost_l(tok) = floor(-ln((c_{l,tok}+1) / (T_l+V+1)) * 1e6)
      oov_l       = floor(-ln(      1       / (T_l+V+1)) * 1e6)
      prior_l     = floor(-ln(n_docs_l / n_slice_docs)   * 1e6)

    so per-doc per-class sums are exact int64 and the argmin (cost asc,
    lang asc tie) is bit-identical under any block structure. Zero-token
    docs are classified by prior alone (never dropped).

    Shape: ONE token-hash shuffle over the slice's (lang, tok, count)
    partials; totals/priors are O(langs); the vocab cut is per-block
    partial top-V + an O(V) driver merge; the dense V x L cost matrix
    (bounded by the caps, independent of corpus size) broadcasts via
    ray.put, and the held-out corpus then streams through one vectorized
    index_in + matrix-reduceat pass — no corpus-sized shuffle, state, or
    driver materialization."""
    import math

    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["doc_id", "lang", "text"])

    def slice_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pylist()
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        lg: list[str] = []
        toks: list[str] = []
        nd: dict[str, int] = {}
        for did, lang, t in zip(ids.tolist(), langs, texts):
            if did % _NB_SLICE_MOD:
                continue
            # NULL labels form their own class ('' sentinel; grouped_agg
            # drops null keys while SQL keeps them — the data_split device)
            lang = "\x00" if lang is None else lang
            nd[lang] = nd.get(lang, 0) + 1
            for tk in tokenize(t):
                lg.append(lang)
                toks.append(tk)
        tbl = pa.table(
            {
                "lang": pa.array(lg, type=pa.string()),
                "tok": pa.array(toks, type=pa.string()),
            }
        )
        out = (
            tbl.group_by(["lang", "tok"], use_threads=False)
            .aggregate([("tok", "count")])
            .rename_columns(["lang", "tok", "n"])
        )
        # doc-count rows ride along with tok='' (tokenize never yields '')
        return pa.table(
            {
                "lang": pa.array(
                    out.column("lang").to_pylist() + list(nd), type=pa.string()
                ),
                "tok": pa.array(
                    out.column("tok").to_pylist() + [""] * len(nd), type=pa.string()
                ),
                "n": pa.array(
                    out.column("n").to_numpy(zero_copy_only=False).tolist()
                    + list(nd.values()),
                    type=pa.int64(),
                ),
            }
        )

    counts = pin(
        grouped_agg(
            ds.map_batches(slice_partial, batch_format="pyarrow", batch_size=8192),
            ["lang", "tok"],
            {"c": ("n", "sum")},
            num_parts=16,
        ),
        "nb_langid_counts",
    )

    # O(langs) driver rows: per-lang token totals + slice doc counts
    def lang_partial(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        tok = np.asarray(batch.column("tok").to_pylist(), dtype=object)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        isdoc = tok == ""
        out_l: list[str] = []
        out_t: list[int] = []
        out_d: list[int] = []
        for lang in sorted(set(langs.tolist())):
            m = langs == lang
            out_l.append(lang)
            out_t.append(int(c[m & ~isdoc].sum()))
            out_d.append(int(c[m & isdoc].sum()))
        return pa.table(
            {
                "lang": pa.array(out_l, type=pa.string()),
                "t": pa.array(out_t, type=pa.int64()),
                "nd": pa.array(out_d, type=pa.int64()),
            }
        )

    lp = counts.map_batches(lang_partial, batch_format="pyarrow").to_pandas()
    lp = lp.groupby("lang", as_index=False).sum().sort_values("lang")
    langs = lp["lang"].tolist()
    T_l = lp["t"].to_numpy(dtype=np.int64)
    nd_l = lp["nd"].to_numpy(dtype=np.int64)
    n_slice = int(nd_l.sum())
    L = len(langs)

    # global top-V vocabulary (count desc, token asc). counts is keyed by
    # (lang, tok) hash, so one token's global count spans blocks — re-key
    # by tok FIRST (one O(distinct x langs) shuffle) so the per-block
    # partial top-V is a sound superset (the lm_quality plan shape).
    def drop_doc_rows(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("tok"), pa.scalar("", type=pa.string()))
        return batch.filter(keep).select(["tok", "c"])

    gcounts = grouped_agg(
        counts.map_batches(drop_doc_rows, batch_format="pyarrow"),
        ["tok"],
        {"gc": ("c", "sum")},
        num_parts=16,
    )

    def partial_topv(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch.column("tok").to_pylist(), dtype=object)
        c = batch.column("gc").to_numpy(zero_copy_only=False)
        o = np.lexsort((tok, -c))[:_NB_V_CAP]
        return pa.table(
            {
                "tok": pa.array(tok[o].tolist(), type=pa.string()),
                "gc": pa.array(c[o], type=pa.int64()),
            }
        )

    gdf = gcounts.map_batches(partial_topv, batch_format="pyarrow").to_pandas()
    if gdf.empty or "tok" not in gdf.columns:
        # zero slice tokens: ray's to_pandas drops columns on an empty
        # dataset (the wave-21 gotcha) — degrade to an empty vocabulary
        gdf = pd.DataFrame({"tok": [], "gc": []})
    tok_all = gdf["tok"].to_numpy(dtype=object)
    c_all = gdf["gc"].to_numpy(dtype=np.int64)
    o = np.lexsort((tok_all, -c_all))[:_NB_V_CAP]
    vocab_tok = tok_all[o]
    V = len(vocab_tok)
    vpos = {t: i for i, t in enumerate(vocab_tok.tolist())}

    # dense V x L count matrix (bounded by the caps): one filtered pull
    vocab_arr = pa.array(vocab_tok.tolist(), type=pa.string())

    def vocab_counts(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("tok"), value_set=vocab_arr)
        keep = pc.is_valid(idx)
        return batch.filter(keep)

    vc = counts.map_batches(vocab_counts, batch_format="pyarrow").to_pandas()
    if vc.empty or "tok" not in vc.columns:
        vc = pd.DataFrame({"lang": [], "tok": [], "c": []})
    C = np.zeros((V, L), dtype=np.int64)
    lpos = {lang: j for j, lang in enumerate(langs)}
    for lang, tok, c in zip(vc["lang"], vc["tok"], vc["c"]):
        C[vpos[tok], lpos[lang]] = c

    # integer micro-nat cost tables (libm log on scalar doubles == DuckDB ln)
    den = [int(T_l[j]) + V + 1 for j in range(L)]
    Q = np.empty((V, L), dtype=np.int64)
    for j in range(L):
        d = den[j]
        Q[:, j] = np.fromiter(
            (
                math.floor(-math.log((int(c) + 1) / d) * _NB_SCALE)
                for c in C[:, j]
            ),
            dtype=np.int64,
            count=V,
        )
    oov = np.array(
        [math.floor(-math.log(1 / d) * _NB_SCALE) for d in den], dtype=np.int64
    )
    prior = np.array(
        [
            math.floor(-math.log(int(nd_l[j]) / n_slice) * _NB_SCALE)
            for j in range(L)
        ],
        dtype=np.int64,
    )
    lang_arr = np.asarray(langs, dtype=object)
    ref = ray.put((vocab_arr, Q, oov, prior, lang_arr))
    if L == 0:
        # empty train slice: no classes to score against (the SQL twin's
        # prior_cost CTE is empty too, so the grid yields no rows)
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "pred_lang": pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                }
            )
        )

    def score(batch: pa.Table) -> pa.Table:
        voc, q_tab, oov_t, prior_t, lg_arr = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tl = batch.column("lang").to_pylist()
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        held = np.asarray([did % _NB_SLICE_MOD != 0 for did in ids.tolist()])
        if not held.any():
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "pred_lang": pa.array([], type=pa.string()),
                }
            )
        true_lang = np.asarray(
            ["\x00" if x is None else x for x in tl], dtype=object
        )[held]
        flat: list[str] = []
        nt = []
        for i in np.flatnonzero(held).tolist():
            tk = tokenize(texts[i])
            nt.append(len(tk))
            flat.extend(tk)
        nt = np.asarray(nt, dtype=np.int64)
        n_doc = len(nt)
        total = np.tile(prior_t, (n_doc, 1))
        pos = np.flatnonzero(nt > 0)
        if len(flat):
            idx = pc.index_in(pa.array(flat, type=pa.string()), value_set=voc)
            iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(q_tab):
                qg = np.where(
                    iv[:, None] >= 0, q_tab[np.maximum(iv, 0)], oov_t[None, :]
                )
            else:  # empty vocabulary: every token is OOV
                qg = np.tile(oov_t, (len(iv), 1))
            nt_k = nt[pos]
            starts = np.cumsum(nt_k) - nt_k
            total[pos] += np.add.reduceat(qg, starts, axis=0)
        pred = np.argmin(total, axis=1)  # first min == lang-asc tie-break
        return pa.table(
            {
                "lang": pa.array(true_lang.tolist(), type=pa.string()),
                "pred_lang": pa.array(lg_arr[pred].tolist(), type=pa.string()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return grouped_agg(
        scored.map_batches(
            lambda t: t.group_by(["lang", "pred_lang"], use_threads=False)
            .aggregate([("pred_lang", "count")])
            .rename_columns(["lang", "pred_lang", "n"]),
            batch_format="pyarrow",
        ),
        ["lang", "pred_lang"],
        {"n_docs": ("n", "sum")},
        num_parts=4,
    )


NB_LANGID_SQL = f"""
WITH sl AS (
  SELECT doc_id, COALESCE(lang, chr(0)) AS lang, text
  FROM documents WHERE doc_id % {_NB_SLICE_MOD} = 0
),
slice_toks AS (
  SELECT lang, u.tok
  FROM sl, UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                              x -> x <> '')) AS u(tok)
),
counts AS (SELECT lang, tok, count(*) AS c FROM slice_toks GROUP BY 1, 2),
totals AS (SELECT lang, CAST(sum(c) AS BIGINT) AS T FROM counts GROUP BY lang),
gcounts AS (SELECT tok, sum(c) AS gc FROM counts GROUP BY tok),
vocab AS (SELECT tok FROM gcounts ORDER BY gc DESC, tok LIMIT {_NB_V_CAP}),
nv AS (SELECT count(*) AS V FROM vocab),
priors AS (SELECT lang, count(*) AS nd FROM sl GROUP BY lang),
ns AS (SELECT count(*) AS n FROM sl),
q AS (
  SELECT t.lang, v.tok,
         CAST(floor(-ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (t.T + nv.V + 1))
                    * {_NB_SCALE}) AS BIGINT) AS q
  FROM totals t CROSS JOIN vocab v CROSS JOIN nv
  LEFT JOIN counts c ON c.lang = t.lang AND c.tok = v.tok
),
oov AS (
  SELECT lang,
         CAST(floor(-ln(CAST(1 AS DOUBLE) / (T + nv.V + 1)) * {_NB_SCALE})
              AS BIGINT) AS q
  FROM totals CROSS JOIN nv
),
prior_cost AS (
  SELECT p.lang,
         CAST(floor(-ln(CAST(p.nd AS DOUBLE) / ns.n) * {_NB_SCALE}) AS BIGINT) AS pq
  FROM priors p CROSS JOIN ns
),
held AS (
  SELECT doc_id, COALESCE(lang, chr(0)) AS true_lang, text
  FROM documents WHERE doc_id % {_NB_SLICE_MOD} <> 0
),
doc_toks AS (
  SELECT doc_id, u.tok
  FROM held, UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                                x -> x <> '')) AS u(tok)
),
tok_costs AS (
  SELECT d.doc_id, o.lang, sum(coalesce(q.q, o.q)) AS tc
  FROM doc_toks d
  CROSS JOIN oov o
  LEFT JOIN q ON q.lang = o.lang AND q.tok = d.tok
  GROUP BY 1, 2
),
grid AS (
  SELECT h.doc_id, h.true_lang, p.lang, p.pq + coalesce(t.tc, 0) AS cost
  FROM held h
  CROSS JOIN prior_cost p
  LEFT JOIN tok_costs t ON t.doc_id = h.doc_id AND t.lang = p.lang
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY cost, lang) AS rn
  FROM grid
)
SELECT true_lang AS lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1 GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# proximity search (wave 31)
# ---------------------------------------------------------------------------

PROX_TERMS = ("scan", "merge", "window")  # all-of terms
PROX_W = 8  # window width in token positions


def proximity_search(sf_dir: str, terms: tuple[str, ...] = PROX_TERMS,
                     w: int = PROX_W):
    """Proximity retrieval — docs where ALL query terms co-occur within a
    ``w``-token window, with the count of matching window START
    positions (1-based; docs shorter than ``w`` have exactly one
    candidate window covering the whole doc). The standard
    positional-index proximity operator, and the natural relaxation of
    phrase_search's adjacency.

    Fully stateless vectorized scan (the pii_scrub class): per doc, one
    cumulative-sum presence profile per term turns "window contains the
    term" into a range-count > 0 test, so the all-terms check is one
    boolean AND across k arrays — no shuffle, no driver state, nothing
    leaves the scan but (doc_id, n_windows) for matching docs."""
    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    tset = list(terms)

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        d_out, n_out = [], []
        for did, text in zip(ids.tolist(), texts):
            toks = tokenize(text or "")
            L = len(toks)
            if L == 0:
                continue
            arr = np.asarray(toks, dtype=object)
            n_starts = max(L - w + 1, 1)
            ok = np.ones(n_starts, dtype=bool)
            for t in tset:
                cs = np.zeros(L + 1, dtype=np.int64)
                np.cumsum(arr == t, out=cs[1:])
                ends = np.minimum(np.arange(n_starts) + w, L)
                ok &= (cs[ends] - cs[:n_starts]) > 0
                if not ok.any():
                    break
            n = int(ok.sum())
            if n:
                d_out.append(did)
                n_out.append(n)
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "n_windows": pa.array(n_out, type=pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=4096)


def _proximity_sql(terms: tuple[str, ...] = PROX_TERMS, w: int = PROX_W) -> str:
    conds = " AND ".join(
        f"list_contains(sp[i : least(i + {w - 1}, len(sp))], '{t}')" for t in terms
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                     x -> x <> '') AS sp
  FROM documents
),
wins AS (
  SELECT doc_id, i
  FROM toks,
       LATERAL UNNEST(generate_series(1, greatest(len(sp) - {w - 1}, 1))) AS t(i)
  WHERE len(sp) > 0 AND {conds}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM wins GROUP BY 1
"""


PROXIMITY_SEARCH_SQL = _proximity_sql()


# ---------------------------------------------------------------------------
# per-document token entropy (wave 34)
# ---------------------------------------------------------------------------


def doc_entropy(sf_dir: str):
    """Unigram token entropy per document in INTEGER micro-nats:
    ent_micro = Σ_t c_t · floor(ln(N/c_t)·1e6) over the doc's own token
    counts (N = doc token total) — the repetitiveness / diversity
    quality signal (a low-entropy doc is boilerplate or spam; compare
    gopher_filter's repetition fractions). The per-term floor runs on
    the IDENTICAL float64 expression in engine and oracle (the
    lm_quality libm device), so per-doc sums are exact int64. Returns
    (doc_id, n_tokens, ent_micro) for docs with >= 1 token.

    Stateless single-pass map_batches — no shuffle, no driver state."""
    import math

    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        d_out, n_out, e_out = [], [], []
        for did, text in zip(ids.tolist(), texts):
            toks = tokenize(text or "")
            n = len(toks)
            if n == 0:
                continue
            # run-length counts via one sort (no dict churn)
            arr = np.sort(np.asarray(toks, dtype=object))
            seg = np.flatnonzero(np.r_[True, arr[1:] != arr[:-1]])
            c = np.diff(np.r_[seg, n])
            ent = sum(
                int(ci) * math.floor(math.log(n / int(ci)) * 1_000_000)
                for ci in c
            )
            d_out.append(did)
            n_out.append(n)
            e_out.append(ent)
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "n_tokens": pa.array(n_out, type=pa.int64()),
                "ent_micro": pa.array(e_out, type=pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=8192)


DOC_ENTROPY_SQL = r"""
WITH doc_toks AS (
  SELECT doc_id, u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                          x -> x <> '')) AS u(tok)
),
c AS (SELECT doc_id, tok, count(*) AS c FROM doc_toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT c.doc_id, n.n AS n_tokens,
       CAST(sum(c.c * CAST(floor(ln(CAST(n.n AS DOUBLE) / c.c) * 1000000)
                           AS BIGINT)) AS BIGINT) AS ent_micro
FROM c JOIN n USING (doc_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# bigram LM quality scoring (wave 34)
# ---------------------------------------------------------------------------

_LM2_SLICE_MOD = 10
_LM2_V_CAP = 65536
_LM2_SCALE = 1_000_000


def bigram_lm_quality(sf_dir: str):
    """Bigram language-model quality scoring — the KenLM-shaped upgrade
    of lm_quality: train Laplace-smoothed bigram costs on the
    doc_id % 10 == 0 slice and score EVERY document, in INTEGER
    micro-nats so per-doc sums are exact int64 and block-structure
    invariant.

    Token space: the slice's top-V unigram vocabulary (count desc, token
    asc — the lm_quality cut, re-keyed by token so per-block partials
    are sound); out-of-vocab tokens map to one OOV id, and each doc is
    conditioned on a BOS id (so a doc with n tokens scores exactly n
    bigrams). With V' = |vocab| + 1 possible right-side outcomes:

      cost(w1,w2) = floor(-ln((c12+1) / (c1(w1)+V'+1)) · 1e6)

    where c12 / c1 are bigram / context counts over the MAPPED slice
    stream (c1 = Σ_w2 c12, so one shuffle feeds both), and unseen
    contexts fall out of the same expression with c12 = c1 = 0 — the
    engine evaluates the IDENTICAL float64 expression as the DuckDB
    twin per distinct case. Returns (doc_id, n_bigrams, lm2_cost) for
    docs with >= 1 token.

    Shape: one token-hash unigram shuffle (vocab), one (k1,k2)-hash
    bigram shuffle over the SLICE, O(distinct mapped bigrams) driver
    rows for the broadcast cost table (bounded in mapped space; the
    big-table twin is a lookup_join of corpus bigrams against the cost
    table — the bpe_encode device), then the corpus streams through one
    vectorized index_in + searchsorted pass."""
    import math

    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    # --- phase 1: slice unigram counts -> top-V vocabulary ---
    def uni_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        for did, t in zip(ids.tolist(), texts):
            if did % _LM2_SLICE_MOD == 0:
                toks.extend(tokenize(t or ""))
        tbl = pa.table({"tok": pa.array(toks, type=pa.string())})
        return (
            tbl.group_by("tok", use_threads=False)
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "n"])
        )

    ucounts = grouped_agg(
        ds.map_batches(uni_partial, batch_format="pyarrow", batch_size=8192),
        ["tok"],
        {"c": ("n", "sum")},
        num_parts=16,
    )

    def partial_topv(batch: pa.Table) -> pa.Table:
        tok = np.asarray(batch.column("tok").to_pylist(), dtype=object)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        o = np.lexsort((tok, -c))[:_LM2_V_CAP]
        return pa.table(
            {
                "tok": pa.array(tok[o].tolist(), type=pa.string()),
                "c": pa.array(c[o], type=pa.int64()),
            }
        )

    gdf = ucounts.map_batches(partial_topv, batch_format="pyarrow").to_pandas()
    tok_all = gdf["tok"].to_numpy(dtype=object)
    c_all = gdf["c"].to_numpy(dtype=np.int64)
    o = np.lexsort((tok_all, -c_all))[:_LM2_V_CAP]
    vocab_tok = tok_all[o]
    V = len(vocab_tok)
    OOV, BOS = V, V + 1  # mapped ids
    Vp = V + 1  # possible right-side outcomes (vocab + OOV)
    vocab_arr = pa.array(vocab_tok.tolist(), type=pa.string())
    vref = ray.put(vocab_arr)

    def _mapped_bigrams(ids, texts, voc, only_slice: bool):
        """Flattened (doc_id, left, right) mapped-bigram arrays."""
        flat: list[str] = []
        nt = []
        keep_ids = []
        for did, t in zip(ids.tolist(), texts):
            if only_slice and did % _LM2_SLICE_MOD != 0:
                continue
            tk = tokenize(t or "")
            if not tk:
                continue
            keep_ids.append(did)
            nt.append(len(tk))
            flat.extend(tk)
        if not keep_ids:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        nt = np.asarray(nt, dtype=np.int64)
        idx = pc.index_in(pa.array(flat, type=pa.string()), value_set=voc)
        iv = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        iv[iv < 0] = OOV
        starts = np.cumsum(nt) - nt
        left = np.empty_like(iv)
        left[1:] = iv[:-1]
        left[starts] = BOS
        docs = np.repeat(np.asarray(keep_ids, dtype=np.int64), nt)
        return docs, left, iv, nt

    # --- phase 2: slice bigram counts (one (k1,k2) shuffle) ---
    def bi_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        voc = ray.get(vref)
        _, left, right, _ = _mapped_bigrams(ids, texts, voc, True)
        tbl = pa.table(
            {
                "k1": pa.array(left, type=pa.int64()),
                "k2": pa.array(right, type=pa.int64()),
            }
        )
        return (
            tbl.group_by(["k1", "k2"], use_threads=False)
            .aggregate([("k2", "count")])
            .rename_columns(["k1", "k2", "n"])
        )

    bdf = grouped_agg(
        ds.map_batches(bi_partial, batch_format="pyarrow", batch_size=8192),
        ["k1", "k2"],
        {"c": ("n", "sum")},
        num_parts=16,
    ).to_pandas()

    # driver: O(distinct mapped bigrams) rows -> packed cost table
    k1 = bdf["k1"].to_numpy(dtype=np.int64)
    k2 = bdf["k2"].to_numpy(dtype=np.int64)
    c12 = bdf["c"].to_numpy(dtype=np.int64)
    c1 = np.zeros(V + 2, dtype=np.int64)
    np.add.at(c1, k1, c12)
    keys = k1 * (V + 2) + k2
    o = np.argsort(keys, kind="stable")
    keys, k1s, c12s = keys[o], k1[o], c12[o]
    den = c1[k1s] + Vp + 1
    hit_cost = np.fromiter(
        (
            math.floor(-math.log((int(a) + 1) / int(b)) * _LM2_SCALE)
            for a, b in zip(c12s, den)
        ),
        dtype=np.int64,
        count=len(c12s),
    )
    miss_cost = np.fromiter(
        (
            math.floor(-math.log(1 / int(b)) * _LM2_SCALE)
            for b in (c1 + Vp + 1)
        ),
        dtype=np.int64,
        count=V + 2,
    )
    cref = ray.put((vocab_arr, keys, hit_cost, miss_cost))

    # --- phase 3: score every document ---
    def score(batch: pa.Table) -> pa.Table:
        voc, ky, hc, mc = ray.get(cref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        docs, left, right, nt = _mapped_bigrams(ids, texts, voc, False)
        if not len(docs):
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "lm2_cost": pa.array([], type=pa.int64()),
                }
            )
        want = left * (V + 2) + right
        pos = np.searchsorted(ky, want)
        safe = np.clip(pos, 0, max(len(ky) - 1, 0))
        hit = (pos < len(ky)) & (ky[safe] == want) if len(ky) else np.zeros(len(want), bool)
        cost = np.where(hit, hc[safe] if len(ky) else 0, mc[left])
        starts = np.cumsum(nt) - nt
        uids = docs[starts]
        return pa.table(
            {
                "doc_id": pa.array(uids, type=pa.int64()),
                "n_bigrams": pa.array(nt, type=pa.int64()),
                "lm2_cost": pa.array(
                    np.add.reduceat(cost, starts), type=pa.int64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=8192)


BIGRAM_LM_QUALITY_SQL = f"""
WITH sl_toks AS (
  SELECT u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
  WHERE doc_id % {_LM2_SLICE_MOD} = 0
),
uc AS (SELECT tok, count(*) AS c FROM sl_toks GROUP BY tok),
vocab AS (SELECT tok FROM uc ORDER BY c DESC, tok LIMIT {_LM2_V_CAP}),
nv AS (SELECT count(*) AS V FROM vocab),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                     x -> x <> '') AS sp
  FROM documents
),
mapped AS (
  -- real tokens carry a 't' prefix so the bare '1' (BOS) / '2' (OOV)
  -- sentinels cannot collide with literal control-character tokens
  SELECT t.doc_id, i.i,
         CASE WHEN v.tok IS NOT NULL THEN 't' || t2.tok ELSE '2' END AS mtok
  FROM toks t,
       LATERAL UNNEST(generate_series(1, len(t.sp))) AS i(i),
       LATERAL (SELECT t.sp[i.i] AS tok) AS t2
  LEFT JOIN vocab v ON v.tok = t2.tok
),
bigrams AS (
  SELECT a.doc_id, a.mtok AS w1, b.mtok AS w2
  FROM mapped a JOIN mapped b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  UNION ALL
  SELECT doc_id, '1' AS w1, mtok AS w2 FROM mapped WHERE i = 1
),
sl_bi AS (
  SELECT w1, w2, count(*) AS c12 FROM bigrams
  WHERE doc_id % {_LM2_SLICE_MOD} = 0 GROUP BY 1, 2
),
sl_ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM sl_bi GROUP BY 1)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CAST(floor(-ln(CAST(COALESCE(sb.c12, 0) + 1 AS DOUBLE)
                               / (COALESCE(sc.c1, 0) + nv.V + 2))
                           * {_LM2_SCALE}) AS BIGINT)) AS BIGINT) AS lm2_cost
FROM bigrams g
CROSS JOIN nv
LEFT JOIN sl_bi sb ON sb.w1 = g.w1 AND sb.w2 = g.w2
LEFT JOIN sl_ctx sc ON sc.w1 = g.w1
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# Zipf-law fit of the corpus token distribution (wave 35)
# ---------------------------------------------------------------------------

_ZF_SCALE = 1000  # milli-nat grid for x=ln(rank), y=ln(count)
_ZF_OUT = 1_000_000  # coefficient output scale


def zipf_fit(sf_dir: str):
    """Zipf-law fit: least-squares slope of ln(count) on ln(rank) over
    the corpus's distinct-token frequency table — the classic corpus
    health check (natural text ≈ -1; synthetic/spammy token streams
    deviate). Composition of three repo devices:

      1. one token-hash shuffle -> (token, count), pinned;
      2. EXACT global rank by (count desc, token asc) via the
         coarse-bucket offset device (perplexity_buckets): bucket key =
         (count, first token byte) so the byte prefix subdivides the
         long count=1 tail (no hot group holds the whole tail), driver
         sees O(distinct counts x 256) offset integers;
      3. per-bucket milli-nat quantization x = floor(ln(rank)·1e3),
         y = floor(ln(count)·1e3) (np.log == DuckDB ln bit-for-bit, the
         host_keywords precedent) and int64 moment partials feeding the
         price_model Cramer solve (truncating division = DuckDB //).

    Returns one row (n_tokens, slope_micro, intercept_micro) — the
    intercept is in milli-nat y units, both coefficients scaled by 1e6.
    Int64 budget: |x|,|y| <= ~3e4 on the milli grid, so even 1e9-token
    groups keep Σx² < 1e18."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin
    from osmwaterwayextractor_ray.pipelines.relational3 import _trunc_div
    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        for t in texts:
            toks.extend(tokenize(t or ""))
        tbl = pa.table({"tok": pa.array(toks, type=pa.string())})
        return (
            tbl.group_by("tok", use_threads=False)
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "n"])
        )

    counts = pin(
        grouped_agg(
            ds.map_batches(tok_partial, batch_format="pyarrow", batch_size=8192),
            ["tok"],
            {"c": ("n", "sum")},
            num_parts=16,
        ),
        "zipf_counts",
    )

    def coarse(batch: pa.Table) -> pa.Table:
        tok = batch.column("tok").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        p = np.asarray([t.encode()[0] for t in tok], dtype=np.int64)
        tbl = pa.table(
            {
                "c": pa.array(c, type=pa.int64()),
                "p": pa.array(p, type=pa.int64()),
            }
        )
        return (
            tbl.group_by(["c", "p"], use_threads=False)
            .aggregate([("p", "count")])
            .rename_columns(["c", "p", "n"])
        )

    cdf = (
        grouped_agg(
            counts.map_batches(coarse, batch_format="pyarrow"),
            ["c", "p"],
            {"n": ("n", "sum")},
            num_parts=4,
        )
        .to_pandas()
        .sort_values(["c", "p"], ascending=[False, True])
    )
    ex = np.cumsum(cdf["n"].to_numpy()) - cdf["n"].to_numpy()
    offs = {
        (int(c), int(p)): int(o)
        for c, p, o in zip(cdf["c"], cdf["p"], ex)
    }

    def tag(batch: pa.Table) -> pa.Table:
        tok = batch.column("tok").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        p = np.asarray([t.encode()[0] for t in tok], dtype=np.int64)
        return pa.table(
            {
                "tok": batch["tok"],
                "c": pa.array(c, type=pa.int64()),
                "__g": pa.array(c * 256 + p, type=pa.int64()),
            }
        )

    def moments(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({k: pa.array([], type=pa.int64())
                             for k in ("n", "sx", "sy", "sxx", "sxy")})
        tok = np.asarray(g.column("tok").to_pylist(), dtype=object)
        c = g.column("c").to_numpy(zero_copy_only=False)
        gid = int(g.column("__g")[0].as_py())
        base = offs[(gid // 256, gid % 256)]
        order = np.argsort(tok, kind="stable")
        rank = np.empty(len(tok), dtype=np.int64)
        rank[order] = base + np.arange(1, len(tok) + 1, dtype=np.int64)
        x = np.floor(np.log(rank.astype(np.float64)) * _ZF_SCALE).astype(np.int64)
        y = np.floor(np.log(c.astype(np.float64)) * _ZF_SCALE).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    parts = (
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("__g")
        .map_groups(moments, batch_format="pyarrow")
        .take_all()
    )
    n = sum(int(p["n"]) for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sy = sum(int(p["sy"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    sxy = sum(int(p["sxy"]) for p in parts)
    den = n * sxx - sx * sx
    if den == 0:
        raise ValueError("zipf_fit: degenerate rank design (single token?)")
    return pa.table(
        {
            "n_tokens": pa.array([n], type=pa.int64()),
            "slope_micro": pa.array(
                [_trunc_div((n * sxy - sx * sy) * _ZF_OUT, den)], type=pa.int64()
            ),
            "intercept_micro": pa.array(
                [_trunc_div((sxx * sy - sx * sxy) * _ZF_OUT, den)], type=pa.int64()
            ),
        }
    )


ZIPF_FIT_SQL = f"""
WITH toks AS (
  SELECT u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
),
c AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk FROM c),
xy AS (
  SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * {_ZF_SCALE}) AS BIGINT) AS x,
         CAST(floor(ln(CAST(c AS DOUBLE)) * {_ZF_SCALE}) AS BIGINT) AS y
  FROM r
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       CAST(((n * sxy - sx * sy) * {_ZF_OUT}) // (n * sxx - sx * sx)
            AS BIGINT) AS slope_micro,
       CAST(((sxx * sy - sx * sxy) * {_ZF_OUT}) // (n * sxx - sx * sx)
            AS BIGINT) AS intercept_micro
FROM s
"""


# ---------------------------------------------------------------------------
# vocabulary drift screen (wave 39)
# ---------------------------------------------------------------------------

_VD_NUM, _VD_DEN = 1, 10  # flag when |rate_a - rate_b| > 10% of their sum


def vocab_drift(sf_dir: str):
    """Token-distribution drift screen between two corpus slices (the
    train-data drift detector every continuously-ingesting pipeline
    runs): slice A = even doc_id, slice B = odd doc_id; a token is
    DRIFTED when its rate asymmetry exceeds _VD_NUM/_VD_DEN of the
    combined rate — evaluated as one exact integer cross-multiplication

      _VD_DEN · |o_a·N_b − o_b·N_a|  >  _VD_NUM · (o_a·N_b + o_b·N_a)

    (no float rates; products run in Python big ints inside the
    per-block kernel, so 1e12-token slices cannot overflow). Returns
    (tok, o_a, o_b, drifted) for every token in either slice.

    Shape: ONE token-hash shuffle of (tok, slice) count partials; the
    O(langs)-style totals ride an O(blocks) driver sum; the flag kernel
    is a streaming map over the counts table."""
    from osmwaterwayextractor_ray.functions.text import tokenize
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        sl: list[int] = []
        for did, t in zip(ids.tolist(), texts):
            s = did % 2
            for tk in tokenize(t or ""):
                toks.append(tk)
                sl.append(s)
        tbl = pa.table(
            {
                "tok": pa.array(toks, type=pa.string()),
                "s": pa.array(sl, type=pa.int64()),
            }
        )
        out = (
            tbl.group_by(["tok", "s"], use_threads=False)
            .aggregate([("s", "count")])
            .rename_columns(["tok", "s", "n"])
        )
        s_arr = out.column("s").to_numpy(zero_copy_only=False)
        n_arr = out.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tok": out["tok"],
                "o_a": pa.array(np.where(s_arr == 0, n_arr, 0), type=pa.int64()),
                "o_b": pa.array(np.where(s_arr == 1, n_arr, 0), type=pa.int64()),
            }
        )

    counts = pin(
        grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=8192),
            ["tok"],
            {"o_a": ("o_a", "sum"), "o_b": ("o_b", "sum")},
            num_parts=16,
        ),
        "vocab_drift_counts",
    )

    def tot2(t: pa.Table) -> pa.Table:
        a = t.column("o_a").to_numpy(zero_copy_only=False)
        b = t.column("o_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "sa": pa.array([int(a.sum())], type=pa.int64()),
                "sb": pa.array([int(b.sum())], type=pa.int64()),
            }
        )

    parts_ = counts.map_batches(tot2, batch_format="pyarrow").take_all()
    n_a = sum(int(p["sa"]) for p in parts_)
    n_b = sum(int(p["sb"]) for p in parts_)

    def flag(t: pa.Table) -> pa.Table:
        oa = t.column("o_a").to_numpy(zero_copy_only=False)
        ob = t.column("o_b").to_numpy(zero_copy_only=False)
        dr = np.fromiter(
            (
                int(
                    _VD_DEN * abs(int(a) * n_b - int(b) * n_a)
                    > _VD_NUM * (int(a) * n_b + int(b) * n_a)
                )
                for a, b in zip(oa, ob)
            ),
            dtype=np.int64,
            count=len(oa),
        )
        return pa.table(
            {
                "tok": t["tok"],
                "o_a": pa.array(oa, type=pa.int64()),
                "o_b": pa.array(ob, type=pa.int64()),
                "drifted": pa.array(dr, type=pa.int64()),
            }
        )

    return counts.map_batches(flag, batch_format="pyarrow")


VOCAB_DRIFT_SQL = f"""
WITH toks AS (
  SELECT doc_id % 2 AS s, u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
),
c AS (
  SELECT tok,
         CAST(count(*) FILTER (s = 0) AS HUGEINT) AS o_a,
         CAST(count(*) FILTER (s = 1) AS HUGEINT) AS o_b
  FROM toks GROUP BY tok
),
n AS (SELECT CAST(sum(o_a) AS HUGEINT) AS n_a, CAST(sum(o_b) AS HUGEINT) AS n_b FROM c)
SELECT tok, CAST(o_a AS BIGINT) AS o_a, CAST(o_b AS BIGINT) AS o_b,
       CAST(CASE WHEN {_VD_DEN} * abs(o_a * n.n_b - o_b * n.n_a)
                      > {_VD_NUM} * (o_a * n.n_b + o_b * n.n_a)
                 THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM c CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve + prefix index (wave 42)
# ---------------------------------------------------------------------------

_VC_KS = (1, 5, 10, 20, 50)  # vocabulary sizes on the coverage curve
_PI_MAXLEN = 4  # prefix lengths 1.._PI_MAXLEN


def vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve: for each candidate vocabulary size k,
    how many corpus token OCCURRENCES the top-k tokens (count desc,
    token asc) cover — the classic tokenizer-budget audit (what does a
    32k vocab buy?). Exact integers end-to-end: the zipf_fit
    coarse-bucket device gives every token its exact global rank, each
    bucket emits per-k covered-count partials, and one O(buckets x |K|)
    grouped sum finishes. Returns (k, covered, total)."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin
    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        for t in texts:
            toks.extend(tokenize(t or ""))
        tbl = pa.table({"tok": pa.array(toks, type=pa.string())})
        return (
            tbl.group_by("tok", use_threads=False)
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "n"])
        )

    counts = pin(
        grouped_agg(
            ds.map_batches(tok_partial, batch_format="pyarrow", batch_size=8192),
            ["tok"],
            {"c": ("n", "sum")},
            num_parts=16,
        ),
        "vc_counts",
    )

    def coarse(batch: pa.Table) -> pa.Table:
        tok = batch.column("tok").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        p = np.asarray([t.encode()[0] for t in tok], dtype=np.int64)
        tbl = pa.table(
            {
                "c": pa.array(c, type=pa.int64()),
                "p": pa.array(p, type=pa.int64()),
            }
        )
        return (
            tbl.group_by(["c", "p"], use_threads=False)
            .aggregate([("p", "count")])
            .rename_columns(["c", "p", "n"])
        )

    cdf = (
        grouped_agg(
            counts.map_batches(coarse, batch_format="pyarrow"),
            ["c", "p"],
            {"n": ("n", "sum")},
            num_parts=4,
        )
        .to_pandas()
        .sort_values(["c", "p"], ascending=[False, True])
    )
    ex = np.cumsum(cdf["n"].to_numpy()) - cdf["n"].to_numpy()
    offs = {
        (int(c), int(p)): int(o) for c, p, o in zip(cdf["c"], cdf["p"], ex)
    }
    import ray

    oref = ray.put(offs)

    def tag(batch: pa.Table) -> pa.Table:
        tok = batch.column("tok").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        p = np.asarray([t.encode()[0] for t in tok], dtype=np.int64)
        return pa.table(
            {
                "tok": batch["tok"],
                "c": pa.array(c, type=pa.int64()),
                "__g": pa.array(c * 256 + p, type=pa.int64()),
            }
        )

    def cover(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"k": pa.array([], type=pa.int64()),
                 "cov": pa.array([], type=pa.int64()),
                 "tot": pa.array([], type=pa.int64())}
            )
        o_map = ray.get(oref)
        tok = np.asarray(g.column("tok").to_pylist(), dtype=object)
        c = g.column("c").to_numpy(zero_copy_only=False)
        gid = int(g.column("__g")[0].as_py())
        base = o_map[(gid // 256, gid % 256)]
        order = np.argsort(tok, kind="stable")
        cs = c[order]
        rank = base + np.arange(1, len(tok) + 1, dtype=np.int64)
        pre = np.cumsum(cs)
        out_k, out_cov = [], []
        for k in _VC_KS:
            m = int((rank <= k).sum())  # ranks are contiguous in a bucket
            out_k.append(k)
            out_cov.append(int(pre[m - 1]) if m else 0)
        tot = int(c.sum())
        return pa.table(
            {
                "k": pa.array(out_k, type=pa.int64()),
                "cov": pa.array(out_cov, type=pa.int64()),
                "tot": pa.array([tot] * len(out_k), type=pa.int64()),
            }
        )

    return grouped_agg(
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("__g")
        .map_groups(cover, batch_format="pyarrow"),
        ["k"],
        {"covered": ("cov", "sum"), "total": ("tot", "sum")},
        num_parts=2,
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
),
c AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk FROM c),
ks AS (SELECT unnest([{", ".join(str(k) for k in _VC_KS)}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(COALESCE(sum(r.c) FILTER (r.rnk <= ks.k), 0) AS BIGINT) AS covered,
       CAST(sum(r.c) AS BIGINT) AS total
FROM r CROSS JOIN ks GROUP BY ks.k
"""


def prefix_index(sf_dir: str):
    """Prefix index export (the autocomplete / wildcard-search front):
    for every token prefix of length 1.._PI_MAXLEN, the number of
    distinct tokens and total occurrences it covers. Built entirely from
    the O(distinct) token-count table — the corpus shuffles once into
    (tok, count), then a prefix flat-map + ONE more grouped sum over
    O(distinct x maxlen) skinny rows. Returns (prefix, n_tokens,
    n_occurrences)."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def tok_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        for t in texts:
            toks.extend(tokenize(t or ""))
        tbl = pa.table({"tok": pa.array(toks, type=pa.string())})
        return (
            tbl.group_by("tok", use_threads=False)
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "n"])
        )

    counts = grouped_agg(
        ds.map_batches(tok_partial, batch_format="pyarrow", batch_size=8192),
        ["tok"],
        {"c": ("n", "sum")},
        num_parts=16,
    )

    def prefixes(t: pa.Table) -> pa.Table:
        toks = t.column("tok").to_pylist()
        c = t.column("c").to_numpy(zero_copy_only=False)
        out_p, out_c = [], []
        for tok, cnt in zip(toks, c.tolist()):
            for ln in range(1, min(len(tok), _PI_MAXLEN) + 1):
                out_p.append(tok[:ln])
                out_c.append(cnt)
        return pa.table(
            {
                "prefix": pa.array(out_p, type=pa.string()),
                "c": pa.array(out_c, type=pa.int64()),
                "one": pa.array(np.ones(len(out_p), dtype=np.int64)),
            }
        )

    return grouped_agg(
        counts.map_batches(prefixes, batch_format="pyarrow"),
        ["prefix"],
        {"n_tokens": ("one", "sum"), "n_occurrences": ("c", "sum")},
        num_parts=8,
    )


PREFIX_INDEX_SQL = f"""
WITH toks AS (
  SELECT u.tok
  FROM documents,
       UNNEST(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+'),
                          x -> x <> '')) AS u(tok)
),
c AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
p AS (
  SELECT substr(tok, 1, l.l) AS prefix, c
  FROM c, LATERAL UNNEST(generate_series(1, least(length(tok), {_PI_MAXLEN})))
       AS l(l)
)
SELECT prefix, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(c) AS BIGINT) AS n_occurrences
FROM p GROUP BY prefix
"""


# ---------------------------------------------------------------------------
# lang x source association audit (wave 43)
# ---------------------------------------------------------------------------


def lang_source_pmi(sf_dir: str):
    """Categorical association audit between the lang and source
    columns: per (lang, source) cell, the joint count and the pointwise
    mutual information in INTEGER micro-nats,

      pmi_micro = floor(ln((n_ij · N) / (n_i · n_j)) · 1e6)

    — the dataset-card check for "is some source feeding one language?"
    (independent columns give pmi ≈ 0 everywhere). The ln argument is a
    correctly-rounded double of an exact rational (all counts < 2^53),
    evaluated identically in engine and oracle (the token_pmi device).
    Returns (lang, source, n_ij, pmi_micro).

    Shape: one O(cells) grouped count (per-batch Arrow partials); the
    marginals derive from the cell table itself — the corpus scans
    once."""
    import math

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_documents(sf_dir, ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        # NULL labels coalesce to '' (grouped_agg drops null keys while
        # SQL keeps them — the data_split device)
        t = pa.table(
            {
                "lang": batch.column("lang").fill_null(""),
                "source": batch.column("source").fill_null(""),
            }
        )
        return (
            t.group_by(["lang", "source"], use_threads=False)
            .aggregate([("source", "count")])
            .rename_columns(["lang", "source", "n"])
        )

    cells = pin(
        grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
            ["lang", "source"],
            {"n_ij": ("n", "sum")},
            num_parts=8,
        ),
        "lsp_cells",
    )
    # marginals: O(cells) driver rows (cells <= langs x sources)
    cdf = cells.to_pandas()
    n_i = cdf.groupby("lang")["n_ij"].sum().to_dict()
    n_j = cdf.groupby("source")["n_ij"].sum().to_dict()
    N = int(cdf["n_ij"].sum())
    import ray

    mref = ray.put((n_i, n_j, N))

    def score(t: pa.Table) -> pa.Table:
        ni, nj, n_tot = ray.get(mref)
        lang = t.column("lang").to_pylist()
        src = t.column("source").to_pylist()
        nij = t.column("n_ij").to_numpy(zero_copy_only=False)
        pmi = np.fromiter(
            (
                math.floor(
                    math.log((int(c) * n_tot) / (ni[la] * nj[so])) * 1_000_000
                )
                for la, so, c in zip(lang, src, nij.tolist())
            ),
            dtype=np.int64,
            count=len(lang),
        )
        return pa.table(
            {
                "lang": t["lang"],
                "source": t["source"],
                "n_ij": pa.array(nij, type=pa.int64()),
                "pmi_micro": pa.array(pmi, type=pa.int64()),
            }
        )

    return cells.map_batches(score, batch_format="pyarrow")


LANG_SOURCE_PMI_SQL = """
WITH c AS (SELECT COALESCE(lang, '') AS lang, COALESCE(source, '') AS source,
                  count(*) AS n_ij FROM documents GROUP BY 1, 2),
mi AS (SELECT lang, CAST(sum(n_ij) AS BIGINT) AS n_i FROM c GROUP BY lang),
mj AS (SELECT source, CAST(sum(n_ij) AS BIGINT) AS n_j FROM c GROUP BY source),
n AS (SELECT CAST(sum(n_ij) AS BIGINT) AS N FROM c)
SELECT c.lang, c.source, CAST(c.n_ij AS BIGINT) AS n_ij,
       CAST(floor(ln(CAST(c.n_ij * n.N AS DOUBLE) / (mi.n_i * mj.n_j))
                  * 1000000) AS BIGINT) AS pmi_micro
FROM c JOIN mi USING (lang) JOIN mj USING (source) CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# per-source language entropy (wave 44)
# ---------------------------------------------------------------------------


def source_lang_entropy(sf_dir: str):
    """Language diversity per source in INTEGER micro-nats: for each
    source, ent_micro = Σ_lang n_l · floor(ln(N_s/n_l)·1e6) over its doc
    language counts (the doc_entropy device lifted to the corpus level)
    — a one-language source scores 0, a mixed source scores high; the
    mixing-audit sibling of lang_source_pmi. Returns (source, n_docs,
    ent_micro).

    One O(sources x langs) grouped count; the entropy kernel streams
    over that cell table with a per-source reduceat."""
    import math

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_documents(sf_dir, ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": batch.column("lang").fill_null(""),
                "source": batch.column("source").fill_null(""),
            }
        )
        return (
            t.group_by(["source", "lang"], use_threads=False)
            .aggregate([("lang", "count")])
            .rename_columns(["source", "lang", "n"])
        )

    cells = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["source", "lang"],
        {"n_l": ("n", "sum")},
        num_parts=4,
    )

    def ent(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "ent_micro": pa.array([], type=pa.int64()),
                }
            )
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        n_l = t.column("n_l").to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, n_l = src[order], n_l[order]
        seg = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        tot = np.repeat(np.add.reduceat(n_l, seg), np.diff(np.r_[seg, len(src)]))
        terms = np.fromiter(
            (
                int(c) * math.floor(math.log(int(T) / int(c)) * 1_000_000)
                for c, T in zip(n_l, tot)
            ),
            dtype=np.int64,
            count=len(n_l),
        )
        return pa.table(
            {
                "source": pa.array(src[seg].tolist(), type=pa.string()),
                "n_docs": pa.array(np.add.reduceat(n_l, seg), type=pa.int64()),
                "ent_micro": pa.array(np.add.reduceat(terms, seg), type=pa.int64()),
            }
        )

    # the cell table is O(sources x langs): one final single-block pass
    # keeps per-source rows together
    return cells.repartition(1).map_batches(ent, batch_format="pyarrow")


SOURCE_LANG_ENTROPY_SQL = """
WITH c AS (
  SELECT COALESCE(source, '') AS source, COALESCE(lang, '') AS lang,
         count(*) AS n_l
  FROM documents GROUP BY 1, 2
),
t AS (SELECT source, CAST(sum(n_l) AS BIGINT) AS n_docs FROM c GROUP BY source)
SELECT c.source, t.n_docs,
       CAST(sum(c.n_l * CAST(floor(ln(CAST(t.n_docs AS DOUBLE) / c.n_l)
                                   * 1000000) AS BIGINT)) AS BIGINT) AS ent_micro
FROM c JOIN t USING (source)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# reciprocal rank fusion (wave 51)
# ---------------------------------------------------------------------------

_RRF_C = 60  # the standard RRF constant (Cormack et al. 2009)
_RRF_PR_K = 50  # authority candidates taken from the PageRank top-K
_RRF_OUT_K = 10  # fused results per query term


def rrf_search(sf_dir: str):
    """Reciprocal rank fusion (Cormack 2009) of the lexical and the
    authority ranking — the hybrid-retrieval combiner: per BM25 query
    term, fuse that term's BM25 top-k with the global PageRank top-K by

        rrf_micro(doc) = Σ_lists 1e6 // (60 + rank_in_list)

    (a list a doc is absent from contributes 0; candidates = the union
    of both lists). Returns the fused top-10 per term as
    (term, rank, doc_id, rrf_micro) — all-integer scores, exact ties by
    doc_id asc.

    Scale shape: both rankings stay fully distributed (bm25_search's
    per-block partial top-k; pagerank's fixed-point iterations); fusion
    itself touches only O(terms × k + K) driver rows — the same
    contract as rank_agreement."""
    from osmwaterwayextractor_ray.pipelines.webgraph import (
        _driver_topk,
        pagerank,
    )

    bm = bm25_search(sf_dir).to_pandas()
    pr_top = _driver_topk(
        pagerank(sf_dir).map_batches(
            lambda t: t.select(["page_id", "pr"]), batch_format="pyarrow"
        ),
        "pr",
        _RRF_PR_K,
    )
    rp = {int(r["page_id"]): i + 1 for i, r in enumerate(pr_top)}

    out_rows = []
    for term, grp in bm.groupby("term"):
        rb = {
            int(d): int(r) for d, r in zip(grp["doc_id"], grp["rank"])
        }
        cand = set(rb) | set(rp)
        scored = sorted(
            (
                -(
                    (1_000_000 // (_RRF_C + rb[d]) if d in rb else 0)
                    + (1_000_000 // (_RRF_C + rp[d]) if d in rp else 0)
                ),
                d,
            )
            for d in cand
        )[:_RRF_OUT_K]
        for i, (neg, d) in enumerate(scored):
            out_rows.append((term, i + 1, d, -neg))
    out = pd.DataFrame(
        out_rows, columns=["term", "rank", "doc_id", "rrf_micro"]
    )
    for c in ("rank", "doc_id", "rrf_micro"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["term", "rank"]).reset_index(drop=True)


def _rrf_sql() -> str:
    from osmwaterwayextractor_ray.pipelines.webgraph import PAGERANK_SQL

    return f"""
WITH bm AS MATERIALIZED (SELECT * FROM ({BM25_SEARCH_SQL})),
prs AS MATERIALIZED (SELECT * FROM ({PAGERANK_SQL})),
prtop AS (
  SELECT page_id AS doc_id,
         row_number() OVER (ORDER BY pr DESC, page_id) AS rp
  FROM prs QUALIFY rp <= {_RRF_PR_K}
),
cand AS (
  SELECT t.term, p.doc_id
  FROM (SELECT DISTINCT term FROM bm) t, (SELECT doc_id FROM prtop) p
  UNION
  SELECT term, doc_id FROM bm
),
sc AS (
  SELECT c.term, c.doc_id,
         COALESCE(1000000 // ({_RRF_C} + b.rank), 0)
           + COALESCE(1000000 // ({_RRF_C} + p.rp), 0) AS rrf_micro
  FROM cand c
  LEFT JOIN bm b ON b.term = c.term AND b.doc_id = c.doc_id
  LEFT JOIN prtop p ON p.doc_id = c.doc_id
)
SELECT term,
       CAST(row_number() OVER (PARTITION BY term
                               ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro
FROM sc QUALIFY rank <= {_RRF_OUT_K}
"""


# resolved lazily so the module keeps no import-time webgraph dependency
def __getattr__(name):
    if name == "RRF_SEARCH_SQL":
        return _rrf_sql()
    raise AttributeError(name)
