"""Training-data text pipelines over the `documents` table.

Oracle-checked (DuckDB SQL in __ray_entry__):
  * dedup_exact      — exact dedup: content-hash partial + groupby, keep
                       min doc_id per distinct text (hash-partition +
                       per-group first, the north-rule dedup primitive)
  * doc_quality      — per-doc char/token/punct metrics (integer outputs)
  * lang_doc_stats   — grouped aggregates over the provided lang column
  * token_totals     — tokenize + groupby(source) integer sums

Rows-only (not expressible in SQL; pinned by pytest instead):
  * minhash_neardup  — shingle→MinHash→LSH-band groupby→candidate pairs→
                       exact-Jaccard verify (planted near-dups must be found)
  * simhash_fingerprints, langid_pred, winnow_fingerprint_counts
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.functions.hashing import text_hash64
from osmwaterwayextractor_ray.stages._pool import pool_max
from osmwaterwayextractor_ray.functions.text import (
    char_counts,
    langid,
    minhash_bands,
    minhash_signature,
    punct_counts,
    simhash64,
    token_counts,
    winnow_fingerprints,
)


def _read_documents(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def dedup_exact(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        h = text_hash64(["" if t is None else t for t in texts])
        return batch.append_column("h", pa.array(h.view(np.int64), type=pa.int64()))

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
    # min doc_id per content hash; Min(text) is THE text (all texts in a
    # hash group are identical, collisions aside)
    return grouped_agg(
        hashed, ["h"], {"doc_id": ("doc_id", "min"), "text": ("text", "min")}
    ).select_columns(["doc_id", "text"])


DEDUP_EXACT_SQL = "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"


def doc_quality(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def quality(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(char_counts(texts), type=pa.int64()),
                "n_tokens": pa.array(token_counts(texts), type=pa.int64()),
                "n_punct": pa.array(punct_counts(texts), type=pa.int64()),
            }
        )

    return ds.map_batches(quality, batch_format="pyarrow", batch_size=8192)


DOC_QUALITY_SQL = r"""
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '')) AS n_tokens,
       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
FROM documents
"""


def lang_doc_stats(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ds = _read_documents(sf_dir, ["lang", "n_chars"])
    return (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .map_batches(
            lambda t: t.append_column(
                "avg_chars",
                pc.round(
                    pc.divide(pc.cast(t["total_chars"], pa.float64()), pc.cast(t["n_docs"], pa.float64())),
                    4,
                ),
            ),
            batch_format="pyarrow",
        )
    )


LANG_DOC_STATS_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
FROM documents GROUP BY lang
"""


def token_totals(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        df = pd.DataFrame({"source": batch.column("source").to_pylist(), "n": token_counts(texts)})
        g = df.groupby("source", as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("source")
        .aggregate(Sum("n", alias_name="total_tokens"))
    )


TOKEN_TOTALS_SQL = r"""
SELECT source,
       CAST(sum(len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> ''))) AS BIGINT) AS total_tokens
FROM documents GROUP BY source
"""


# ---- near-duplicate detection (MinHash + LSH) ----

def _corpus_with_planted_dups(sf_dir: str):
    """documents ∪ deterministic near-dup copies (doc_id + 1_000_000, last
    40 chars dropped) — gives the LSH pipeline known positives at any sf."""
    import ray.data as rd

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        dup_mask = [len(t) > 200 for t in texts]
        dup_ids = [int(i) + 1_000_000 for i, m in zip(ids.tolist(), dup_mask) if m]
        dup_texts = [t[:-40] for t, m in zip(texts, dup_mask) if m]
        return pa.table(
            {
                "doc_id": pa.array(ids.tolist() + dup_ids, type=pa.int64()),
                "text": pa.array(texts + dup_texts, type=pa.string()),
            }
        )

    return ds.map_batches(plant, batch_format="pyarrow", batch_size=8192)


class _MinHashStage:
    """Actor-pool stage: shingle + MinHash + LSH band emission (compiled
    state — permutation tables — built once per actor)."""

    def __init__(self, n_bands: int = 32):
        # 32 bands x 2 rows: recall at Jaccard 0.6 is 1-(1-0.6^2)^32 ≈ 1-6e-7
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        out_band, out_key, out_doc = [], [], []
        for did, t in zip(ids.tolist(), texts):
            sig = minhash_signature(t)
            for b, key in enumerate(minhash_bands(sig, self.n_bands)):
                out_band.append(b)
                out_key.append(key)
                out_doc.append(did)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )


def minhash_neardup(sf_dir: str, threshold: float = 0.6, skew_threshold: int | None = None):
    """Candidate pairs from LSH buckets, verified with exact shingle
    Jaccard >= threshold. Returns (doc_a, doc_b, jaccard) with doc_a <
    doc_b, deduplicated across buckets.

    The exact-Jaccard verify is fully distributed: candidate pairs are
    hash-joined back to the corpus text twice (doc_a side, doc_b side)
    with fastagg.hash_join — no whole-corpus driver materialization or
    broadcast. The planted corpus is materialized ONCE (object-store
    blocks, spillable) and feeds all three consumers (MinHash stage +
    both join sides) instead of being re-derived per consumer
    (VERDICT r2 perf #2)."""
    corpus = _corpus_with_planted_dups(sf_dir).materialize()

    bands = corpus.map_batches(
        _MinHashStage, batch_format="pyarrow", batch_size=1024, concurrency=(1, pool_max())
    )

    from osmwaterwayextractor_ray.stages.fastagg import bucketed_pairs
    from osmwaterwayextractor_ray.stages.fastagg import distinct as fa_distinct

    # candidate pairs per (band, band_key) LSH bucket — resolved with one
    # vectorized kernel per coarse hash bucket, NOT one map_groups call per
    # fine bucket (10^4+ fine buckets made the per-group overhead dominate);
    # >200-id buckets are dropped (stop-band guard, unchanged semantics)
    cand = bucketed_pairs(
        bands, ["band", "band_key"], "doc_id", "doc_a", "doc_b", max_group=200
    )
    cand = fa_distinct(cand, ["doc_a", "doc_b"])

    # distributed exact-Jaccard verify: pairs ⋈ corpus on doc_a, then doc_b
    from osmwaterwayextractor_ray.stages.fastagg import hash_join

    def _text_side(id_col: str, text_col: str):
        def rn(batch: pa.Table) -> pa.Table:
            return pa.table({id_col: batch["doc_id"], text_col: batch["text"]})

        return corpus.map_batches(rn, batch_format="pyarrow", batch_size=8192)

    # skew_threshold: opt-in hot-key guard for the verify joins (a
    # mega-duplicate doc id appearing in >threshold candidate pairs is
    # salted across sub-buckets — fastagg.hash_join docstring). Off by
    # default: the max_group stop-band above already bounds any one doc to
    # O(bands × max_group) pairs. When on, pin the candidate set so the
    # heavy-hitter pre-pass doesn't re-run the LSH banding.
    if skew_threshold is not None:
        cand = cand.materialize()
    paired = hash_join(cand, _text_side("doc_a", "text_a"), on=["doc_a"], skew_threshold=skew_threshold)
    if skew_threshold is not None:
        paired = paired.materialize()  # pre-pass for join 2 must not re-run join 1
    paired = hash_join(paired, _text_side("doc_b", "text_b"), on=["doc_b"], skew_threshold=skew_threshold)

    def verify(batch: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.functions.text import shingle_hashes

        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        # each doc occurs in MANY candidate pairs — shingle it once per
        # batch, not once per pair (same jaccard() semantics)
        memo: dict[str, set] = {}

        def sh(t: str) -> set:
            s = memo.get(t)
            if s is None:
                s = set(shingle_hashes(t).tolist())
                memo[t] = s
            return s

        def jac_pair(x: str, y: str) -> float:
            sa, sb = sh(x), sh(y)
            if not sa and not sb:
                return 1.0
            return len(sa & sb) / len(sa | sb)

        jac = np.array([jac_pair(x, y) for x, y in zip(ta, tb)], dtype=np.float64)
        keep = jac >= threshold if len(jac) else np.zeros(0, dtype=bool)
        return pa.table(
            {
                "doc_a": pa.array(a[keep], type=pa.int64()),
                "doc_b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), type=pa.float64()),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow", batch_size=4096)


def simhash_fingerprints(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        vals = np.fromiter((simhash64(t) for t in texts), dtype=np.uint64, count=len(texts))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(vals.view(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(sh, batch_format="pyarrow", batch_size=2048)


def langid_pred(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def li(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array([langid(t) for t in texts], type=pa.string()),
            }
        )

    return ds.map_batches(li, batch_format="pyarrow", batch_size=4096)


def winnow_counts(sf_dir: str):
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def wc(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        fps = [winnow_fingerprints(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array([len(f) for f in fps], type=pa.int64()),
                "min_fingerprint": pa.array(
                    [int(f.min()) & 0x7FFFFFFFFFFFFFFF for f in fps], type=pa.int64()
                ),
            }
        )

    return ds.map_batches(wc, batch_format="pyarrow", batch_size=2048)

# ---- exact n-gram Jaccard similarity self-join (prefix filtering) ----

def ngram_jaccard_neardup(sf_dir: str, threshold: float = 0.5):
    """EXACT all-pairs word-trigram Jaccard >= threshold over `documents`
    — the deterministic complement to the probabilistic minhash_neardup,
    with a full DuckDB oracle (NGRAM_JACCARD_SQL).

    Scale design is AllPairs/PPJoin prefix filtering (Bayardo et al.,
    WWW'07 — public): under ANY global total order on shingles, two sets
    with Jaccard >= t must share an element within their first
    ``|d| - ceil(t*|d|) + 1`` shingles. The canonical order here is the
    shingle's xxh64 value (no global-frequency pass needed; a frequency
    ordering would shrink candidates further and can be added as a
    pre-pass without changing results). So:

      shingle (map_batches, per-doc sorted distinct hashes, pinned once)
      -> prefix emission (ragged numpy take, no Python loop)
      -> groupby(shingle) candidate pairs (fastagg.bucketed_pairs, no
         stop-band: completeness is the contract; positional/length
         filtering is the documented refinement if a hot shingle ever
         dominates)
      -> distinct pairs -> two partitioned hash joins ship the (small,
         already-shingled) sets to the pair -> exact intersect + filter.

    Nothing is corpus-sized on the driver; every stage is a map_batches
    or a bucketed shuffle."""
    from osmwaterwayextractor_ray.functions.text import word_ngram_hashes
    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pairs,
        distinct as fa_distinct,
        hash_join,
    )

    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def shingle(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        lists = [word_ngram_hashes(t) for t in texts]
        keep = [i for i, l in enumerate(lists) if len(l)]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                # int64 view of the uint64 hashes; rows stay sorted in
                # uint64 order (the canonical prefix order)
                "sh": pa.array(
                    [lists[i].view(np.int64) for i in keep], type=pa.list_(pa.int64())
                ),
                "n_sh": pa.array([len(lists[i]) for i in keep], type=pa.int64()),
            }
        )

    # pinned once; feeds the prefix emission AND both verify join sides
    shingled = docs.map_batches(shingle, batch_format="pyarrow", batch_size=2048).materialize()

    def prefix_emit(batch: pa.Table) -> pa.Table:
        col = batch.column("sh")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_sh = np.diff(offs)
        p = n_sh - np.ceil(threshold * n_sh).astype(np.int64) + 1
        P = int(p.sum())
        pref = np.concatenate(([0], np.cumsum(p)))[:-1]
        idx = np.repeat(offs[:-1] - pref, p) + np.arange(P)
        return pa.table(
            {
                "g": pa.array(values[idx], type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, p), type=pa.int64()),
            }
        )

    prefixes = shingled.map_batches(prefix_emit, batch_format="pyarrow", batch_size=65536)
    cand = bucketed_pairs(prefixes, ["g"], "doc_id", "id_a", "id_b")
    cand = fa_distinct(cand, ["id_a", "id_b"])

    def _side(idc: str, shc: str, nc: str):
        def rn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {idc: batch["doc_id"], shc: batch["sh"], nc: batch["n_sh"]}
            )

        return shingled.map_batches(rn, batch_format="pyarrow", batch_size=8192)

    paired = hash_join(cand, _side("id_a", "sh_a", "n_a"), on=["id_a"])
    paired = hash_join(paired, _side("id_b", "sh_b", "n_b"), on=["id_b"])

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        na = batch.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)
        sha = batch.column("sh_a").to_pylist()
        shb = batch.column("sh_b").to_pylist()
        inter = np.fromiter(
            (
                len(np.intersect1d(np.asarray(x), np.asarray(y), assume_unique=True))
                for x, y in zip(sha, shb)
            ),
            dtype=np.int64,
            count=len(a),
        )
        union = na + nb - inter
        jac = inter / union
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "n_inter": pa.array(inter[keep], type=pa.int64()),
                "n_union": pa.array(union[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow", batch_size=4096)


def _ngram_jaccard_sql(threshold: float = 0.5) -> str:
    # word trigrams via the SAME single-space split as word_ngram_hashes
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         list_aggregate(list_slice(sp, i, i + 2), 'string_agg', chr(31)) AS g
  FROM toks, LATERAL UNNEST(generate_series(1, greatest(len(sp) - 2, 0))) AS t(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(c AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - c AS BIGINT) AS n_union,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}
"""


NGRAM_JACCARD_SQL = _ngram_jaccard_sql()
