"""Web-scale curation operators (pipelines/webtext.py) — the parts the SQL
oracle can't see.

tests/test_oracle.py already pins all four operators against DuckDB at
sf0.001 (and the driver replica at sf0.01). This suite pins:

  * Python-re <-> DuckDB-RE2 parity of the PII patterns on adversarial
    boundary/overlap strings (the oracle only exercises the planted corpus).
  * dup_span_stats against a brute-force set-based reference on a corpus
    built to stress the interval-union kernel (adjacent / overlapping /
    disjoint spans, within-doc repeated grams, empty and short docs).
  * bm25_search against a full-corpus numpy reference (the pipeline's
    per-batch partial top-k must lose nothing).
  * block-structure invariance: every operator returns identical rows when
    the input arrives in 7 shuffled-size blocks instead of one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webtext

WORDS = ["scan", "merge", "window", "dup", "aa", "bb", "cc", "dd", "ee"]


def _make_corpus(n=80, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        L = int(rng.integers(0, 40))
        toks = [WORDS[int(v)] for v in rng.integers(0, len(WORDS), L)]
        rows.append((i, " ".join(toks)))
    # planted span cases: identical long run shared by 3 docs (adjacent +
    # overlapping grams), a shared trigram islanded inside unique text,
    # a within-doc repeated trigram that is NOT shared, short/empty docs
    shared = "scan merge window dup scan merge window"
    rows.append((n, shared + " aa bb cc"))
    rows.append((n + 1, "dd ee " + shared))
    rows.append((n + 2, shared))
    rows.append((n + 3, "aa aa aa aa aa aa"))  # self-repeat only
    rows.append((n + 4, "scan merge"))  # < 3 words -> no grams
    rows.append((n + 5, ""))
    # OOV plant for lm_quality: doc_id 86 (% 10 != 0, outside the LM
    # training slice) carries words no slice doc can contain
    rows.append((n + 6, "zzuniq qquniq scan"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["source"] = [f"s{i % 3}" for i in range(len(df))]
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df["lang"] = "en"
    return df


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("webtext_docs")
    _make_corpus().to_parquet(d / "documents.parquet", index=False)
    return str(d)


# ---------------------------------------------------------------------------
# PII regex parity (python re vs DuckDB RE2) on adversarial strings
# ---------------------------------------------------------------------------

PII_EDGE_CASES = [
    "a@b.co",  # minimal email
    "x a.b@c.d.ee y",  # dotted local + dotted domain
    "no-pii here 1.2 3.4",  # dotted numbers too short for IP
    "ip 1.2.3.4 end",  # plain IP
    "v 999.999.999.999 w",  # syntactic IP, out-of-range octets (still matches)
    "1.2.3.4.5",  # 5 octets: \b boundaries allow the leading 4
    "call +1-555-123-4567 now",  # phone
    "+12-345-678-9012",  # 2-digit country code
    "mail bob@ex.com +1-555-123-4567 10.0.0.1",  # all three
    "bob@10.2.3.4",  # email whose domain looks like an IP
    "a@b.c",  # TLD too short -> not an email
    "edge@case.com.",  # trailing dot after TLD
    "nested bob@example.com10.0.0.1",  # adjacency, no space
]


def test_pii_regex_parity_duckdb():
    import duckdb

    con = duckdb.connect()
    for s in PII_EDGE_CASES:
        for pat, rx in [
            (webtext.PII_EMAIL, webtext._RE_EMAIL),
            (webtext.PII_PHONE, webtext._RE_PHONE),
            (webtext.PII_IP, webtext._RE_IP),
        ]:
            want = con.execute(
                "SELECT regexp_extract_all(?, ?)", [s, pat]
            ).fetchone()[0]
            got = rx.findall(s)
            assert got == want, (s, pat, got, want)
        # redaction parity (the fixed EMAIL->PHONE->IP order)
        red_py = webtext._RE_IP.sub(
            "<IP>",
            webtext._RE_PHONE.sub("<PHONE>", webtext._RE_EMAIL.sub("<EMAIL>", s)),
        )
        red_sql = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(?,"
            " ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<IP>', 'g')",
            [s, webtext.PII_EMAIL, webtext.PII_PHONE, webtext.PII_IP],
        ).fetchone()[0]
        assert red_py == red_sql, (s, red_py, red_sql)


# ---------------------------------------------------------------------------
# dup_span_stats vs brute force
# ---------------------------------------------------------------------------

def _brute_span_stats(df: pd.DataFrame, n: int = webtext._SPAN_N) -> pd.DataFrame:
    grams: dict[str, set[int]] = {}
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for did, text in zip(df["doc_id"], df["text"]):
        ws = text.split(" ")
        lst = []
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i : i + n])
            lst.append((i, g))
            grams.setdefault(g, set()).add(did)
        per_doc[did] = lst
    rows = []
    for did, text in zip(df["doc_id"], df["text"]):
        ws = text.split(" ")
        dup_pos = [i for i, g in per_doc[did] if len(grams[g]) >= 2]
        covered: set[int] = set()
        for i in dup_pos:
            covered.update(range(i, i + n))
        rows.append(
            (did, len(ws), max(len(ws) - n + 1, 0), len(dup_pos), len(covered))
        )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id", "n_words", "n_gram_positions",
            "n_dup_positions", "n_covered_words",
        ],
    )


def test_dup_span_stats_bruteforce(ray_session, corpus_dir):
    got = (
        webtext.dup_span_stats(corpus_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _brute_span_stats(_make_corpus())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# bm25_search vs full-corpus numpy reference
# ---------------------------------------------------------------------------

def _brute_bm25(df: pd.DataFrame, terms, k) -> pd.DataFrame:
    toks = [t.split(" ") for t in df["text"]]
    dl = np.array([len(w) for w in toks], dtype=np.int64)
    avgdl = np.float64(dl.sum()) / np.float64(len(dl))
    rows = []
    for term in terms:
        tf = np.array([w.count(term) for w in toks], dtype=np.int64)
        hit = tf > 0
        if not hit.any():
            continue
        tff = tf[hit].astype(np.float64)
        s = tff * (webtext._BM25_K1 + 1.0) / (
            tff
            + webtext._BM25_K1
            * ((1.0 - webtext._BM25_B) + webtext._BM25_B * (dl[hit] / avgdl))
        )
        ids = df["doc_id"].to_numpy()[hit]
        order = np.lexsort((ids, -s))[:k]
        for r, j in enumerate(order, start=1):
            rows.append((term, r, int(ids[j]), int(tf[hit][j]), int(dl[hit][j])))
    return pd.DataFrame(rows, columns=["term", "rank", "doc_id", "tf", "dl"])


def test_bm25_bruteforce(ray_session, corpus_dir):
    got = (
        webtext.bm25_search(corpus_dir)
        .to_pandas()
        .sort_values(["term", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _brute_bm25(_make_corpus(), webtext.BM25_TERMS, webtext._BM25_K)
        .sort_values(["term", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# weighted_sample determinism + threshold rule
# ---------------------------------------------------------------------------

def test_weighted_sample_rule(ray_session, corpus_dir):
    got = (
        webtext.weighted_sample(corpus_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = _make_corpus()
    h = (df["doc_id"].to_numpy().astype(np.int64) * webtext._WS_HASH_MULT) % 2**32
    keep = h < df["n_chars"].to_numpy().astype(np.int64) * webtext._WS_SCALE
    want = (
        df.loc[keep, ["doc_id", "source", "n_chars"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 0 < len(got) < len(df)  # the corpus exercises both branches


def test_lm_quality_bruteforce(ray_session, corpus_dir):
    import math

    docs = _make_corpus()
    # independent pure-python LM (counts/dicts, no numpy/arrow)
    counts: dict[str, int] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        if did % webtext._LM_SLICE_MOD == 0:
            for t in text.split():
                counts[t] = counts.get(t, 0) + 1
    T = sum(counts.values())
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: webtext._LM_V_CAP]
    q = {t: math.floor(-math.log(c / T) * webtext._LM_SCALE) for t, c in vocab}
    q_oov = math.floor(math.log(T + 1) * webtext._LM_SCALE)

    got = webtext.lm_quality(corpus_dir).to_pandas()
    want_rows = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        if not toks:
            continue
        cost = sum(q.get(t, q_oov) for t in toks)
        oov = sum(1 for t in toks if t not in q)
        want_rows[did] = (len(toks), cost, oov)
    assert len(got) == len(want_rows)
    saw_oov = 0
    for _, row in got.iterrows():
        nt, cost, oov = want_rows[row["doc_id"]]
        assert (row["n_tokens"], row["lm_cost"], row["n_oov"]) == (nt, cost, oov)
        saw_oov += oov
    # the fixture must actually exercise the OOV path (docs outside the
    # slice contain words the slice never saw) or this test proves nothing
    assert saw_oov > 0


# ---------------------------------------------------------------------------
# line_dedup vs brute force
# ---------------------------------------------------------------------------

def _brute_line_dedup(df: pd.DataFrame) -> pd.DataFrame:
    W, K = webtext._LD_W, webtext._LD_K
    per_doc: dict[int, list[str]] = {}
    freq: dict[str, set[int]] = {}
    for did, text in zip(df["doc_id"], df["text"]):
        ws = text.split(" ")
        if did % 2 == 0:
            ws = webtext._LD_BOILER.format(v=did % 5).split(" ") + ws
        lines = [" ".join(ws[i : i + W]) for i in range(0, len(ws), W)]
        per_doc[int(did)] = lines
        for ln in set(lines):
            freq.setdefault(ln, set()).add(int(did))
    rows = []
    for did, lines in per_doc.items():
        kept = [ln for ln in lines if len(freq[ln]) < K]
        rows.append((did, len(lines), len(lines) - len(kept), "\n".join(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_lines", "n_removed", "clean_text"]
    )


def test_line_dedup_bruteforce(ray_session, corpus_dir):
    got = (
        webtext.line_dedup(corpus_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _brute_line_dedup(_make_corpus())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the fixture must exercise BOTH paths: planted boilerplate removed
    # (every even doc loses its banner line) and clean docs untouched
    assert int(want["n_removed"].sum()) >= want["doc_id"].nunique() // 2
    assert (want["n_removed"] == 0).any()


# ---------------------------------------------------------------------------
# positional phrase search — brute force + overlaps + repeated-word phrase
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def phrase_dir(tmp_path_factory):
    rows = [
        (0, "big data big data big"),        # two occurrences of "big data"
        (1, "big big data"),                 # one, after a decoy prefix
        (2, "data big"),                     # reversed -> none
        (3, "big\tdata"),                    # tab separator still tokenizes
        (4, ""),                             # empty
        (5, "the the the"),                  # repeated-word phrase target
        (6, "the the"),                      # exactly one "the the" pair? two tokens -> one occurrence
        (7, "big data"),                     # minimal hit
        (8, "bigdata big"),                  # concatenated decoy -> none
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df["lang"] = "en"
    d = tmp_path_factory.mktemp("phrase_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d), {i: t for i, t in rows}


def _brute_phrase(texts: dict[int, str], phrase: tuple[str, ...]) -> dict[int, int]:
    out = {}
    k = len(phrase)
    for did, tx in texts.items():
        toks = tx.split()
        n = sum(
            1
            for i in range(len(toks) - k + 1)
            if tuple(toks[i : i + k]) == phrase
        )
        if n:
            out[did] = n
    return out


@pytest.mark.parametrize("phrase", [("big", "data"), ("the", "the"), ("big", "data", "big")])
def test_phrase_search_bruteforce(ray_session, phrase_dir, phrase):
    d, texts = phrase_dir
    got = {
        int(r["doc_id"]): int(r["n_occurrences"])
        for r in webtext.phrase_search(d, phrase=phrase).take_all()
    }
    want = _brute_phrase(texts, phrase)
    assert want, phrase  # each parametrized phrase must actually hit
    assert got == want


def test_phrase_search_block_invariance(ray_session, phrase_dir, monkeypatch):
    d, _ = phrase_dir
    base = sorted(
        map(tuple, webtext.phrase_search(d).to_pandas().to_numpy().tolist())
    )
    real = webtext._read_documents

    def spread(sf_dir, columns):
        import pyarrow as pa

        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column(columns[0]).to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 4, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(webtext, "_read_documents", spread)
    alt = sorted(
        map(tuple, webtext.phrase_search(d).to_pandas().to_numpy().tolist())
    )
    assert alt == base


# ---------------------------------------------------------------------------
# block-structure invariance: 7 shuffled blocks == 1 block
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "op",
    ["pii_scrub", "dup_span_stats", "bm25_search", "weighted_sample",
     "lm_quality", "line_dedup", "host_quota", "doc_length_hist",
     "dsir_weights", "source_temperature_mix", "gopher_filter",
     "dedup_spans", "perplexity_buckets", "source_epochs",
     "normalize_text", "data_split", "sentence_stats", "parse_quarantine",
     "host_keywords", "readability"],
)
def test_block_invariance(ray_session, corpus_dir, monkeypatch, op):
    fn = getattr(webtext, op)
    base = fn(corpus_dir).to_pandas()

    real = webtext._read_documents

    def spread(sf_dir, columns):
        # deterministic shuffle into 7 uneven blocks
        ds = real(sf_dir, columns)
        import pyarrow as pa

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column(columns[0]).to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 7, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(webtext, "_read_documents", spread)
    alt = fn(corpus_dir).to_pandas()
    cols = list(base.columns)
    assert list(alt.columns) == cols
    b = base.sort_values(cols).reset_index(drop=True)
    a = alt.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# host_quota / doc_length_hist / dsir_weights brute-force references
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def quota_dir(tmp_path_factory):
    """A corpus dense enough that every host exceeds the cap (400 docs /
    20 hosts = 20 per host > cap 15), with planted n_chars TIES inside a
    host so the doc_id tiebreak is actually exercised."""
    rng = np.random.default_rng(23)
    n = 400
    texts = ["x" * int(rng.integers(0, 60)) for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df["source"] = "s0"
    df["lang"] = ["en" if i % 3 == 0 else "xx" for i in range(n)]
    d = tmp_path_factory.mktemp("quota_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_host_quota_bruteforce(ray_session, quota_dir):
    got = (
        webtext.host_quota(quota_dir)
        .to_pandas()
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{quota_dir}/documents.parquet")
    df["hostn"] = df["doc_id"] % webtext._HQ_HOSTS
    df = df.sort_values(
        ["hostn", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    df["host_rank"] = df.groupby("hostn").cumcount() + 1
    want = df[df["host_rank"] <= webtext._HQ_CAP].copy()
    want["host"] = "site" + want["hostn"].astype(str) + ".test"
    want = (
        want[["doc_id", "host", "n_chars", "host_rank"]]
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )
    # every host hits the cap exactly in this corpus
    assert (got.groupby("host").size() == webtext._HQ_CAP).all()
    pd.testing.assert_frame_equal(
        got, want.astype({c: got[c].dtype for c in want.columns})
    )


def test_doc_length_hist_bruteforce(ray_session, quota_dir):
    got = (
        webtext.doc_length_hist(quota_dir)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{quota_dir}/documents.parquet")
    g = df.assign(bucket=df["n_chars"] // webtext._DLH_BIN).groupby("bucket")["n_chars"]
    want = pd.DataFrame(
        {
            "bucket": g.count().index.astype(np.int64),
            "n_docs": g.count().to_numpy(np.int64),
            "sum_chars": g.sum().to_numpy(np.int64),
            "min_chars": g.min().to_numpy(np.int64),
            "max_chars": g.max().to_numpy(np.int64),
        }
    )
    want["lo_chars"] = want["bucket"] * webtext._DLH_BIN
    want = want[list(got.columns)].sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({c: got[c].dtype for c in want.columns}))


def test_dsir_weights_bruteforce(ray_session, corpus_dir):
    """Pure-python DSIR reference on the module corpus (all-en: target ==
    raw so every weight collapses to 0) AND the mixed-lang quota corpus
    exercised via the oracle suite; here the all-en degenerate case pins
    the smoothing arithmetic (weights must be exactly 0, sums exact)."""
    import math

    from collections import Counter

    got = webtext.dsir_weights(corpus_dir).to_pandas()
    df = pd.read_parquet(f"{corpus_dir}/documents.parquet")
    ct: Counter = Counter()
    cr: Counter = Counter()
    for _, r in df.iterrows():
        toks = r["text"].split()
        cr.update(toks)
        if r["lang"] == webtext._DSIR_TARGET_LANG:
            ct.update(toks)
    vocab = sorted(cr, key=lambda t: (-cr[t], t))[: webtext._DSIR_V_CAP]
    V = len(vocab)
    Tt = sum(ct[t] for t in vocab)
    Tr = sum(cr[t] for t in vocab)
    w = {
        t: math.floor(
            (math.log((ct[t] + 1) / (Tt + V)) - math.log((cr[t] + 1) / (Tr + V)))
            * webtext._DSIR_SCALE
        )
        for t in vocab
    }
    wset = set(vocab)
    want_rows = []
    for _, r in df.iterrows():
        toks = r["text"].split()
        if toks:
            want_rows.append(
                (r["doc_id"], len(toks), sum(w[t] for t in toks if t in wset))
            )
    want = pd.DataFrame(want_rows, columns=["doc_id", "n_tokens", "dsir_weight"])
    g = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, want.astype({c: g[c].dtype for c in want.columns}))
    # all-en corpus: ct == cr for every token -> every weight identical...
    # but Tt == Tr too, so the difference is exactly 0
    assert (g["dsir_weight"] == 0).all()


def test_dsir_weights_mixed_lang(ray_session, quota_dir):
    """On the mixed-lang corpus the en slice is 1/3 of the mass: weights
    must be non-degenerate and in-vocab-only (the single-token docs give
    direct per-token reads)."""
    got = webtext.dsir_weights(quota_dir).to_pandas()
    assert (got["dsir_weight"] != 0).any()


def test_source_temperature_mix_bruteforce(ray_session, corpus_dir):
    """Pure-python reference of the tempered-rate decision on the module
    corpus (3 sources with naturally different byte masses)."""
    import math

    got = webtext.source_temperature_mix(corpus_dir).to_pandas()
    df = pd.read_parquet(f"{corpus_dir}/documents.parquet")
    mass = df.groupby("source")["n_chars"].sum().to_dict()
    m_min = min(mass.values())
    thr = {
        s: math.floor(math.sqrt(m_min / float(m)) * 4294967296)
        for s, m in mass.items()
    }
    keep = [
        (int(r["doc_id"]), r["source"])
        for _, r in df.iterrows()
        if (int(r["doc_id"]) * webtext._STM_HASH_MULT) % 4294967296
        < thr[r["source"]]
    ]
    want = pd.DataFrame(keep, columns=["doc_id", "source"])
    g = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g, want.astype({c: g[c].dtype for c in want.columns})
    )
    # masses differ -> at least one source is actually downsampled, and
    # the lightest source keeps everything (rate exactly 1)
    assert len(set(thr.values())) > 1
    lightest = min(mass, key=mass.get)  # unique on this corpus
    n_light = (df["source"] == lightest).sum()
    assert (got["source"] == lightest).sum() == n_light


def test_host_count_constants_agree():
    """_HQ_HOSTS re-declares webgraph's host count (a module-level import
    would cycle through CURATE_WEB_CORPUS_SQL's build): pin them equal so
    the two host universes can't silently desync."""
    from osmwaterwayextractor_ray.pipelines import webgraph

    assert webtext._HQ_HOSTS == webgraph._N_HOSTS


# ---------------------------------------------------------------------------
# dedup_spans vs brute force (wave 11)
# ---------------------------------------------------------------------------

def _brute_dedup_spans(df: pd.DataFrame) -> pd.DataFrame:
    """Per-position reference: union of spans of every non-first
    occurrence of a cross-document shared gram."""
    n = webtext._SPAN_N
    words = {int(d): t.split(" ") for d, t in zip(df["doc_id"], df["text"])}
    occ: dict[str, list[tuple[int, int]]] = {}
    for did, ws in words.items():
        for i in range(len(ws) - n + 1):
            occ.setdefault(" ".join(ws[i : i + n]), []).append((did, i))
    cov = {d: np.zeros(len(ws), dtype=bool) for d, ws in words.items()}
    for gram, lst in occ.items():
        if len({d for d, _ in lst}) >= 2:
            first = min(lst)  # lexicographic == packed (doc_id, pos) order
            for d, p in lst:
                if (d, p) != first:
                    cov[d][p : p + n] = True
    rows = []
    for did in sorted(words):
        ws, m = words[did], cov[did]
        kept = [w for w, c in zip(ws, m) if not c]
        rows.append((did, len(ws), int(m.sum()), " ".join(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_words", "n_removed_words", "clean_text"]
    )


def test_dedup_spans_brute_force(ray_session, corpus_dir):
    got = (
        webtext.dedup_spans(corpus_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_dedup_spans(_make_corpus())
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the planted shared run must actually be rewritten: at least one of
    # the three docs sharing it loses words, and the global first
    # occurrence's doc keeps more than the later ones
    shared_docs = want[want["doc_id"].isin([80, 81, 82])]
    assert shared_docs["n_removed_words"].sum() > 0
    # self-repeat-only doc (83) is untouched: its grams are single-doc
    assert int(want.loc[want["doc_id"] == 83, "n_removed_words"].iloc[0]) == 0


# ---------------------------------------------------------------------------
# perplexity_buckets properties (wave 11)
# ---------------------------------------------------------------------------

def test_perplexity_buckets_thirds_and_order(ray_session, corpus_dir):
    got = webtext.perplexity_buckets(corpus_dir).to_pandas()
    for lang, g in got.groupby("lang"):
        counts = g["bucket"].value_counts()
        # equal thirds, +-1 doc
        assert counts.max() - counts.min() <= 1, (lang, counts.to_dict())
        # rank order respected: every head key <= every middle key <= tail
        h = g.loc[g["bucket"] == "head", "ppl_key"]
        m = g.loc[g["bucket"] == "middle", "ppl_key"]
        t = g.loc[g["bucket"] == "tail", "ppl_key"]
        assert h.max() <= m.min() and m.max() <= t.min()


# ---------------------------------------------------------------------------
# source_epochs properties (wave 12)
# ---------------------------------------------------------------------------

def test_source_epochs_copy_counts(ray_session, corpus_dir):
    got = webtext.source_epochs(corpus_dir).to_pandas()
    df = _make_corpus()
    per_doc = got.groupby("doc_id").size()
    assert set(per_doc.index) == set(df["doc_id"])  # every doc appears
    for did, src in zip(df["doc_id"], df["source"]):
        k = int(src[1:])  # this corpus uses 's0'/'s1'/'s2' (trailing digits)
        num = 4 + (k % 5)
        lo, hi = num // webtext._SE_DEN, (num + webtext._SE_DEN - 1) // webtext._SE_DEN
        assert lo <= per_doc[did] <= hi, (did, src, per_doc[did])
        # exact per-doc rule, independently recomputed
        extra = (did * webtext._SE_HASH_MULT) % 4294967296 < (
            num % webtext._SE_DEN
        ) * (4294967296 // webtext._SE_DEN)
        assert per_doc[did] == num // webtext._SE_DEN + int(extra)
    # epoch_idx is a clean 0..copies-1 sequence per doc
    for did, g in got.groupby("doc_id"):
        assert sorted(g["epoch_idx"]) == list(range(len(g)))


# ---------------------------------------------------------------------------
# data_split / sentence_stats / parse_quarantine (wave 20)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def strata_dir(tmp_path_factory):
    # 2 langs x 2 sources with deliberately uneven stratum sizes
    # (37 / 23 / 11 / 9) so the exact n//10 allocations differ per stratum
    rows = []
    sizes = {("en", "web"): 37, ("en", "books"): 23, ("de", "web"): 11,
             ("de", "books"): 9}
    i = 0
    for (lang, src), n in sizes.items():
        for _ in range(n):
            rows.append((i, f"text {i}", lang, src))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    d = tmp_path_factory.mktemp("webtext_strata")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d), sizes


def test_data_split_bruteforce(ray_session, strata_dir):
    d, sizes = strata_dir
    got = webtext.data_split(d).to_pandas()
    assert len(got) == sum(sizes.values())
    # pandas reference: rank by (h, doc_id) within each stratum
    df = pd.read_parquet(f"{d}/documents.parquet")
    df["h"] = (df["doc_id"].to_numpy() * webtext._SPLIT_MULT) % 4294967296
    df = df.sort_values(["lang", "source", "h", "doc_id"])
    df["rn"] = df.groupby(["lang", "source"]).cumcount()
    want = {}
    for _, r in df.iterrows():
        n = sizes[(r["lang"], r["source"])]
        tenth = n // 10
        want[r["doc_id"]] = (
            "val" if r["rn"] < tenth else ("test" if r["rn"] < 2 * tenth else "train")
        )
    for _, row in got.iterrows():
        assert want[row["doc_id"]] == row["split"], row["doc_id"]
    # exact per-stratum proportions, not just in expectation
    cnt = got.groupby(["lang", "source", "split"]).size()
    for (lang, src), n in sizes.items():
        assert cnt.get((lang, src, "val"), 0) == n // 10
        assert cnt.get((lang, src, "test"), 0) == n // 10
        assert cnt.get((lang, src, "train"), 0) == n - 2 * (n // 10)


SENTENCE_EDGE_CASES = [
    "",  # empty
    "!!!",  # punctuation only -> 0 sentences
    "no terminator at all",  # 1 sentence (the whole text)
    "One. Two! Three?",  # plain 3
    "a.b",  # terminator mid-token splits: 'a' + 'b'
    "Hi...   spaced out ?!  ",  # runs collapse; trailing empty segment
    "tabs\tand\nnewlines. \t\n second.",  # trim set beyond plain space
    "café rules. ok",  # non-ASCII char counts as ONE char both sides
    ". leading",  # leading empty segment
]


def test_sentence_stats_edge_cases_vs_duckdb(ray_session, tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("webtext_sentences")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(SENTENCE_EDGE_CASES), dtype=np.int64),
            "text": SENTENCE_EDGE_CASES,
        }
    )
    df["lang"] = "en"
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(d / "documents.parquet", index=False)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(webtext.SENTENCE_STATS_SQL).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    got = (
        webtext.sentence_stats(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want[got.columns].astype("int64")
    )
    # hand-pinned expectations for the load-bearing rows
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_sentences"] == 0  # empty
    assert by_id.loc[1, "n_sentences"] == 0  # "!!!"
    assert by_id.loc[2, "n_sentences"] == 1  # no terminator
    assert by_id.loc[3, "n_sentences"] == 3
    assert by_id.loc[4, "n_sentences"] == 2  # "a.b"
    assert by_id.loc[7, "max_sent_chars"] == len("café rules")


def test_parse_quarantine_statuses(ray_session, corpus_dir):
    got = webtext.parse_quarantine(corpus_dir).to_pandas()
    for _, row in got.iterrows():
        d = row["doc_id"]
        if d % 11 == 5:
            assert (row["status"], row["views"]) == ("missing", -1), d
        elif d % 7 == 3:
            assert (row["status"], row["views"]) == ("bad_value", -1), d
        else:
            assert (row["status"], row["views"]) == ("ok", (d * 37) % 100000), d
    # every path of the dead-letter routing fires on this corpus
    assert set(got["status"]) == {"ok", "bad_value", "missing"}


def test_corpus_datasheet_adversarial(ray_session, tmp_path_factory):
    # nulls, empties, exact dups, multiple langs/sources — the cases the
    # sf corpora don't exercise
    from osmwaterwayextractor_ray.pipelines import textops

    texts = [None, "", "dup text", "dup text", "a b  c", "one.two", "x"]
    langs = ["en", "en", "de", "de", "en", "fr", "en"]
    srcs = ["s0", "s1", "s0", "s0", "s1", "s2", "s0"]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": srcs,
        }
    )
    df["n_chars"] = df["text"].fillna("").str.len().astype(np.int64)
    d = tmp_path_factory.mktemp("webtext_datasheet")
    df.to_parquet(d / "documents.parquet", index=False)

    got = textops.corpus_datasheet(str(d)).to_pandas().iloc[0]
    assert got["n_docs"] == 7
    assert got["n_empty"] == 2  # None and "" both count
    assert got["total_chars"] == sum(len(t or "") for t in texts)
    assert got["max_chars"] == len("dup text")
    # whitespace tokens: dup(2)+dup(2)+abc(3)+one.two(1)+x(1)
    assert got["total_tokens"] == 9
    assert got["n_distinct_texts"] == 5  # None=="" collapse, dups collapse
    assert got["n_langs"] == 3 and got["n_sources"] == 3

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(textops.CORPUS_DATASHEET_SQL).df().iloc[0]
    con.close()
    for c in got.index:
        assert int(got[c]) == int(want[c]), c


def test_corpus_datasheet_empty_corpus(ray_session, tmp_path_factory):
    # DuckDB sum()/max() over zero rows return NULL — the twin COALESCEs
    from osmwaterwayextractor_ray.pipelines import textops
    import duckdb

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("webtext_datasheet_empty")
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    pq.write_table(empty, d / "documents.parquet")
    got = textops.corpus_datasheet(str(d)).to_pandas().iloc[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(textops.CORPUS_DATASHEET_SQL).df().iloc[0]
    con.close()
    for c in got.index:
        assert int(got[c]) == int(want[c]) == 0 or c == "n_docs", c
    assert int(got["n_docs"]) == 0


def test_data_split_null_strata(ray_session, tmp_path_factory):
    # NULL lang/source coalesce to '' on both sides (regression: the
    # null-key drop in grouped_agg crashed assign with a KeyError)
    import duckdb

    d = tmp_path_factory.mktemp("webtext_split_nulls")
    n = 30
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["t"] * n,
            "lang": [None if i % 3 == 0 else "en" for i in range(n)],
            "source": [None if i % 5 == 0 else "web" for i in range(n)],
        }
    )
    df["n_chars"] = np.int64(1)
    df.to_parquet(d / "documents.parquet", index=False)
    got = (
        webtext.data_split(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == n
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(webtext.DATA_SPLIT_SQL).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_host_keywords_bruteforce(ray_session, corpus_dir):
    import math

    df = _make_corpus()
    n = len(df)
    tf = {}
    dfc = {}
    for _, r in df.iterrows():
        toks = [t for t in (r["text"] or "").split() if t]
        for t in toks:
            tf[(r["source"], t)] = tf.get((r["source"], t), 0) + 1
        for t in set(toks):
            dfc[t] = dfc.get(t, 0) + 1
    rows = []
    for (src, tok), c in tf.items():
        idf = math.floor(math.log(n / dfc[tok]) * webtext._KW_Q)
        rows.append((src, tok, c, idf, c * idf))
    ref = pd.DataFrame(rows, columns=["source", "tok", "tf", "idf_q", "score"])
    ref = ref.sort_values(["source", "score", "tok"], ascending=[True, False, True])
    ref["rank"] = ref.groupby("source").cumcount() + 1
    ref = ref[ref["rank"] <= webtext._KW_K].reset_index(drop=True)

    got = (
        webtext.host_keywords(corpus_dir).to_pandas()
        .sort_values(["source", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, ref.sort_values(["source", "rank"]).reset_index(drop=True),
        check_dtype=False,
    )
    assert got.groupby("source")["rank"].max().min() == webtext._KW_K


READABILITY_EDGE_CASES = [
    "",  # no words -> sentinel 0
    "...",  # 1 whitespace token but 0 sentences -> the s guard fires
    "Cat sat.",  # 2 words, 1 sentence, 2 vowel groups
    "The quick brown fox jumps. It runs! Why?",  # 3 sentences
    "bcdfg hjklm",  # no vowels: v=0 term drops out
    "aeiou AEIOU aei",  # vowel runs spanning whole words
]


def test_readability_vs_duckdb_and_pinned(ray_session, tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("webtext_readability")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(READABILITY_EDGE_CASES), dtype=np.int64),
            "text": READABILITY_EDGE_CASES,
        }
    )
    df["lang"] = "en"
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(d / "documents.parquet", index=False)
    got = (
        webtext.readability(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(webtext.READABILITY_SQL).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want[got.columns].astype("int64")
    )
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "flesch_m"] == 0  # empty -> sentinel
    assert by_id.loc[2, "n_words"] == 2
    assert by_id.loc[2, "n_sentences"] == 1
    assert by_id.loc[2, "n_vowel_groups"] == 2
    assert by_id.loc[2, "flesch_m"] == 206835 - (1015 * 2) // 1 - (84600 * 2) // 2
    assert by_id.loc[3, "n_sentences"] == 3
    assert by_id.loc[4, "n_vowel_groups"] == 0


def test_host_keywords_null_source(ray_session, tmp_path_factory):
    # NULL source coalesces to '' on both sides (regression: grouped_agg's
    # null-key drop silently lost NULL-source documents from the engine)
    import duckdb

    d = tmp_path_factory.mktemp("webtext_kw_nulls")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype=np.int64),
            "text": [f"alpha beta tok{i % 4}" for i in range(20)],
            "lang": "en",
            "source": [None if i % 4 == 0 else f"s{i % 2}" for i in range(20)],
        }
    )
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(d / "documents.parquet", index=False)
    got = (
        webtext.host_keywords(str(d)).to_pandas()
        .sort_values(["source", "rank"]).reset_index(drop=True)
    )
    assert "" in set(got["source"])  # the NULL stratum survived
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(webtext.HOST_KEYWORDS_SQL).df()
        .sort_values(["source", "rank"]).reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
