"""tfidf_cosine_neardup — independent pure-Python brute force (dict/loop,
exact ints) + block-structure invariance + the exact-equality threshold
band (the big-int fallback path). tests/test_oracle.py pins the SQL
oracle; here the reference shares no code with the engine."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import textops

N_DOCS = 120


def _texts(n=N_DOCS) -> list[str]:
    """Deterministic multi-term corpus: doc i uses 6 consecutive words of
    a 12-word ring starting at i%4, each repeated 1+(i+j)%3 times — so
    term dfs span N/4..N (exercising the df <= N/2 vocabulary cut), texts
    repeat every 12 docs (exact-dup pairs at cosine 1), and offset-sharing
    docs overlap partially (graded cosines)."""
    out = []
    for i in range(n):
        toks = []
        for j in range(6):
            toks.extend([f"tok{(i % 4 + j) % 12}"] * (1 + (i + j) % 3))
        out.append(" ".join(toks))
    return out


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tfidf_docs")
    texts = _texts()
    pd.DataFrame(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"s{i % 3}" for i in range(N_DOCS)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _brute(texts: list[str], thr_num: int, thr_den: int) -> pd.DataFrame:
    n = len(texts)
    tfs = [
        {t: min(c, textops.TFIDF_TF_CAP) for t, c in Counter(tx.split()).items()}
        for tx in texts
    ]
    df = Counter(t for tf in tfs for t in tf)
    idf = {
        t: math.floor(math.log(n / d) * textops.TFIDF_Q)
        for t, d in df.items()
        if d * textops.TFIDF_DF_DEN <= n * textops.TFIDF_DF_NUM
    }
    idf = {t: v for t, v in idf.items() if v > 0}
    w = [{t: c * idf[t] for t, c in tf.items() if t in idf} for tf in tfs]
    nn = [sum(x * x for x in wv.values()) for wv in w]
    rows = []
    for a in range(n):
        for b in range(a + 1, n):
            shared = set(w[a]) & set(w[b])
            dot = sum(w[a][t] * w[b][t] for t in shared)
            if dot > 0 and dot * dot * thr_den * thr_den >= (
                thr_num * thr_num * nn[a] * nn[b]
            ):
                rows.append((a, b, dot, nn[a], nn[b]))
    return (
        pd.DataFrame(rows, columns=["id_a", "id_b", "dot", "nn_a", "nn_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def _run(sf_dir, **kw) -> pd.DataFrame:
    got = textops.tfidf_cosine_neardup(sf_dir, **kw).to_pandas()
    return (
        got[["id_a", "id_b", "dot", "nn_a", "nn_b"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def test_bruteforce(ray_session, corpus_dir):
    got = _run(corpus_dir)
    want = _brute(_texts(), 4, 5)
    assert len(want) > 0  # the corpus must actually produce hits
    # and the threshold must actually reject some candidate pairs
    assert len(want) < len(_brute(_texts(), 0, 1))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_exact_equality_threshold(ray_session, corpus_dir):
    # thr 1/1 keeps only cosine == 1 pairs: dot^2 == nn_a * nn_b holds
    # with exact equality for identical texts, so every kept pair runs
    # through the certainty band's big-int fallback
    got = _run(corpus_dir, thr_num=1, thr_den=1)
    want = _brute(_texts(), 1, 1)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # identical texts repeat every 12 docs -> those pairs must be present
    # (cosine-1 pairs with UNEQUAL norms also qualify: proportional vectors)
    texts = _texts()
    kept = set(zip(got["id_a"], got["id_b"]))
    for a in range(N_DOCS):
        for b in range(a + 1, N_DOCS):
            if texts[a] == texts[b]:
                assert (a, b) in kept


def test_token_pmi_bruteforce(ray_session, corpus_dir):
    texts = _texts()
    pc: Counter = Counter()
    uc: Counter = Counter()
    T = P = 0
    for tx in texts:
        toks = tx.split()
        uc.update(toks)
        T += len(toks)
        for i in range(len(toks)):
            for d in range(1, textops.PMI_W + 1):
                if i + d >= len(toks):
                    break
                a, b = sorted((toks[i], toks[i + d]))
                pc[(a, b)] += 1
                P += 1
    rows = []
    for (a, b), cab in pc.items():
        if cab < textops.PMI_MIN_CNT:
            continue
        pmi = math.floor(
            math.log((cab / P) / ((uc[a] / T) * (uc[b] / T))) * textops.PMI_Q
        )
        rows.append((a, b, cab, pmi))
    want = (
        pd.DataFrame(rows, columns=["tok_a", "tok_b", "c_ab", "pmi_q"])
        .sort_values(["tok_a", "tok_b"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    got = (
        textops.token_pmi(corpus_dir)
        .to_pandas()
        .sort_values(["tok_a", "tok_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_pmi_block_invariance(ray_session, corpus_dir, monkeypatch):
    base = (
        textops.token_pmi(corpus_dir)
        .to_pandas()
        .sort_values(["tok_a", "tok_b"])
        .reset_index(drop=True)
    )
    real = textops._read_documents

    def spread(sf_dir, columns):
        import pyarrow as pa

        ds = real(sf_dir, columns)

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

    monkeypatch.setattr(textops, "_read_documents", spread)
    alt = (
        textops.token_pmi(corpus_dir)
        .to_pandas()
        .sort_values(["tok_a", "tok_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, base)


def test_block_invariance(ray_session, corpus_dir, monkeypatch):
    base = _run(corpus_dir)
    real = textops._read_documents

    def spread(sf_dir, columns):
        import pyarrow as pa

        ds = real(sf_dir, columns)

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

    monkeypatch.setattr(textops, "_read_documents", spread)
    alt = _run(corpus_dir)
    pd.testing.assert_frame_equal(alt, base)
