"""Wave 29: Naive Bayes language classifier (webtext.nb_langid) —
independent pure-Python reference + block invariance. The exact DuckDB
twin (NB_LANGID_SQL) is pinned by tests/test_oracle.py; here the
reference is a dict/list loop so the Ray pipeline and the SQL can't
share a bug."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webtext

N_DOCS = 90


def _make_docs(n=N_DOCS):
    # three "languages" with genuinely different token distributions plus
    # shared noise tokens, so the classifier has real signal and every
    # confusion cell is reachable; doc 0, 10, ... land in the train slice
    vocab = {
        "aa": ["alpha", "beta", "gamma"],
        "bb": ["delta", "epsilon", "zeta"],
        "cc": ["eta", "theta", "iota"],
    }
    langs = ["aa", "bb", "cc"]
    rows = []
    for i in range(n):
        lang = langs[i % 3]
        words = []
        for k in range(3 + i % 5):
            # mostly own-lang tokens, a few cross-lang ones
            src = lang if (i + k) % 4 else langs[(i + k) % 3]
            words.append(vocab[src][(i * 7 + k) % 3])
        if i % 11 == 0:
            words = []  # zero-token docs classified by prior alone
        rows.append((i, " ".join(words), lang))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    return df


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nb_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _reference_confusion(docs: pd.DataFrame) -> dict[tuple[str, str], int]:
    """Sequential NB with the operator's exact integer-cost contract."""
    SC = webtext._NB_SCALE
    sl = docs[docs.doc_id % webtext._NB_SLICE_MOD == 0]
    counts: dict[str, Counter] = {}
    nd: Counter = Counter()
    for _, r in sl.iterrows():
        nd[r["lang"]] += 1
        counts.setdefault(r["lang"], Counter()).update(r["text"].split())
    gl = Counter()
    for c in counts.values():
        gl.update(c)
    vocab = sorted(gl, key=lambda t: (-gl[t], t))[: webtext._NB_V_CAP]
    V = len(vocab)
    langs = sorted(nd)
    n_slice = sum(nd.values())
    T = {l: sum(counts[l].values()) for l in langs}
    q = {
        (l, t): math.floor(-math.log((counts[l].get(t, 0) + 1) / (T[l] + V + 1)) * SC)
        for l in langs
        for t in vocab
    }
    oov = {l: math.floor(-math.log(1 / (T[l] + V + 1)) * SC) for l in langs}
    prior = {l: math.floor(-math.log(nd[l] / n_slice) * SC) for l in langs}
    vset = set(vocab)
    conf: Counter = Counter()
    for _, r in docs[docs.doc_id % webtext._NB_SLICE_MOD != 0].iterrows():
        cost = {l: prior[l] for l in langs}
        for t in r["text"].split():
            for l in langs:
                cost[l] += q[(l, t)] if t in vset else oov[l]
        pred = min(langs, key=lambda l: (cost[l], l))
        conf[(r["lang"], pred)] += 1
    return dict(conf)


def test_nb_langid_bruteforce(ray_session, corpus_dir):
    got = webtext.nb_langid(corpus_dir).to_pandas()
    want = _reference_confusion(_make_docs())
    got_d = {
        (r["lang"], r["pred_lang"]): int(r["n_docs"]) for _, r in got.iterrows()
    }
    assert got_d == want
    # every held-out doc classified exactly once
    n_held = int((_make_docs().doc_id % webtext._NB_SLICE_MOD != 0).sum())
    assert sum(got_d.values()) == n_held


def test_nb_langid_block_invariance(ray_session, corpus_dir, monkeypatch):
    import pyarrow as pa

    base = webtext.nb_langid(corpus_dir).to_pandas()
    real = webtext._read_documents

    def spread(sf_dir, columns):
        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 5, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(webtext, "_read_documents", spread)
    alt = webtext.nb_langid(corpus_dir).to_pandas()
    cols = ["lang", "pred_lang"]
    pd.testing.assert_frame_equal(
        base.sort_values(cols).reset_index(drop=True),
        alt.sort_values(cols).reset_index(drop=True),
    )


def test_nb_langid_sf0001_shape(ray_session):
    got = webtext.nb_langid("/root/testdata/sf0.001").to_pandas()
    # 500 docs, 50 in the train slice -> 450 held-out classifications
    assert int(got["n_docs"].sum()) == 450
    assert set(got["lang"]) <= {"de", "en", "es", "fr", "zh"}
    assert set(got["pred_lang"]) <= {"de", "en", "es", "fr", "zh"}


def test_nb_langid_empty_slice_vocab(ray_session, tmp_path_factory):
    """Train slice with zero tokens: every held-out token is OOV and the
    classifier degrades to the prior (engine must not crash on the
    zero-row cost matrix — review regression)."""
    texts = ["", "", "alpha beta", "gamma", ""]
    # doc 0 is the only slice doc and has no tokens
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["aa", "bb", "bb", "aa", "bb"],
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    d = tmp_path_factory.mktemp("nb_empty_vocab")
    df.to_parquet(d / "documents.parquet", index=False)
    got = webtext.nb_langid(str(d)).to_pandas()
    # one class ('aa' from doc 0) -> every held-out doc predicted 'aa'
    assert set(got["pred_lang"]) == {"aa"}
    assert int(got["n_docs"].sum()) == 4
