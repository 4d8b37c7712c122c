"""Wave 32: co-citation similarity (webgraph.co_citation) and the exact
embedding Gram matrix (embeddings.embed_gram) — independent pure-Python
references. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from osmwaterwayextractor_ray.pipelines import embeddings, webgraph

N = 60


def _make_docs(n=N):
    texts = ["w " * 3] * n
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cocite_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _brute_cocitation(n=N) -> dict[tuple[int, int], int]:
    out_lists = {}
    for did in range(n):
        dsts = set()
        for m, a in webgraph._LINK_RULES:
            t = (did * m + a) % n
            if t != did:
                dsts.add(t)
        out_lists[did] = sorted(dsts)
    c: Counter = Counter()
    for dsts in out_lists.values():
        for i in range(len(dsts)):
            for j in range(i + 1, len(dsts)):
                c[(dsts[i], dsts[j])] += 1
    return {k: v for k, v in c.items() if v >= webgraph._CC_MIN}


def test_co_citation_bruteforce(ray_session, corpus_dir):
    want = _brute_cocitation()
    assert want  # the rule graph really produces co-cited pairs
    got = webgraph.co_citation(corpus_dir).to_pandas()
    got_d = {
        (int(r["page_a"]), int(r["page_b"])): int(r["n_common"])
        for _, r in got.iterrows()
    }
    assert got_d == want
    assert all(a < b for a, b in got_d)


def test_embed_gram_bruteforce_sf0001(ray_session):
    sf = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    q = np.floor(mat * 1e6 + 0.5).astype(object)  # python-int exact matmul
    got = embeddings.embed_gram(sf).to_pandas()
    d = mat.shape[1]
    assert len(got) == d * (d + 1) // 2
    assert (got["i"] <= got["j"]).all()
    assert (got["i"] >= 1).all()  # sentinel rows never leak
    lookup = {(int(r["i"]), int(r["j"])): int(r["s"]) for _, r in got.iterrows()}
    rng = np.random.RandomState(3)
    for _ in range(25):  # spot-check cells with arbitrary-precision sums
        i, j = sorted(rng.randint(0, d, size=2).tolist())
        want = int(sum(int(a) * int(b) for a, b in zip(q[:, i], q[:, j])))
        assert lookup[(i + 1, j + 1)] == want, (i, j)


def test_embed_gram_budget_raises(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("gram_budget")
    n, dim = 4, embeddings.DIM
    vecs = [np.full(dim, 1e5, dtype=np.float32) for _ in range(n)]  # |q| ~ 1e11
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
            "label": np.zeros(n, dtype=np.int32),
        }
    ).to_parquet(d / "embeddings.parquet", index=False)
    with pytest.raises(Exception, match="budget"):
        embeddings.embed_gram(str(d))
