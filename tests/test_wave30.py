"""Wave 30: bow-tie decomposition (webgraph.bowtie) — independent
pure-Python reference (boolean closure over the synthesized link rules)
+ block invariance. The exact DuckDB twin (BOWTIE_SQL) is pinned by
tests/test_oracle.py."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webgraph


def _make_docs(n):
    texts = ["w " * 5] * n
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


@pytest.fixture(scope="module", params=[60, 77])
def corpus(tmp_path_factory, request):
    n = request.param
    d = tmp_path_factory.mktemp(f"bowtie_docs_{n}")
    _make_docs(n).to_parquet(d / "documents.parquet", index=False)
    return n, str(d)


def _brute_bowtie(n) -> dict[str, int]:
    A = np.eye(n, dtype=bool)
    for did in range(n):
        for m, a in webgraph._LINK_RULES:
            t = (did * m + a) % n
            A[did, t] = True
    # boolean transitive closure (n small)
    R = A.copy()
    while True:
        R2 = R | (R @ R)
        if (R2 == R).all():
            break
        R = R2
    mutual = R & R.T
    scc_id = np.array([np.flatnonzero(mutual[v]).min() for v in range(n)])
    sizes = Counter(scc_id.tolist())
    core = min(sizes, key=lambda c: (-sizes[c], c))
    comp = []
    core_members = np.flatnonzero(scc_id == core)
    for v in range(n):
        if scc_id[v] == core:
            comp.append("core")
        elif R[v, core_members].any():
            comp.append("in")
        elif R[core_members, v].any():
            comp.append("out")
        else:
            comp.append("other")
    return dict(Counter(comp))


def test_bowtie_bruteforce(ray_session, corpus):
    n, d = corpus
    want = _brute_bowtie(n)
    got = webgraph.bowtie(d).to_pandas()
    got_d = {r["component"]: int(r["n_pages"]) for _, r in got.iterrows()}
    assert got_d == want
    assert sum(got_d.values()) == n


def test_bowtie_all_four_classes(ray_session, tmp_path_factory):
    """A corpus size where the rule graph yields a non-trivial split
    (found by scanning n): every page is classified exactly once and
    the core is the largest SCC."""
    for n in (60, 77):
        want = _brute_bowtie(n)
        assert sum(want.values()) == n
        assert "core" in want


def test_bowtie_block_invariance(ray_session, corpus, monkeypatch):
    import pyarrow as pa

    n, d = corpus
    base = webgraph.bowtie(d).to_pandas()
    real = webgraph._read_documents

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

    monkeypatch.setattr(webgraph, "_read_documents", spread)
    alt = webgraph.bowtie(d).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("component").reset_index(drop=True),
        alt.sort_values("component").reset_index(drop=True),
    )
