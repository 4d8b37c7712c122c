"""BSP min-label fixpoint (state/labelprop.py) — twin equality vs the
pure-Dataset fixpoint, brute-force reachability, and shard-count
invariance. The BSP path is the default scc/bowtie engine, so the twin
equality here is what licenses the swap."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmwaterwayextractor_ray.pipelines import webgraph
from osmwaterwayextractor_ray.state.labelprop import min_label_fixpoint_bsp

from tests.test_webgraph import _make_docs  # noqa: F401  (fixture helper)


@pytest.fixture(scope="module")
def corpus77_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("labelprop_docs77")
    _make_docs(77).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_scc_twin_equality(ray_session, corpus77_dir, monkeypatch):
    monkeypatch.setenv("WWX_SCC_FIXPOINT", "dataset")
    want = _sorted_df(webgraph.scc(corpus77_dir))
    monkeypatch.setenv("WWX_SCC_FIXPOINT", "bsp")
    got = _sorted_df(webgraph.scc(corpus77_dir))
    pd.testing.assert_frame_equal(got, want)


def test_bowtie_twin_equality(ray_session, corpus77_dir, monkeypatch):
    monkeypatch.setenv("WWX_SCC_FIXPOINT", "dataset")
    want = _sorted_df(webgraph.bowtie(corpus77_dir))
    monkeypatch.setenv("WWX_SCC_FIXPOINT", "bsp")
    got = _sorted_df(webgraph.bowtie(corpus77_dir))
    pd.testing.assert_frame_equal(got, want)


def _random_graph(n: int, m: int, seed: int):
    """Random digraph WITH per-node self-loops (the fixpoint contract)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    nodes = np.arange(n, dtype=np.int64)
    src = np.concatenate([src, nodes])
    dst = np.concatenate([dst, nodes])
    return src, dst


def _brute_min_reachable(src, dst, n, along: str) -> dict[int, int]:
    adj: dict[int, set[int]] = {v: set() for v in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        if along == "out":
            adj[s].add(d)
        else:
            adj[d].add(s)
    out = {}
    for v0 in range(n):
        seen = {v0}
        stk = [v0]
        while stk:
            v = stk.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stk.append(u)
        out[v0] = min(seen)
    return out


@pytest.mark.parametrize("along", ["out", "in"])
@pytest.mark.parametrize("num_parts", [3, 8])
def test_bsp_fixpoint_bruteforce(ray_session, along, num_parts):
    import ray.data as rd

    n, m, seed = 40, 70, 7
    src, dst = _random_graph(n, m, seed)
    e_ds = rd.from_arrow(
        pa.table(
            {"src_page": pa.array(src), "dst_page": pa.array(dst)}
        )
    )
    nodes = np.arange(n, dtype=np.int64)
    lab_ds = rd.from_arrow(
        pa.table({"page_id": pa.array(nodes), "lab": pa.array(nodes)})
    )
    got = (
        min_label_fixpoint_bsp(lab_ds, e_ds, along, f"t_{along}_{num_parts}",
                               num_parts=num_parts)
        .to_pandas()
        .set_index("page_id")["lab"]
        .to_dict()
    )
    assert got == _brute_min_reachable(src, dst, n, along)


def test_bsp_shard_count_invariance(ray_session):
    """Final labels are the unique fixpoint — independent of W."""
    import ray.data as rd

    src, dst = _random_graph(55, 90, 11)
    outs = []
    for W in (2, 5, 8):
        e_ds = rd.from_arrow(
            pa.table({"src_page": pa.array(src), "dst_page": pa.array(dst)})
        )
        nodes = np.arange(55, dtype=np.int64)
        lab_ds = rd.from_arrow(
            pa.table({"page_id": pa.array(nodes), "lab": pa.array(nodes)})
        )
        outs.append(
            _sorted_df(
                min_label_fixpoint_bsp(lab_ds, e_ds, "out", f"tw_{W}",
                                       num_parts=W)
            )
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


@pytest.mark.parametrize("bad", ["group", "attach"])
def test_bsp_unlabeled_endpoint_fails_loud(ray_session, bad):
    import ray.data as rd

    # node 9 is NOT in the label table; an edge touching it must raise
    src, dst = (9, 0) if bad == "group" else (0, 9)
    e_ds = rd.from_arrow(
        pa.table(
            {
                "src_page": pa.array([0, 1, src], type=pa.int64()),
                "dst_page": pa.array([0, 1, dst], type=pa.int64()),
            }
        )
    )
    lab_ds = rd.from_arrow(
        pa.table(
            {
                "page_id": pa.array([0, 1], type=pa.int64()),
                "lab": pa.array([0, 1], type=pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="labelprop"):
        min_label_fixpoint_bsp(
            lab_ds, e_ds, "out", f"t_unlab_{bad}", num_parts=2
        )


def test_bsp_no_selfloops_still_converges(ray_session):
    """The per-node label-edge is the self-term: even with no self-loops
    in E, labels stay monotone non-increasing (lab(lab(v)) <= lab(v))
    and converge to the same fixpoint."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    n, m = 30, 45
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    e_ds = rd.from_arrow(
        pa.table({"src_page": pa.array(src), "dst_page": pa.array(dst)})
    )
    nodes = np.arange(n, dtype=np.int64)
    lab_ds = rd.from_arrow(
        pa.table({"page_id": pa.array(nodes), "lab": pa.array(nodes)})
    )
    got = (
        min_label_fixpoint_bsp(lab_ds, e_ds, "out", "t_nosl", num_parts=4)
        .to_pandas()
        .set_index("page_id")["lab"]
        .to_dict()
    )
    assert got == _brute_min_reachable(src, dst, n, "out")
