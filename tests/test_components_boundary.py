"""Adversarial boundary-fraction property tests for the distributed
connected-components closure (stages/components.py) — VERDICT r3 #9.

The one driver-side step is the O(boundary) root-equivalence closure;
these graphs are built so nearly EVERY edge crosses edge-partitions
(boundary >> partitions), the regime where a wrong closure would show."""

import numpy as np
import pytest
import ray.data as rd

from osmwaterwayextractor_ray.stages.components import connected_components
from osmwaterwayextractor_ray.state.unionfind import connected_components_from_pairs


def _run(a, b, num_parts):
    ds = rd.from_arrow(
        __import__("pyarrow").table(
            {"a": np.asarray(a, dtype=np.int64), "b": np.asarray(b, dtype=np.int64)}
        )
    )
    out = connected_components(ds, "a", "b", num_parts=num_parts).take_all()
    return {r["node"]: r["component"] for r in out}


def _oracle(a, b):
    return connected_components_from_pairs(
        np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)
    )


def test_chain_spanning_all_partitions():
    # one long chain whose ids are scrambled so consecutive nodes land in
    # different hash partitions — every edge is a boundary edge, yet the
    # closure must still collapse the chain to one component (min id)
    rng = np.random.default_rng(11)
    ids = rng.permutation(5000).astype(np.int64)
    a, b = ids[:-1], ids[1:]
    got = _run(a, b, num_parts=8)
    assert set(got.values()) == {0}
    assert len(got) == 5000


def test_star_with_max_center():
    # star centered on the LARGEST id: every partition's local root must
    # still resolve to the global min leaf
    center = 10_000
    leaves = np.arange(1, 600, dtype=np.int64) * 7  # spread across buckets
    a = np.full(len(leaves), center, dtype=np.int64)
    got = _run(a, leaves, num_parts=8)
    want = _oracle(a, leaves)
    assert got == want
    assert set(got.values()) == {int(leaves.min())}


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("num_parts", [2, 7])
def test_random_graphs_match_sequential_uf(seed, num_parts):
    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 800, 1200
    a = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    b = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    got = _run(a, b, num_parts=num_parts)
    want = _oracle(a, b)
    assert got == want


def test_doubletons_with_cross_partition_bridges():
    # many 2-node components plus a few long-range bridges merging them in
    # waves — each bridge creates a fresh root equivalence, so the driver
    # closure sees boundary pairs >> partitions and must chain transitively
    pairs_a = np.arange(0, 2000, 2, dtype=np.int64)
    pairs_b = pairs_a + 1
    bridge_a = pairs_b[:-1:2]  # odd node of component k
    bridge_b = pairs_a[1::2]   # even node of component k+1
    a = np.concatenate([pairs_a, bridge_a])
    b = np.concatenate([pairs_b, bridge_b])
    got = _run(a, b, num_parts=4)
    want = _oracle(a, b)
    assert got == want
