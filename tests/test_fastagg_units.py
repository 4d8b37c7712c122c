"""Unit tests for the fastagg join/count primitives and the generic
connected-components stage — edge cases the oracle queries don't force
(missing keys, empty sides, list payloads, randomized graphs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_items(rows)


def test_lookup_join_inner_semantics_and_list_payload(ray_session):
    from osmwaterwayextractor_ray.stages.fastagg import lookup_join

    left = _ds([{"k": 1}, {"k": 2}, {"k": 2}, {"k": 99}])  # 99 absent from right
    right_tbl = pa.table(
        {
            "rid": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array([[10, 11], [20], [30, 31, 32]], type=pa.list_(pa.int64())),
        }
    )
    import ray.data as rd

    right = rd.from_arrow(right_tbl)
    out = lookup_join(left, right, "k", "rid", {"payload": "p"}).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 2]  # inner: unmatched left row dropped
    got = [list(v) for v in out["p"]]
    assert got == [[10, 11], [20], [20]]


def test_lookup_join_empty_left(ray_session):
    from osmwaterwayextractor_ray.stages.fastagg import lookup_join

    left = _ds([{"k": 123}])

    def drop_all(batch: pa.Table) -> pa.Table:
        return batch.slice(0, 0)

    left = left.map_batches(drop_all, batch_format="pyarrow")
    right = _ds([{"rid": 1, "v": 7}])
    out = lookup_join(left, right, "k", "rid", {"v": "v"}).to_pandas()
    assert len(out) == 0


def test_pair_counts_multiplicity(ray_session):
    from osmwaterwayextractor_ray.stages.fastagg import pair_counts

    rows = [{"a": 1, "b": 2}] * 5 + [{"a": 1, "b": 3}] * 2 + [{"a": 4, "b": 5}]
    out = pair_counts(_ds(rows), "a", "b", "n").to_pandas()
    got = {(int(r.a), int(r.b)): int(r.n) for r in out.itertuples()}
    assert got == {(1, 2): 5, (1, 3): 2, (4, 5): 1}


def test_connected_components_random_vs_bruteforce(ray_session):
    """Randomized graphs across several densities: the distributed CC
    labeling must equal the driver-side union-find ground truth."""
    from osmwaterwayextractor_ray.stages.components import connected_components
    from osmwaterwayextractor_ray.state.unionfind import connected_components_from_pairs

    rng = np.random.default_rng(1234)
    for n_nodes, n_edges in [(50, 20), (200, 150), (400, 800)]:
        a = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
        b = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        want = connected_components_from_pairs(a, b)
        ds = _ds([{"a": int(x), "b": int(y)} for x, y in zip(a, b)])
        got = connected_components(ds, "a", "b", num_parts=5).to_pandas()
        got_map = dict(zip(got["node"].astype(int), got["component"].astype(int)))
        assert got_map == want, f"n={n_nodes} e={len(a)}"


def test_entry_module_integrity():
    """Every oracle key and every bench QUERY_SET name must resolve to a
    registered query callable (guards registration typos)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em
    import bench

    qs = em.queries()
    missing_oracle = set(em.oracle_sql()) - set(qs)
    missing_bench = set(bench.QUERY_SET) - set(qs)
    assert not missing_oracle, missing_oracle
    assert not missing_bench, missing_bench


def test_joined_schema_matches_actual_join(ray_session):
    """joined_schema must predict lookup_join's output schema exactly
    (it is passed as the next chained join's left_schema, so a drift
    would null-pad with wrong types)."""
    import pyarrow as pa
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import joined_schema, lookup_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                  "x": pa.array([1.0, 2.0, 3.0])})
    )
    right = rd.from_arrow(
        pa.table({"rid": pa.array([1, 2, 3], type=pa.int64()),
                  "payload": pa.array([[1, 2], [3], []], type=pa.list_(pa.int64()))})
    )
    predicted = joined_schema(left, right, {"payload": "p"})
    actual = pa.schema(
        lookup_join(left, right, "k", "rid", {"payload": "p"}).schema().base_schema
    )
    assert predicted.names == actual.names
    for f in predicted:
        assert actual.field(f.name).type == f.type, f.name


def test_pair_products_and_sums_contract(ray_session):
    """bucketed_pair_products (product + const modes) and pair_sums
    (sum + count in one pass) against a hand-computed reference."""
    import pyarrow as pa
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pair_products,
        pair_sums,
    )

    # two groups: g=1 has ids 1,2,3 (w 10,20,30); g=2 has ids 2,5 (w 7,11)
    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "id": pa.array([3, 1, 2, 5, 2], type=pa.int64()),
            "w": pa.array([30, 10, 20, 11, 7], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    prod = bucketed_pair_products(ds, ["g"], "id", "w", "a", "b", "p").take_all()
    got = sorted((r["a"], r["b"], r["p"]) for r in prod)
    assert got == [(1, 2, 200), (1, 3, 300), (2, 3, 600), (2, 5, 77)]

    # const mode: w must be group-constant
    t2 = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "id": pa.array([3, 1, 2, 5, 2], type=pa.int64()),
            "w": pa.array([4, 4, 4, 9, 9], type=pa.int64()),
        }
    )
    cst = bucketed_pair_products(
        rd.from_arrow(t2), ["g"], "id", "w", "a", "b", "p", weight_mode="const"
    ).take_all()
    got = sorted((r["a"], r["b"], r["p"]) for r in cst)
    assert got == [(1, 2, 4), (1, 3, 4), (2, 3, 4), (2, 5, 9)]

    # pair_sums: duplicate keys reduce; count rides the same pass
    pairs = pa.table(
        {
            "a": pa.array([1, 1, 1, 2], type=pa.int64()),
            "b": pa.array([2, 2, 3, 3], type=pa.int64()),
            "v": pa.array([5, 7, 1, 9], type=pa.int64()),
        }
    )
    red = pair_sums(
        rd.from_arrow(pairs), "a", "b", "v", sum_col="s", count_col="n"
    ).take_all()
    got = sorted((r["a"], r["b"], r["s"], r["n"]) for r in red)
    assert got == [(1, 2, 12, 2), (1, 3, 1, 1), (2, 3, 9, 1)]
