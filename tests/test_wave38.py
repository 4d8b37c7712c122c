"""Wave 38: events_percent_rank + fk_violations (relational3) —
pure-Python references with planted ties and planted orphans.
tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3


def _make_events():
    # crafted ties: type 'a' has duplicate values (RANK semantics bite),
    # type 'b' is a single-row partition (pr = 0), type 'c' is uniform
    rows = [
        (0, "a", 5.0), (1, "a", 1.0), (2, "a", 5.0), (3, "a", 3.0),
        (4, "a", 1.0),
        (5, "b", 9.0),
        (6, "c", 2.0), (7, "c", 2.0), (8, "c", 2.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    df["ts"] = pd.Timestamp("2024-01-01")
    df["user_id"] = np.int64(1)
    df["props"] = ""
    return df


@pytest.fixture(scope="module")
def ev_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("prank_events")
    _make_events().to_parquet(d / "events.parquet", index=False)
    return str(d)


def _brute_prank(ev: pd.DataFrame):
    out = {}
    for t, g in ev.groupby("event_type"):
        n = len(g)
        for _, r in g.iterrows():
            rank = int((g["value"] < r["value"]).sum()) + 1
            pr = ((rank - 1) * 1_000_000) // (n - 1) if n > 1 else 0
            out[int(r["event_id"])] = (t, pr)
    return out


def test_percent_rank_bruteforce(ray_session, ev_dir):
    want = _brute_prank(_make_events())
    got = relational3.events_percent_rank(ev_dir).to_pandas()
    got_d = {
        int(r["event_id"]): (r["event_type"], int(r["pr_micro"]))
        for _, r in got.iterrows()
    }
    assert got_d == want
    # the intended tie outcomes, spelled out
    assert got_d[1][1] == got_d[4][1] == 0          # shared min rank
    assert got_d[0][1] == got_d[2][1] == 750_000    # shared rank 4 of 5
    assert got_d[5][1] == 0                          # single-row partition
    assert {got_d[i][1] for i in (6, 7, 8)} == {0}   # all-equal partition


def test_fk_violations_planted(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fk_tables")
    # minimal star with PLANTED orphans: 2 lineitems point at a missing
    # order, 1 order at a missing customer
    pd.DataFrame(
        {"l_orderkey": [1, 1, 99, 99, 2], "l_partkey": [10, 10, 10, 10, 10],
         "l_suppkey": [20, 20, 20, 20, 20]}
    ).to_parquet(d / "lineitem.parquet", index=False)
    pd.DataFrame(
        {"o_orderkey": [1, 2], "o_custkey": [5, 77]}
    ).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame({"c_custkey": [5], "c_nationkey": [0]}).to_parquet(
        d / "customer.parquet", index=False
    )
    pd.DataFrame({"p_partkey": [10]}).to_parquet(d / "part.parquet", index=False)
    pd.DataFrame({"s_suppkey": [20], "s_nationkey": [0]}).to_parquet(
        d / "supplier.parquet", index=False
    )
    pd.DataFrame({"n_nationkey": [0], "n_regionkey": [0]}).to_parquet(
        d / "nation.parquet", index=False
    )
    pd.DataFrame({"r_regionkey": [0]}).to_parquet(d / "region.parquet", index=False)
    got = relational3.fk_violations(str(d)).to_pandas()
    got_d = dict(zip(got["relation"], got["n_orphans"].astype(int)))
    assert got_d["lineitem.orderkey"] == 2
    assert got_d["orders.custkey"] == 1
    assert sum(got_d.values()) == 3  # every other edge is clean
    assert len(got_d) == len(relational3._FK_RELATIONS)


def test_fk_violations_clean_testdata(ray_session):
    got = relational3.fk_violations("/root/testdata/sf0.001").to_pandas()
    assert (got["n_orphans"] == 0).all()
