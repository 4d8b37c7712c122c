"""Wave 55: customer_best_order (greatest-per-group + dimension attach)
+ brand_revenue_share (ratio-to-report) — pure-Python references.
tests/test_oracle.py pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational2


def test_customer_best_order_bruteforce(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cbo")
    orders = pd.DataFrame(
        {
            # cust 1: tie on price -> lower orderkey wins; cust 2: single;
            # cust 3 has no orders (absent from output)
            "o_orderkey": np.array([10, 11, 12, 20], dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "o_orderstatus": "F",
            "o_totalprice": [500.0, 500.0, 100.0, 42.5],
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1-URGENT",
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], dtype=np.int64),
            "c_name": ["alice", "bob", "carol"],
            "c_nationkey": np.int32(0),
            "c_acctbal": 0.0,
            "c_mktsegment": ["BUILDING", "MACHINERY", "AUTOMOBILE"],
        }
    )
    orders.to_parquet(d / "orders.parquet", index=False)
    cust.to_parquet(d / "customer.parquet", index=False)
    got = (
        relational2.customer_best_order(str(d))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert got.shape[0] == 2
    assert list(got["c_custkey"]) == [1, 2]
    assert list(got["o_orderkey"]) == [10, 20]
    assert list(got["total_cents"]) == [50000, 4250]
    assert list(got["c_name"]) == ["alice", "bob"]
    assert list(got["c_mktsegment"]) == ["BUILDING", "MACHINERY"]


def test_brand_revenue_share_bruteforce(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("brs")
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], dtype=np.int64),
            "p_name": "p",
            "p_brand": ["B1", "B2", "B1"],
            "p_type": ["T1", "T1", "T2"],
            "p_size": np.int32(1),
            "p_retailprice": 1.0,
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.array([1, 2, 2, 3], dtype=np.int64),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.int32(1),
            "l_quantity": 1.0,
            "l_extendedprice": [10.00, 20.00, 10.00, 5.00],
            "l_discount": [0.00, 0.10, 0.00, 0.05],
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    part.to_parquet(d / "part.parquet", index=False)
    li.to_parquet(d / "lineitem.parquet", index=False)
    got = (
        relational2.brand_revenue_share(str(d))
        .sort_values(["p_type", "p_brand"])
        .reset_index(drop=True)
    )
    # revenues in 1e-4 units: B1/T1 = 1000*100 = 100000;
    # B2/T1 = 2000*90 + 1000*100 = 280000; B1/T2 = 500*95 = 47500
    assert list(got["p_type"]) == ["T1", "T1", "T2"]
    assert list(got["p_brand"]) == ["B1", "B2", "B1"]
    assert list(got["rev_1e4"]) == [100000, 280000, 47500]
    t1 = 100000 + 280000
    assert list(got["share_ppm"]) == [
        100000 * 1_000_000 // t1,
        280000 * 1_000_000 // t1,
        1_000_000,
    ]
