"""Wave 48: k_anonymity + key_skew_audit (pipelines/quality.py) —
pure-Python references. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import quality


def test_k_anonymity_bruteforce(ray_session, tmp_path_factory):
    # classes: (1,'A') x 7, (1,'B') x 2, (2,'A') x 5, (2,'B') x 1
    rows = [(1, "A")] * 7 + [(1, "B")] * 2 + [(2, "A")] * 5 + [(2, "B")]
    df = pd.DataFrame(rows, columns=["c_nationkey", "c_mktsegment"])
    df["c_custkey"] = np.arange(len(df), dtype=np.int64)
    df["c_name"] = "c"
    df["c_acctbal"] = 0.0
    df["c_nationkey"] = df["c_nationkey"].astype(np.int32)
    d = tmp_path_factory.mktemp("ka_cust")
    df.to_parquet(d / "customer.parquet", index=False)
    got = quality.k_anonymity(str(d))
    assert got.iloc[0].to_dict() == {
        "n_rows": 15,
        "n_classes": 4,
        "k_min": 1,
        "n_rows_below_k": 3,  # the size-2 and size-1 classes
        "n_classes_below_k": 2,
    }


def test_key_skew_audit_bruteforce(ray_session, tmp_path_factory):
    # key 7 x 50, key 3 x 30, keys 10..21 x 2 each (ties -> key asc)
    keys = [7] * 50 + [3] * 30 + [k for k in range(10, 22) for _ in range(2)]
    df = pd.DataFrame({"l_partkey": np.array(keys, dtype=np.int64)})
    for c, v in [
        ("l_orderkey", 1), ("l_suppkey", 1), ("l_linenumber", 1),
    ]:
        df[c] = np.int32(v) if c == "l_linenumber" else np.int64(v)
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        df[c] = 1.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    d = tmp_path_factory.mktemp("skew_li")
    df.to_parquet(d / "lineitem.parquet", index=False)

    got = quality.key_skew_audit(str(d))
    total = len(keys)
    want_keys = [7, 3] + list(range(10, 18))  # ties at n=2 break by key asc
    want_n = [50, 30] + [2] * 8
    assert list(got["rank"]) == list(range(1, 11))
    assert list(got["l_partkey"]) == want_keys
    assert list(got["n_rows"]) == want_n
    assert list(got["share_ppm"]) == [n * 1_000_000 // total for n in want_n]


def test_fd_audit_null_contract(ray_session, tmp_path_factory):
    """NULL lhs/rhs rows are excluded on BOTH sides (engine == SQL):
    a lhs mapping to {5, NULL} holds; a NULL-lhs row adds no group."""
    import duckdb

    from osmwaterwayextractor_ray.pipelines.quality import _FDS, FD_AUDIT_SQL

    d = tmp_path_factory.mktemp("fdnull")
    li = pd.DataFrame(
        {
            "l_orderkey": pd.array([1, 1, 2, None, 3, 3], dtype="Int64"),
            "l_partkey": pd.array([10, 10, 20, 30, 40, 40], dtype="Int64"),
            "l_suppkey": pd.array([5, None, 7, 8, 9, 11], dtype="Int64"),
            "l_linenumber": pd.array([1, 2, 1, 1, 1, 1], dtype="Int32"),
            "l_returnflag": ["N", "N", "A", "R", "N", None],
        }
    )
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        li[c] = 1.0
    li["l_linestatus"] = "O"
    li["l_shipdate"] = pd.Timestamp("2024-01-01")
    li.to_parquet(d / "lineitem.parquet", index=False)

    got = quality.fd_audit(str(d)).set_index("fd")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    want = con.sql(FD_AUDIT_SQL).df().set_index("fd")
    for name, *_ in _FDS:
        assert int(got.loc[name, "n_lhs"]) == int(want.loc[name, "n_lhs"]), name
        assert int(got.loc[name, "n_violating"]) == int(
            want.loc[name, "n_violating"]
        ), name
    # partkey 10 maps to {5, NULL} -> holds after NULL exclusion
    assert int(got.loc["l_partkey->l_suppkey", "n_violating"]) == 1  # only 40
