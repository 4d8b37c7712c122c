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
