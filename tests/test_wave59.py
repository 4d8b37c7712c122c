"""Wave 59: rebalance_audit (reshard data-movement under mod-N vs
consistent-hash ring) — pure-Python reference. tests/test_oracle.py pins
the SQL twin at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import quality


def _brute(keys):
    ro = quality._rb_ring(quality._RB_P_OLD)
    rn = quality._rb_ring(quality._RB_P_NEW)

    def owner(pt, ring):
        rpt, rw = ring
        i = np.searchsorted(rpt, pt, side="left")
        return int(rw[0 if i == len(rpt) else i])

    moved_mod = moved_ring = 0
    for k in keys:
        if k % quality._RB_P_OLD != k % quality._RB_P_NEW:
            moved_mod += 1
        pt = int(quality._rb_point(np.array([k], dtype=np.int64))[0])
        if owner(pt, ro) != owner(pt, rn):
            moved_ring += 1
    return moved_mod, moved_ring


def test_rebalance_audit_bruteforce(ray_session, tmp_path_factory):
    rng = np.random.RandomState(23)
    keys = np.unique(rng.randint(1, 1_000_000, 700)).astype(np.int64)
    df = pd.DataFrame({"l_partkey": np.repeat(keys, 2)})  # dups collapse
    for c, v in [("l_orderkey", 1), ("l_suppkey", 1)]:
        df[c] = np.int64(v)
    df["l_linenumber"] = np.int32(1)
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        df[c] = 1.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    d = tmp_path_factory.mktemp("rb_li")
    df.to_parquet(d / "lineitem.parquet", index=False)

    got = quality.rebalance_audit(str(d)).set_index("scheme")
    moved_mod, moved_ring = _brute(keys.tolist())
    n = len(keys)
    assert int(got.loc["mod", "n_keys"]) == n
    assert int(got.loc["mod", "n_moved"]) == moved_mod
    assert int(got.loc["ring", "n_moved"]) == moved_ring
    assert int(got.loc["ring", "moved_ppm"]) == moved_ring * 1_000_000 // n
    # the whole point: the ring moves FAR less than mod-N on a grow
    assert moved_ring < moved_mod
    # and roughly the arc fraction 1 - P/P' = 1/3 (generous band)
    assert 0.15 * n < moved_ring < 0.55 * n
