"""Wave 53: column_correlations (all-integer Pearson audit, quality) +
grouped_mode (relational3) — pure-Python references. tests/test_oracle.py
pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import quality, relational3

US = 1_000_000
BASE = 1_700_000_000 * US


def test_column_correlations_bruteforce(ray_session, tmp_path_factory):
    rng = np.random.RandomState(13)
    n = 500
    qty = rng.randint(1, 51, n).astype(np.float64)
    price = qty * 100.0 + rng.randint(0, 50, n)  # strongly correlated
    # exact-.50 prices: half-to-even (np.round) and half-away-from-zero
    # (DuckDB round) provably differ on these rows (ADVICE r4)
    price[::7] += 0.50
    disc = rng.randint(0, 11, n) / 100.0  # independent
    tax = 0.08 - disc / 2.0  # anti-correlated with disc
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.int64(1),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.int32(1),
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": disc,
            "l_tax": tax,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    d = tmp_path_factory.mktemp("cc_li")
    df.to_parquet(d / "lineitem.parquet", index=False)

    got = quality.column_correlations(str(d)).set_index("pair")

    # independent big-int reference for every pair
    grids = {"qty": qty, "price": price, "disc": disc * 100, "tax": tax * 100}
    names = ["qty", "price", "disc", "tax"]
    # half-away-from-zero, matching the engine and DuckDB round()
    xs = {k: np.floor(v + 0.5).astype(object) for k, v in grids.items()}
    for ai in range(4):
        for bi in range(ai + 1, 4):
            a, b = xs[names[ai]], xs[names[bi]]
            num = n * int((a * b).sum()) - int(a.sum()) * int(b.sum())
            da = n * int((a * a).sum()) - int(a.sum()) ** 2
            db = n * int((b * b).sum()) - int(b.sum()) ** 2
            r2 = num * num // max(da * db // 1_000_000, 1)
            want = -r2 if num < 0 else r2
            key = f"{names[ai]}~{names[bi]}"
            assert int(got.loc[key, "r2_ppm"]) == want, key
            assert int(got.loc[key, "n"]) == n
    # sanity on the planted structure
    assert int(got.loc["qty~price", "r2_ppm"]) > 990_000
    # tax rounds to the 1-cent grid (disc/2 lands on half cents), which
    # flattens the planted anti-correlation to r² ≈ 0.96
    assert int(got.loc["disc~tax", "r2_ppm"]) < -900_000


def test_grouped_mode_bruteforce(ray_session, tmp_path_factory):
    rows = (
        [(1, i, BASE + i, "A", 5.00) for i in range(4)]
        + [(1, 10 + i, BASE + i, "A", 7.00) for i in range(4)]  # tie: 4 vs 4
        + [(1, 20, BASE, "A", 9.99)]
        + [(2, 30 + i, BASE + i, "B", 1.25) for i in range(3)]
        + [(2, 40, BASE, "B", 8.00)]
    )
    ev = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts_us", "event_type", "value"]
    )
    ev = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype(np.int64),
            "ts": ev["ts_us"].astype("datetime64[us]"),
            "user_id": ev["user_id"].astype(np.int64),
            "event_type": ev["event_type"],
            "value": ev["value"].astype(np.float64),
            "props": "",
        }
    )
    d = tmp_path_factory.mktemp("gm_events")
    ev.to_parquet(d / "events.parquet", index=False)
    got = relational3.grouped_mode(str(d)).set_index("event_type")
    # A ties 500 vs 700 at count 4 -> lower cents wins
    assert int(got.loc["A", "mode_cents"]) == 500
    assert int(got.loc["A", "n_occurrences"]) == 4
    assert int(got.loc["B", "mode_cents"]) == 125
    assert int(got.loc["B", "n_occurrences"]) == 3
