"""Wave 57: rolling_active_users (trailing 7-day WAU) + revenue_wow
(week-over-week growth) — pure-Python references. tests/test_oracle.py
pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3

US = 1_000_000
DAY = 86_400_000_000
WEEK = 7 * DAY
BASE = 1_700_000_000 * US
W = relational3._WAU_WINDOW


def test_rolling_active_users_bruteforce(ray_session, tmp_path_factory):
    # u1 active days 0, 1; u2 active day 0 (twice); u3 active day 9
    rows = [
        (1, 0, BASE), (1, 1, BASE + DAY), (2, 2, BASE), (2, 3, BASE + US),
        (3, 4, BASE + 9 * DAY),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us"])
    ev = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype(np.int64),
            "ts": ev["ts_us"].astype("datetime64[us]"),
            "user_id": ev["user_id"].astype(np.int64),
            "event_type": "view",
            "value": 1.0,
            "props": "",
        }
    )
    d = tmp_path_factory.mktemp("wau_events")
    ev.to_parquet(d / "events.parquet", index=False)
    got = (
        relational3.rolling_active_users(str(d))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )

    # brute force: distinct (user, day), window membership
    active = {(1, 0), (1, 1), (2, 0), (3, 9)}
    base_day = BASE // DAY
    want = {}
    for u, dday in active:
        for i in range(W):
            want.setdefault(base_day + dday + i, set()).add(u)
    want_rows = sorted((d_, len(us)) for d_, us in want.items())
    assert [(int(r["day"]), int(r["wau"])) for _, r in got.iterrows()] == want_rows


def test_revenue_wow_bruteforce(ray_session, tmp_path_factory):
    # weeks 0, 1, 2 consecutive; week 5 after a gap (prev NULL);
    # week 2 declines (negative ppm must truncate like DuckDB //)
    orders = []
    wk_cents = {0: 10000, 1: 15000, 2: 14999, 5: 777}
    k = 0
    for w, cents in wk_cents.items():
        orders.append((k, BASE + w * WEEK, cents / 100.0))
        k += 1
    df = pd.DataFrame(orders, columns=["o_orderkey", "ts_us", "o_totalprice"])
    df = pd.DataFrame(
        {
            "o_orderkey": df["o_orderkey"].astype(np.int64),
            "o_custkey": np.int64(1),
            "o_orderstatus": "F",
            "o_totalprice": df["o_totalprice"].astype(np.float64),
            "o_orderdate": df["ts_us"].astype("datetime64[us]"),
            "o_orderpriority": "1-URGENT",
        }
    )
    d = tmp_path_factory.mktemp("wow_orders")
    df.to_parquet(d / "orders.parquet", index=False)
    got = relational3.revenue_wow(str(d)).reset_index(drop=True)
    base_w = BASE // WEEK

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    assert list(got["week"]) == [base_w, base_w + 1, base_w + 2, base_w + 5]
    assert list(got["total_cents"]) == [10000, 15000, 14999, 777]
    pc = got["prev_cents"].tolist()
    assert np.isnan(pc[0]) and np.isnan(pc[3]) and pc[1:3] == [10000.0, 15000.0]
    wp = got["wow_ppm"].tolist()
    assert np.isnan(wp[0]) and np.isnan(wp[3])
    assert wp[1] == float(trunc_div(5000 * 1_000_000, 10000))
    assert wp[2] == float(trunc_div(-1 * 1_000_000, 15000))
