"""Wave 54: events_moving_avg (ROWS-frame trailing window) +
ship_lag_hist (fact-to-fact join histogram) — pure-Python references.
tests/test_oracle.py pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3

US = 1_000_000
DAY = 86_400_000_000
BASE = 1_700_000_000 * US
W = relational3._MA_WINDOW


def test_events_moving_avg_bruteforce(ray_session, tmp_path_factory):
    rows = [
        # u1: 6 events — window ramps 1,2,3,4 then slides
        *[(1, i, BASE + i * US, (i + 1) * 1.00) for i in range(6)],
        # u2: same-ts tie ordered by event_id
        (2, 10, BASE, 5.00),
        (2, 11, BASE, 7.00),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us", "value"])
    ev = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype(np.int64),
            "ts": ev["ts_us"].astype("datetime64[us]"),
            "user_id": ev["user_id"].astype(np.int64),
            "event_type": "view",
            "value": ev["value"].astype(np.float64),
            "props": "",
        }
    )
    d = tmp_path_factory.mktemp("ma_events")
    ev.to_parquet(d / "events.parquet", index=False)
    got = (
        relational3.events_moving_avg(str(d))
        .to_pandas()
        .set_index("event_id")
    )

    # brute force
    per_user = {}
    for uid, eid, ts, v in rows:
        per_user.setdefault(uid, []).append((ts, eid, round(v * 100)))
    for uid, evs in per_user.items():
        evs.sort()
        for i, (_, eid, _) in enumerate(evs):
            win = [c for _, _, c in evs[max(0, i - W + 1) : i + 1]]
            want = (sum(win) * 1_000_000) // len(win)
            assert int(got.loc[eid, "ma_micro"]) == want, eid


def test_ship_lag_hist_bruteforce(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("slh")
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.int64(1),
            "o_orderstatus": "F",
            "o_totalprice": 1.0,
            "o_orderdate": pd.to_datetime(
                [BASE, BASE + DAY], unit="us"
            ),
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "l_partkey": np.int64(1),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.arange(4, dtype=np.int32),
            "l_quantity": 1.0,
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            # lags: 0d, 0d (same day +1h), 3d; order 2: 5d
            "l_shipdate": pd.to_datetime(
                [BASE, BASE + 3600 * US, BASE + 3 * DAY, BASE + DAY + 5 * DAY],
                unit="us",
            ),
        }
    )
    orders.to_parquet(d / "orders.parquet", index=False)
    li.to_parquet(d / "lineitem.parquet", index=False)
    got = relational3.ship_lag_hist(str(d)).to_pandas()
    got_d = {
        (r["o_orderpriority"], int(r["lag_days"])): int(r["n_lineitems"])
        for _, r in got.iterrows()
    }
    assert got_d == {
        ("1-URGENT", 0): 2,
        ("1-URGENT", 3): 1,
        ("2-HIGH", 5): 1,
    }
