"""Wave 52: peak_concurrency (distributed sweep line) + robust_outliers
(median/MAD screen) — pure-Python references. tests/test_oracle.py pins
the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3

US = 1_000_000
W = relational3._PC_WINDOW_US
BASE = 1_700_000_000 * US


def _events(rows, d):
    """rows = (user_id, event_id, ts_us, event_type, value)."""
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
    ev.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _brute_peak(ts_list):
    pts = sorted(
        [(t, 1) for t in ts_list] + [(t + W, -1) for t in ts_list],
        key=lambda p: (p[0], p[1]),
    )
    c = peak = 0
    first_t = None
    for t, d in pts:
        c += d
        if c > peak:
            peak, first_t = c, t
    return peak, first_t


def test_peak_concurrency_bruteforce(ray_session, tmp_path_factory):
    # overlapping cluster of 3, a back-to-back boundary pair (half-open:
    # no overlap), and a lone far-away session
    ts = [
        BASE,
        BASE + 10 * US,
        BASE + 20 * US,       # 3 concurrent here
        BASE + W,             # starts exactly as #1 ends — not 4
        BASE + 10 * W,        # lone
    ]
    rows = [(1, i, t, "view", 1.0) for i, t in enumerate(ts)]
    sf = _events(rows, tmp_path_factory.mktemp("pc_events"))
    got = relational3.peak_concurrency(sf)
    peak, first_t = _brute_peak(ts)
    assert int(got["peak"].iloc[0]) == peak == 3
    assert int(got["first_t_us"].iloc[0]) == first_t == BASE + 20 * US


def test_peak_concurrency_random_vs_bruteforce(ray_session, tmp_path_factory):
    rng = np.random.RandomState(5)
    # spread across several sweep buckets (2^36 us ≈ 19 h; span ~12 days)
    ts = sorted(
        int(BASE + rng.randint(0, 12 * 86_400) * US) for _ in range(400)
    )
    rows = [(1, i, t, "view", 1.0) for i, t in enumerate(ts)]
    sf = _events(rows, tmp_path_factory.mktemp("pc_rand"))
    got = relational3.peak_concurrency(sf)
    peak, first_t = _brute_peak(ts)
    assert int(got["peak"].iloc[0]) == peak
    assert int(got["first_t_us"].iloc[0]) == first_t


def test_robust_outliers_bruteforce(ray_session, tmp_path_factory):
    # type A: tight cluster around 10.00 with one wild point;
    # type B: 4 values (even n exercises the ceil(n/2) rank)
    rows = (
        [(1, i, BASE + i * US, "A", 10.00 + 0.01 * i) for i in range(9)]
        + [(1, 9, BASE + 9 * US, "A", 500.0)]
        + [
            (2, 10, BASE, "B", 1.00),
            (2, 11, BASE + US, "B", 2.00),
            (2, 12, BASE + 2 * US, "B", 3.00),
            (2, 13, BASE + 3 * US, "B", 4.00),
        ]
    )
    sf = _events(rows, tmp_path_factory.mktemp("ro_events"))
    got = (
        relational3.robust_outliers(sf)
        .to_pandas()
        .set_index("event_type")
    )
    # type A: cents sorted = [1000..1008, 50000]; n=10 -> med = rank 5 = 1004
    # ad sorted = [0,1,2,3,4,1,2,3,4->resorted...] compute directly:
    a = np.array([1000 + i for i in range(9)] + [50000])
    med_a = int(np.sort(a)[(10 + 1) // 2 - 1])
    ad_a = np.sort(np.abs(a - med_a))
    mad_a = int(ad_a[(10 + 1) // 2 - 1])
    assert int(got.loc["A", "med_cents"]) == med_a
    assert int(got.loc["A", "mad_cents"]) == mad_a
    assert int(got.loc["A", "n_outliers"]) == int((ad_a > 3 * mad_a).sum())
    # type B: [100,200,300,400]; med = rank 2 = 200; ad=[100,0,100,200]
    assert int(got.loc["B", "med_cents"]) == 200
    assert int(got.loc["B", "mad_cents"]) == 100
    assert int(got.loc["B", "n_outliers"]) == 0
