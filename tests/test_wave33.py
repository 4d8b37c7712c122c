"""Wave 33: funnel_conversion + retention_cohorts (relational3) —
pure-Python references over a boundary-heavy fixture + block
invariance. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3

US = 1_000_000
H = 3600 * US
W = relational3._FUNNEL_W_US
BASE = 1_700_000_000 * US  # any epoch anchor


def _make_events():
    rows = []  # (user_id, ts_us, type)

    def ev(u, t_us, ty):
        rows.append((u, t_us, ty))

    # u0: clean conversion
    ev(0, BASE, "view"); ev(0, BASE + H, "click"); ev(0, BASE + 2 * H, "purchase")
    # u1: click exactly at t1 (same-ts boundary counts)
    ev(1, BASE, "view"); ev(1, BASE, "click"); ev(1, BASE + W, "purchase")
    # u2: click exactly at t1 + W (inclusive boundary)
    ev(2, BASE, "view"); ev(2, BASE + W, "click")
    # u3: click just past the window
    ev(3, BASE, "view"); ev(3, BASE + W + 1, "click")
    # u4: click BEFORE the first view (must not count)
    ev(4, BASE + H, "view"); ev(4, BASE, "click")
    # u5: purchase before the qualifying click (must not count)
    ev(5, BASE, "view"); ev(5, BASE + H, "click"); ev(5, BASE, "purchase")
    # u6: two views; the FIRST anchors the chain (greedy-earliest)
    ev(6, BASE, "view"); ev(6, BASE + 10 * H, "view")
    ev(6, BASE + W + H, "click")  # within W of view#2 only -> no step 2
    # u7: no view at all
    ev(7, BASE, "click"); ev(7, BASE + H, "purchase")
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type"])
    return pd.DataFrame(
        {
            "event_id": np.arange(len(df), dtype=np.int64),
            "ts": df["ts_us"].astype("datetime64[us]"),
            "user_id": df["user_id"].astype(np.int64),
            "event_type": df["event_type"],
            "value": 1.0,
            "props": "",
        }
    )


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel_events")
    _make_events().to_parquet(d / "events.parquet", index=False)
    return str(d)


def _brute_funnel(ev: pd.DataFrame):
    n = [0, 0, 0]
    for u, g in ev.groupby("user_id"):
        g = g.assign(t=g["ts"].astype("datetime64[us]").astype(np.int64))
        views = sorted(g[g.event_type == "view"]["t"])
        if not views:
            continue
        n[0] += 1
        t1 = views[0]
        clicks = sorted(
            t for t in g[g.event_type == "click"]["t"] if t1 <= t <= t1 + W
        )
        if not clicks:
            continue
        n[1] += 1
        t2 = clicks[0]
        purch = [t for t in g[g.event_type == "purchase"]["t"] if t2 <= t <= t2 + W]
        if purch:
            n[2] += 1
    return {i + 1: c for i, c in enumerate(n)}


def test_funnel_bruteforce(ray_session, events_dir):
    want = _brute_funnel(_make_events())
    got = relational3.funnel_conversion(events_dir).to_pandas()
    got_d = {int(r["step"]): int(r["n_users"]) for _, r in got.iterrows()}
    assert got_d == want
    # the fixture's intended per-user outcomes, spelled out:
    # step1 = u0..u6 (u7 has no view); step2 = u0,u1,u2,u5 (u3 past the
    # window, u4 clicked before the view, u6 anchored on its FIRST view);
    # step3 = u0,u1 (u5's purchase precedes its click)
    assert want == {1: 7, 2: 4, 3: 2}


def _brute_retention(ev: pd.DataFrame):
    wk = ev["ts"].astype("datetime64[us]").astype(np.int64) // relational3._WEEK_US
    uw = set(zip(ev["user_id"], wk))
    coh = {}
    for u, w in uw:
        coh[u] = min(coh.get(u, w), w)
    return dict(Counter((coh[u], w - coh[u]) for u, w in uw))


def test_retention_bruteforce(ray_session, events_dir):
    want = _brute_retention(_make_events())
    got = relational3.retention_cohorts(events_dir).to_pandas()
    got_d = {
        (int(r["cohort_week"]), int(r["week_offset"])): int(r["n_users"])
        for _, r in got.iterrows()
    }
    assert got_d == want


def test_wave33_block_invariance(ray_session, events_dir, monkeypatch):
    import pyarrow as pa

    base_f = relational3.funnel_conversion(events_dir).to_pandas()
    base_r = relational3.retention_cohorts(events_dir).to_pandas()
    real = relational3._read_pq

    def spread(path, columns=None, **kw):
        ds = real(path, columns=columns, **kw)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("user_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 5, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(relational3, "_read_pq", spread)
    alt_f = relational3.funnel_conversion(events_dir).to_pandas()
    alt_r = relational3.retention_cohorts(events_dir).to_pandas()
    for base, alt, cols in [
        (base_f, alt_f, ["step"]),
        (base_r, alt_r, ["cohort_week", "week_offset"]),
    ]:
        pd.testing.assert_frame_equal(
            base.sort_values(cols).reset_index(drop=True),
            alt.sort_values(cols).reset_index(drop=True),
        )
