"""Wave 46: cdc_upsert (CDC change-log compaction with tombstones) and
scd2_history (SCD2 validity intervals) — pure-Python references.
tests/test_oracle.py pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3

US = 1_000_000
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


def test_cdc_upsert_bruteforce(ray_session, tmp_path_factory):
    rows = [
        # u1: upsert, upsert -> survives with the later value
        (1, 0, BASE, "view", 1.0),
        (1, 1, BASE + 5, "purchase", 2.5),
        # u2: last change is a tombstone -> key deleted
        (2, 2, BASE, "click", 3.0),
        (2, 3, BASE + 1, "error", 0.0),
        # u3: tombstone mid-log, later upsert resurrects the key
        (3, 4, BASE, "error", 0.0),
        (3, 5, BASE + 9, "signup", 7.25),
        # u4: same-ts tie — event_id breaks it; the LAST (eid 7) wins
        (4, 6, BASE, "view", 1.0),
        (4, 7, BASE, "click", 4.75),
        # u5: single tombstone -> gone entirely
        (5, 8, BASE, "error", 0.0),
    ]
    sf = _events(rows, tmp_path_factory.mktemp("cdc_events"))
    got = (
        relational3.cdc_upsert(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": np.array([1, 3, 4], dtype=np.int64),
            "last_type": ["purchase", "signup", "click"],
            "cents": np.array([250, 725, 475], dtype=np.int64),
            "n_changes": np.array([2, 2, 2], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_scd2_history_bruteforce(ray_session, tmp_path_factory):
    rows = [
        # u1: view, view (collapse), click, view — three versions
        (1, 0, BASE, "view", 0.0),
        (1, 1, BASE + 10, "view", 0.0),
        (1, 2, BASE + 20, "click", 0.0),
        (1, 3, BASE + 30, "view", 0.0),
        # u2: single event — one open interval
        (2, 4, BASE + 7, "signup", 0.0),
        # u3: same-ts tie — event_id orders them (click then view)
        (3, 5, BASE, "click", 0.0),
        (3, 6, BASE, "view", 0.0),
    ]
    sf = _events(rows, tmp_path_factory.mktemp("scd2_events"))
    got = (
        relational3.scd2_history(sf)
        .to_pandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2, 3, 3], dtype=np.int64),
            "event_type": ["view", "click", "view", "signup", "click", "view"],
            "valid_from": np.array(
                [BASE, BASE + 20, BASE + 30, BASE + 7, BASE, BASE],
                dtype=np.int64,
            ),
            "valid_to": pd.array(
                [BASE + 20, BASE + 30, None, None, BASE, None], dtype="Int64"
            ),
            "version": np.array([1, 2, 3, 1, 1, 2], dtype=np.int64),
        }
    )
    got["valid_to"] = got["valid_to"].astype("Int64")
    pd.testing.assert_frame_equal(got, want)


def test_scd2_intervals_tile(ray_session, tmp_path_factory):
    """Interval invariants on a larger random log: per user, intervals
    chain exactly (valid_to == next valid_from), versions are 1..k, and
    consecutive interval types always differ."""
    rng = np.random.RandomState(7)
    n = 400
    rows = [
        (
            int(rng.randint(0, 25)),
            i,
            BASE + i * 3,
            ["view", "click", "purchase"][rng.randint(0, 3)],
            0.0,
        )
        for i in range(n)
    ]
    sf = _events(rows, tmp_path_factory.mktemp("scd2_rand"))
    got = relational3.scd2_history(sf).to_pandas()
    for uid, grp in got.groupby("user_id"):
        grp = grp.sort_values("version").reset_index(drop=True)
        assert list(grp["version"]) == list(range(1, len(grp) + 1))
        assert grp["valid_to"].iloc[-1] is None or pd.isna(
            grp["valid_to"].iloc[-1]
        )
        for i in range(len(grp) - 1):
            assert grp["valid_to"].iloc[i] == grp["valid_from"].iloc[i + 1]
            assert grp["event_type"].iloc[i] != grp["event_type"].iloc[i + 1]
