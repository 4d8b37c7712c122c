"""Wave 40: hourly_active_users (relational3) + dedup_numnorm (textops)
— pure-Python references. tests/test_oracle.py pins the SQL twins."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import relational3, textops

US = 1_000_000
H = 3600 * US
BASE = 1_700_000_000 * US


def test_hourly_active_users_bruteforce(ray_session, tmp_path_factory):
    rows = [
        # u1 twice in hour 0 (counted once), u2 in hours 0 and 1,
        # u3 exactly on the hour boundary (falls in hour 1)
        (1, BASE + 10), (1, BASE + 20), (2, BASE + 30),
        (2, BASE + H + 5), (3, BASE + H),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts_us"])
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(df), dtype=np.int64),
            "ts": df["ts_us"].astype("datetime64[us]"),
            "user_id": df["user_id"].astype(np.int64),
            "event_type": "view",
            "value": 1.0,
            "props": "",
        }
    )
    d = tmp_path_factory.mktemp("hau_events")
    ev.to_parquet(d / "events.parquet", index=False)
    got = relational3.hourly_active_users(str(d)).to_pandas()
    got_d = {int(r["hour"]): int(r["n_users"]) for _, r in got.iterrows()}
    h0 = BASE // relational3._HOUR_US_
    assert got_d == {h0: 2, h0 + 1: 2}


def test_dedup_numnorm_planted(ray_session, tmp_path_factory):
    texts = [
        "chapter 1 begins here",
        "chapter 2 begins here",     # same template as doc 0
        "chapter 10 begins here",    # '10' -> '00': DIFFERENT class ('1'->'0')
        "chapter one begins here",   # words differ: own class
        "no digits at all",
        "no digits at all",          # exact dup
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    d = tmp_path_factory.mktemp("numnorm_docs")
    df.to_parquet(d / "documents.parquet", index=False)
    got = textops.dedup_numnorm(str(d)).to_pandas()
    got_d = {int(r["doc_id"]): int(r["n_variants"]) for _, r in got.iterrows()}
    # classes: {0,1} (chapter 0), {2} (chapter 00), {3}, {4,5}
    assert got_d == {0: 2, 2: 1, 3: 1, 4: 2}


def test_dedup_numnorm_collapses_more_than_exact(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = textops.dedup_exact(sf).to_pandas()
    norm = textops.dedup_numnorm(sf).to_pandas()
    assert len(norm) <= len(exact)
    assert int(norm["n_variants"].sum()) == 500  # every doc classified once


# ---------------------------------------------------------------------------
# grouped_percentiles (wave 41)
# ---------------------------------------------------------------------------


def _brute_gp(values_by_type):
    out = {}
    for et, vals in values_by_type.items():
        cents = sorted(int(round(v * 100)) for v in vals)
        n = len(cents)
        for p in relational3._GP_PCTS:
            out[(et, p)] = cents[(n * p + 99) // 100 - 1]
    return out


def test_grouped_percentiles_bruteforce(ray_session, tmp_path_factory):
    rng = np.random.RandomState(11)
    vals = {
        "a": rng.uniform(0, 300, 157).round(2).tolist(),
        # degenerate: every value identical -> ONE coarse bucket holds all
        "b": [7.77] * 40,
        # tiny partition + ties at the boundary
        "c": [1.0, 1.0, 2.0],
    }
    rows = [(et, v) for et, vs in vals.items() for v in vs]
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.int64(1),
            "event_type": [r[0] for r in rows],
            "value": [r[1] for r in rows],
            "props": "",
        }
    )
    d = tmp_path_factory.mktemp("gp_events")
    ev.to_parquet(d / "events.parquet", index=False)
    want = _brute_gp(vals)
    got = relational3.grouped_percentiles(str(d)).to_pandas()
    got_d = {
        (r["event_type"], int(r["pct"])): int(r["cents"])
        for _, r in got.iterrows()
    }
    assert got_d == want
    assert got_d[("b", 50)] == got_d[("b", 99)] == 777
