"""Wave 49: source_jaccard (textops) + cumulative_distinct_users
(relational3) — pure-Python references. tests/test_oracle.py pins the
SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3, textops

US = 1_000_000
DAY = 86_400_000_000
BASE = 1_700_000_000 * US  # 2023-11-14, mid-day


def test_source_jaccard_bruteforce(ray_session, tmp_path_factory):
    docs = [
        ("s1", "a b c"),
        ("s1", "c d"),  # s1 set: {a,b,c,d}
        ("s2", "c d e"),  # s2 set: {c,d,e}
        ("s3", "x y"),  # s3 set: {x,y} — disjoint, must NOT appear
        ("s2", None),  # NULL text adds nothing
    ]
    df = pd.DataFrame(docs, columns=["source", "text"])
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    df["lang"] = "en"
    df["n_chars"] = np.int64(1)
    d = tmp_path_factory.mktemp("sj_docs")
    df.to_parquet(d / "documents.parquet", index=False)

    got = (
        textops.source_jaccard(str(d))
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    # only (s1, s2) intersect: inter={c,d}=2, union={a,b,c,d,e}=5
    want = pd.DataFrame(
        {
            "src_a": ["s1"],
            "src_b": ["s2"],
            "inter": np.array([2], dtype=np.int64),
            "union_n": np.array([5], dtype=np.int64),
            "jacc_ppm": np.array([2 * 1_000_000 // 5], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_cumulative_distinct_users_bruteforce(ray_session, tmp_path_factory):
    rows = [
        # day 0: users 1, 2 first seen (user 1 twice)
        (1, 0, BASE), (1, 1, BASE + 10), (2, 2, BASE + 5),
        # day 1: user 1 returns (NOT new), user 3 first seen
        (1, 3, BASE + DAY), (3, 4, BASE + DAY + 7),
        # day 3: user 4 first seen
        (4, 5, BASE + 3 * DAY),
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
    d = tmp_path_factory.mktemp("cdu_events")
    ev.to_parquet(d / "events.parquet", index=False)

    got = relational3.cumulative_distinct_users(str(d))
    d0 = BASE // DAY
    want = pd.DataFrame(
        {
            "day": np.array([d0, d0 + 1, d0 + 3], dtype=np.int64),
            "new_users": np.array([2, 1, 1], dtype=np.int64),
            "cum_users": np.array([2, 3, 4], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)
