"""Wave 56: watermark_audit (exact out-of-orderness audit) +
table_fingerprint (order-independent anti-entropy digest) — pure-Python
references. tests/test_oracle.py pins the SQL twins at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import relational3

US = 1_000_000
L = relational3._WM_LATENESS_US
BASE = 1_700_000_000 * US


def _events(pairs, d):
    """pairs = (event_id, ts_us): arrival order is event_id order."""
    ev = pd.DataFrame(pairs, columns=["event_id", "ts_us"])
    ev = pd.DataFrame(
        {
            "event_id": ev["event_id"].astype(np.int64),
            "ts": ev["ts_us"].astype("datetime64[us]"),
            "user_id": np.int64(1),
            "event_type": "view",
            "value": 1.0,
            "props": "",
        }
    )
    ev.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _brute(pairs):
    pairs = sorted(pairs)
    wm = None
    n_late = 0
    max_lag = 0
    for _, ts in pairs:
        if wm is not None:
            lag = wm - ts
            if lag > L:
                n_late += 1
            max_lag = max(max_lag, lag)
        wm = ts if wm is None else max(wm, ts)
    return n_late, max(max_lag, 0)


def test_watermark_audit_bruteforce(ray_session, tmp_path_factory):
    pairs = [
        (0, BASE),
        (1, BASE + 10 * US),
        (2, BASE + 5 * US),        # 5 s behind — within lateness
        (3, BASE - 2 * L),         # 2 h + 10 s behind — LATE
        (4, BASE + 20 * US),
        (5, BASE + 20 * US - L),   # exactly L behind — NOT late (> only)
        (6, BASE + 19 * US - L),   # L + 1 s behind — LATE
    ]
    sf = _events(pairs, tmp_path_factory.mktemp("wm_events"))
    got = relational3.watermark_audit(sf)
    n_late, max_lag = _brute(pairs)
    assert int(got["n_events"].iloc[0]) == len(pairs)
    assert int(got["n_late"].iloc[0]) == n_late == 2
    assert int(got["max_lag_us"].iloc[0]) == max_lag


def test_watermark_audit_spans_buckets(ray_session, tmp_path_factory):
    """event_ids straddling several 2^16 arrival buckets: the late row's
    watermark comes from an EARLIER bucket (the cross-bucket seed)."""
    shift = relational3._WM_SHIFT
    pairs = [(i, BASE + i * US) for i in range(0, 5)]  # bucket 0, ordered
    pairs += [((1 << shift) + 1, BASE - 2 * L)]  # bucket 1, very late
    pairs += [((2 << shift) + 7, BASE + 900 * US)]  # bucket 2, on time
    sf = _events(pairs, tmp_path_factory.mktemp("wm_span"))
    got = relational3.watermark_audit(sf)
    n_late, max_lag = _brute(pairs)
    assert int(got["n_late"].iloc[0]) == n_late == 1
    assert int(got["max_lag_us"].iloc[0]) == max_lag
    assert int(got["n_events"].iloc[0]) == len(pairs)


def test_watermark_in_order_stream(ray_session, tmp_path_factory):
    pairs = [(i, BASE + i * US) for i in range(50)]
    sf = _events(pairs, tmp_path_factory.mktemp("wm_ord"))
    got = relational3.watermark_audit(sf)
    assert int(got["n_late"].iloc[0]) == 0
    assert int(got["max_lag_us"].iloc[0]) == 0


def test_table_fingerprint_detects_change(ray_session, tmp_path_factory):
    """Same rows in a different order ⇒ identical digest; one changed
    key ⇒ different digest."""
    d1 = tmp_path_factory.mktemp("fp_a")
    d2 = tmp_path_factory.mktemp("fp_b")
    d3 = tmp_path_factory.mktemp("fp_c")

    def write(dirp, keys):
        for tbl, col in relational3._FP_TABLES:
            if tbl == "events":
                df = pd.DataFrame(
                    {
                        "event_id": np.array(keys, dtype=np.int64),
                        "ts": pd.Timestamp("2024-01-01"),
                        "user_id": np.int64(1),
                        "event_type": "view",
                        "value": 1.0,
                        "props": "",
                    }
                )
            else:
                df = pd.DataFrame({col: np.array(keys, dtype=np.int64)})
            df.to_parquet(dirp / f"{tbl}.parquet", index=False)

    write(d1, [1, 2, 3, 4, 5])
    write(d2, [5, 3, 1, 4, 2])  # permuted
    write(d3, [1, 2, 3, 4, 6])  # one key changed
    a = relational3.table_fingerprint(str(d1)).set_index("tbl")
    b = relational3.table_fingerprint(str(d2)).set_index("tbl")
    c = relational3.table_fingerprint(str(d3)).set_index("tbl")
    for tbl, _ in relational3._FP_TABLES:
        assert int(a.loc[tbl, "fp"]) == int(b.loc[tbl, "fp"])
        assert int(a.loc[tbl, "fp"]) != int(c.loc[tbl, "fp"])
        assert int(a.loc[tbl, "n_rows"]) == 5


def test_table_fingerprint_negative_and_wide_keys(
    ray_session, tmp_path_factory
):
    """Negative keys must take the exact truncated-mod path (DuckDB's %
    truncates toward zero; numpy/Python % floor) and wide keys the
    big-int path — both verified directly against the SQL twin
    (ADVICE r4)."""
    import duckdb

    d = tmp_path_factory.mktemp("fp_neg")
    keys = [-7, -1, 0, 1, 3, -(2**40), 2**40, (2**63 - 2) // 2_654_435_761 + 5]
    for tbl, col in relational3._FP_TABLES:
        if tbl == "events":
            df = pd.DataFrame(
                {
                    "event_id": np.array(keys, dtype=np.int64),
                    "ts": pd.Timestamp("2024-01-01"),
                    "user_id": np.int64(1),
                    "event_type": "view",
                    "value": 1.0,
                    "props": "",
                }
            )
        else:
            df = pd.DataFrame({col: np.array(keys, dtype=np.int64)})
        df.to_parquet(d / f"{tbl}.parquet", index=False)

    got = relational3.table_fingerprint(str(d)).set_index("tbl")
    con = duckdb.connect()
    for tbl, _ in relational3._FP_TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{d}/{tbl}.parquet')"
        )
    want = con.execute(relational3.TABLE_FINGERPRINT_SQL).df().set_index("tbl")
    con.close()
    for tbl, _ in relational3._FP_TABLES:
        assert int(got.loc[tbl, "fp"]) == int(want.loc[tbl, "fp"]), tbl
        assert int(got.loc[tbl, "n_rows"]) == len(keys)
