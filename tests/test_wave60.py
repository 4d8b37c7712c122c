"""Wave 60: view_maintenance (incremental materialized-view merge) —
the merge(agg(base), agg(delta)) == agg(all) proof, plus a multi-delta
chain. tests/test_oracle.py pins the full-recompute SQL twin."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmwaterwayextractor_ray.pipelines import quality

SF = "/root/testdata/sf0.001"


def _canon(res) -> pd.DataFrame:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_view_maintenance_equals_full_recompute(ray_session):
    """The maintained view (base merged with delta) must equal a direct
    one-shot aggregation of the full table."""
    import duckdb

    got = _canon(quality.view_maintenance(SF))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = _canon(con.sql(quality.VIEW_MAINTENANCE_SQL).df())
    pd.testing.assert_frame_equal(got, want)
    # both partitions are genuinely non-empty around the split
    n = con.sql(
        f"SELECT sum(CASE WHEN l_shipdate < TIMESTAMP '{quality._VM_SPLIT}' "
        "THEN 1 ELSE 0 END) AS b, "
        f"sum(CASE WHEN l_shipdate >= TIMESTAMP '{quality._VM_SPLIT}' "
        "THEN 1 ELSE 0 END) AS d FROM lineitem"
    ).fetchone()
    assert n[0] > 0 and n[1] > 0


def test_merge_chain_is_associative(ray_session, tmp_path_factory):
    """Merging three delta summaries in any grouping gives the same
    view — the property that lets a 100 TB deployment fold daily deltas
    into a persisted O(groups) summary."""
    import pyarrow as pa
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    rng = np.random.RandomState(3)

    def summary(seed):
        n = 200
        r = np.random.RandomState(seed)
        t = pa.table(
            {
                "l_returnflag": pa.array(
                    [["A", "N", "R"][i] for i in r.randint(0, 3, n)]
                ),
                "l_linestatus": pa.array(
                    [["O", "F"][i] for i in r.randint(0, 2, n)]
                ),
                "n_rows": pa.array(np.ones(n, dtype=np.int64)),
                "sum_qty": pa.array(r.randint(1, 50, n).astype(np.int64)),
                "sum_cents": pa.array(r.randint(100, 9999, n).astype(np.int64)),
                "min_cents": pa.array(r.randint(100, 9999, n).astype(np.int64)),
                "max_cents": pa.array(r.randint(100, 9999, n).astype(np.int64)),
            }
        )
        return grouped_agg(
            rd.from_arrow(t),
            ["l_returnflag", "l_linestatus"],
            {
                "n_rows": ("n_rows", "sum"),
                "sum_qty": ("sum_qty", "sum"),
                "sum_cents": ("sum_cents", "sum"),
                "min_cents": ("min_cents", "min"),
                "max_cents": ("max_cents", "max"),
            },
            num_parts=1,
        ).materialize()

    a, b, c = summary(1), summary(2), summary(3)
    left = quality.merge_view_summaries(
        quality.merge_view_summaries(a, b).materialize(), c
    )
    right = quality.merge_view_summaries(
        a, quality.merge_view_summaries(b, c).materialize()
    )
    pd.testing.assert_frame_equal(_canon(left), _canon(right))
