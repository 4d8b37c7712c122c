"""Relational query pipelines over the driver testdata tables.

These validate the engine's shuffle/aggregate/join/sort machinery
independently of the geospatial payload (SURVEY §2.5-§2.6 mappings), each
with a DuckDB oracle in __ray_entry__.oracle_sql().

Patterns exercised:
  * partial aggregation inside map_batches before the groupby shuffle (q1)
  * broadcast hash join of a small dimension side (customer_order_stats)
  * global sort + limit top-k (top_orders)
  * distinct via groupby (distinct_segments)
  * event-time tumbling windows via integer bucketing (events_window)
  * per-key ordered sessionization via groupby().map_groups (user_sessions)

Column names match the oracle SQL exactly (driver hash-compares by sorted
column name). Aggregated floats are rounded in BOTH implementations to
absorb summation-order differences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osmwaterwayextractor_ray.stages._pool import pool_max


def q1_pricing_summary(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                count_order=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=32768)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("sum_base_price"),
                "sum_base_price",
                pc.cast(pc.round(pc.multiply(t["sum_base_price"], pa.scalar(100.0)), 0), pa.int64()),
            )
            .set_column(
                t.schema.get_field_index("sum_disc_price"),
                "sum_disc_price",
                pc.cast(pc.round(pc.multiply(t["sum_disc_price"], pa.scalar(100.0)), 0), pa.int64()),
            )
            .set_column(
                t.schema.get_field_index("sum_qty"), "sum_qty", pc.round(t["sum_qty"], 2)
            )
            .rename_columns([
                "l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price_cents", "sum_disc_price_cents", "count_order",
            ]),
            batch_format="pyarrow",
        )
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_cents,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_price_cents,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def filter_revenue(sf_dir: str):
    """Row-level computed column + predicate filter — values are exact
    (same IEEE ops per row), no rounding needed."""
    import ray.data as rd

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cut = pa.scalar(np.datetime64("1996-01-01", "us"))

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less(batch["l_shipdate"], cut), pc.greater(batch["l_discount"], pa.scalar(0.05))
        )
        t = batch.filter(m)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": rev,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


FILTER_REVENUE_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
"""


def customer_order_stats(sf_dir: str, mode: str = "distributed"):
    """Fact ⨝ dimension where the dimension (customer) grows WITH the
    dataset — so the default path is fully distributed (VERDICT r2 weak #1):
    orders are partial-aggregated per o_custkey inside map_batches, the
    O(customers) per-key rows are hash-joined to the customer table
    (fastagg.hash_join — no O(dataset) driver state), and a tiny grouped
    agg rolls up to the 5 segments. ``mode="broadcast"`` keeps the old
    driver-dict broadcast as a small-data fast path (equality of the two
    modes is pinned by tests)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("total_price"),
            "total_price",
            pc.cast(pc.round(pc.multiply(t["total_price"], pa.scalar(100.0)), 0), pa.int64()),
        ).rename_columns(["c_mktsegment", "n_orders", "total_price_cents"])

    if mode == "distributed":
        from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

        # pinned: hash_join schema-probes its sides; unpinned, the agg
        # chain would run once for the probe and again for the join
        per_cust = grouped_agg(
            orders,
            ["o_custkey"],
            {"n_orders": ("o_totalprice", "count"), "total_price": ("o_totalprice", "sum")},
        ).materialize()
        cust = _read_pq(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        joined = hash_join(per_cust, cust, left_on=["o_custkey"], right_on=["c_custkey"])
        out = grouped_agg(
            joined,
            ["c_mktsegment"],
            {"n_orders": ("n_orders", "sum"), "total_price": ("total_price", "sum")},
        )
        return out.map_batches(
            lambda t: _cents(t.select(["c_mktsegment", "n_orders", "total_price"])),
            batch_format="pyarrow",
        )

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class JoinSegment:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["c_mktsegment"] = df["o_custkey"].map(self.lookup)
            g = df.groupby("c_mktsegment", as_index=False).agg(
                n_orders=("o_totalprice", "size"), total_price=("o_totalprice", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        orders.map_batches(lambda b: JoinSegment()(b), batch_format="pyarrow", batch_size=32768)
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total_price", alias_name="total_price"))
        .map_batches(_cents, batch_format="pyarrow")
    )
    return out


CUSTOMER_ORDER_STATS_SQL = """
SELECT c.c_mktsegment, count(*) AS n_orders, CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS total_price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def top_orders(sf_dir: str):
    import ray.data as rd

    ds = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def distinct_segments(sf_dir: str):
    import ray.data as rd

    ds = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    return ds.groupby("c_mktsegment").count().select_columns(["c_mktsegment"])


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def events_window(sf_dir: str):
    """Tumbling 1-hour event-time windows (integer epoch bucketing).

    Pre-aggregates per batch in EXACT integer cents (`value` carries two
    decimals by construction; round(v*100) is bit-exact, verified) so the
    shuffle moves one row per (window, type) per batch instead of every
    event, and the sums are identical under any block structure — the
    repo's float-accumulation-order rule. The native groupby().aggregate
    previously shuffled the full fact table for ~3.6k groups."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64())
        win = pc.floor(pc.divide(pc.cast(ts_us, pa.float64()), 3600e6))
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "window_start": pc.cast(win, pa.int64()),
                "event_type": batch["event_type"],
                "cents": pa.array(cents, type=pa.int64()),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    agg = grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536),
        ["window_start", "event_type"],
        {"n_events": ("one", "sum"), "cents": ("cents", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        sv = pc.round(pc.divide(pc.cast(t["cents"], pa.float64()), 100.0), 4)
        return pa.table(
            {
                "window_start": t["window_start"],
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": sv,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_WINDOW_SQL = """
SELECT CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 3600000000) AS BIGINT) AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def user_sessions(sf_dir: str, gap_s: int = 1800):
    """Sessionization: per user, events sorted by ts; a gap > 30 min starts
    a new session. Users are hash-bucketed (32 buckets); each bucket does
    one vectorized sort + diff over ALL its users — no per-user Python."""
    import pyarrow as pa
    import ray.data as rd

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array((uid % 32).astype(np.int64), type=pa.int64())
        )

    def sessions(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        same_user = uid[1:] == uid[:-1]
        new_sess = same_user & (np.diff(ts) > gap_s * 1_000_000)
        users, first_idx = np.unique(uid, return_index=True)
        # per-user new-session counts via segmented sum over the flag array
        flags = np.concatenate(([0], new_sess.astype(np.int64)))
        csum = np.cumsum(flags)
        bounds = np.concatenate((first_idx, [len(uid)]))
        n_sessions = 1 + (csum[bounds[1:] - 1] - csum[bounds[:-1]])
        return pa.table(
            {
                "user_id": pa.array(users, type=pa.int64()),
                "n_sessions": pa.array(n_sessions, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(sessions, batch_format="pyarrow")
    )


USER_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions FROM d GROUP BY user_id
"""

def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)
