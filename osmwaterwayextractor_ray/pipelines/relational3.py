"""Third relational operator set: multi-level aggregates and window /
non-equi-join primitives the first two modules don't cover.

  * orders_rollup        — GROUP BY ROLLUP (hierarchical subtotals) as
                           three chained partial aggregations; coarser
                           levels re-aggregate the (tiny) finest level,
                           never the fact table.
  * events_pivot         — pivot (conditional aggregation): one column
                           per event_type, vectorized per-batch partials.
  * events_lag_gaps      — LAG window: per-user gap to the previous
                           event under a total (ts, event_id) order.
  * orders_running_total — per-key running sum (ROWS UNBOUNDED
                           PRECEDING) via one bucket shuffle + grouped
                           cumsum; exact int64 cents.
  * signup_error_window_join — banded interval join (non-equi |Δt| ≤ 1h)
                           via temporal binning: each pair meets in
                           exactly one bin (the right event's), the
                           classic distributed range-join plan.
  * nation_trade_fulljoin — FULL OUTER JOIN of two grouped aggregates.
  * orders_cube          — GROUP BY CUBE: all four grouping sets from
                           the same pinned finest aggregate.
  * events_value_ntile   — NTILE window (exact SQL tile-size semantics
                           via rank arithmetic).
  * user_set_ops         — EXCEPT + INTERSECT (SQL distinct semantics)
                           in one cogroup shuffle.
  * orders_above_cust_avg — correlated-aggregate filter by exact integer
                           cross-multiplication (no float average).
  * distinct_counts_hll / value_percentiles_sketch / heavy_users_mg —
                           the three mergeable sketch families (HLL,
                           t-digest, Misra-Gries) as first-class queries.

All money/value sums are exact int64 cents (CAST(round(x*100) AS
BIGINT) on the oracle side) so results are bit-stable under any block
structure — the float-sum-order lesson from the graph pipeline
(CLAUDE.md).  No reference counterpart (the reference has no relational
surface); these are the §2.6/§2.7 generalizations the north star needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_FNV = np.uint64(1099511628211)


def _cents(x: np.ndarray) -> np.ndarray:
    return np.round(x * 100.0).astype(np.int64)


# ---------------------------------------------------------------------------
# ROLLUP
# ---------------------------------------------------------------------------


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(year, priority): finest level is a distributed
    partial-agg + bucket combine; the (year) subtotals and grand total
    re-aggregate the FINEST RESULT (≤ years × priorities rows), so the
    fact table is read exactly once. NULL group keys use the sentinels
    -1 / 'ALL' to keep both engines' dtypes non-nullable."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "o_year": pa.array(year, type=pa.int64()),
                "o_orderpriority": batch["o_orderpriority"],
                "cents": pa.array(
                    _cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
                ),
            }
        )

    # pinned: three consumers (direct level + two lifts) — unpinned, the
    # fact scan + shuffle would execute once per consumer
    fine = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        keys=["o_year", "o_orderpriority"],
        agg_spec={"n_orders": ("cents", "count"), "total_cents": ("cents", "sum")},
    ).materialize()

    def lift_year(batch: pa.Table) -> pa.Table:
        # re-key the finest rows for the (year) subtotal level
        return batch.set_column(
            batch.schema.get_field_index("o_orderpriority"),
            "o_orderpriority",
            pa.array(["ALL"] * batch.num_rows, type=pa.string()),
        )

    def lift_all(batch: pa.Table) -> pa.Table:
        t = lift_year(batch)
        return t.set_column(
            t.schema.get_field_index("o_year"),
            "o_year",
            pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
        )

    spec = {"n_orders": ("n_orders", "sum"), "total_cents": ("total_cents", "sum")}
    by_year = grouped_agg(
        fine.map_batches(lift_year, batch_format="pyarrow"),
        keys=["o_year", "o_orderpriority"],
        agg_spec=spec,
        num_parts=4,
    )
    total = grouped_agg(
        fine.map_batches(lift_all, batch_format="pyarrow"),
        keys=["o_year", "o_orderpriority"],
        agg_spec=spec,
        num_parts=1,
    )
    cols = ["o_year", "o_orderpriority", "n_orders", "total_cents"]
    return (
        fine.select_columns(cols)
        .union(by_year.select_columns(cols))
        .union(total.select_columns(cols))
    )


ORDERS_ROLLUP_SQL = """
SELECT COALESCE(o_year, -1) AS o_year,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       n_orders, total_cents
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
         count(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders
  GROUP BY ROLLUP(o_year, o_orderpriority)
)
"""


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(sf_dir: str):
    """Pivot event_type into one count column per type plus an exact
    int64-cents value total, per user. Per-batch vectorized partials
    (one boolean reduction per type) then the standard bucket combine —
    the pivot never shuffles raw events."""
    import ray.data as rd

    N_PARTS = 8

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch.column("user_id").to_numpy(zero_copy_only=False),
                "et": batch.column("event_type").to_pandas(),
                "cents": _cents(batch.column("value").to_numpy(zero_copy_only=False)),
            }
        )
        for t in _EVENT_TYPES:
            df[f"n_{t}"] = (df["et"] == t).astype(np.int64)
        agg = {f"n_{t}": (f"n_{t}", "sum") for t in _EVENT_TYPES}
        agg["value_cents"] = ("cents", "sum")
        g = df.groupby("user_id", as_index=False, sort=False).agg(**agg)
        g["__part"] = (
            g["user_id"].to_numpy().astype(np.uint64) * _FNV % np.uint64(N_PARTS)
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def combine(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("user_id", as_index=False, sort=False).agg(
            **{c: (c, "sum") for c in g.columns if c not in ("user_id", "__part")}
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return parts.groupby("__part").map_groups(combine, batch_format="pandas")


EVENTS_PIVOT_SQL = """
SELECT user_id,
  count(*) FILTER (event_type = 'click')    AS n_click,
  count(*) FILTER (event_type = 'error')    AS n_error,
  count(*) FILTER (event_type = 'purchase') AS n_purchase,
  count(*) FILTER (event_type = 'signup')   AS n_signup,
  count(*) FILTER (event_type = 'view')     AS n_view,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# LAG window
# ---------------------------------------------------------------------------


def events_lag_gaps(sf_dir: str):
    """LAG(ts) OVER (PARTITION BY user ORDER BY ts, event_id): the gap in
    microseconds to the user's previous event. Needs the whole key in one
    place, so it is exactly one hash-bucket shuffle; inside each bucket a
    single lexsort + diff resolves every user (no per-user calls). The
    (ts, event_id) order is total, so output is partitioning-invariant."""
    import ray.data as rd

    N_PARTS = 32

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "__part", pa.array((u * _FNV % np.uint64(N_PARTS)).astype(np.int64))
        )

    def gaps(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        tsi = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsi, u))
        u, tsi, eid = u[order], tsi[order], eid[order]
        gap = np.empty(len(u), dtype=np.int64)
        gap[1:] = tsi[1:] - tsi[:-1]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        keep = ~first
        return pa.table(
            {
                "user_id": pa.array(u[keep]),
                "ts": pa.array(tsi[keep].astype("datetime64[us]")),
                "event_id": pa.array(eid[keep]),
                "gap_us": pa.array(gap[keep]),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(gaps, batch_format="pyarrow")
    )


EVENTS_LAG_GAPS_SQL = """
SELECT user_id, ts, event_id,
  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
    AS gap_us
FROM events
QUALIFY gap_us IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Per-key running total
# ---------------------------------------------------------------------------


def orders_running_total(sf_dir: str):
    """SUM OVER (PARTITION BY custkey ORDER BY date, orderkey ROWS
    UNBOUNDED PRECEDING) in exact int64 cents. One bucket shuffle; each
    bucket computes every customer's prefix sums with one lexsort + a
    cumsum minus per-group offsets (reduceat-style, no per-key loop)."""
    import ray.data as rd

    N_PARTS = 32

    ds = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        c = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "cents": pa.array(
                    _cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
                ),
                "__part": pa.array((c * _FNV % np.uint64(N_PARTS)).astype(np.int64)),
            }
        )
        return t

    def running(g: pa.Table) -> pa.Table:
        c = g.column("o_custkey").to_numpy(zero_copy_only=False)
        k = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = g.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        v = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, d, c))
        c, k, d, v = c[order], k[order], d[order], v[order]
        cs = np.cumsum(v)
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(first)
        # offset before each group's first row, broadcast to members
        base = np.repeat(cs[starts] - v[starts], np.diff(np.append(starts, len(c))))
        return pa.table(
            {
                "o_custkey": pa.array(c),
                "o_orderkey": pa.array(k),
                "o_orderdate": pa.array(d.astype("datetime64[us]")),
                "running_cents": pa.array(cs - base),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(running, batch_format="pyarrow")
    )


ORDERS_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS running_cents
FROM orders
"""


# ---------------------------------------------------------------------------
# Banded interval (range) join
# ---------------------------------------------------------------------------

_WIN_US = 3_600_000_000  # ±1 hour


def signup_error_window_join(sf_dir: str):
    """Non-equi range join: for every signup event, how many error events
    happened within ±1 h — no equality key at all. Distributed plan =
    temporal binning: bin width equals the window, the LEFT side is
    replicated into every bin its window overlaps (≤3), the RIGHT side
    goes to its own bin only, so each qualifying (signup, error) pair
    meets in exactly one co-group (the error's bin) and is counted once.
    Every signup sits in its own bin too, so the per-bin partial counts
    (including zeros) already cover every left row — the final grouped
    sum needs no zero-fill join."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import cogroup, grouped_agg

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )

    def split(kind: str, replicate: bool):
        def f(batch: pa.Table) -> pa.Table:
            et = batch.column("event_type").to_pandas().to_numpy()
            m = et == kind
            ids = batch.column("event_id").to_numpy(zero_copy_only=False)[m]
            ts = (
                batch.column("ts")
                .to_numpy(zero_copy_only=False)[m]
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            if not replicate:
                return pa.table(
                    {
                        "event_id": pa.array(ids),
                        "ts_us": pa.array(ts),
                        "bin": pa.array(ts // _WIN_US),
                    }
                )
            lo = (ts - _WIN_US) // _WIN_US
            hi = (ts + _WIN_US) // _WIN_US
            reps = (hi - lo + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(ids)), reps)
            bins = np.concatenate(
                [np.arange(a, b + 1) for a, b in zip(lo.tolist(), hi.tolist())]
            ) if len(ids) else np.array([], dtype=np.int64)
            return pa.table(
                {
                    "event_id": pa.array(ids[idx]),
                    "ts_us": pa.array(ts[idx]),
                    "bin": pa.array(bins),
                }
            )

        return f

    signups = ds.map_batches(split("signup", True), batch_format="pyarrow", batch_size=65536)
    errors = ds.map_batches(split("error", False), batch_format="pyarrow", batch_size=65536)

    grouped, splitg = cogroup(
        signups, errors, ["bin"], num_parts=16, batch_size=65536
    )

    def count_in_window(g: pa.Table) -> pa.Table:
        lg, rg = splitg(g)
        s_ids = lg.column("event_id").to_numpy(zero_copy_only=False)
        s_ts = lg.column("ts_us").to_numpy(zero_copy_only=False)
        s_bin = lg.column("bin").to_numpy(zero_copy_only=False)
        e_ts = rg.column("ts_us").to_numpy(zero_copy_only=False)
        e_bin = rg.column("bin").to_numpy(zero_copy_only=False)
        out_id, out_ts, out_n = [], [], []
        # a bucket holds whole bins; resolve each bin with two searchsorteds
        for b in np.unique(s_bin):
            sm = s_bin == b
            ets = np.sort(e_ts[e_bin == b])
            lo = np.searchsorted(ets, s_ts[sm] - _WIN_US, side="left")
            hi = np.searchsorted(ets, s_ts[sm] + _WIN_US, side="right")
            out_id.append(s_ids[sm])
            out_ts.append(s_ts[sm])
            out_n.append(hi - lo)
        if not out_id:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "ts_us": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_id)),
                "ts_us": pa.array(np.concatenate(out_ts)),
                "n": pa.array(np.concatenate(out_n).astype(np.int64)),
            }
        )

    per_bin = grouped.map_groups(count_in_window, batch_format="pyarrow")
    counts = grouped_agg(
        per_bin,
        keys=["event_id", "ts_us"],
        agg_spec={"n_errors": ("n", "sum")},
        num_parts=16,
    )

    def finish(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": pa.array(ts),
                "n_errors": batch["n_errors"],
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")


SIGNUP_ERROR_WINDOW_SQL = """
SELECT s.event_id, s.ts, count(e.event_id) AS n_errors
FROM events s
LEFT JOIN events e
  ON e.event_type = 'error'
 AND abs(epoch_us(e.ts) - epoch_us(s.ts)) <= 3600000000
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.ts
"""


# ---------------------------------------------------------------------------
# FULL OUTER JOIN
# ---------------------------------------------------------------------------


def nation_trade_fulljoin(sf_dir: str):
    """FULL OUTER JOIN of two grouped aggregates (high-balance customers
    vs high-balance suppliers per nation): both sides are distributed
    partial aggs; the outer join itself is the partitioned cogroup with
    pandas how='outer' per bucket; unmatched sides zero-fill. The
    25-row nation name lookup is a broadcast small (CLAUDE.md rule)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

    def side(table: str, keycol: str, balcol: str, thr: float, n_out: str, c_out: str):
        ds = _read_pq(f"{sf_dir}/{table}.parquet", columns=[keycol, balcol])

        def prep(batch: pa.Table) -> pa.Table:
            bal = batch.column(balcol).to_numpy(zero_copy_only=False)
            m = bal > thr
            return pa.table(
                {
                    "nk": pa.array(
                        batch.column(keycol)
                        .to_numpy(zero_copy_only=False)[m]
                        .astype(np.int64)
                    ),
                    "cents": pa.array(_cents(bal[m])),
                }
            )

        return grouped_agg(
            ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
            keys=["nk"],
            agg_spec={n_out: ("cents", "count"), c_out: ("cents", "sum")},
            num_parts=8,
        )

    cust = side("customer", "c_nationkey", "c_acctbal", 9500.0, "n_cust", "cust_bal_cents")
    supp = side("supplier", "s_nationkey", "s_acctbal", 9000.0, "n_supp", "supp_bal_cents")

    # explicit schemas: the balance filters can leave a side EMPTY at tiny
    # scale, and an empty Dataset cannot report its own schema
    def _schema(n_out: str, c_out: str) -> pa.Schema:
        return pa.schema(
            [("nk", pa.int64()), (n_out, pa.int64()), (c_out, pa.int64())]
        )

    joined = hash_join(
        cust, supp, on=["nk"], how="outer", num_parts=8,
        left_schema=_schema("n_cust", "cust_bal_cents"),
        right_schema=_schema("n_supp", "supp_bal_cents"),
    )

    nt = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    names = dict(
        zip(
            nt.column("n_nationkey").to_numpy(zero_copy_only=False).tolist(),
            nt.column("n_name").to_pylist(),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {
                "n_name": df["nk"].map(names),
                "n_cust": df["n_cust"].fillna(0).astype(np.int64),
                "cust_bal_cents": df["cust_bal_cents"].fillna(0).astype(np.int64),
                "n_supp": df["n_supp"].fillna(0).astype(np.int64),
                "supp_bal_cents": df["supp_bal_cents"].fillna(0).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Approximate COUNT DISTINCT (HyperLogLog sketch)
# ---------------------------------------------------------------------------


def distinct_counts_hll(sf_dir: str):
    """Approximate COUNT(DISTINCT ...) via the from-scratch mergeable
    HyperLogLog (state/hll.py): each block contributes one 2^p-byte
    register row, merging is elementwise max — cardinality questions at
    10^12 rows move sketch bytes, never keys. No SQL oracle (the
    estimate is sketch-defined); golden-pinned + error-bound-tested in
    tests/test_hll.py."""
    import ray.data as rd

    from osmwaterwayextractor_ray.state.hll import approx_distinct

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "event_id"])
    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])

    def texthash(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch.column("text").to_pandas().to_numpy()
        ).astype(np.int64)
        return pa.table({"text_hash": pa.array(h)})

    rows = [
        ("events.user_id", approx_distinct(ev.select_columns(["user_id"]), "user_id")),
        ("events.event_id", approx_distinct(ev.select_columns(["event_id"]), "event_id")),
        (
            "documents.text",
            approx_distinct(
                docs.map_batches(texthash, batch_format="pyarrow"), "text_hash"
            ),
        ),
    ]
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], type=pa.string()),
            "n_hll": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )


NATION_TRADE_FULLJOIN_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust,
         SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS cust_bal_cents
  FROM customer WHERE c_acctbal > 9500 GROUP BY 1
), s AS (
  SELECT s_nationkey AS nk, count(*) AS n_supp,
         SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS supp_bal_cents
  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
)
SELECT n.n_name,
       COALESCE(c.n_cust, 0) AS n_cust,
       CAST(COALESCE(c.cust_bal_cents, 0) AS BIGINT) AS cust_bal_cents,
       COALESCE(s.n_supp, 0) AS n_supp,
       CAST(COALESCE(s.supp_bal_cents, 0) AS BIGINT) AS supp_bal_cents
FROM c FULL OUTER JOIN s ON c.nk = s.nk
JOIN nation n ON n.n_nationkey = COALESCE(c.nk, s.nk)
"""


# ---------------------------------------------------------------------------
# CUBE (all grouping-set combinations)
# ---------------------------------------------------------------------------


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(year, priority): the rollup's plan plus the
    (priority)-only grouping set — all four levels re-aggregate the tiny
    finest aggregate, one fact-table scan total. Same -1/'ALL' NULL
    sentinels as orders_rollup."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "o_year": pa.array(year, type=pa.int64()),
                "o_orderpriority": batch["o_orderpriority"],
                "cents": pa.array(
                    _cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
                ),
            }
        )

    fine = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        keys=["o_year", "o_orderpriority"],
        agg_spec={"n_orders": ("cents", "count"), "total_cents": ("cents", "sum")},
    ).materialize()  # feeds all four grouping-set projections

    def lift(drop_year: bool, drop_prio: bool):
        def f(batch: pa.Table) -> pa.Table:
            t = batch
            if drop_prio:
                t = t.set_column(
                    t.schema.get_field_index("o_orderpriority"),
                    "o_orderpriority",
                    pa.array(["ALL"] * t.num_rows, type=pa.string()),
                )
            if drop_year:
                t = t.set_column(
                    t.schema.get_field_index("o_year"),
                    "o_year",
                    pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                )
            return t

        return f

    spec = {"n_orders": ("n_orders", "sum"), "total_cents": ("total_cents", "sum")}
    cols = ["o_year", "o_orderpriority", "n_orders", "total_cents"]
    out = fine.select_columns(cols)
    for dy, dp in [(False, True), (True, False), (True, True)]:
        lifted = fine.map_batches(lift(dy, dp), batch_format="pyarrow")
        agg = grouped_agg(
            lifted, keys=["o_year", "o_orderpriority"], agg_spec=spec, num_parts=4
        )
        out = out.union(agg.select_columns(cols))
    return out


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_year, -1) AS o_year,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       n_orders, total_cents
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
         count(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders
  GROUP BY CUBE(o_year, o_orderpriority)
)
"""


# ---------------------------------------------------------------------------
# NTILE window
# ---------------------------------------------------------------------------


def events_value_ntile(sf_dir: str, n: int = 4):
    """NTILE(n) OVER (PARTITION BY user ORDER BY value, event_id): equal
    rank buckets per user (the first size%n tiles take the extra row —
    exact SQL NTILE semantics). One bucket shuffle; each bucket resolves
    every user with a lexsort + pure rank arithmetic."""
    import ray.data as rd

    N_PARTS = 32

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "__part", pa.array((u * _FNV % np.uint64(N_PARTS)).astype(np.int64))
        )

    def ntile(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        e = g.column("event_id").to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, v, u))
        u, e, v = u[order], e[order], v[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(u)))
        r = np.arange(len(u)) - np.repeat(starts, sizes)  # 0-based rank in user
        s = np.repeat(sizes, sizes)
        base, rem = s // n, s % n
        cut = rem * (base + 1)
        big = r < cut
        tile = np.where(
            big, r // (base + 1), rem + (r - cut) // np.maximum(base, 1)
        ) + 1
        return pa.table(
            {
                "user_id": pa.array(u),
                "event_id": pa.array(e),
                "value": pa.array(v),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(ntile, batch_format="pyarrow")
    )


EVENTS_VALUE_NTILE_SQL = """
SELECT user_id, event_id, value,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
"""


# ---------------------------------------------------------------------------
# t-digest percentile sketch as a first-class query
# ---------------------------------------------------------------------------


def value_percentiles_sketch(sf_dir: str):
    """Approximate p50/p90/p99 of events.value via the from-scratch
    mergeable t-digest (state/tdigest.py — the same sketch the QA stage
    uses at scale, exposed as a query): per-batch digests, one weighted
    intermediate compress, O(delta) driver rows. Estimates are
    sketch-defined -> no SQL oracle; golden-pinned, and the ~1% error
    bound vs the exact sorted-index percentile is pinned in
    tests/test_qa_properties.py for the same code path."""
    import ray.data as rd

    from osmwaterwayextractor_ray.state.tdigest import digest_dataset, quantile

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["value"])
    means, weights = digest_dataset(ds, "value")
    qs = [0.5, 0.9, 0.99]
    return pa.table(
        {
            "q": pa.array(qs, type=pa.float64()),
            "value_est": pa.array(
                [round(quantile(means, weights, q), 6) for q in qs], type=pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Set operations (EXCEPT / INTERSECT with SQL distinct semantics)
# ---------------------------------------------------------------------------


def user_set_ops(sf_dir: str):
    """EXCEPT and INTERSECT over user-id sets (users who clicked vs users
    who purchased): per-side distinct partials shrink each stream, then
    ONE cogroup shuffle resolves both set ops per bucket with two np.isin
    masks. Output rows are tagged by op; SQL-distinct semantics (each
    surviving id once per op)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import cogroup

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def side(kind: str):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch.column("event_type"), kind)
            u = batch.filter(m).column("user_id").to_numpy(zero_copy_only=False)
            return pa.table({"user_id": pa.array(np.unique(u), type=pa.int64())})

        return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)

    grouped, split = cogroup(side("click"), side("purchase"), ["user_id"], num_parts=8)

    def setops(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        a = np.unique(lg.column("user_id").to_numpy(zero_copy_only=False))
        b = np.unique(rg.column("user_id").to_numpy(zero_copy_only=False))
        in_b = np.isin(a, b)
        ids = np.concatenate([a[~in_b], a[in_b]])
        ops = np.concatenate(
            [
                np.repeat(np.array(["except"], dtype=object), (~in_b).sum()),
                np.repeat(np.array(["intersect"], dtype=object), in_b.sum()),
            ]
        )
        return pa.table(
            {
                "op": pa.array(ops, type=pa.string()),
                "user_id": pa.array(ids, type=pa.int64()),
            }
        )

    return grouped.map_groups(setops, batch_format="pyarrow")


USER_SET_OPS_SQL = """
SELECT 'except' AS op, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'intersect' AS op, user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
)
"""


# ---------------------------------------------------------------------------
# Correlated aggregate filter (orders above their customer's average)
# ---------------------------------------------------------------------------


def orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery shape: orders strictly above their own
    customer's average order value. Per-customer (sum, count) is a
    partial agg; the comparison joins it back and uses the integer
    cross-multiplication ``cents * n > sum_cents`` — exact int64 math,
    no float average, so the result hash-matches SQL bit-for-bit."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join

    ds = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "cents": pa.array(
                    _cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
                ),
            }
        )

    orders = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    # pinned: lookup_join schema-probes its sides; a lazy shuffle output
    # would execute its whole agg for the probe and again for the run
    per_cust = grouped_agg(
        orders,
        keys=["o_custkey"],
        agg_spec={"sum_cents": ("cents", "sum"), "n_orders": ("cents", "count")},
        num_parts=16,
    ).materialize()
    joined = lookup_join(
        orders, per_cust, "o_custkey", "o_custkey",
        {"sum_cents": "sum_cents", "n_orders": "n_orders"},
    )

    def above(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        s = batch.column("sum_cents").to_numpy(zero_copy_only=False)
        n = batch.column("n_orders").to_numpy(zero_copy_only=False)
        keep = c * n > s
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": out["o_orderkey"],
                "o_custkey": out["o_custkey"],
                "cents": out["cents"],
            }
        )

    return joined.map_batches(above, batch_format="pyarrow")


ORDERS_ABOVE_CUST_AVG_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), agg AS (
  SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS sum_cents, count(*) AS n
  FROM o GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.cents
FROM o JOIN agg USING (o_custkey)
WHERE o.cents * agg.n > agg.sum_cents
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def heavy_users_mg(sf_dir: str, top: int = 20):
    """Top users by event count via the mergeable Misra-Gries summary
    (state/heavyhitters.py): O(k) rows per block move instead of a
    distinct-key shuffle. With k=256 counters and only 150 distinct
    users (sf0.01, the correctness scale) the summary provably never
    trims, so the MG residuals are EXACT and returned directly. If ANY
    stage trims (distinct > k — e.g. sf0.1's 1500 users), the residuals
    are approximate and the exact SQL oracle would silently drift; the
    r3 guard raised here, which crashed the sf0.1 bench. Instead the
    query now falls back to an exact, still scale-safe plan: per-user
    counts via the partial-agg shuffle (O(distinct users) rows move,
    users << events), per-block partial top-N, tiny driver merge — so
    the result is exact at EVERY scale and the oracle always applies.
    The trimming/error-bound regime of the sketch itself is pinned by
    tests/test_heavyhitters.py on zipf data."""
    import numpy as np

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.state.heavyhitters import approx_top_k

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id"])
    keys, counts, trimmed = approx_top_k(
        ds, "user_id", k=256, top=top, return_trimmed=True
    )
    if trimmed:
        per_user = grouped_agg(ds, ["user_id"], {"n_events": ("user_id", "count")})

        def partial_topn(batch: pa.Table) -> pa.Table:
            u = batch.column("user_id").to_numpy(zero_copy_only=False)
            n = batch.column("n_events").to_numpy(zero_copy_only=False)
            o = np.lexsort((u, -n))[:top]  # count desc, user_id asc (oracle order)
            return pa.table(
                {
                    "user_id": pa.array(u[o], type=pa.int64()),
                    "n_events": pa.array(n[o], type=pa.int64()),
                }
            )

        pdf = per_user.map_batches(partial_topn, batch_format="pyarrow").to_pandas()
        u = pdf["user_id"].to_numpy(dtype=np.int64)
        n = pdf["n_events"].to_numpy(dtype=np.int64)
        o = np.lexsort((u, -n))[:top]
        keys, counts = u[o], n[o]
    return pa.table(
        {
            "user_id": pa.array(keys, type=pa.int64()),
            "n_events": pa.array(counts, type=pa.int64()),
        }
    )


HEAVY_USERS_MG_SQL = """
SELECT user_id, count(*) AS n_events FROM events
GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt (wide -> long)
# ---------------------------------------------------------------------------


def events_unpivot(sf_dir: str):
    """UNPIVOT: melts the per-user pivot back to long (user_id,
    event_type, n_events) rows — one numpy repeat/tile per batch, no
    shuffle beyond the pivot's own. Zero-count combinations are kept
    (the melt is lossless), so the oracle builds the full user x type
    lattice with a VALUES cross join."""
    wide = events_pivot(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        n_types = len(_EVENT_TYPES)
        counts = np.stack(
            [
                batch.column(f"n_{t}").to_numpy(zero_copy_only=False)
                for t in _EVENT_TYPES
            ],
            axis=1,
        )
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, n_types), type=pa.int64()),
                "event_type": pa.array(
                    np.tile(np.array(_EVENT_TYPES, dtype=object), len(u)),
                    type=pa.string(),
                ),
                "n_events": pa.array(counts.ravel(), type=pa.int64()),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


EVENTS_UNPIVOT_SQL = """
SELECT u.user_id, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')) t(event_type)
LEFT JOIN (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type
) c ON c.user_id = u.user_id AND c.event_type = t.event_type
"""


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)


# ---------------------------------------------------------------------------
# exact-integer linear regression (wave 31)
# ---------------------------------------------------------------------------

_LR_SCALE = 1_000_000  # micro-cents per coefficient unit


def _trunc_div_arr(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized truncate-toward-zero division — DuckDB's ``//`` (numpy
    ``//`` floors; they differ for negative epochs)."""
    q = np.abs(a) // b
    return np.where(a >= 0, q, -q)


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//``
    semantics (Python's ``//`` floors; they differ on negatives).
    Measured: DuckDB (-7)//2 = -3, Python -4."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def price_model(sf_dir: str):
    """Simple linear regression of order value on order size — the
    distributed-ML primitive (exact normal equations): y = o_totalprice
    in cents, x = the order's total lineitem quantity, fit
    y ≈ intercept + slope·x by least squares. All five moment sums
    (n, Σx, Σy, Σx², Σxy) are exact int64 partials combined on the
    driver (O(blocks) rows), and the closed-form solution

      slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
      intercept = (Σx²·Σy − Σx·Σxy) / (n·Σx² − (Σx)²)

    is evaluated in arbitrary-precision Python ints with ONE truncating
    division to micro-cents per coefficient — bit-identical to the
    DuckDB HUGEINT twin under any block structure. Returns one row
    (n_orders, slope_micro, intercept_micro).

    Shape: one skinny (orderkey, qty) shuffle + a partitioned hash join
    against orders; nothing else moves. At 100 TB the join is the only
    wide op and both sides are pre-projected to two columns."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

    li = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        ok, q = ok[order], q[order]
        seg = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        return pa.table(
            {
                "o_orderkey": pa.array(ok[seg], type=pa.int64()),
                "x": pa.array(np.add.reduceat(q, seg), type=pa.int64()),
            }
        )

    x_per_order = grouped_agg(
        li.map_batches(qty_partial, batch_format="pyarrow", batch_size=65536),
        ["o_orderkey"],
        {"x": ("x", "sum")},
        num_parts=16,
    )

    def to_cents(t: pa.Table) -> pa.Table:
        y = np.rint(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "y": pa.array(y, type=pa.int64())}
        )

    joined = hash_join(
        x_per_order,
        orders.map_batches(to_cents, batch_format="pyarrow"),
        left_on=["o_orderkey"],
        right_on=["o_orderkey"],
        num_parts=16,
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("x", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("y", pa.int64())]),
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    parts = joined.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(p["n"]) for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sy = sum(int(p["sy"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    sxy = sum(int(p["sxy"]) for p in parts)
    den = n * sxx - sx * sx
    if den == 0:
        raise ValueError("price_model: degenerate design (all x identical)")
    slope_micro = _trunc_div((n * sxy - sx * sy) * _LR_SCALE, den)
    intercept_micro = _trunc_div((sxx * sy - sx * sxy) * _LR_SCALE, den)
    return pa.table(
        {
            "n_orders": pa.array([n], type=pa.int64()),
            "slope_micro": pa.array([slope_micro], type=pa.int64()),
            "intercept_micro": pa.array([intercept_micro], type=pa.int64()),
        }
    )


PRICE_MODEL_SQL = f"""
WITH x AS (
  SELECT l_orderkey AS o_orderkey, CAST(sum(l_quantity) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT x.x, CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
  FROM x JOIN orders o USING (o_orderkey)
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(((n * sxy - sx * sy) * {_LR_SCALE}) // (n * sxx - sx * sx)
            AS BIGINT) AS slope_micro,
       CAST(((sxx * sy - sx * sxy) * {_LR_SCALE}) // (n * sxx - sx * sx)
            AS BIGINT) AS intercept_micro
FROM s
"""


# ---------------------------------------------------------------------------
# funnel conversion + retention cohorts (wave 33)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_W_US = 72 * 3600 * 1_000_000  # max gap between consecutive steps
_WEEK_US = 7 * 86400 * 1_000_000


def funnel_conversion(sf_dir: str):
    """Classic funnel analysis over the event stream: how many users
    reach each step of view -> click -> purchase, where every successive
    step must occur within _FUNNEL_W_US of the previous one. The chain
    is GREEDY-EARLIEST (t1 = first view; t2 = first click in
    [t1, t1+W]; t3 = first purchase in [t2, t2+W]) so the result is a
    pure function of the data. Returns (step, n_users), 3 rows.

    Shape: one filtered scan (only funnel-step types leave it), one
    user-hash co-group; inside each bucket the three chained
    first-after-within lookups are packed-key searchsorteds (the
    purchase_attribution device — key = uid<<51 | ts_us), no per-user
    loop; O(3 x buckets) partial rows reach the final grouped sum."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])

    def bucket(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.is_in(batch["event_type"], value_set=pa.array(list(_FUNNEL_STEPS)))
        )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array((uid % 16).astype(np.int64), type=pa.int64())
        )

    def chain(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"step": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        ety = g.column("event_type").to_pylist()
        key = (uid << np.int64(51)) | ts

        def sorted_type(name):
            m = np.asarray([e == name for e in ety])
            k = np.sort(key[m])
            return k, (k >> np.int64(51))

        vk, vu = sorted_type(_FUNNEL_STEPS[0])
        # first view per user: run starts in the sorted (uid, ts) keys
        if len(vk):
            starts = np.flatnonzero(np.r_[True, vu[1:] != vu[:-1]])
            users = vu[starts]
            t_cur = vk[starts] & np.int64((1 << 51) - 1)
        else:
            users = np.empty(0, dtype=np.int64)
            t_cur = users
        mask = np.int64((1 << 51) - 1)
        counts = [len(users)]
        for step_name in _FUNNEL_STEPS[1:]:
            sk, su = sorted_type(step_name)
            if not len(sk):
                users = t_cur = np.empty(0, dtype=np.int64)
                counts.append(0)
                continue
            # first same-user event at ts >= t_cur: searchsorted-left on
            # the packed key (uid prefix keeps the probe inside the user)
            want = (users << np.int64(51)) | t_cur
            idx = np.searchsorted(sk, want, side="left")
            ok = idx < len(sk)
            safe = np.clip(idx, 0, len(sk) - 1)
            nxt_t = sk[safe] & mask
            ok &= (su[safe] == users) & (nxt_t <= t_cur + _FUNNEL_W_US)
            users, t_cur = users[ok], nxt_t[ok]
            counts.append(len(users))
        return pa.table(
            {
                "step": pa.array([1, 2, 3], type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    partials = (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(chain, batch_format="pyarrow")
    )
    return grouped_agg(partials, ["step"], {"n_users": ("n", "sum")}, num_parts=2)


FUNNEL_CONVERSION_SQL = f"""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT v.user_id, min(e.ts) AS t2
  FROM v JOIN events e ON e.user_id = v.user_id AND e.event_type = 'click'
   AND e.ts >= v.t1 AND epoch_us(e.ts) <= epoch_us(v.t1) + {_FUNNEL_W_US}
  GROUP BY 1
),
p AS (
  SELECT c.user_id, min(e.ts) AS t3
  FROM c JOIN events e ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts >= c.t2 AND epoch_us(e.ts) <= epoch_us(c.t2) + {_FUNNEL_W_US}
  GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM p
"""


def retention_cohorts(sf_dir: str):
    """Retention-cohort matrix: users grouped by first-activity week,
    counted per week-offset of later activity — the standard
    retention triangle. Weeks are pure integer arithmetic
    (epoch_us // week_us), so engine and SQL agree exactly. Returns
    (cohort_week, week_offset, n_users).

    Shape: one distinct (user, week) shuffle; the cohort (min week per
    user) rides a grouped min over that distinct set; one lookup_join
    attaches it back; final O(weeks²) grouped count."""
    from osmwaterwayextractor_ray.stages.fastagg import (
        distinct,
        grouped_agg,
        lookup_join,
    )

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def weeks(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "wk": pa.array(_trunc_div_arr(ts, _WEEK_US), type=pa.int64()),
            }
        )

    uw = distinct(
        ds.map_batches(weeks, batch_format="pyarrow", batch_size=65536),
        ["user_id", "wk"],
        num_parts=16,
    )
    from osmwaterwayextractor_ray.stages.pin import pin

    uw = pin(uw, "retention_uw")
    coh = grouped_agg(uw, ["user_id"], {"cwk": ("wk", "min")}, num_parts=16)
    joined = lookup_join(
        uw, coh, "user_id", "user_id", {"cwk": "cwk"},
        num_parts=16,
        left_schema=pa.schema([("user_id", pa.int64()), ("wk", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()), ("cwk", pa.int64())]),
    )

    def offs(t: pa.Table) -> pa.Table:
        wk = t.column("wk").to_numpy(zero_copy_only=False)
        cwk = t.column("cwk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_week": pa.array(cwk, type=pa.int64()),
                "week_offset": pa.array(wk - cwk, type=pa.int64()),
                "one": pa.array(np.ones(len(wk), dtype=np.int64)),
            }
        )

    return grouped_agg(
        joined.map_batches(offs, batch_format="pyarrow"),
        ["cohort_week", "week_offset"],
        {"n_users": ("one", "sum")},
        num_parts=4,
    )


RETENTION_COHORTS_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events
),
coh AS (SELECT user_id, min(wk) AS cwk FROM uw GROUP BY 1)
SELECT CAST(coh.cwk AS BIGINT) AS cohort_week,
       CAST(uw.wk - coh.cwk AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN coh USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# market-basket affinity (wave 36)
# ---------------------------------------------------------------------------

_BK_MIN_SUP = 10  # minimum co-order support


def basket_pairs(sf_dir: str):
    """Market-basket affinity over part types (the Apriori 2-itemset
    pass): for every pair of part types co-ordered in >= _BK_MIN_SUP
    orders, the pair support, both singleton supports, the order
    universe size, and an EXACT positive-lift flag
    (n_both · n_orders > n_a · n_b — integer cross-multiplication, the
    orders_above_cust_avg device; no float lift). Returns (type_a,
    type_b, n_both, n_a, n_b, n_orders, lift_positive), type_a < type_b.

    Shape: the fact table joins the part dimension with a partitioned
    lookup_join, collapses to DISTINCT (order, type_id) (one shuffle),
    then the order-grouped pair expansion is ONE bucketed_pairs +
    pair_counts pass (per-order fan-out is bounded by the basket size).
    Type ids are assigned from the SORTED distinct type list (O(types)
    driver rows), so the int pair order IS the string pair order."""
    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pairs,
        distinct,
        grouped_agg,
        lookup_join,
        pair_counts,
    )
    from osmwaterwayextractor_ray.stages.pin import pin

    li = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    part = _read_pq(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])

    types = sorted(
        distinct(part, ["p_type"], num_parts=4)
        .to_pandas()["p_type"]
        .tolist()
    )
    tid_of = {t: i for i, t in enumerate(types)}
    tref = ray.put(pa.array(types, type=pa.string()))

    typed = lookup_join(
        li, part, "l_partkey", "p_partkey", {"p_type": "p_type"},
        num_parts=16,
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()), ("p_type", pa.string())]),
    )

    def to_tid(t: pa.Table) -> pa.Table:
        voc = ray.get(tref)
        idx = pc.index_in(t["p_type"], value_set=voc)
        return pa.table(
            {
                "o": t["l_orderkey"],
                "tid": pa.array(
                    idx.to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    ot = pin(
        distinct(
            typed.map_batches(to_tid, batch_format="pyarrow"),
            ["o", "tid"],
            num_parts=16,
        ),
        "basket_ot",
    )

    n_orders = distinct(ot, ["o"], num_parts=16).count()
    singles = grouped_agg(
        ot.map_batches(
            lambda t: pa.table(
                {"tid": t["tid"], "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["tid"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()  # O(types) rows
    n_t = np.zeros(len(types), dtype=np.int64)
    n_t[singles["tid"].to_numpy()] = singles["n"].to_numpy()
    sref = ray.put(n_t)

    pairs = bucketed_pairs(ot, ["o"], "tid", "ta", "tb", num_parts=16)
    counted = pair_counts(pairs, "ta", "tb", "n_both", num_parts=16)

    def finish(t: pa.Table) -> pa.Table:
        voc = ray.get(tref)
        nt = ray.get(sref)
        t = t.filter(pc.greater_equal(t["n_both"], _BK_MIN_SUP))
        ta = t.column("ta").to_numpy(zero_copy_only=False)
        tb = t.column("tb").to_numpy(zero_copy_only=False)
        nb = t.column("n_both").to_numpy(zero_copy_only=False)
        na_, nb_ = nt[ta], nt[tb]
        lift = (nb.astype(object) * n_orders > na_.astype(object) * nb_).astype(
            np.int64
        )
        return pa.table(
            {
                "type_a": pc.take(voc, pa.array(ta, type=pa.int64())),
                "type_b": pc.take(voc, pa.array(tb, type=pa.int64())),
                "n_both": pa.array(nb, type=pa.int64()),
                "n_a": pa.array(na_, type=pa.int64()),
                "n_b": pa.array(nb_, type=pa.int64()),
                "n_orders": pa.array(
                    np.full(len(ta), n_orders, dtype=np.int64), type=pa.int64()
                ),
                "lift_positive": pa.array(lift, type=pa.int64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow")


BASKET_PAIRS_SQL = f"""
WITH ot AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_type AS t
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT count(DISTINCT o) AS n_orders FROM ot),
s AS (SELECT t, count(*) AS n_t FROM ot GROUP BY t),
pr AS (
  SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_both
  FROM ot a JOIN ot b ON a.o = b.o AND a.t < b.t
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
       CAST(sa.n_t AS BIGINT) AS n_a, CAST(sb.n_t AS BIGINT) AS n_b,
       CAST(n.n_orders AS BIGINT) AS n_orders,
       CAST(CASE WHEN n_both * n.n_orders > sa.n_t * sb.n_t
                 THEN 1 ELSE 0 END AS BIGINT) AS lift_positive
FROM pr
JOIN s sa ON sa.t = pr.type_a
JOIN s sb ON sb.t = pr.type_b
CROSS JOIN n
WHERE n_both >= {_BK_MIN_SUP}
"""


# ---------------------------------------------------------------------------
# percent_rank window + referential-integrity audit (wave 38)
# ---------------------------------------------------------------------------


def events_percent_rank(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) in
    EXACT integer micro-units: pr_micro = ((rank-1)·1e6) // (n-1) with
    SQL RANK tie semantics (equal values share the rank of their first
    row) and pr_micro = 0 for single-row partitions — no float ranks
    anywhere, so the result is bit-identical under any block structure.
    Returns (event_id, event_type, pr_micro).

    One type-hash bucket shuffle; each bucket resolves all its types
    with one lexsort + run-boundary rank arithmetic (the ntile plan)."""
    N_PARTS = 8

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        # deterministic content hash — Python's hash() is per-process
        # randomized and would split one type across groups
        from osmwaterwayextractor_ray.functions.hashing import text_hash64

        et = batch.column("event_type").to_pylist()
        h = text_hash64(et).view(np.int64) & np.int64(0x7FFFFFFF)
        return batch.append_column(
            "__part", pa.array(h % N_PARTS, type=pa.int64())
        )

    def prank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "pr_micro": pa.array([], type=pa.int64()),
                }
            )
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, et))
        et, eid, v = et[order], eid[order], v[order]
        tstart = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        sizes = np.diff(np.r_[tstart, len(et)])
        pos = np.arange(len(et), dtype=np.int64) - np.repeat(tstart, sizes)
        # RANK ties: a row's rank is the position of the first row with an
        # equal (type, value)
        # value boundary: NaN != NaN is True in numpy but DuckDB RANK
        # ties all NaNs together (they sort last on both sides)
        vdiff = (v[1:] != v[:-1]) & ~(np.isnan(v[1:]) & np.isnan(v[:-1]))
        vstart = np.flatnonzero(np.r_[True, (et[1:] != et[:-1]) | vdiff])
        vsizes = np.diff(np.r_[vstart, len(et)])
        rank0 = np.repeat(pos[vstart], vsizes)  # 0-based shared rank
        n = np.repeat(sizes, sizes)
        pr = np.where(n > 1, (rank0 * 1_000_000) // np.maximum(n - 1, 1), 0)
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "event_type": pa.array(et.tolist(), type=pa.string()),
                "pr_micro": pa.array(pr, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(prank, batch_format="pyarrow")
    )


EVENTS_PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       CAST(CASE WHEN cnt > 1 THEN ((rnk - 1) * 1000000) // (cnt - 1)
                 ELSE 0 END AS BIGINT) AS pr_micro
FROM (
  SELECT event_id, event_type,
         rank() OVER (PARTITION BY event_type ORDER BY value) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
)
"""


_FK_RELATIONS = [
    # (name, child table, child key, parent table, parent key)
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_violations(sf_dir: str):
    """Referential-integrity audit — the data-quality gate every ingest
    pipeline runs before training-data joins: for each declared FK edge,
    the number of child ROWS whose key has no parent. Returns
    (relation, n_orphans), one row per edge, zero counts included.

    Shape (ALL edges batched through one pass per role — the per-edge
    loop paid ~30 serial barrier launches and measured 6.4 s at
    sf0.1/32): every child table is read once and emits packed
    (edge << 56 | key, row_count) partials for each edge it carries;
    ONE grouped_agg collapses them to O(distinct keys) rows; parents
    union into ONE distinct; ONE lookup_join (inner) + per-edge block
    partials give matched row counts, and orphans = total − matched.
    The pack is fail-loud for keys ≥ 2^56 or negative (exact anti-join
    counts — Bloom screens can't give exact counts)."""
    from osmwaterwayextractor_ray.stages.fastagg import (
        distinct,
        grouped_agg,
        lookup_join,
    )
    from osmwaterwayextractor_ray.stages.pin import pin

    def packer(cols, edge_ids):
        def fn(t: pa.Table) -> pa.Table:
            eks = []
            for col, ei in zip(cols, edge_ids):
                k = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
                if len(k) and (int(k.min()) < 0 or int(k.max()) >= 1 << 56):
                    raise ValueError("fk_violations: key outside the 56-bit pack")
                eks.append((ei << 56) | k)
            ek = np.concatenate(eks) if eks else np.empty(0, dtype=np.int64)
            return pa.table(
                {
                    "ek": pa.array(ek, type=pa.int64()),
                    "one": pa.array(np.ones(len(ek), dtype=np.int64)),
                }
            )

        return fn

    # group edges by their child / parent table so each table reads once
    child_tables: dict[str, tuple[list[str], list[int]]] = {}
    parent_tables: dict[str, tuple[list[str], list[int]]] = {}
    for ei, (name, child, ckey, parent, pkey) in enumerate(_FK_RELATIONS):
        child_tables.setdefault(child, ([], []))[0].append(ckey)
        child_tables[child][1].append(ei)
        parent_tables.setdefault(parent, ([], []))[0].append(pkey)
        parent_tables[parent][1].append(ei)

    child_parts = [
        _read_pq(f"{sf_dir}/{tbl}.parquet", columns=sorted(set(cols))).map_batches(
            packer(cols, eids), batch_format="pyarrow", batch_size=65536
        )
        for tbl, (cols, eids) in child_tables.items()
    ]
    children = child_parts[0].union(*child_parts[1:])
    ckeys = pin(
        grouped_agg(children, ["ek"], {"n": ("one", "sum")}, num_parts=8),
        "fk_ckeys",
    )

    parent_parts = [
        _read_pq(f"{sf_dir}/{tbl}.parquet", columns=sorted(set(cols))).map_batches(
            packer(cols, eids), batch_format="pyarrow", batch_size=65536
        )
        for tbl, (cols, eids) in parent_tables.items()
    ]
    parents = parent_parts[0].union(*parent_parts[1:])
    pkeys = distinct(parents, ["ek"], num_parts=8).map_batches(
        lambda t: pa.table(
            {
                "ek": t["ek"],
                "present": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    joined = lookup_join(
        ckeys, pkeys, "ek", "ek", {"present": "present"},
        num_parts=8,
        left_schema=pa.schema([("ek", pa.int64()), ("n", pa.int64())]),
        right_schema=pa.schema([("ek", pa.int64()), ("present", pa.int64())]),
    )

    def per_edge_sums(ds) -> dict[int, int]:
        def part(t: pa.Table) -> pa.Table:
            ek = t.column("ek").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            e = ek >> 56
            order = np.argsort(e, kind="stable")
            e_s, n_s = e[order], n[order]
            starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]])
            sums = np.add.reduceat(n_s, starts) if len(n_s) else n_s
            return pa.table(
                {
                    "e": pa.array(e_s[starts], type=pa.int64()),
                    "s": pa.array(sums, type=pa.int64()),
                }
            )

        out: dict[int, int] = {}
        for p in ds.map_batches(part, batch_format="pyarrow").take_all():
            out[int(p["e"])] = out.get(int(p["e"]), 0) + int(p["s"])
        return out

    totals = per_edge_sums(ckeys)
    matched = per_edge_sums(joined)
    return pa.table(
        {
            "relation": pa.array(
                [name for name, *_ in _FK_RELATIONS], type=pa.string()
            ),
            "n_orphans": pa.array(
                [
                    totals.get(ei, 0) - matched.get(ei, 0)
                    for ei in range(len(_FK_RELATIONS))
                ],
                type=pa.int64(),
            ),
        }
    )


FK_VIOLATIONS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relation,
       CAST((SELECT count(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pkey} = c.{ckey})) AS BIGINT)
       AS n_orphans"""
    for name, child, ckey, parent, pkey in _FK_RELATIONS
)


# ---------------------------------------------------------------------------
# hourly active users (wave 40)
# ---------------------------------------------------------------------------

_HOUR_US_ = 3600 * 1_000_000


def hourly_active_users(sf_dir: str):
    """Exact distinct active users per hour — the canonical streaming
    dashboard aggregate, done exactly: one DISTINCT (hour, user) shuffle
    (the skinny pair is all that moves) + an O(hours) grouped count.
    Hours are integer epoch_us // 3600e6 so engine and twin agree
    exactly. Returns (hour, n_users)."""
    from osmwaterwayextractor_ray.stages.fastagg import distinct, grouped_agg

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def hours(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "hour": pa.array(_trunc_div_arr(ts, _HOUR_US_), type=pa.int64()),
                "user_id": t["user_id"],
            }
        )

    hu = distinct(
        ds.map_batches(hours, batch_format="pyarrow", batch_size=65536),
        ["hour", "user_id"],
        num_parts=16,
    )
    return grouped_agg(
        hu.map_batches(
            lambda t: pa.table(
                {"hour": t["hour"], "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["hour"],
        {"n_users": ("one", "sum")},
        num_parts=8,
    )


HOURLY_ACTIVE_USERS_SQL = f"""
SELECT epoch_us(ts) // {_HOUR_US_} AS hour,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# exact grouped percentiles (wave 41)
# ---------------------------------------------------------------------------

_GP_PCTS = (50, 90, 99)  # reported percentiles
_GP_SHIFT = 8  # coarse value-bucket width = 2^8 cents


def grouped_percentiles(sf_dir: str):
    """EXACT per-group percentiles (percentile_disc semantics: the value
    at rank ceil(p·n) under (value asc) order) of event value cents per
    event_type — the exact twin of the t-digest sketch query, built on
    the coarse-bucket rank device (zipf_fit / perplexity_buckets):

      1. one (type, cents>>_GP_SHIFT) bucket-count shuffle; the driver
         sees O(types x occupied buckets) integers and computes
         exclusive offsets + the target ranks ceil(p·n_t);
      2. a second grouped pass over the SAME bucket key: each bucket
         locally sorts its cents and emits exactly the target ranks that
         land inside it — fully distributed, nothing value-sized reaches
         the driver even when every row shares one bucket.

    Returns (event_type, pct, cents). Integer ranks end-to-end: no
    float quantile interpolation to drift."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(cents, type=pa.int64()),
                "b": pa.array(cents >> _GP_SHIFT, type=pa.int64()),
            }
        )

    rows = pin(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "gp_rows",
    )
    bcounts = (
        grouped_agg(
            rows.map_batches(
                lambda t: pa.table(
                    {
                        "event_type": t["event_type"],
                        "b": t["b"],
                        "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["event_type", "b"],
            {"n": ("one", "sum")},
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["event_type", "b"])
    )
    offs: dict[tuple[str, int], int] = {}
    targets: dict[str, list[tuple[int, int]]] = {}
    for et, grp in bcounts.groupby("event_type"):
        c = grp["n"].to_numpy()
        ex = np.cumsum(c) - c
        for b, o in zip(grp["b"].to_numpy(), ex):
            offs[(et, int(b))] = int(o)
        n = int(c.sum())
        targets[et] = [(p, (n * p + 99) // 100) for p in _GP_PCTS]

    # O(types x buckets) small — close over directly (a ray.put dict
    # pays a deserializing ray.get per map_groups GROUP; see rfm_segments)

    def tag(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        b = t.column("b").to_numpy(zero_copy_only=False)
        from osmwaterwayextractor_ray.functions.hashing import text_hash64

        h = text_hash64([f"{e}|{x}" for e, x in zip(et, b)]).view(np.int64)
        return t.append_column(
            "__part", pa.array((h & 0x7FFFFFFF) % 1024, type=pa.int64())
        )

    def pick(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "pct": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                }
            )
        o_map, t_map = offs, targets
        et_all = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        b_all = g.column("b").to_numpy(zero_copy_only=False)
        c_all = g.column("cents").to_numpy(zero_copy_only=False)
        out_e, out_p, out_c = [], [], []
        # a __part group may hold several (type, bucket) keys: resolve runs
        order = np.lexsort((c_all, b_all, et_all))
        et_all, b_all, c_all = et_all[order], b_all[order], c_all[order]
        seg = np.flatnonzero(
            np.r_[True, (et_all[1:] != et_all[:-1]) | (b_all[1:] != b_all[:-1])]
        )
        sizes = np.diff(np.r_[seg, len(et_all)])
        for s, ln in zip(seg, sizes):
            et, b = et_all[s], int(b_all[s])
            o = o_map[(et, b)]
            for p, r in t_map[et]:
                if o < r <= o + ln:
                    out_e.append(et)
                    out_p.append(p)
                    out_c.append(int(c_all[s + (r - o) - 1]))
        return pa.table(
            {
                "event_type": pa.array(out_e, type=pa.string()),
                "pct": pa.array(out_p, type=pa.int64()),
                "cents": pa.array(out_c, type=pa.int64()),
            }
        )

    return (
        rows.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pick, batch_format="pyarrow")
    )


GROUPED_PERCENTILES_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
{" UNION ALL ".join(
    f"SELECT event_type, CAST({p} AS BIGINT) AS pct, cents FROM r "
    f"WHERE rn = (n * {p} + 99) // 100"
    for p in _GP_PCTS
)}
"""


# ---------------------------------------------------------------------------
# event-type transition matrix (wave 43)
# ---------------------------------------------------------------------------


def event_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's event
    sequence (the sequence-mining primitive behind session models):
    order events per user by the TOTAL key (ts, event_id), count every
    adjacent (cur_type, next_type) pair. Returns (cur_type, next_type,
    n_transitions).

    One user-hash co-group; inside each bucket one lexsort + shifted
    comparison yields every adjacent pair (no per-user loop); a final
    O(types²) grouped sum combines buckets."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    def bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array((uid % 16).astype(np.int64), type=pa.int64())
        )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "cur_type": pa.array([], type=pa.string()),
                    "next_type": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        same_user = uid[1:] == uid[:-1]
        cur = et[:-1][same_user]
        nxt = et[1:][same_user]
        tbl = pa.table(
            {
                "cur_type": pa.array(cur.tolist(), type=pa.string()),
                "next_type": pa.array(nxt.tolist(), type=pa.string()),
            }
        )
        return (
            tbl.group_by(["cur_type", "next_type"], use_threads=False)
            .aggregate([("next_type", "count")])
            .rename_columns(["cur_type", "next_type", "n"])
        )

    partials = (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(pairs, batch_format="pyarrow")
    )
    return grouped_agg(
        partials,
        ["cur_type", "next_type"],
        {"n_transitions": ("n", "sum")},
        num_parts=4,
    )


EVENT_TRANSITIONS_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS cur_type, next_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM o WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# CDC change-log compaction + SCD2 history build (wave 46)
# ---------------------------------------------------------------------------

_CDC_TOMBSTONE = "error"  # the change-log delete marker


def cdc_upsert(sf_dir: str):
    """Change-data-capture compaction (warehouse MERGE INTO semantics):
    the events stream is a keyed change log over a per-user profile
    store — every event upserts its user's row; ``error`` events are
    tombstones that DELETE the key. Applying the log = keep each key's
    LAST change under the total (ts, event_id) order and drop keys whose
    last change is a tombstone. Returns (user_id, last_type, cents,
    n_changes) for the surviving keys; n_changes counts every log entry
    for the key, tombstones included.

    One user-hash co-group; inside each bucket a single lexsort resolves
    every key's last change and its change count from run lengths — no
    per-key loop, and the log is shuffled exactly once."""
    import pyarrow.compute as pc

    N_PARTS = 16
    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array((uid % N_PARTS).astype(np.int64), type=pa.int64())
        )

    def compact(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "last_type": pa.array([], type=pa.string()),
                    "cents": pa.array([], type=pa.int64()),
                    "n_changes": pa.array([], type=pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        is_last = np.r_[uid_s[1:] != uid_s[:-1], True]
        starts = np.flatnonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])
        n_changes = np.diff(np.r_[starts, len(uid_s)])
        last_idx = order[is_last]
        last_type = pc.take(g.column("event_type").combine_chunks(),
                            pa.array(last_idx, type=pa.int64()))
        cents = _cents(
            g.column("value").to_numpy(zero_copy_only=False)[last_idx]
        )
        keep = pc.not_equal(last_type, _CDC_TOMBSTONE).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s[is_last][keep], type=pa.int64()),
                "last_type": last_type.filter(pa.array(keep)),
                "cents": pa.array(cents[keep], type=pa.int64()),
                "n_changes": pa.array(n_changes[keep], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(compact, batch_format="pyarrow")
    )


CDC_UPSERT_SQL = f"""
WITH r AS (
  SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id, event_type AS last_type, cents,
       CAST(n_changes AS BIGINT) AS n_changes
FROM r WHERE rn = 1 AND event_type <> '{_CDC_TOMBSTONE}'
"""


def scd2_history(sf_dir: str):
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event stream (total (ts, event_id) order) into validity
    intervals of its event_type — a new version starts exactly when the
    type CHANGES; consecutive equal types merge into one interval.
    Returns (user_id, event_type, valid_from, valid_to, version) with
    valid_from/valid_to in epoch microseconds; the current (open)
    interval has valid_to NULL. The standard dimension-table layout a
    warehouse derives from any change stream.

    One user-hash co-group; per bucket a lexsort + shifted type
    comparison finds all change points, and intervals/versions fall out
    of run arithmetic — no per-user loop."""
    N_PARTS = 16
    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array((uid % N_PARTS).astype(np.int64), type=pa.int64())
        )

    def intervals(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "valid_from": pa.array([], type=pa.int64()),
                    "valid_to": pa.array([], type=pa.int64()),
                    "version": pa.array([], type=pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, et_s = uid[order], ts[order], et[order]
        new_user = np.r_[True, uid_s[1:] != uid_s[:-1]]
        change = new_user | np.r_[False, et_s[1:] != et_s[:-1]]
        ci = np.flatnonzero(change)
        uid_c, ts_c, et_c = uid_s[ci], ts_s[ci], et_s[ci]
        # valid_to = next change point's ts iff it belongs to the same user
        same_next = np.r_[uid_c[1:] == uid_c[:-1], False]
        vt = np.empty(len(ci), dtype=np.int64)
        vt[:-1] = ts_c[1:] if len(ci) > 1 else 0
        vt[-1] = 0
        ustart = np.flatnonzero(np.r_[True, uid_c[1:] != uid_c[:-1]])
        runs = np.diff(np.r_[ustart, len(ci)])
        version = (
            np.arange(len(ci), dtype=np.int64) - np.repeat(ustart, runs) + 1
        )
        return pa.table(
            {
                "user_id": pa.array(uid_c, type=pa.int64()),
                "event_type": pa.array(et_c.tolist(), type=pa.string()),
                "valid_from": pa.array(ts_c, type=pa.int64()),
                "valid_to": pa.array(vt, type=pa.int64(), mask=~same_next),
                "version": pa.array(version, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(intervals, batch_format="pyarrow")
    )


SCD2_HISTORY_SQL = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
chg AS (
  SELECT user_id, event_type, ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) AS ver
  FROM o WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, ts_us AS valid_from,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ver) AS valid_to,
       CAST(ver AS BIGINT) AS version
FROM chg
"""


# ---------------------------------------------------------------------------
# cumulative distinct users (wave 49)
# ---------------------------------------------------------------------------

_DAY_US_ = 86_400_000_000


def cumulative_distinct_users(sf_dir: str):
    """Growth-curve audit: per day, how many users were seen for the
    FIRST time, and the running total of distinct users up to that day
    — the exact version of the cumulative-DAU dashboard query. Returns
    (day, new_users, cum_users) with day = first_ts // 1 day (epoch
    days, truncating division matching DuckDB //).

    One O(users) grouped-min shuffle (each user's first event ts) + an
    O(days) grouped count; the prefix sum runs on the driver over
    O(days) integers only."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {"user_id": t["user_id"], "ts_us": pa.array(ts, type=pa.int64())}
        )

    first = grouped_agg(
        ds.map_batches(to_us, batch_format="pyarrow", batch_size=65536),
        ["user_id"],
        {"first_us": ("ts_us", "min")},
        num_parts=8,
    )

    def days(t: pa.Table) -> pa.Table:
        f = t.column("first_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(_trunc_div_arr(f, _DAY_US_), type=pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    per_day = grouped_agg(
        first.map_batches(days, batch_format="pyarrow"),
        ["day"],
        {"new_users": ("one", "sum")},
        num_parts=4,
    ).to_pandas().sort_values("day").reset_index(drop=True)
    per_day["day"] = per_day["day"].astype(np.int64)
    per_day["new_users"] = per_day["new_users"].astype(np.int64)
    per_day["cum_users"] = per_day["new_users"].cumsum().astype(np.int64)
    return per_day


CUMULATIVE_DISTINCT_USERS_SQL = f"""
WITH f AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY 1
),
d AS (
  SELECT first_us // {_DAY_US_} AS day,
         CAST(count(*) AS BIGINT) AS new_users
  FROM f GROUP BY 1
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
"""


# ---------------------------------------------------------------------------
# skyline (Pareto frontier) query (wave 50)
# ---------------------------------------------------------------------------


def _skyline_kernel(t: pa.Table) -> pa.Table:
    """Exact 2-D skyline (maximize p_size, minimize price_cents) of one
    table: sort by (size desc, price asc), per-size min price via
    reduceat, keep a size iff its min price is strictly below the
    running min over all larger sizes (ties on (size, price) all
    survive — dominance needs one strict inequality)."""
    if t.num_rows == 0:
        return t
    size = t.column("p_size").to_numpy(zero_copy_only=False)
    price = t.column("price_cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((price, -size))
    size_s, price_s = size[order], price[order]
    sstart = np.flatnonzero(np.r_[True, size_s[1:] != size_s[:-1]])
    smin = price_s[sstart]  # per-size min (price asc within size)
    # running min over strictly larger sizes (exclusive prefix)
    prev = np.r_[np.iinfo(np.int64).max, np.minimum.accumulate(smin)[:-1]]
    keep_size = smin < prev
    sizes_n = np.diff(np.r_[sstart, len(size_s)])
    row_keep = np.repeat(keep_size, sizes_n) & (
        price_s == np.repeat(smin, sizes_n)
    )
    idx = pa.array(order[row_keep], type=pa.int64())
    import pyarrow.compute as pc

    return pa.table(
        {
            "p_partkey": pc.take(t.column("p_partkey").combine_chunks(), idx),
            "p_size": pc.take(t.column("p_size").combine_chunks(), idx),
            "price_cents": pc.take(
                t.column("price_cents").combine_chunks(), idx
            ),
        }
    )


def skyline_parts(sf_dir: str):
    """Skyline (Pareto-frontier) query over parts: every part for which
    no other part has size >= AND price <= with at least one strict —
    i.e. the bigger-and-cheaper frontier, the classic multi-objective
    short-list operator. Returns (p_partkey, p_size, price_cents); all
    ties on a frontier point survive.

    Distributed plan: a per-block partial skyline first (sound — a
    globally non-dominated point is non-dominated within its block, so
    the local skyline is a superset of the global one's members there),
    then ONE tiny final pass over the O(blocks × distinct sizes)
    survivors. The parts table itself never shuffles."""
    ds = _read_pq(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return _skyline_kernel(
            pa.table(
                {
                    "p_partkey": t["p_partkey"],
                    "p_size": pa.array(
                        t.column("p_size")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        type=pa.int64(),
                    ),
                    "price_cents": pa.array(
                        _cents(
                            t.column("p_retailprice").to_numpy(
                                zero_copy_only=False
                            )
                        ),
                        type=pa.int64(),
                    ),
                }
            )
        )

    partial = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        )

    return (
        partial.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: _skyline_kernel(g.drop_columns(["__part"])),
            batch_format="pyarrow",
        )
    )


SKYLINE_PARTS_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
)
SELECT p_partkey, p_size, price_cents FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
    AND (b.p_size > a.p_size OR b.price_cents < a.price_cents)
)
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation (wave 51)
# ---------------------------------------------------------------------------

_RFM_K = 5  # quintile scores
# (score column, metric column, descending?, bucket shift)
_RFM_DIMS = [
    ("r_score", "recency_days", False, 0),
    ("f_score", "frequency", True, 0),
    ("m_score", "monetary_cents", True, 12),
]


def rfm_segments(sf_dir: str):
    """RFM customer segmentation — the classic marketing-analytics
    operator: per customer the Recency (days since last order vs the
    corpus max date), Frequency (order count) and Monetary (exact cents)
    metrics, each scored into exact SQL-NTILE(5) quintiles under total
    orders (r: recency asc — 1 = most recent; f/m: metric desc — 1 =
    most frequent / biggest spender; ties by custkey asc). Returns
    (c_custkey, recency_days, frequency, monetary_cents, r_score,
    f_score, m_score).

    Scale shape: one O(customers) grouped agg builds the metric table
    (pinned); ONE combined bucket-count pass gives the driver
    O(Σ buckets) integers for the three exact global-rank offset maps
    (the zipf_fit coarse-bucket device — negated keys make descending
    buckets order-preserving under arithmetic >>); then three bucket
    co-group passes attach the scores with pure rank arithmetic.
    Customer rows shuffle 3×; order rows once; nothing reaches the
    driver but bucket counts. Bucket shifts size the per-task groups —
    a degenerate all-one-value dimension degrades to one task for that
    pass (same caveat as grouped_percentiles)."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        us = (
            t.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "ts_us": pa.array(us, type=pa.int64()),
                "cents": pa.array(
                    _cents(
                        t.column("o_totalprice").to_numpy(zero_copy_only=False)
                    ),
                    type=pa.int64(),
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    prepped = pin(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "rfm_prepped",
    )
    per_cust = grouped_agg(
        prepped,
        ["c_custkey"],
        {
            "last_us": ("ts_us", "max"),
            "frequency": ("one", "sum"),
            "monetary_cents": ("cents", "sum"),
        },
        num_parts=8,
    )
    # global max order date: O(blocks) integers to the driver
    mx_parts = prepped.map_batches(
        lambda t: pa.table(
            {
                "mx": pa.array(
                    [int(t.column("ts_us").to_numpy(zero_copy_only=False).max())]
                    if t.num_rows
                    else [],
                    type=pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    mx_us = int(mx_parts["mx"].max())

    def recency(t: pa.Table) -> pa.Table:
        last = t.column("last_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "recency_days": pa.array(
                    _trunc_div_arr(mx_us - last, _DAY_US_), type=pa.int64()
                ),
                "frequency": t["frequency"],
                "monetary_cents": t["monetary_cents"],
            }
        )

    metrics = pin(
        per_cust.map_batches(recency, batch_format="pyarrow"), "rfm_metrics"
    )

    # ONE combined bucket-count pass for all three dims
    def bcounts(t: pa.Table) -> pa.Table:
        dims, bs = [], []
        for di, (_, metric, desc, shift) in enumerate(_RFM_DIMS):
            v = t.column(metric).to_numpy(zero_copy_only=False)
            key = -v if desc else v
            dims.append(np.full(len(v), di, dtype=np.int64))
            bs.append(key >> shift)
        return pa.table(
            {
                "dim": pa.array(np.concatenate(dims), type=pa.int64()),
                "b": pa.array(np.concatenate(bs), type=pa.int64()),
                "one": pa.array(
                    np.ones(3 * t.num_rows, dtype=np.int64)
                ),
            }
        )

    counts = grouped_agg(
        metrics.map_batches(bcounts, batch_format="pyarrow"),
        ["dim", "b"],
        {"n": ("one", "sum")},
        num_parts=4,
    ).to_pandas()
    offs_by_dim: list[dict[int, int]] = []
    n_total = 0
    for di in range(len(_RFM_DIMS)):
        grp = counts[counts["dim"] == di].sort_values("b")
        c = grp["n"].to_numpy(dtype=np.int64)
        ex = np.cumsum(c) - c
        offs_by_dim.append(
            {int(b): int(o) for b, o in zip(grp["b"].to_numpy(), ex)}
        )
        n_total = int(c.sum())
    # the offset maps are O(buckets) small — close over them directly:
    # a ray.put'd dict costs a deserializing ray.get PER GROUP inside
    # map_groups (measured 15 s at sf0.1: ~2500 groups x 3 passes),
    # while a closure ships once per task

    out = metrics
    for di, (out_col, metric, desc, shift) in enumerate(_RFM_DIMS):

        def tag(t: pa.Table, _m=metric, _d=desc, _s=shift) -> pa.Table:
            v = t.column(_m).to_numpy(zero_copy_only=False)
            key = -v if _d else v
            return t.append_column(
                "__rb", pa.array(key >> _s, type=pa.int64())
            )

        def score(
            g: pa.Table, _di=di, _m=metric, _d=desc, _c=out_col
        ) -> pa.Table:
            if g.num_rows == 0:
                return g.drop_columns(["__rb"]).append_column(
                    _c, pa.array([], type=pa.int64())
                )
            offs, n = offs_by_dim, n_total
            v = g.column(_m).to_numpy(zero_copy_only=False)
            key = -v if _d else v
            ck = g.column("c_custkey").to_numpy(zero_copy_only=False)
            order = np.lexsort((ck, key))
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            b = int(g.column("__rb")[0].as_py())
            rank0 = offs[_di][b] + inv  # 0-based global rank per row
            base, rem = n // _RFM_K, n % _RFM_K
            cut = rem * (base + 1)
            tile = np.where(
                rank0 < cut,
                rank0 // (base + 1),
                rem + (rank0 - cut) // np.maximum(base, 1),
            ) + 1
            return g.drop_columns(["__rb"]).append_column(
                _c, pa.array(tile.astype(np.int64), type=pa.int64())
            )

        out = (
            out.map_batches(tag, batch_format="pyarrow")
            .groupby("__rb")
            .map_groups(score, batch_format="pyarrow")
        )
    return out


RFM_SEGMENTS_SQL = f"""
WITH m AS (
  SELECT o_custkey AS c_custkey,
         max(epoch_us(o_orderdate)) AS last_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY 1
),
g AS (SELECT max(last_us) AS mx FROM m),
r AS (
  SELECT c_custkey,
         CAST((g.mx - last_us) // {_DAY_US_} AS BIGINT) AS recency_days,
         frequency, monetary_cents
  FROM m, g
)
SELECT c_custkey, recency_days, frequency, monetary_cents,
  CAST(ntile({_RFM_K}) OVER (ORDER BY recency_days, c_custkey) AS BIGINT)
    AS r_score,
  CAST(ntile({_RFM_K}) OVER (ORDER BY frequency DESC, c_custkey) AS BIGINT)
    AS f_score,
  CAST(ntile({_RFM_K}) OVER (ORDER BY monetary_cents DESC, c_custkey)
    AS BIGINT) AS m_score
FROM r
"""


# ---------------------------------------------------------------------------
# peak concurrency (distributed sweep line) + robust MAD outliers (wave 52)
# ---------------------------------------------------------------------------

_PC_WINDOW_US = 30 * 60 * 1_000_000  # 30-minute sessions
_PC_SHIFT = 36  # sweep bucket width = 2^36 us ≈ 19.1 h


def peak_concurrency(sf_dir: str):
    """Maximum number of concurrently open sessions and the earliest
    instant it is reached — the classic sweep-line capacity audit, with
    each event opening a half-open session [ts, ts+30min). Returns ONE
    row (peak, first_t_us).

    Distributed exact prefix sum (the pack_chunks device): every event
    emits (+1 at ts, −1 at ts+W) sweep points bucketed by time range
    (t >> _PC_SHIFT — range partitioning, so bucket order IS time
    order); each bucket sorts locally by (t, delta) (delta −1 first:
    half-open intervals don't overlap end-to-start) and reports its
    delta total, its max running prefix, and the first t attaining it —
    O(buckets) integers to the driver, which offsets them by the
    exclusive totals and picks the global peak (earliest bucket, then
    earliest t, wins ties). Sweep points never leave their bucket."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg  # noqa: F401

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["ts"])

    def sweep(t: pa.Table) -> pa.Table:
        us = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        ts_all = np.r_[us, us + _PC_WINDOW_US]
        d_all = np.r_[
            np.ones(len(us), dtype=np.int64),
            -np.ones(len(us), dtype=np.int64),
        ]
        return pa.table(
            {
                "t": pa.array(ts_all, type=pa.int64()),
                "d": pa.array(d_all, type=pa.int64()),
                "b": pa.array(ts_all >> _PC_SHIFT, type=pa.int64()),
            }
        )

    def bucket_stats(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t))  # -1 sorts before +1 at equal t
        t_s, d_s = t[order], d[order]
        c = np.cumsum(d_s)
        am = int(np.argmax(c))  # first index attaining the local max
        return pa.table(
            {
                "b": pa.array([int(g.column("b")[0].as_py())], type=pa.int64()),
                "total": pa.array([int(c[-1])], type=pa.int64()),
                "max_prefix": pa.array([int(c[am])], type=pa.int64()),
                "t_at_max": pa.array([int(t_s[am])], type=pa.int64()),
            }
        )

    stats = (
        ds.map_batches(sweep, batch_format="pyarrow", batch_size=65536)
        .groupby("b")
        .map_groups(bucket_stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    totals = stats["total"].to_numpy(dtype=np.int64)
    offs = np.cumsum(totals) - totals  # exclusive prefix of earlier buckets
    global_max = offs + stats["max_prefix"].to_numpy(dtype=np.int64)
    peak = int(global_max.max())
    first_idx = int(np.argmax(global_max == peak))  # earliest bucket wins
    return pd.DataFrame(
        {
            "peak": np.array([peak], dtype=np.int64),
            "first_t_us": np.array(
                [int(stats["t_at_max"].iloc[first_idx])], dtype=np.int64
            ),
        }
    )


PEAK_CONCURRENCY_SQL = f"""
WITH pts AS (
  SELECT epoch_us(ts) AS t, CAST(1 AS BIGINT) AS d FROM events
  UNION ALL
  SELECT epoch_us(ts) + {_PC_WINDOW_US}, CAST(-1 AS BIGINT) FROM events
),
sw AS (
  SELECT t, sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS c
  FROM pts
)
SELECT CAST(max(c) AS BIGINT) AS peak,
       CAST(min(t) FILTER (c = (SELECT max(c) FROM sw)) AS BIGINT)
         AS first_t_us
FROM sw
"""


def robust_outliers(sf_dir: str):
    """Robust outlier screen per event type: exact median and MAD
    (median absolute deviation, both percentile_disc-at-0.5 = the value
    at rank ceil(n/2)) of value cents, and the count of rows with
    |cents − med| > 3·MAD — the scale-free alternative to a z-score
    that one giant outlier cannot poison. Returns (event_type,
    med_cents, mad_cents, n_outliers).

    One type-hash co-group (the events_percent_rank shape — the type
    dimension bounds group sizes); each group resolves median, MAD and
    the outlier count with two numpy sorts, all integers."""
    N_PARTS = 8

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.functions.hashing import text_hash64

        et = batch.column("event_type").to_pylist()
        h = text_hash64(et).view(np.int64) & np.int64(0x7FFFFFFF)
        return batch.append_column(
            "__part", pa.array(h % N_PARTS, type=pa.int64())
        )

    def screen(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "med_cents": pa.array([], type=pa.int64()),
                    "mad_cents": pa.array([], type=pa.int64()),
                    "n_outliers": pa.array([], type=pa.int64()),
                }
            )
        et = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        cents = _cents(g.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((cents, et))
        et_s, c_s = et[order], cents[order]
        starts = np.flatnonzero(np.r_[True, et_s[1:] != et_s[:-1]])
        sizes = np.diff(np.r_[starts, len(et_s)])
        types, meds, mads, outs = [], [], [], []
        for s, n in zip(starts, sizes):
            vals = c_s[s : s + n]  # already sorted within the type
            med = int(vals[(n + 1) // 2 - 1])
            ad = np.sort(np.abs(vals - med))
            mad = int(ad[(n + 1) // 2 - 1])
            types.append(et_s[s])
            meds.append(med)
            mads.append(mad)
            outs.append(int((ad > 3 * mad).sum()))
        return pa.table(
            {
                "event_type": pa.array(types, type=pa.string()),
                "med_cents": pa.array(meds, type=pa.int64()),
                "mad_cents": pa.array(mads, type=pa.int64()),
                "n_outliers": pa.array(outs, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(screen, batch_format="pyarrow")
    )


ROBUST_OUTLIERS_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
med AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
  FROM c GROUP BY 1
),
dev AS (
  SELECT c.event_type, abs(c.cents - m.med) AS ad, m.med
  FROM c JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type, CAST(max(d.med) AS BIGINT) AS med_cents,
       CAST(max(m.mad) AS BIGINT) AS mad_cents,
       CAST(coalesce(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# grouped mode (wave 53)
# ---------------------------------------------------------------------------


def grouped_mode(sf_dir: str):
    """MODE per group — the most frequent value cents per event type
    under the total (count desc, cents asc) tie-break, with its
    occurrence count: the missing classic aggregate (SQL mode() with a
    deterministic tie rule). Returns (event_type, mode_cents,
    n_occurrences).

    One O(distinct (type, cents)) grouped-count shuffle; after it every
    (type, cents) is ONE row, so a per-block top-1 per type is a sound
    superset and the driver merges O(blocks × types) rows."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(
                    _cents(t.column("value").to_numpy(zero_copy_only=False)),
                    type=pa.int64(),
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["event_type", "cents"],
        {"n": ("one", "sum")},
        num_parts=8,
    )

    def top1(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, -n, et))
        et_s = et[order]
        first = np.r_[True, et_s[1:] != et_s[:-1]]
        idx = order[first]
        return pa.table(
            {
                "event_type": pa.array(et[idx].tolist(), type=pa.string()),
                "cents": pa.array(c[idx], type=pa.int64()),
                "n": pa.array(n[idx], type=pa.int64()),
            }
        )

    parts = counts.map_batches(top1, batch_format="pyarrow").to_pandas()
    best = (
        parts.sort_values(["event_type", "n", "cents"],
                          ascending=[True, False, True])
        .groupby("event_type", as_index=False)
        .first()
    )
    out = pd.DataFrame(
        {
            "event_type": best["event_type"],
            "mode_cents": best["cents"].astype(np.int64),
            "n_occurrences": best["n"].astype(np.int64),
        }
    )
    return out.reset_index(drop=True)


GROUPED_MODE_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
n AS (
  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS n
  FROM c GROUP BY 1, 2
),
r AS (
  SELECT event_type, cents, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, cents) AS rn
  FROM n
)
SELECT event_type, cents AS mode_cents, n AS n_occurrences
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# ROWS-frame moving average + ship-lag histogram (wave 54)
# ---------------------------------------------------------------------------

_MA_WINDOW = 4  # trailing ROWS window (current + 3 preceding)


def events_moving_avg(sf_dir: str):
    """Trailing ROWS-frame moving average — AVG(value) OVER (PARTITION
    BY user ORDER BY ts, event_id ROWS 3 PRECEDING) — the row-count
    window sibling of the time-based sliding window already covered.
    Exact integers: ma_micro = (window cents sum · 1e6) // window size
    (truncating division matching DuckDB's //; sums are int64 cents, so
    the result is bit-stable under any block structure). Returns
    (event_id, user_id, ma_micro).

    One user-hash co-group; each bucket resolves every user with one
    lexsort + cumsum-minus-shifted-cumsum — the prefix-difference
    kernel, no per-row loop."""
    N_PARTS = 16
    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array((uid % N_PARTS).astype(np.int64), type=pa.int64())
        )

    def ma(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "ma_micro": pa.array([], type=pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        cents = _cents(g.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, c_s = uid[order], eid[order], cents[order]
        starts = np.flatnonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])
        sizes = np.diff(np.r_[starts, len(uid_s)])
        gstart = np.repeat(starts, sizes)  # each row's user-start index
        pos = np.arange(len(uid_s), dtype=np.int64) - gstart
        cs = np.cumsum(c_s)
        prev = np.r_[np.int64(0), cs[:-1]]
        upfx = cs - prev[gstart]  # per-user inclusive prefix sum
        # trailing window of size min(pos+1, W): subtract the prefix W
        # rows back within the user (0 when the window reaches the start)
        lag = pos - _MA_WINDOW
        lag_val = np.where(lag >= 0, upfx[gstart + np.maximum(lag, 0)], 0)
        win_sum = upfx - lag_val
        w = np.minimum(pos + 1, _MA_WINDOW)
        ma_micro = np.empty(len(win_sum), dtype=np.int64)
        for k in range(1, _MA_WINDOW + 1):
            m = w == k
            ma_micro[m] = _trunc_div_arr(win_sum[m] * 1_000_000, k)
        return pa.table(
            {
                "event_id": pa.array(eid_s, type=pa.int64()),
                "user_id": pa.array(uid_s, type=pa.int64()),
                "ma_micro": pa.array(ma_micro, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(ma, batch_format="pyarrow")
    )


EVENTS_MOVING_AVG_SQL = f"""
WITH w AS (
  SELECT event_id, user_id,
         sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS {_MA_WINDOW - 1} PRECEDING) AS s,
         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS {_MA_WINDOW - 1} PRECEDING) AS c
  FROM events
)
SELECT event_id, user_id, CAST(s * 1000000 // c AS BIGINT) AS ma_micro
FROM w
"""


_SL_DAY_US = 86_400_000_000


def ship_lag_hist(sf_dir: str):
    """Order-to-ship lag histogram per order priority — the fulfilment
    SLA audit, and the registry's dedicated FACT-to-FACT join histogram
    (lineitem ⋈ orders on orderkey, both sides too big to broadcast):
    lag_days = (l_shipdate − o_orderdate) // 1 day (truncating, matching
    DuckDB). Returns (o_orderpriority, lag_days, n_lineitems).

    One partitioned hash join on orderkey (both sides hash-bucketed —
    nothing broadcast) + an O(priorities × lags) grouped count."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        us = (
            t.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pa.array(us, type=pa.int64()),
            }
        )

    def o_prep(t: pa.Table) -> pa.Table:
        us = (
            t.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "order_us": pa.array(us, type=pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow", batch_size=65536),
        orders.map_batches(o_prep, batch_format="pyarrow", batch_size=65536),
        left_on=["l_orderkey"],
        right_on=["o_orderkey"],
        num_parts=16,
    )

    def lag(t: pa.Table) -> pa.Table:
        d = _trunc_div_arr(
            t.column("ship_us").to_numpy(zero_copy_only=False)
            - t.column("order_us").to_numpy(zero_copy_only=False),
            _SL_DAY_US,
        )
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "lag_days": pa.array(d, type=pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return grouped_agg(
        joined.map_batches(lag, batch_format="pyarrow"),
        ["o_orderpriority", "lag_days"],
        {"n_lineitems": ("one", "sum")},
        num_parts=4,
    )


SHIP_LAG_HIST_SQL = f"""
SELECT o_orderpriority,
       CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate)) // {_SL_DAY_US}
            AS BIGINT) AS lag_days,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# streaming watermark audit + table fingerprints (wave 56)
# ---------------------------------------------------------------------------

_WM_LATENESS_US = 3_600_000_000  # allowed lateness: 1 h
_WM_SHIFT = 16  # arrival buckets: 2^16 event_ids per sweep bucket


def watermark_audit(sf_dir: str):
    """Streaming watermark / late-data audit: treating event_id as the
    ARRIVAL order and ts as event time, a row is LATE when its event
    time sits more than the allowed lateness (1 h) behind the watermark
    — the running max event time over everything that arrived strictly
    before it. Returns ONE row (n_events, n_late, max_lag_us) with
    max_lag_us the worst watermark lag observed (0 if arrivals are in
    order) — the exact out-of-orderness audit every event-time streaming
    pipeline runs to size its watermark delay.

    Distributed exact prefix-MAX, two passes (the grouped_percentiles
    offset device, with max for sum): pass 1 reduces each arrival-range
    bucket (event_id >> 16 — bucket order IS arrival order) to its max
    ts, and the driver forms the exclusive running max = the watermark
    ENTERING each bucket (O(buckets) integers); pass 2 re-groups the
    same buckets, seeds each bucket's running max with its incoming
    watermark, and emits O(1) (n, n_late, max_lag) partials. Rows never
    leave their bucket; the driver holds bucket scalars only."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_us": pa.array(ts, type=pa.int64()),
                "__b": pa.array(eid >> _WM_SHIFT, type=pa.int64()),
            }
        )

    tagged = pin(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536),
        "wm_tagged",
    )
    bmaxes = (
        grouped_agg(tagged, ["__b"], {"bmax": ("ts_us", "max")}, num_parts=4)
        .to_pandas()
        .sort_values("__b")
        .reset_index(drop=True)
    )
    run = np.maximum.accumulate(bmaxes["bmax"].to_numpy(dtype=np.int64))
    _NO_WM = -(1 << 62)  # "no watermark yet" sentinel (lags stay negative)
    wm_in = {
        int(b): (int(run[i - 1]) if i else _NO_WM)
        for i, b in enumerate(bmaxes["__b"])
    }
    def audit(g: pa.Table) -> pa.Table:
        wm_map = wm_in  # O(buckets) closure — see the rfm_segments note
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")  # event_ids unique
        ts_s = ts[order]
        seed = wm_map[int(g.column("__b")[0].as_py())]
        prev = np.r_[np.int64(seed), np.maximum.accumulate(ts_s)[:-1]]
        prev = np.maximum(prev, np.int64(seed))
        lag = prev - ts_s
        return pa.table(
            {
                "n": pa.array([len(ts_s)], type=pa.int64()),
                "n_late": pa.array(
                    [int((lag > _WM_LATENESS_US).sum())], type=pa.int64()
                ),
                "max_lag": pa.array(
                    [int(max(int(lag.max()), 0))], type=pa.int64()
                ),
            }
        )

    parts = (
        tagged.groupby("__b")
        .map_groups(audit, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_events": np.array([int(parts["n"].sum())], dtype=np.int64),
            "n_late": np.array([int(parts["n_late"].sum())], dtype=np.int64),
            "max_lag_us": np.array(
                [int(parts["max_lag"].max()) if len(parts) else 0],
                dtype=np.int64,
            ),
        }
    )


WATERMARK_AUDIT_SQL = f"""
WITH w AS (
  SELECT ts,
         max(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS wm
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(sum(CASE WHEN wm - epoch_us(ts) > {_WM_LATENESS_US}
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late,
       CAST(greatest(coalesce(max(wm - epoch_us(ts)), 0), 0) AS BIGINT)
         AS max_lag_us
FROM w
"""


# order-independent per-table content fingerprints: sum of a keyed
# multiplicative mix mod the Mersenne prime 2^61-1 — any row order /
# block structure gives the same digest, and the expression is plain
# integer arithmetic both engines evaluate exactly
_FP_MOD = (1 << 61) - 1
_FP_MIX = 2_654_435_761  # Knuth multiplicative constant
_FP_TABLES = [
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("customer", "c_custkey"),
    ("events", "event_id"),
]


def table_fingerprint(sf_dir: str):
    """Anti-entropy table fingerprints — the replication/transfer
    verification primitive: per table an ORDER-INDEPENDENT digest
    fp = Σ_rows ((key · 2654435761 + 1) mod (2^61−1)) mod (2^61−1) over
    the table's primary key column, plus the exact row count. Two
    replicas disagree ⇒ fingerprints differ (up to the prime-modulus
    collision bound). Returns (tbl, n_rows, fp).

    One streaming pass per table emitting an O(1) partial (count, exact
    sum of per-element truncated mods, hi/lo-split across two int64s)
    per block; the driver recombines O(blocks) rows in Python ints and
    applies ONE truncated mod — the exact shape of the SQL twin, so
    negative keys (DuckDB's % truncates toward zero; numpy/Python %
    floor) and any sign mix give identical digests."""
    rows = []
    for tbl, key in _FP_TABLES:
        ds = _read_pq(f"{sf_dir}/{tbl}.parquet", columns=[key])

        def partial(t: pa.Table, _k=key) -> pa.Table:
            v = t.column(_k).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(v) and (
                int(v.min()) < 0 or int(v.max()) > (2**63 - 2) // _FP_MIX
            ):
                # negative keys (DuckDB % truncates; numpy % floors) or
                # keys wide enough for the int64 product to wrap — exact
                # Python-int path with truncated-mod semantics
                s = 0
                for x in v.tolist():
                    m = x * _FP_MIX + 1
                    e = m % _FP_MOD
                    if m < 0 and e:
                        e -= _FP_MOD  # floored -> truncated
                    s += e
            else:
                mixed = (v * _FP_MIX + 1) % _FP_MOD
                # vectorized exact sum: split each value (< 2^61) into
                # 32-bit halves — both int64 partial sums stay far below
                # 2^63 for any batch size up to 2^18 rows, then recombine
                # in Python ints (dividends >= 1 here, so floored ==
                # truncated per element)
                s = int((mixed & 0xFFFFFFFF).sum()) + (
                    int((mixed >> 32).sum()) << 32
                )
            # exact block sum (|s| < 65536 * 2^61 ~ 2^77) split across two
            # int64 columns; floored divmod keeps lo in [0, 2^62)
            s_hi, s_lo = divmod(int(s), 1 << 62)
            return pa.table(
                {
                    "n": pa.array([t.num_rows], type=pa.int64()),
                    "s_hi": pa.array([s_hi], type=pa.int64()),
                    "s_lo": pa.array([s_lo], type=pa.int64()),
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=65536
        ).to_pandas()
        total = sum(
            (int(h) << 62) + int(lo)
            for h, lo in zip(parts["s_hi"], parts["s_lo"])
        )
        fp = total % _FP_MOD
        if total < 0 and fp:
            fp -= _FP_MOD  # DuckDB's % truncates toward zero
        rows.append((tbl, int(parts["n"].sum()), int(fp)))
    out = pd.DataFrame(rows, columns=["tbl", "n_rows", "fp"])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["fp"] = out["fp"].astype(np.int64)
    return out


TABLE_FINGERPRINT_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{tbl}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum((CAST({key} AS HUGEINT) * {_FP_MIX} + 1) % {_FP_MOD})
            % {_FP_MOD} AS BIGINT) AS fp
FROM {tbl}"""
    for tbl, key in _FP_TABLES
)


# ---------------------------------------------------------------------------
# rolling active users + week-over-week revenue growth (wave 57)
# ---------------------------------------------------------------------------

_WAU_WINDOW = 7  # trailing window in days
_WEEK_US_ = 7 * 86_400_000_000


def rolling_active_users(sf_dir: str):
    """Trailing 7-day active users per day — the WAU dashboard series,
    exact: for every day d that any user's activity window covers, the
    number of distinct users active in [d−6, d]. Returns (day, wau).

    Shape: one distinct (user, day) shuffle (O(users × active days) —
    the corpus never moves), a ≤7× flat-map expansion of each active
    day into the windows it serves, a second distinct to collapse
    multi-activity windows, and an O(days) grouped count. Every step is
    a bounded-fanout streaming pass — no per-day rescan."""
    from osmwaterwayextractor_ray.stages.fastagg import distinct, grouped_agg

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pa.array(_trunc_div_arr(ts, _DAY_US_), type=pa.int64()),
            }
        )

    ud = distinct(
        ds.map_batches(days, batch_format="pyarrow", batch_size=65536),
        ["user_id", "day"],
        num_parts=16,
    )

    def expand(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        n = len(uid)
        reps = np.repeat(np.arange(_WAU_WINDOW, dtype=np.int64), n)
        return pa.table(
            {
                "user_id": pa.array(np.tile(uid, _WAU_WINDOW), type=pa.int64()),
                "wday": pa.array(np.tile(day, _WAU_WINDOW) + reps, type=pa.int64()),
            }
        )

    uw = distinct(
        ud.map_batches(expand, batch_format="pyarrow", batch_size=16384),
        ["user_id", "wday"],
        num_parts=16,
    )
    return grouped_agg(
        uw.map_batches(
            lambda t: pa.table(
                {
                    "day": t["wday"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["day"],
        {"wau": ("one", "sum")},
        num_parts=8,
    )


ROLLING_ACTIVE_USERS_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US_} AS day FROM events
),
w AS (
  SELECT DISTINCT user_id, day + g.i AS wday
  FROM ud, UNNEST(generate_series(0, {_WAU_WINDOW - 1})) AS g(i)
)
SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau
FROM w GROUP BY 1
"""


def revenue_wow(sf_dir: str):
    """Week-over-week revenue growth — weekly order revenue (exact
    cents) with the previous week's revenue and the integer ppm delta
    ((cur − prev)·1e6 // prev; NULL for the first week and after gap
    weeks, mirroring a strict LAG over observed weeks only). Returns
    (week, total_cents, prev_cents, wow_ppm).

    One O(weeks) grouped sum; the LAG chain runs on the driver over
    O(weeks) integers (big-int ppm so cents·1e6 cannot wrap)."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def weeks(t: pa.Table) -> pa.Table:
        us = (
            t.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "week": pa.array(
                    _trunc_div_arr(us, _WEEK_US_), type=pa.int64()
                ),
                "cents": pa.array(
                    _cents(
                        t.column("o_totalprice").to_numpy(zero_copy_only=False)
                    ),
                    type=pa.int64(),
                ),
            }
        )

    wk = (
        grouped_agg(
            ds.map_batches(weeks, batch_format="pyarrow", batch_size=65536),
            ["week"],
            {"total_cents": ("cents", "sum")},
            num_parts=4,
        )
        .to_pandas()
        .sort_values("week")
        .reset_index(drop=True)
    )
    wk["week"] = wk["week"].astype(np.int64)
    wk["total_cents"] = wk["total_cents"].astype(np.int64)
    prev, ppm = [], []
    for i in range(len(wk)):
        if i and int(wk["week"].iloc[i]) == int(wk["week"].iloc[i - 1]) + 1:
            p = int(wk["total_cents"].iloc[i - 1])
            prev.append(p)
            # _trunc_div: negative deltas must truncate like DuckDB //
            ppm.append(
                _trunc_div((int(wk["total_cents"].iloc[i]) - p) * 1_000_000, p)
            )
        else:
            prev.append(None)
            ppm.append(None)
    # float64-with-NaN (DuckDB's own fetchdf convention for a nullable
    # BIGINT) — the pandas Int64 extension dtype breaks numpy consumers
    wk["prev_cents"] = np.array(
        [np.nan if p is None else float(p) for p in prev], dtype=np.float64
    )
    wk["wow_ppm"] = np.array(
        [np.nan if p is None else float(p) for p in ppm], dtype=np.float64
    )
    return wk


REVENUE_WOW_SQL = f"""
WITH w AS (
  SELECT epoch_us(o_orderdate) // {_WEEK_US_} AS week,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1
),
l AS (
  SELECT week, total_cents,
         lag(week) OVER (ORDER BY week) AS pw,
         lag(total_cents) OVER (ORDER BY week) AS pc
  FROM w
)
SELECT week, total_cents,
       CASE WHEN pw = week - 1 THEN pc END AS prev_cents,
       CASE WHEN pw = week - 1 THEN
         CAST((CAST(total_cents AS HUGEINT) - pc) * 1000000 // pc AS BIGINT)
       END AS wow_ppm
FROM l
"""
