"""Second batch of oracle-checked relational/text/embedding queries:
multi-way broadcast joins, date bucketing, JSON-prop extraction, global
token top-k, vector norms. Each has a DuckDB oracle in __ray_entry__."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osmwaterwayextractor_ray.stages._pool import pool_max
from osmwaterwayextractor_ray.stages.fastagg import grouped_agg


def q3_top_revenue(sf_dir: str):
    """TPC-H Q3 shape: customer(segment) ⨝ orders(date<) ⨝ lineitem(ship>)
    → revenue per order → top 10. Both dimension sides broadcast."""
    import ray
    import ray.data as rd

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    building = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cut = np.datetime64("1995-03-15", "us")
    sel = orders[(orders["o_custkey"].isin(building)) & (orders["o_orderdate"].values < cut)]
    okeys_ref = ray.put(set(sel["o_orderkey"]))

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        okeys = _ray.get(okeys_ref)
        df = batch.to_pandas()
        df = df[(df["l_shipdate"].values > cut) & df["l_orderkey"].isin(okeys)]
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("l_orderkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = grouped_agg(partials, ["l_orderkey"], {"revenue": ("revenue", "sum")})

    def round_rev(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("revenue"), "revenue", pc.round(t["revenue"], 2)
        )

    return (
        agg.map_batches(round_rev, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )


Q3_TOP_REVENUE_SQL = """
SELECT l.l_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q6_revenue(sf_dir: str):
    """Single-row filtered aggregate (TPC-H Q6 shape)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    lo = np.datetime64("1994-01-01", "us")
    hi = np.datetime64("1995-01-01", "us")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = (
            (df["l_shipdate"].values >= lo)
            & (df["l_shipdate"].values < hi)
            & (df["l_discount"] >= 0.05)
            & (df["l_discount"] <= 0.07)
            & (df["l_quantity"] < 24)
        )
        return pa.table({"r": [float((df.loc[m, "l_extendedprice"] * df.loc[m, "l_discount"]).sum())]})

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).aggregate(
        Sum("r", alias_name="revenue")
    )
    # integer cents: robust to last-ulp float-sum differences vs the oracle
    cents = int(np.rint(float(agg["revenue"] or 0.0) * 100))
    return pd.DataFrame([{"revenue_cents": cents}])


Q6_REVENUE_SQL = """
SELECT CAST(round(coalesce(sum(l_extendedprice * l_discount), 0) * 100) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def events_props_sum(sf_dir: str):
    """JSON property extraction: parse props='{"k": N}' per event, sum k by
    event_type (stateless vectorized-ish map + small grouped sum)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        ks = np.fromiter(
            (json.loads(p)["k"] for p in batch.column("props").to_pylist()),
            dtype=np.int64,
            count=len(types),
        )
        df = pd.DataFrame({"event_type": types, "k": ks, "one": 1})
        g = df.groupby("event_type", as_index=False).agg(
            sum_k=("k", "sum"), n=("one", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))
    )


EVENTS_PROPS_SUM_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def top_tokens(sf_dir: str, k: int = 20):
    """Global token frequency top-k over documents (partial counts per
    batch → hash-bucket combine → sort+limit)."""
    import ray.data as rd

    from osmwaterwayextractor_ray.functions.text import tokenize

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tokenize(t or ""))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    agg = grouped_agg(partials, ["token"], {"n_occurrences": ("n", "sum")})
    return agg.sort(["n_occurrences", "token"], descending=[True, False]).limit(k)


TOP_TOKENS_SQL = r"""
SELECT t AS token, count(*) AS n_occurrences
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'), x -> x <> '')) AS t
  FROM documents
)
GROUP BY t ORDER BY n_occurrences DESC, token LIMIT 20
"""


def orders_monthly(sf_dir: str):
    """Event-time month bucketing: count + sum per (year, month)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["year"] = df["o_orderdate"].dt.year.astype(np.int64)
        df["month"] = df["o_orderdate"].dt.month.astype(np.int64)
        g = df.groupby(["year", "month"], as_index=False).agg(
            n_orders=("o_totalprice", "size"), total=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["year", "month"])
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total", alias_name="total"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("total"),
                "total",
                pc.cast(pc.round(pc.multiply(t["total"], pa.scalar(100.0)), 0), pa.int64()),
            ).rename_columns(["year", "month", "n_orders", "total_cents"]),
            batch_format="pyarrow",
        )
    )


ORDERS_MONTHLY_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS month,
       count(*) AS n_orders, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_cents
FROM orders GROUP BY 1, 2
"""


def supplier_region_rollup(sf_dir: str):
    """3-level dimension rollup (supplier ⨝ nation ⨝ region), all
    broadcast — no shuffle at all."""
    import ray.data as rd
    import ray

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put((n2r, r2name))

    supp = _read_pq(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])

    def roll(batch: pa.Table) -> pa.Table:
        import ray as _ray

        n2r_, r2name_ = _ray.get(lookup_ref)
        df = batch.to_pandas()
        # two chained dict maps (C-level), not a per-row Python lambda
        df["r_name"] = df["s_nationkey"].map(n2r_).map(r2name_)
        g = df.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_acctbal", "size"), total_acctbal=("s_acctbal", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    return (
        supp.map_batches(roll, batch_format="pyarrow", batch_size=65536)
        .groupby("r_name")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("total_acctbal", alias_name="total_acctbal"),
        )
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("total_acctbal"),
                "total_acctbal",
                pc.cast(pc.round(pc.multiply(t["total_acctbal"], pa.scalar(100.0)), 0), pa.int64()),
            ).rename_columns(["r_name", "n_suppliers", "total_acctbal_cents"]),
            batch_format="pyarrow",
        )
    )


SUPPLIER_REGION_ROLLUP_SQL = """
SELECT r.r_name, count(*) AS n_suppliers, CAST(round(sum(s.s_acctbal) * 100) AS BIGINT) AS total_acctbal_cents
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q5_local_supplier_volume(sf_dir: str, region_name: str = "ASIA"):
    """TPC-H Q5 shape — the 6-table join: revenue per nation where the
    customer and the supplier sit in the SAME nation of one region, over
    a one-year order window. The canonical mixed join plan:

      region/nation (25+5 rows) -> driver dicts, ray.put broadcast
      (fixed-size dims — the CLAUDE.md broadcast budget);
      customer & supplier (dataset-sized) -> broadcast-FILTERED to the
      region's nations inside map_batches, then partitioned hash joins;
      orders date-filtered at the read -> ⨝ customer on custkey;
      lineitem -> ⨝ that on orderkey; per-(suppkey, nationkey) partial
      pre-aggregation BEFORE the supplier join shrinks the fact stream
      to O(suppliers) rows; final same-nation filter + nation rollup.

    Revenue is rounded to integer cents at the end (the q6 discipline:
    robust to last-ulp float-sum ordering)."""
    import ray
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkey = int(region.loc[region["r_name"] == region_name, "r_regionkey"].iloc[0])
    nat = nation[nation["n_regionkey"] == rkey]
    lookup_ref = ray.put(
        (set(nat["n_nationkey"].astype(int)), dict(zip(nat["n_nationkey"], nat["n_name"])))
    )

    def _in_region(key_col: str):
        def f(batch: pa.Table) -> pa.Table:
            import ray as _ray

            keys, _ = _ray.get(lookup_ref)
            k = batch.column(key_col).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(k, list(keys))))

        return f

    cust = _read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_in_region("c_nationkey"), batch_format="pyarrow", batch_size=65536)

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")
    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def date_window(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((d >= lo) & (d < hi))).select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(date_window, batch_format="pyarrow", batch_size=65536)
    # pinned: feeds the Bloom build and the lineitem join. All three
    # joins below have UNIQUE-keyed right sides (custkey, orderkey,
    # suppkey), so they use the Arrow-native lookup_join (searchsorted
    # + take per bucket, no pandas merge).
    oc = lookup_join(
        orders, cust, "o_custkey", "c_custkey", {"c_nationkey": "c_nationkey"}
    ).materialize()

    # Bloom semi-join prefilter for the fact table, built DISTRIBUTEDLY
    # (per-batch partial filters OR-merged on the driver — the driver
    # holds one O(capacity)-bit array, never the key set): only ~the
    # surviving fraction of lineitem enters the partitioned join, and
    # Bloom false positives are harmless because the join itself is the
    # exact check.
    from osmwaterwayextractor_ray.functions.bloom import BloomFilter

    n_keys = max(oc.count(), 1)

    def partial_bloom(batch: pa.Table) -> pa.Table:
        b = BloomFilter(n_keys)
        b.add(batch.column("o_orderkey").to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([b.bits.tobytes()], type=pa.binary())})

    bf = BloomFilter(n_keys)
    for r in oc.map_batches(partial_bloom, batch_format="pyarrow", batch_size=65536).take_all():
        bf.bits |= np.frombuffer(r["bits"], dtype=bf.bits.dtype)
    bf_ref = ray.put(bf)

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def semi(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bf_ = _ray.get(bf_ref)
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bf_.contains(keys)))

    li = li.map_batches(semi, batch_format="pyarrow", batch_size=65536)

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "rev": r,
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow", batch_size=65536)
    lioc = lookup_join(li, oc, "l_orderkey", "o_orderkey", {"c_nationkey": "c_nationkey"})

    # shrink to O(suppliers x nations-in-region) before the supplier join.
    # per_supp has ONE consumer, so instead of a defensive materialize
    # (r3's fix for the schema-probe double execution) the next join gets
    # an EXPLICIT left_schema — the probe never fires and the whole tail
    # (lineitem join -> pre-agg -> supplier join -> rollup) streams in a
    # single executor launch (r4: one barrier fewer, measured faster).
    import pyarrow.parquet as pq

    per_supp = grouped_agg(lioc, ["l_suppkey", "c_nationkey"], {"rev": ("rev", "sum")})
    li_sch = pq.read_schema(f"{sf_dir}/lineitem.parquet")
    cu_sch = pq.read_schema(f"{sf_dir}/customer.parquet")
    per_supp_schema = pa.schema(
        [
            pa.field("l_suppkey", li_sch.field("l_suppkey").type),
            pa.field("c_nationkey", cu_sch.field("c_nationkey").type),
            pa.field("rev", pa.float64()),
        ]
    )

    supp = _read_pq(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_in_region("s_nationkey"), batch_format="pyarrow", batch_size=65536)
    js = lookup_join(per_supp, supp, "l_suppkey", "s_suppkey", {"s_nationkey": "s_nationkey"},
                     left_schema=per_supp_schema)

    def same_nation(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["c_nationkey"], batch["s_nationkey"])
        return batch.filter(keep).select(["c_nationkey", "rev"])

    local = js.map_batches(same_nation, batch_format="pyarrow", batch_size=65536)
    per_nation = grouped_agg(local, ["c_nationkey"], {"revenue": ("rev", "sum")})

    def finish(batch: pa.Table) -> pa.Table:
        import ray as _ray

        _, n2name = _ray.get(lookup_ref)
        df = batch.to_pandas()
        df["n_name"] = df["c_nationkey"].map(n2name)
        df["revenue_cents"] = np.rint(df["revenue"].to_numpy() * 100).astype(np.int64)
        return pa.Table.from_pandas(
            df[["n_name", "revenue_cents"]], preserve_index=False
        ).replace_schema_metadata(None)

    return per_nation.map_batches(finish, batch_format="pyarrow", batch_size=65536)


Q5_SQL = """
SELECT n_name,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""


def customers_no_orders(sf_dir: str):
    """Distributed anti-join (NOT IN): customers with NO order in the
    1996H1 window. One cogroup shuffle, per-bucket np.isin — neither
    side is driver-resident (fastagg.anti_join)."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.fastagg import anti_join

    cust = _read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = _read_pq(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-07-01", "us")

    def window(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((d >= lo) & (d < hi))).select(["o_custkey"])

    orders = orders.map_batches(window, batch_format="pyarrow", batch_size=65536)
    return anti_join(cust, orders, "c_custkey", "o_custkey")


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
)
"""


def events_top3_per_user(sf_dir: str, k: int = 3):
    """Grouped top-k window (row_number <= k per user by (ts DESC,
    event_id) — the dense total tie-break makes the result set
    deterministic): per-batch partial top-k per user shrinks the stream,
    then one hash-bucket shuffle resolves the per-user top-k with a
    single lexsort per bucket — no per-user map_groups calls."""
    import ray.data as rd

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    N_PARTS = 32

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = (
            df.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, True])
            .groupby("user_id", sort=False)
            .head(k)
        )
        df["__part"] = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) % np.uint64(N_PARTS)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def topk(g: pd.DataFrame) -> pa.Table:
        g = (
            g.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, True])
            .groupby("user_id", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(
            g[["user_id", "ts", "event_id", "value"]], preserve_index=False
        ).replace_schema_metadata(None)

    return parts.groupby("__part").map_groups(topk, batch_format="pandas")


EVENTS_TOP3_SQL = """
SELECT user_id, ts, event_id, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) <= 3
"""


def part_type_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Mean

    ds = _read_pq(f"{sf_dir}/part.parquet", columns=["p_type", "p_retailprice"])
    return (
        ds.groupby("p_type")
        .aggregate(Count(alias_name="n_parts"), Mean("p_retailprice", alias_name="avg_price"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("avg_price"), "avg_price", pc.round(t["avg_price"], 4)
            ),
            batch_format="pyarrow",
        )
    )


PART_TYPE_STATS_SQL = """
SELECT p_type, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
FROM part GROUP BY p_type
"""


def embed_norms(sf_dir: str):
    import ray.data as rd

    from osmwaterwayextractor_ray.pipelines.embeddings import _emb_matrix

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "l2_norm": pa.array(
                    np.round(np.sqrt((mat * mat).sum(axis=1)), 6), type=pa.float64()
                ),
            }
        )

    return ds.map_batches(norms, batch_format="pyarrow", batch_size=8192)


EMBED_NORMS_SQL = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(range(1, 65),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
"""


def purchase_attribution(sf_dir: str):
    """As-of join within the events stream: for every 'purchase', the most
    recent prior 'click' of the same user (classic attribution). Per-user
    co-group (hash-bucketed) + pandas merge_asof over the sorted group —
    the as-of pattern from the Ray guide. Ties on identical timestamps
    resolved toward the click with the largest event_id among the latest.
    Output: purchase event_id, user_id, attributed click event_id (or -1)."""
    import ray.data as rd

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = batch.filter(
            _pc.is_in(batch["event_type"], value_set=pa.array(["purchase", "click"]))
        )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array((uid % 16).astype(np.int64), type=pa.int64()))

    def asof(g: pa.Table) -> pa.Table:
        # one packed-key searchsorted over the whole bucket (no per-user
        # loop): key = user_id << 51 | ts_us (ts_us < 2^51, user ids are
        # small), clicks sorted by (key, event_id) — searchsorted 'right'
        # minus one lands on the LAST click with key <= (user, ts), which
        # is the max event_id among the latest ts, the documented
        # tie-break; a uid mismatch at the landing index means the user
        # has no prior click -> -1.
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        is_click = pc.equal(g["event_type"], "click").to_numpy(zero_copy_only=False)
        is_purch = pc.equal(g["event_type"], "purchase").to_numpy(zero_copy_only=False)
        key = (uid << np.int64(51)) | ts
        ck, ce, cu = key[is_click], eid[is_click], uid[is_click]
        o = np.lexsort((ce, ck))
        ck, ce, cu = ck[o], ce[o], cu[o]
        pk, pe, pu = key[is_purch], eid[is_purch], uid[is_purch]
        idx = np.searchsorted(ck, pk, side="right") - 1
        ok = idx >= 0
        safe = np.clip(idx, 0, None)
        ok &= (cu[safe] == pu) if len(cu) else False
        attributed = np.where(ok, ce[safe] if len(ce) else -1, -1)
        return pa.table(
            {
                "purchase_id": pa.array(pe, type=pa.int64()),
                "user_id": pa.array(pu, type=pa.int64()),
                "click_id": pa.array(attributed, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(asof, batch_format="pyarrow")
    )


PURCHASE_ATTRIBUTION_SQL = """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id,
       coalesce((
         SELECT c.click_id FROM c
         WHERE c.user_id = p.user_id AND c.ts <= p.ts
         ORDER BY c.ts DESC, c.click_id DESC LIMIT 1
       ), -1) AS click_id
FROM p
"""


def events_sliding_window(sf_dir: str):
    """Sliding 2-hour windows stepping hourly: each event lands in two
    windows (flat emission inside map_batches), counts + value sums per
    (window_start, event_type)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def emit(batch: pa.Table) -> pa.Table:
        # exact integer cents (value carries two decimals by construction):
        # partial sums are bit-identical under any block structure, and the
        # hash-bucket combine (fastagg) replaces the native per-group
        # finalize (~130 us x 3.6k groups)
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = np.floor(ts_us.astype(np.float64) / 3600e6).astype(np.int64)
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        et = batch.column("event_type")
        et2 = pa.concat_arrays([et.combine_chunks(), et.combine_chunks()])
        return pa.table(
            {
                "window_start": pa.array(np.concatenate([hour, hour - 1]), type=pa.int64()),
                "event_type": et2,
                "cents": pa.array(np.concatenate([cents, cents]), type=pa.int64()),
                "one": pa.array(np.ones(2 * len(hour), dtype=np.int64)),
            }
        )

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    agg = grouped_agg(
        ds.map_batches(emit, batch_format="pyarrow", batch_size=65536),
        ["window_start", "event_type"],
        {"n_events": ("one", "sum"), "cents": ("cents", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t["window_start"],
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pc.round(pc.divide(pc.cast(t["cents"], pa.float64()), 100.0), 4),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_SLIDING_WINDOW_SQL = """
SELECT w AS window_start, event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM (
  SELECT unnest(ARRAY[
           CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 3600000000) AS BIGINT),
           CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 3600000000) AS BIGINT) - 1
         ]) AS w,
         event_type, value
  FROM events
)
GROUP BY 1, 2
"""


def urgent_lineitems(sf_dir: str):
    """Semi-join via a broadcast Bloom filter: lineitems of URGENT orders.
    The Bloom prefilter (1% FPR) drops ~non-matching rows inside
    map_batches; survivors are verified exactly against the key set (at
    web scale the exact check becomes a partitioned hash join over the
    ~1% survivors — functions/bloom.py documents the budget math)."""
    import ray
    import ray.data as rd

    from osmwaterwayextractor_ray.functions.bloom import BloomFilter

    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    urgent = orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_orderkey"].to_numpy()
    bf = BloomFilter(max(len(urgent), 1))
    if len(urgent):
        bf.add(urgent)
    exact = set(urgent.tolist())
    side_ref = ray.put((bf, exact))

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def semi(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bf_, exact_ = _ray.get(side_ref)
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        cand = bf_.contains(keys)
        if not cand.any():
            return batch.slice(0, 0)
        t = batch.filter(pa.array(cand))
        keys2 = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        verified = np.fromiter((int(k) in exact_ for k in keys2), dtype=bool, count=len(keys2))
        return t.filter(pa.array(verified))

    return li.map_batches(semi, batch_format="pyarrow", batch_size=65536)


URGENT_LINEITEMS_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)


def trade_flows(sf_dir: str):
    """TPC-H Q7-shaped nation x nation trade matrix: revenue flowing
    from every supplier nation to every customer nation (cross-nation
    pairs included — the inverse of q5's same-nation filter). Exact
    int64 arithmetic end-to-end: per-row revenue in 1e-4 units
    (cents·(100−d) is an exact integer < 1e9, so round() is exact) sums
    associatively, and the final cents conversion is one integer
    division — bit-identical under any block structure.

    Plan (the q5 machinery minus region/date/Bloom): orders ⨝ customer
    (lookup_join, unique custkey) -> lineitem ⨝ that (unique orderkey)
    -> pre-aggregate to O(suppliers x nations) BEFORE the supplier join
    -> one more lookup_join + an O(nations²) rollup; nation names attach
    from a 25-row broadcast dict. Explicit schemas keep the whole tail
    one streaming launch (no schema-probe re-execution)."""
    import pyarrow.parquet as pq
    import ray

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    nref = ray.put(n2name)

    orders = _read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    oc = lookup_join(
        orders, cust, "o_custkey", "c_custkey", {"c_nationkey": "c_nationkey"}
    )

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev4(batch: pa.Table) -> pa.Table:
        p = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = batch.column("l_discount").to_numpy(zero_copy_only=False)
        r = np.round(p * (1.0 - d) * 10_000.0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "r4": pa.array(r, type=pa.int64()),
            }
        )

    li = li.map_batches(rev4, batch_format="pyarrow", batch_size=65536)
    o_sch = pq.read_schema(f"{sf_dir}/orders.parquet")
    c_sch = pq.read_schema(f"{sf_dir}/customer.parquet")
    li_sch = pq.read_schema(f"{sf_dir}/lineitem.parquet")
    oc_schema = pa.schema(
        [
            pa.field("o_orderkey", o_sch.field("o_orderkey").type),
            pa.field("o_custkey", o_sch.field("o_custkey").type),
            pa.field("c_nationkey", c_sch.field("c_nationkey").type),
        ]
    )
    li_schema = pa.schema(
        [
            pa.field("l_orderkey", li_sch.field("l_orderkey").type),
            pa.field("l_suppkey", li_sch.field("l_suppkey").type),
            pa.field("r4", pa.int64()),
        ]
    )
    lioc = lookup_join(
        li, oc, "l_orderkey", "o_orderkey", {"c_nationkey": "c_nationkey"},
        left_schema=li_schema, right_schema=oc_schema,
    )
    per_supp = grouped_agg(
        lioc, ["l_suppkey", "c_nationkey"], {"r4": ("r4", "sum")}
    )
    supp = _read_pq(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    per_supp_schema = pa.schema(
        [
            pa.field("l_suppkey", li_sch.field("l_suppkey").type),
            pa.field("c_nationkey", c_sch.field("c_nationkey").type),
            pa.field("r4", pa.int64()),
        ]
    )
    js = lookup_join(
        per_supp, supp, "l_suppkey", "s_suppkey", {"s_nationkey": "s_nationkey"},
        left_schema=per_supp_schema,
    )
    flows = grouped_agg(
        js.map_batches(
            lambda t: t.select(["s_nationkey", "c_nationkey", "r4"]),
            batch_format="pyarrow",
        ),
        ["s_nationkey", "c_nationkey"],
        {"r4": ("r4", "sum")},
        num_parts=4,
    )

    def finish(t: pa.Table) -> pa.Table:
        names = ray.get(nref)
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        r4 = t.column("r4").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "supp_nation": pa.array(
                    [names[int(k)] for k in sn], type=pa.string()
                ),
                "cust_nation": pa.array(
                    [names[int(k)] for k in cn], type=pa.string()
                ),
                "revenue_cents": pa.array(r4 // 100, type=pa.int64()),
            }
        )

    return flows.map_batches(finish, batch_format="pyarrow")


TRADE_FLOWS_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) // 100 AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# greatest-per-group join + ratio-to-report share (wave 55)
# ---------------------------------------------------------------------------


def customer_best_order(sf_dir: str):
    """Greatest-one-per-group WITH dimension attach: each customer's
    single largest order (total cents desc, orderkey asc — a total key)
    joined to the customer dimension. Returns (c_custkey, c_name,
    c_mktsegment, o_orderkey, total_cents). Customers without orders
    don't appear (inner semantics).

    Per-block partial top-1 per customer (sound: order rows are unique),
    ONE customer-hash co-group finishes the argmax, then a partitioned
    hash join attaches the dimension — nothing broadcast, both sides
    hash-bucketed."""
    from osmwaterwayextractor_ray.stages.fastagg import hash_join

    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = _read_pq(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    )

    def top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], type=pa.int64()),
                    "o_orderkey": pa.array([], type=pa.int64()),
                    "total_cents": pa.array([], type=pa.int64()),
                }
            )
        ck = t.column("c_custkey" if "c_custkey" in t.column_names
                      else "o_custkey").to_numpy(zero_copy_only=False)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        c = (
            t.column("total_cents").to_numpy(zero_copy_only=False)
            if "total_cents" in t.column_names
            else np.round(
                t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
        )
        order = np.lexsort((ok, -c, ck))
        ck_s = ck[order]
        first = np.r_[True, ck_s[1:] != ck_s[:-1]]
        idx = order[first]
        return pa.table(
            {
                "c_custkey": pa.array(ck[idx], type=pa.int64()),
                "o_orderkey": pa.array(ok[idx], type=pa.int64()),
                "total_cents": pa.array(c[idx], type=pa.int64()),
            }
        )

    partial = orders.map_batches(top1, batch_format="pyarrow", batch_size=65536)

    def tag(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array((ck % 16).astype(np.int64), type=pa.int64())
        )

    best = (
        partial.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: top1(g.drop_columns(["__part"])), batch_format="pyarrow"
        )
        # lazy shuffle output feeding hash_join would pay the schema-probe
        # double execution (CLAUDE.md / NOTES_r3 #16); the argmax result
        # is O(customers) skinny rows — materialize it
        .materialize()
    )
    return hash_join(
        best,
        cust,
        on=["c_custkey"],
        num_parts=16,
    ).select_columns(
        ["c_custkey", "c_name", "c_mktsegment", "o_orderkey", "total_cents"]
    )


CUSTOMER_BEST_ORDER_SQL = """
WITH r AS (
  SELECT o_custkey AS c_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY round(o_totalprice * 100) DESC,
                                     o_orderkey) AS rn
  FROM orders
)
SELECT r.c_custkey, c.c_name, c.c_mktsegment, r.o_orderkey, r.total_cents
FROM r JOIN customer c ON c.c_custkey = r.c_custkey
WHERE rn = 1
"""


def brand_revenue_share(sf_dir: str):
    """Ratio-to-report: each part brand's share of its type's revenue —
    the windowed share-of-total every BI layer ships (SUM OVER PARTITION
    ratio), exact: revenue in 1e-4 units (cents·(100−disc_pct), the
    trade_flows device) and share_ppm = brand·1e6 // type_total.
    Returns (p_type, p_brand, rev_1e4, share_ppm).

    One partitioned hash join (lineitem ⋈ part on partkey — nothing
    broadcast), an O(types × brands) grouped sum, and the per-type
    totals ride an O(cells) second aggregate joined back by type."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    part = _read_pq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type", "p_brand"]
    )

    def rev(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc = np.round(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "rev_1e4": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    joined = hash_join(
        li.map_batches(rev, batch_format="pyarrow", batch_size=65536),
        part,
        left_on=["l_partkey"],
        right_on=["p_partkey"],
        num_parts=16,
    )
    cells = grouped_agg(
        joined.map_batches(
            lambda t: pa.table(
                {
                    "p_type": t["p_type"],
                    "p_brand": t["p_brand"],
                    "rev_1e4": t["rev_1e4"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["p_type", "p_brand"],
        {"rev_1e4": ("rev_1e4", "sum")},
        num_parts=4,
    ).to_pandas()
    # Python big ints for the ppm ratio: rev·1e6 can exceed int64 (the
    # SQL twin widens to HUGEINT for the same step)
    totals = {
        t: int(g.sum()) for t, g in cells.groupby("p_type")["rev_1e4"]
    }
    cells["share_ppm"] = np.array(
        [
            int(r) * 1_000_000 // totals[t]
            for t, r in zip(cells["p_type"], cells["rev_1e4"])
        ],
        dtype=np.int64,
    )
    cells["rev_1e4"] = cells["rev_1e4"].astype(np.int64)
    return cells.reset_index(drop=True)


BRAND_REVENUE_SHARE_SQL = """
WITH c AS (
  SELECT p_type, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rev_1e4
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
)
SELECT p_type, p_brand, rev_1e4,
       CAST(CAST(rev_1e4 AS HUGEINT) * 1000000
            // sum(CAST(rev_1e4 AS HUGEINT)) OVER (PARTITION BY p_type)
            AS BIGINT) AS share_ppm
FROM c
"""
