"""Data-quality / audit operator family — the profiling gates a
large-scale ingest pipeline runs before anything trains on the data:

  * table_profile — per-column profile (rows, nulls, distinct count,
    min/max) of the orders table: the ANALYZE/DESCRIBE-style statistics
    pass every warehouse exposes.
  * fd_audit      — functional-dependency audit: for declared candidate
    FDs ``lhs -> rhs``, the number of lhs values with more than one
    distinct rhs (0 violating = the FD holds; the PK check and the
    schema-inference primitive).
  * k_anonymity   — re-identification risk audit over quasi-identifier
    columns: equivalence-class sizes, k_min, and how much of the table
    sits in classes smaller than k.
  * key_skew_audit — shuffle-key skew profiler: exact heaviest keys +
    integer ppm share of the table — the hot-key detector a distributed
    engine runs before choosing a partitioning key (this repo's own
    salting stages are the consumers of exactly this signal).

All counts are exact int64; min/max travel typed (numeric vs string
channels) through the partials and are projected to VARCHAR only at the
end, so engine and DuckDB twin agree byte-for-byte. Values never reach
the driver: every op reduces to O(columns), O(groups) or O(blocks × k)
skinny rows before anything is collected.

No reference counterpart (the reference has no relational surface);
these generalize SURVEY §2.5-2.6 the way the north star needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)


def _cents(x: np.ndarray) -> np.ndarray:
    return np.round(x * 100.0).astype(np.int64)


# ---------------------------------------------------------------------------
# table_profile (wave 47)
# ---------------------------------------------------------------------------

# (column, kind): kind 'int' profiles the raw int64, 'cents' profiles
# round(x*100) int64 cents, 'str' profiles the string bytes.
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_totalprice", "cents"),
]


def table_profile(sf_dir: str):
    """Per-column statistics profile of orders — (col, n_rows, n_nulls,
    n_distinct, min_val, max_val) with min/max rendered as VARCHAR
    (numeric columns profile their exact int64/cents value, string
    columns their binary-order min/max; n_distinct excludes NULLs, the
    SQL count(DISTINCT) convention).

    One streaming pass emits O(columns) typed partial rows per batch
    (numeric and string min/max travel in separate channels so '10' can
    never sort below '9'); a tiny grouped combine reduces them. Distinct
    counts run one O(distinct) shuffle per column over the single
    projected column — the corpus itself is read once per column and
    never collected."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import distinct, grouped_agg

    cols = [c for c, _ in _PROFILE_COLS]
    ds = _read_pq(f"{sf_dir}/orders.parquet", columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        mins_i, maxs_i, mins_s, maxs_s = [], [], [], []
        for col, kind in _PROFILE_COLS:
            arr = t.column(col)
            names.append(col)
            ns.append(t.num_rows)
            nulls.append(arr.null_count)
            if kind == "str":
                mm = pc.min_max(arr)
                mins_i.append(None)
                maxs_i.append(None)
                mins_s.append(mm["min"].as_py())
                maxs_s.append(mm["max"].as_py())
            else:
                v = arr.drop_null().to_numpy(zero_copy_only=False)
                if kind == "cents":
                    v = _cents(v)
                mins_i.append(int(v.min()) if len(v) else None)
                maxs_i.append(int(v.max()) if len(v) else None)
                mins_s.append(None)
                maxs_s.append(None)
        return pa.table(
            {
                "col": pa.array(names, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "n_nulls": pa.array(nulls, type=pa.int64()),
                "min_i": pa.array(mins_i, type=pa.int64()),
                "max_i": pa.array(maxs_i, type=pa.int64()),
                "min_s": pa.array(mins_s, type=pa.string()),
                "max_s": pa.array(maxs_s, type=pa.string()),
            }
        )

    combined = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["col"],
        {
            "n_rows": ("n", "sum"),
            "n_nulls": ("n_nulls", "sum"),
            "min_i": ("min_i", "min"),
            "max_i": ("max_i", "max"),
            "min_s": ("min_s", "min"),
            "max_s": ("max_s", "max"),
        },
        num_parts=1,
    ).to_pandas()

    n_distinct = {}
    for col, kind in _PROFILE_COLS:
        one = _read_pq(f"{sf_dir}/orders.parquet", columns=[col])
        if kind == "cents":
            one = one.map_batches(
                lambda t, _c=col: pa.table(
                    {_c: pa.array(_cents(
                        t.column(_c).drop_null().to_numpy(zero_copy_only=False)
                    ), type=pa.int64())}
                ),
                batch_format="pyarrow",
                batch_size=65536,
            )
        else:
            one = one.map_batches(
                lambda t, _c=col: t.filter(pc.is_valid(t.column(_c))),
                batch_format="pyarrow",
                batch_size=65536,
            )
        n_distinct[col] = distinct(one, [col], num_parts=8).count()

    rows = []
    kinds = dict(_PROFILE_COLS)
    for _, r in combined.iterrows():
        col = r["col"]
        if kinds[col] == "str":
            mn, mx = r["min_s"], r["max_s"]
        else:
            mn = None if pd.isna(r["min_i"]) else str(int(r["min_i"]))
            mx = None if pd.isna(r["max_i"]) else str(int(r["max_i"]))
        rows.append(
            (col, int(r["n_rows"]), int(r["n_nulls"]), n_distinct[col], mn, mx)
        )
    out = pd.DataFrame(
        rows, columns=["col", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"]
    ).sort_values("col").reset_index(drop=True)
    for c in ("n_rows", "n_nulls", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out


def _profile_select(col: str, kind: str) -> str:
    expr = (
        f"CAST(round({col} * 100) AS BIGINT)" if kind == "cents" else col
    )
    return f"""
SELECT '{col}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       CAST(min({expr}) AS VARCHAR) AS min_val,
       CAST(max({expr}) AS VARCHAR) AS max_val
FROM orders"""


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    _profile_select(c, k) for c, k in _PROFILE_COLS
)


# ---------------------------------------------------------------------------
# fd_audit (wave 47)
# ---------------------------------------------------------------------------

# (name, table, lhs columns, rhs column) — candidate dependencies: the
# first is the declared PK (must hold), the others are the
# schema-inference candidates a profiler would test.
_FDS = [
    ("l_orderkey,l_linenumber->l_partkey", "lineitem",
     ["l_orderkey", "l_linenumber"], "l_partkey"),
    ("l_partkey->l_suppkey", "lineitem", ["l_partkey"], "l_suppkey"),
    ("l_orderkey->l_returnflag", "lineitem", ["l_orderkey"], "l_returnflag"),
]


def fd_audit(sf_dir: str):
    """Functional-dependency audit: for each candidate FD ``lhs -> rhs``
    report the number of distinct lhs values and how many of them map to
    MORE than one distinct rhs (violations; 0 = the dependency holds).
    Returns (fd, n_lhs, n_violating), one row per candidate.

    Per FD: one distinct (lhs, rhs) shuffle (O(distinct pairs) rows
    move, never the table), a grouped count per lhs, and an O(blocks)
    partial reduction of the two counters — values never reach the
    driver.

    NULL contract (explicit on BOTH sides, the host_keywords lesson):
    rows with a NULL anywhere in the dependency are excluded — a NULL
    lhs has no identity to violate and a missing rhs is not evidence
    either way. (fastagg's distinct keeps NULL rhs while SQL's
    count(DISTINCT) drops it, and grouped_agg drops NULL lhs keys while
    GROUP BY keeps them — filtering up front keeps the engines
    agreeing on any data shape.)"""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import distinct, grouped_agg

    rows = []
    for name, table, lhs, rhs in _FDS:

        def drop_nulls(t: pa.Table, _cols=tuple(lhs + [rhs])) -> pa.Table:
            mask = None
            for c in _cols:
                v = pc.is_valid(t.column(c))
                mask = v if mask is None else pc.and_(mask, v)
            return t.filter(mask)

        pairs = distinct(
            _read_pq(
                f"{sf_dir}/{table}.parquet", columns=lhs + [rhs]
            ).map_batches(drop_nulls, batch_format="pyarrow", batch_size=65536),
            lhs + [rhs],
            num_parts=16,
        )

        def ones(t: pa.Table, _lhs=tuple(lhs)) -> pa.Table:
            return pa.table(
                {
                    **{c: t[c] for c in _lhs},
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )

        per_lhs = grouped_agg(
            pairs.map_batches(ones, batch_format="pyarrow"),
            lhs,
            {"nd": ("one", "sum")},
            num_parts=8,
        )

        def fold(t: pa.Table) -> pa.Table:
            nd = t.column("nd").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_lhs": pa.array([len(nd)], type=pa.int64()),
                    "n_violating": pa.array(
                        [int((nd > 1).sum())], type=pa.int64()
                    ),
                }
            )

        parts = per_lhs.map_batches(fold, batch_format="pyarrow").to_pandas()
        rows.append(
            (name, int(parts["n_lhs"].sum()), int(parts["n_violating"].sum()))
        )
    out = pd.DataFrame(rows, columns=["fd", "n_lhs", "n_violating"])
    out["n_lhs"] = out["n_lhs"].astype(np.int64)
    out["n_violating"] = out["n_violating"].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# k_anonymity (wave 48)
# ---------------------------------------------------------------------------

_KA_QI = ["c_nationkey", "c_mktsegment"]  # quasi-identifier columns
_KA_K = 5


def k_anonymity(sf_dir: str):
    """k-anonymity audit over the customer quasi-identifiers
    (nationkey, mktsegment) — the privacy gate a training-data release
    runs: every row in an equivalence class smaller than k is
    re-identifiable to within that class. Returns ONE row:
    (n_rows, n_classes, k_min, n_rows_below_k, n_classes_below_k) with
    k = 5.

    One grouped count over the QI columns (O(classes) rows move, never
    the table) + an O(blocks) fold of five integer counters."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    ds = _read_pq(f"{sf_dir}/customer.parquet", columns=_KA_QI)

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                **{c: t[c] for c in _KA_QI},
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    classes = grouped_agg(
        ds.map_batches(ones, batch_format="pyarrow", batch_size=65536),
        _KA_QI,
        {"n": ("one", "sum")},
        num_parts=8,
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        below = n < _KA_K
        return pa.table(
            {
                "n_rows": pa.array([int(n.sum())], type=pa.int64()),
                "n_classes": pa.array([len(n)], type=pa.int64()),
                "k_min": pa.array(
                    [int(n.min()) if len(n) else None], type=pa.int64()
                ),
                "n_rows_below_k": pa.array(
                    [int(n[below].sum())], type=pa.int64()
                ),
                "n_classes_below_k": pa.array(
                    [int(below.sum())], type=pa.int64()
                ),
            }
        )

    parts = classes.map_batches(fold, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame(
        {
            "n_rows": [int(parts["n_rows"].sum())],
            "n_classes": [int(parts["n_classes"].sum())],
            "k_min": [int(parts["k_min"].min())],
            "n_rows_below_k": [int(parts["n_rows_below_k"].sum())],
            "n_classes_below_k": [int(parts["n_classes_below_k"].sum())],
        }
    )
    return out.astype(np.int64)


K_ANONYMITY_SQL = f"""
WITH g AS (
  SELECT {', '.join(_KA_QI)}, count(*) AS n FROM customer GROUP BY ALL
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(n) AS BIGINT) AS k_min,
       CAST(coalesce(sum(n) FILTER (n < {_KA_K}), 0) AS BIGINT)
         AS n_rows_below_k,
       CAST(coalesce(count(*) FILTER (n < {_KA_K}), 0) AS BIGINT)
         AS n_classes_below_k
FROM g
"""


# ---------------------------------------------------------------------------
# key_skew_audit (wave 48)
# ---------------------------------------------------------------------------

_SKEW_TOPK = 10


def key_skew_audit(sf_dir: str):
    """Shuffle-key skew profiler for lineitem.l_partkey — the hot-key
    audit a distributed engine runs before picking a partitioning key
    (this repo's own salting stages consume exactly this signal).
    Returns the exact _SKEW_TOPK heaviest keys under the total
    (count desc, key asc) order as (rank, l_partkey, n_rows, share_ppm)
    with share_ppm = n·1e6 // total — integer parts-per-million, no
    float shares.

    One O(distinct keys) grouped-count shuffle; after it each key is
    ONE row, so a per-block partial top-k is a sound superset and the
    driver merges O(blocks × k) rows plus O(blocks) total partials —
    the table itself never moves."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg
    from osmwaterwayextractor_ray.stages.pin import pin

    ds = _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])

    counts = pin(
        grouped_agg(
            ds.map_batches(
                lambda t: pa.table(
                    {
                        "l_partkey": t["l_partkey"],
                        "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
                batch_size=65536,
            ),
            ["l_partkey"],
            {"n": ("one", "sum")},
            num_parts=8,
        ),
        "skew_counts",
    )

    def partial_top(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -n))[:_SKEW_TOPK]
        # first row carries the block's count total so the driver can
        # reconstruct the exact grand total from O(blocks) integers
        bt = np.zeros(len(order), dtype=np.int64)
        if len(order):
            bt[0] = int(n.sum())
        return pa.table(
            {
                "l_partkey": pa.array(k[order], type=pa.int64()),
                "n": pa.array(n[order], type=pa.int64()),
                "block_total": pa.array(bt, type=pa.int64()),
            }
        )

    parts = counts.map_batches(
        partial_top, batch_format="pyarrow"
    ).to_pandas()
    total = int(parts["block_total"].sum())
    top = parts.sort_values(
        ["n", "l_partkey"], ascending=[False, True]
    ).head(_SKEW_TOPK)
    out = pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "l_partkey": top["l_partkey"].to_numpy(dtype=np.int64),
            "n_rows": top["n"].to_numpy(dtype=np.int64),
            "share_ppm": (
                top["n"].to_numpy(dtype=np.int64) * 1_000_000 // total
            ),
        }
    )
    return out.reset_index(drop=True)


KEY_SKEW_AUDIT_SQL = f"""
WITH c AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
r AS (
  SELECT l_partkey, n,
         row_number() OVER (ORDER BY n DESC, l_partkey) AS rank
  FROM c
)
SELECT CAST(rank AS BIGINT) AS rank, l_partkey, n AS n_rows,
       CAST(n * 1000000 // t.total AS BIGINT) AS share_ppm
FROM r, t WHERE rank <= {_SKEW_TOPK}
"""


FD_AUDIT_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{name}' AS fd, CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(coalesce(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_violating
FROM (
  SELECT {', '.join(lhs)}, count(DISTINCT {rhs}) AS nd
  FROM {table}
  WHERE {' AND '.join(c + ' IS NOT NULL' for c in lhs + [rhs])}
  GROUP BY {', '.join(lhs)}
)"""
    for name, table, lhs, rhs in _FDS
)


# ---------------------------------------------------------------------------
# column_correlations (wave 53)
# ---------------------------------------------------------------------------

# (name, column, integer grid): correlation is scale-invariant, so each
# column picks the coarsest grid that keeps it exact — price in whole
# dollars (not cents) keeps every later product inside the HUGEINT/
# big-int budgets documented below.
_CC_COLS = [
    ("qty", "l_quantity", 1),
    ("price", "l_extendedprice", 1),
    ("disc", "l_discount", 100),
    ("tax", "l_tax", 100),
]


def column_correlations(sf_dir: str):
    """Pairwise Pearson-correlation audit across the lineitem numeric
    columns — the data-profiling pass that catches redundant /
    leaking features before anything trains. ALL-INTEGER contract
    (no float sqrt to drift): per pair, with exact moments
    num = n·Sxy − Sx·Sy, da = n·Sxx − Sx², db = n·Syy − Sy²,

        r2_ppm = sign(num) · (num² // max(da·db // 1e6, 1))

    — i.e. signed r² in parts-per-million, computed with the identical
    integer expression on both engines (Python big ints here, HUGEINT
    in the twin). Returns (pair, n, r2_ppm), one row per column pair.

    Shape: ONE streaming pass emits a 15-integer moment row per block
    (the price_model device); the driver folds O(blocks) rows in Python
    ints. Budgets (fail-loud): the per-batch partials accumulate in
    float64 BLAS, exact only while rows·max(x)² < 2^53 (price ≤ ~1.1e5
    on the dollar grid → 65536-row batches sit at ~7e14); num² and
    da·db stay under HUGEINT because the dollar grid caps num at ~2e18
    for n ≤ 1e6 rows."""
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=[c for _, c, _ in _CC_COLS]
    )
    k = len(_CC_COLS)
    iu, ju = np.triu_indices(k, 1)

    def moments(t: pa.Table) -> pa.Table:
        cols = []
        for _, col, grid in _CC_COLS:
            v = t.column(col).to_numpy(zero_copy_only=False)
            if v.size and v.min() < 0:
                # floor(v+0.5) is half-away only for non-negative values;
                # the four configured columns are all >= 0 (fail-loud)
                raise ValueError(f"column_correlations: negative {col}")
            # half-AWAY-from-zero to match DuckDB round() — np.round is
            # half-to-even and provably diverges on exact .5 grid points
            # (l_extendedprice has .50 rows; ADVICE r4)
            cols.append(np.floor(v * grid + 0.5).astype(np.int64))
        x = np.stack(cols, axis=1).astype(np.float64)
        mx = float(np.abs(x).max(initial=0.0))
        # the partials accumulate in float64 BLAS, exact only below 2^53
        # (the pca_project bound — NOT int64's 2^62)
        if t.num_rows * mx * mx >= 2**53:
            raise ValueError("column_correlations: per-batch budget exceeded")
        m = x.T @ x  # exact: bounded above
        s = x.sum(axis=0)
        names = (
            ["n"]
            + [f"s_{i}" for i in range(k)]
            + [f"m_{i}_{i}" for i in range(k)]
            + [f"m_{a}_{b}" for a, b in zip(iu, ju)]
        )
        vals = (
            [t.num_rows]
            + [int(v) for v in s]
            + [int(m[i, i]) for i in range(k)]
            + [int(m[a, b]) for a, b in zip(iu, ju)]
        )
        return pa.table(
            {
                "key": pa.array(names, type=pa.string()),
                "v": pa.array(vals, type=pa.int64()),
            }
        )

    parts = ds.map_batches(
        moments, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    # fold in Python ints: per-block partials are bounded by 2^62, so an
    # int64 (pandas) sum across blocks could wrap silently
    tot: dict[str, int] = {}
    for key, v in zip(parts["key"], parts["v"]):
        tot[key] = tot.get(key, 0) + int(v)

    n = tot["n"]
    rows = []
    for a, b in zip(iu, ju):
        num = n * tot[f"m_{a}_{b}"] - tot[f"s_{a}"] * tot[f"s_{b}"]
        da = n * tot[f"m_{a}_{a}"] - tot[f"s_{a}"] ** 2
        db = n * tot[f"m_{b}_{b}"] - tot[f"s_{b}"] ** 2
        r2 = num * num // max(da * db // 1_000_000, 1)
        rows.append(
            (
                f"{_CC_COLS[a][0]}~{_CC_COLS[b][0]}",
                n,
                (-r2 if num < 0 else r2),
            )
        )
    out = pd.DataFrame(rows, columns=["pair", "n", "r2_ppm"])
    out["n"] = out["n"].astype(np.int64)
    out["r2_ppm"] = out["r2_ppm"].astype(np.int64)
    return out


def _cc_sql() -> str:
    exprs = [
        f"CAST(round({col} * {grid}) AS HUGEINT) AS x{i}"
        for i, (_, col, grid) in enumerate(_CC_COLS)
    ]
    k = len(_CC_COLS)
    iu, ju = np.triu_indices(k, 1)
    sums = (
        ["CAST(count(*) AS HUGEINT) AS n"]
        + [f"sum(x{i}) AS s{i}" for i in range(k)]
        + [f"sum(x{i} * x{i}) AS m{i}{i}" for i in range(k)]
        + [f"sum(x{a} * x{b}) AS m{a}{b}" for a, b in zip(iu, ju)]
    )
    selects = []
    for a, b in zip(iu, ju):
        pair = f"{_CC_COLS[a][0]}~{_CC_COLS[b][0]}"
        selects.append(f"""
SELECT '{pair}' AS pair, CAST(n AS BIGINT) AS n,
  CAST(CASE WHEN n * m{a}{b} - s{a} * s{b} < 0 THEN
    -((n * m{a}{b} - s{a} * s{b}) * (n * m{a}{b} - s{a} * s{b})
      // greatest((n * m{a}{a} - s{a} * s{a}) * (n * m{b}{b} - s{b} * s{b})
                  // 1000000, 1))
  ELSE
    (n * m{a}{b} - s{a} * s{b}) * (n * m{a}{b} - s{a} * s{b})
      // greatest((n * m{a}{a} - s{a} * s{a}) * (n * m{b}{b} - s{b} * s{b})
                  // 1000000, 1)
  END AS BIGINT) AS r2_ppm
FROM g""")
    return (
        "WITH raw AS (SELECT "
        + ", ".join(exprs)
        + " FROM lineitem),\ng AS (SELECT "
        + ", ".join(sums)
        + " FROM raw)\n"
        + "\nUNION ALL\n".join(selects)
    )


COLUMN_CORRELATIONS_SQL = _cc_sql()


# ---------------------------------------------------------------------------
# rebalance_audit (wave 59)
# ---------------------------------------------------------------------------

_RB_P_OLD, _RB_P_NEW = 16, 24  # worker counts before/after the reshard
_RB_VNODES = 8  # virtual nodes per worker on the ring
_RB_MIX = 11_400_714_819_323_198_485  # 2^64/phi (Fibonacci hashing)
_RB_WRAP = 1 << 64
_RB_HALF = (1 << 63) - 1


def _rb_point(k: np.ndarray) -> np.ndarray:
    """Fibonacci-hash ring point in [0, 2^63): (k·(2^64/φ) mod 2^64) &
    (2^63−1) — the golden-ratio constant wraps mod 2^64 for every k ≥ 2,
    so points are equidistributed, not monotone (a small constant left
    products unwrapped and the ring degenerated to worker order — caught
    by the brute-force test). numpy uint64 wrap == the twin's explicit
    mod 2^64."""
    return ((k.astype(np.uint64) * np.uint64(_RB_MIX)) & np.uint64(_RB_HALF)).astype(
        np.int64
    )


def _rb_ring(p: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (point, worker) ring for p workers × _RB_VNODES replicas."""
    w = np.repeat(np.arange(p, dtype=np.int64), _RB_VNODES)
    r = np.tile(np.arange(_RB_VNODES, dtype=np.int64), p)
    pt = _rb_point(w * 1_000_003 + r * 7_919 + 1)
    order = np.lexsort((w, pt))
    return pt[order], w[order]


def rebalance_audit(sf_dir: str):
    """Reshard data-movement audit — the partition-planning question a
    distributed engine answers before changing cluster size from 16 to
    24 workers: how many keys change owner under (a) mod-N partitioning
    (key % P — almost everything moves) vs (b) a consistent-hash ring
    (P × 8 virtual nodes; only the arc fraction moves, ≈ 1 − P/P').
    Runs over the distinct lineitem part keys. Returns one row per
    scheme: (scheme, n_keys, n_moved, moved_ppm).

    One O(distinct keys) shuffle; the ring (a few hundred (point,
    worker) pairs) closes over the streaming ownership kernel — per-key
    work is one vectorized searchsorted; counters fold O(blocks)
    integers on the driver. The ring point and tie rule ((point, worker)
    ascending, wrap to the ring minimum) are shared exactly with the
    SQL twin."""
    from osmwaterwayextractor_ray.stages.fastagg import distinct

    keys = distinct(
        _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]),
        ["l_partkey"],
        num_parts=8,
    )
    ring_old = _rb_ring(_RB_P_OLD)
    ring_new = _rb_ring(_RB_P_NEW)

    def owners(pt: np.ndarray, ring: tuple[np.ndarray, np.ndarray]) -> np.ndarray:
        rpt, rw = ring
        idx = np.searchsorted(rpt, pt, side="left")
        return rw[np.where(idx == len(rpt), 0, idx)]  # wrap to ring min

    def fold(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        moved_mod = int(((k % _RB_P_OLD) != (k % _RB_P_NEW)).sum())
        pt = _rb_point(k)
        moved_ring = int(
            (owners(pt, ring_old) != owners(pt, ring_new)).sum()
        )
        return pa.table(
            {
                "n": pa.array([len(k)], type=pa.int64()),
                "moved_mod": pa.array([moved_mod], type=pa.int64()),
                "moved_ring": pa.array([moved_ring], type=pa.int64()),
            }
        )

    parts = keys.map_batches(fold, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    rows = [
        ("mod", n, int(parts["moved_mod"].sum())),
        ("ring", n, int(parts["moved_ring"].sum())),
    ]
    out = pd.DataFrame(rows, columns=["scheme", "n_keys", "n_moved"])
    out["n_keys"] = out["n_keys"].astype(np.int64)
    out["n_moved"] = out["n_moved"].astype(np.int64)
    out["moved_ppm"] = (
        out["n_moved"].astype(np.int64) * 1_000_000 // max(n, 1)
    ).astype(np.int64)
    return out


def _rb_sql() -> str:
    def ring_cte(name: str, p: int) -> str:
        return f"""{name} AS (
  SELECT w.w AS w,
         ((CAST(w.w * 1000003 + r.r * 7919 + 1 AS HUGEINT) * {_RB_MIX})
          % {_RB_WRAP}) % {_RB_HALF + 1} AS pt
  FROM UNNEST(generate_series(0, {p - 1})) AS w(w),
       UNNEST(generate_series(0, {_RB_VNODES - 1})) AS r(r)
)"""

    def owner(ring: str) -> str:
        return f"""coalesce(
      (SELECT w FROM {ring} WHERE pt >= k.pt ORDER BY pt, w LIMIT 1),
      (SELECT w FROM {ring} ORDER BY pt, w LIMIT 1))"""

    return f"""
WITH keys AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
{ring_cte('ring_old', _RB_P_OLD)},
{ring_cte('ring_new', _RB_P_NEW)},
kp AS (
  SELECT k, ((CAST(k AS HUGEINT) * {_RB_MIX}) % {_RB_WRAP}) % {_RB_HALF + 1}
           AS pt
  FROM keys
),
own AS (
  SELECT k.k, k.pt,
         {owner('ring_old')} AS w_old,
         {owner('ring_new')} AS w_new
  FROM kp k
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(CASE WHEN k % {_RB_P_OLD} <> k % {_RB_P_NEW}
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS moved_mod,
         CAST(coalesce(sum(CASE WHEN w_old <> w_new THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS moved_ring
  FROM own
)
SELECT 'mod' AS scheme, n AS n_keys, moved_mod AS n_moved,
       CAST(moved_mod * 1000000 // greatest(n, 1) AS BIGINT) AS moved_ppm
FROM agg
UNION ALL
SELECT 'ring', n, moved_ring,
       CAST(moved_ring * 1000000 // greatest(n, 1) AS BIGINT)
FROM agg
"""


REBALANCE_AUDIT_SQL = _rb_sql()


# ---------------------------------------------------------------------------
# incremental materialized-view maintenance (wave 60)
# ---------------------------------------------------------------------------

_VM_SPLIT = "1998-06-01"  # base/delta boundary (mid-range of l_shipdate)


def view_maintenance(sf_dir: str):
    """Incremental materialized-view maintenance (the warehouse IVM
    primitive): the view SELECT returnflag, linestatus, count, sum(qty),
    sum(cents), min(cents), max(cents) is kept up to date by MERGING the
    already-materialized base partition (shipdate < 1998-06-01) with the
    newly-arrived delta partition — never recomputing over the base.
    Every aggregate is mergeable (sum/count add, min/max fold), so
    merge(agg(base), agg(delta)) == agg(base ∪ delta) exactly; the
    returned table is the maintained view, and the SQL twin recomputes
    from scratch — hash-equality IS the IVM correctness proof.

    Shape: ONE scan of lineitem (prep tags each row is_base from the
    shipdate — every row belongs to exactly one side, so no filter and
    no second pass; ADVICE r4 flagged the old two-scan form), one
    grouped partial keyed (returnflag, linestatus, is_base) producing
    the per-side O(groups) summaries, and one tiny grouped combine over
    the 2 real keys — that second aggregate IS the IVM merge (extra key
    columns are ignored by grouped_agg's kernel). At 100 TB the base
    summary is a persisted O(groups) table and only the delta is
    scanned; `merge_view_summaries` below is the reusable merge step."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    split_us = int(np.datetime64(_VM_SPLIT, "us").astype(np.int64))
    keys = ["l_returnflag", "l_linestatus"]

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=keys + ["l_shipdate", "l_quantity", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        us = (
            t.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        cents = _cents(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "is_base": pa.array(
                    (us < split_us).astype(np.int64), type=pa.int64()
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "qty": pa.array(
                    np.round(
                        t.column("l_quantity").to_numpy(zero_copy_only=False)
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
                "cents": pa.array(cents, type=pa.int64()),
                "min_c": pa.array(cents, type=pa.int64()),
                "max_c": pa.array(cents, type=pa.int64()),
            }
        )

    summaries = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        keys + ["is_base"],
        {
            "n_rows": ("one", "sum"),
            "sum_qty": ("qty", "sum"),
            "sum_cents": ("cents", "sum"),
            "min_cents": ("min_c", "min"),
            "max_cents": ("max_c", "max"),
        },
        num_parts=4,
    )
    # the merge step: fold the per-side summaries over the 2 real keys
    return grouped_agg(
        summaries,
        keys,
        {
            "n_rows": ("n_rows", "sum"),
            "sum_qty": ("sum_qty", "sum"),
            "sum_cents": ("sum_cents", "sum"),
            "min_cents": ("min_cents", "min"),
            "max_cents": ("max_cents", "max"),
        },
        num_parts=1,
    )


def merge_view_summaries(base, delta):
    """The IVM merge step: combine two O(groups) view summaries with the
    aggregates' own merge functions (sums/counts add, min/max fold) —
    usable for any number of incremental delta batches."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    both = base.union(delta)
    return grouped_agg(
        both,
        ["l_returnflag", "l_linestatus"],
        {
            "n_rows": ("n_rows", "sum"),
            "sum_qty": ("sum_qty", "sum"),
            "sum_cents": ("sum_cents", "sum"),
            "min_cents": ("min_cents", "min"),
            "max_cents": ("max_cents", "max"),
        },
        num_parts=1,
    )


VIEW_MAINTENANCE_SQL = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM lineitem GROUP BY 1, 2
"""
