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
    driver."""
    from osmwaterwayextractor_ray.stages.fastagg import distinct, grouped_agg

    rows = []
    for name, table, lhs, rhs in _FDS:
        pairs = distinct(
            _read_pq(f"{sf_dir}/{table}.parquet", columns=lhs + [rhs]),
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


FD_AUDIT_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{name}' AS fd, CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(coalesce(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_violating
FROM (
  SELECT {', '.join(lhs)}, count(DISTINCT {rhs}) AS nd
  FROM {table} GROUP BY {', '.join(lhs)}
)"""
    for name, table, lhs, rhs in _FDS
)
