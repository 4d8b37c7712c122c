"""Vectorized high-cardinality grouped aggregation / co-grouped join.

Ray 2.49's ``groupby().aggregate()`` finalizes per group in Python
(~130 µs/group measured — 27 s for a 190k-group Min), while its sort and
map pipelines are fully vectorized. For high-cardinality keys this module
provides the standard two-phase pattern from the Ray guide instead:

  phase 1 (map side): per-batch vectorized partial aggregation
     (pandas groupby over the batch — one call per 10^4-10^5 rows);
  phase 2 (reduce side): hash-bucket column ``__part = hash(key) % P``
     with SMALL P (default 32), ``groupby(__part).map_groups`` — P group
     invocations total — and a vectorized pandas combine inside each
     bucket.

The same bucket trick implements a partitioned hash join
(``hash_join``): both sides get the bucket column, the union is
co-grouped by bucket, and each bucket pandas-merges its two sides —
the explicit partitioned join the Ray guide describes, with P and the
skew caveat documented at the call sites.

Supported ops: sum, min, max, count (count = sum of partial counts).
Results are identical to the native aggregate; ordering of output rows is
unspecified (as with any shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PARTIAL_OPS = {"sum": "sum", "min": "min", "max": "max", "count": "size"}
_COMBINE_OPS = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _bucket(df: pd.DataFrame, keys: list[str], num_parts: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        col = df[k].to_numpy()
        if col.dtype.kind in "iu":
            v = col.astype(np.uint64)
        else:
            v = pd.util.hash_array(np.asarray(col)).astype(np.uint64)
        h = h * np.uint64(1099511628211) + v
    return (h % np.uint64(num_parts)).astype(np.int64)


def _bucket_tbl(tbl: pa.Table, keys: list[str], num_parts: int) -> np.ndarray:
    """Arrow-native twin of ``_bucket``: same hash per value (uint64
    identity for integer keys, pd.util.hash_array otherwise) without a
    full-table pandas conversion — only key columns are touched."""
    h = np.zeros(tbl.num_rows, dtype=np.uint64)
    for k in keys:
        col = tbl.column(k)
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = pd.util.hash_array(col.to_numpy(zero_copy_only=False)).astype(np.uint64)
        h = h * np.uint64(1099511628211) + v
    return (h % np.uint64(num_parts)).astype(np.int64)


_ARROW_AGG = {"sum": "sum", "min": "min", "max": "max", "size": "count_all", "count": "count_all"}


def _arrow_grouped(tbl: pa.Table, keys: list[str], spec: dict[str, tuple[str, str]]) -> pa.Table:
    """``tbl.group_by(keys).aggregate`` (C++ hash aggregate — no pandas
    round-trip) with explicit output names/ordering: keys first, then the
    spec's out columns. ``spec``: out -> (in_col, op) with op in
    {sum,min,max,size}; size/count ignores in_col."""
    import pyarrow.compute as pc

    # pandas groupby (the previous kernel) drops null-keyed rows; keep that
    # contract so outputs are bit-identical
    for k in keys:
        if tbl.column(k).null_count:
            tbl = tbl.filter(pc.is_valid(tbl[k]))
    aggs = []
    for out, (col, op) in spec.items():
        aggs.append(([] if op in ("size", "count") else col, _ARROW_AGG[op]))
    g = tbl.group_by(keys, use_threads=False).aggregate(aggs)
    # output layout: key columns first, then one column per aggs entry in
    # order (names may collide for duplicate (col, op) pairs — positional
    # access below is collision-proof)
    cols = {k: g.column(j) for j, k in enumerate(keys)}
    for i, out in enumerate(spec):
        cols[out] = g.column(len(keys) + i)
    return pa.table(cols)


def grouped_agg(
    ds,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    num_parts: int = 32,
    batch_size: int = 65536,
):
    """agg_spec: out_col -> (in_col, op), op in {sum,min,max,count}."""
    partial_cols = {out: (col, _PARTIAL_OPS[op]) for out, (col, op) in agg_spec.items()}
    combine_spec = {out: (out, _COMBINE_OPS[op]) for out, (col, op) in agg_spec.items()}

    def partial(batch: pa.Table) -> pa.Table:
        g = _arrow_grouped(batch, keys, partial_cols)
        return g.append_column(
            "__part", pa.array(_bucket_tbl(g, keys, num_parts), type=pa.int64())
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)

    def combine(g: pa.Table) -> pa.Table:
        return _arrow_grouped(g, keys, combine_spec)

    return partials.groupby("__part").map_groups(combine, batch_format="pyarrow")


def distinct(ds, keys: list[str], num_parts: int = 32, batch_size: int = 65536):
    """Distinct rows over key columns (hash-partition + per-bucket drop_duplicates)."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow group_by with no aggregates = distinct keys (C++ hash
        # table; pandas drop_duplicates KEEPS null keys, and so does this)
        g = batch.select(keys).group_by(keys, use_threads=False).aggregate([])
        return g.append_column(
            "__part", pa.array(_bucket_tbl(g, keys, num_parts), type=pa.int64())
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)

    def combine(g: pa.Table) -> pa.Table:
        return g.select(keys).group_by(keys, use_threads=False).aggregate([])

    return partials.groupby("__part").map_groups(combine, batch_format="pyarrow")


def _bucketed_pairs_impl(
    ds,
    group_keys: list[str],
    id_col: str,
    weight_col: str | None,
    out_a: str,
    out_b: str,
    out_w: str | None,
    max_group: int | None,
    num_parts: int,
    batch_size: int,
    weight_mode: str,
    dedupe: bool,
):
    """Shared kernel behind bucketed_pairs / bucketed_pair_products: all
    unordered id pairs (a < b) within each fine group, from P coarse hash
    buckets with ONE vectorized kernel per bucket (fine groups resolved
    with numpy — no per-group Python finalize). ``dedupe`` collapses
    duplicate (group, id) rows first (the LSH path); the weighted path
    instead relies on the caller's distinctness contract so each row's
    weight survives."""

    def tag(batch: pa.Table) -> pa.Table:
        part = _bucket_tbl(batch, group_keys, num_parts)
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)

    def kernel(g: pa.Table) -> pa.Table:
        empty_cols = {
            out_a: pa.array([], type=pa.int64()),
            out_b: pa.array([], type=pa.int64()),
        }
        if weight_col is not None:
            empty_cols[out_w] = pa.array([], type=pa.int64())
        empty = pa.table(empty_cols)
        cols = group_keys + [id_col] + ([weight_col] if weight_col else [])
        if dedupe:
            # distinct rows via the C++ hash aggregate (row order is
            # irrelevant — the lexsort below imposes a total order)
            g = g.select(cols).group_by(cols, use_threads=False).aggregate([])
        if g.num_rows < 2:
            return empty
        arrs = {c: g.column(c).to_numpy(zero_copy_only=False) for c in cols}
        # np.lexsort: LAST key is primary -> sort by group_keys, then id
        # (ids unique per group -> total order, block-structure invariant)
        order = np.lexsort([arrs[c] for c in [id_col] + group_keys[::-1]])
        vals = arrs[id_col][order]
        change = np.zeros(g.num_rows, dtype=bool)
        change[0] = True
        for c in group_keys:
            arr = arrs[c][order]
            change[1:] |= arr[1:] != arr[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, g.num_rows))
        keep = sizes >= 2
        if max_group is not None:
            keep &= sizes <= max_group
        starts, sizes = starts[keep], sizes[keep]
        if len(starts) == 0:
            return empty
        npairs = sizes * (sizes - 1) // 2
        total = int(npairs.sum())
        off = np.concatenate(([0], np.cumsum(npairs)[:-1]))
        p_grp = np.repeat(np.arange(len(starts)), npairs)
        p_loc = np.arange(total) - off[p_grp]
        # invert p = j*(j-1)/2 + i (0 <= i < j): j from the quadratic root,
        # with an exact integer correction for float-sqrt edge cases
        j = ((1.0 + np.sqrt(1.0 + 8.0 * p_loc)) / 2.0).astype(np.int64)
        j -= p_loc < j * (j - 1) // 2
        j += p_loc >= j * (j + 1) // 2
        i = p_loc - j * (j - 1) // 2
        base = starts[p_grp]
        out_cols = {
            out_a: pa.array(vals[base + i], type=pa.int64()),
            out_b: pa.array(vals[base + j], type=pa.int64()),
        }
        if weight_col is not None:
            ws = arrs[weight_col][order]
            w_out = (
                ws[base + i] if weight_mode == "const" else ws[base + i] * ws[base + j]
            )
            out_cols[out_w] = pa.array(w_out, type=pa.int64())
        return pa.table(out_cols)

    return tagged.groupby("__part").map_groups(kernel, batch_format="pyarrow")


def pack_ids32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two id arrays into one uint64 key (a << 32 | b) for np.isin
    membership tests. FAIL-LOUD if any id needs more than 32 bits — a
    silent wrap would corrupt the membership result (e.g. wedge (2^32, 5)
    would alias edge (0, 5))."""
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    if len(a) and int(a.max()) >> 32:
        raise ValueError("pack_ids32: id exceeds 32 bits; widen the key")
    if len(b) and int(b.max()) >> 32:
        raise ValueError("pack_ids32: id exceeds 32 bits; widen the key")
    return a << np.uint64(32) | b


def bucketed_pairs(
    ds,
    group_keys: list[str],
    id_col: str,
    out_a: str,
    out_b: str,
    max_group: int | None = None,
    num_parts: int = 32,
    batch_size: int = 65536,
):
    """All unordered id pairs (a < b) within each fine group — the LSH
    candidate-pair step. Duplicate (group, id) rows are collapsed first.
    Groups with fewer than 2 distinct ids emit nothing; groups larger
    than ``max_group`` distinct ids are dropped (stop-band guard)."""
    return _bucketed_pairs_impl(
        ds, group_keys, id_col, None, out_a, out_b, None,
        max_group, num_parts, batch_size, "product", dedupe=True,
    )


def bucketed_pair_products(
    ds,
    group_keys: list[str],
    id_col: str,
    weight_col: str,
    out_a: str,
    out_b: str,
    out_w: str,
    max_group: int | None = None,
    num_parts: int = 32,
    batch_size: int = 65536,
    weight_mode: str = "product",
):
    """All unordered id pairs (a < b) within each fine group, each pair
    row carrying the PRODUCT of the two rows' int64 weights — the sparse
    dot-product primitive: one output row per shared key per pair, so a
    grouped SUM downstream (``pair_sums``) is the exact dot product.
    Caller contract: rows are DISTINCT on (group_keys, id_col) and the
    weights are int64 whose pairwise products fit int64. Groups larger
    than ``max_group`` rows are dropped (stop-key guard).

    ``weight_mode="const"``: the weight is a GROUP-constant (equal on
    every row of a group — e.g. a per-wedge-center score); each pair then
    carries that constant instead of a product."""
    return _bucketed_pairs_impl(
        ds, group_keys, id_col, weight_col, out_a, out_b, out_w,
        max_group, num_parts, batch_size, weight_mode, dedupe=False,
    )


def pair_sums(
    ds,
    a_col: str,
    b_col: str,
    value_col: str,
    sum_col: str = "s",
    num_parts: int = 32,
    batch_size: int = 65536,
    count_col: str | None = None,
):
    """Grouped int64 SUM over an (a, b, value) pair stream — pair_counts'
    summing twin (exact: integer addition in any order). One hash-bucket
    shuffle; each bucket reduces runs with one lexsort + add.reduceat.
    ``count_col``: also emit the run multiplicities from the same pass
    (sum + count in ONE shuffle)."""
    return _pair_reduce(
        ds, a_col, b_col, value_col, sum_col, count_col, num_parts, batch_size
    )


def _pair_reduce(
    ds,
    a_col: str,
    b_col: str,
    value_col: str | None,
    sum_col: str | None,
    count_col: str | None,
    num_parts: int,
    batch_size: int,
):
    """Shared reduce behind pair_counts / pair_sums: FNV-tag the (a, b)
    keys into hash buckets (the value column ships only when summing),
    then per bucket one lexsort + run-boundary diff resolves every group
    — no per-group Python. Keys are nearly unique (LSH band collisions,
    shared-posting pairs), so a per-batch partial can't compress them."""

    def tag(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((a * np.uint64(1099511628211) + b) % np.uint64(num_parts)).astype(np.int64)
        cols = {a_col: batch[a_col], b_col: batch[b_col]}
        if value_col is not None:
            cols[value_col] = batch[value_col]
        cols["__part"] = pa.array(part, type=pa.int64())
        return pa.table(cols)

    def reduce_runs(g: pa.Table) -> pa.Table:
        a = g.column(a_col).to_numpy(zero_copy_only=False)
        b = g.column(b_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        change = np.ones(len(a), dtype=bool)
        change[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(change)
        cols = {
            a_col: pa.array(a[starts], type=pa.int64()),
            b_col: pa.array(b[starts], type=pa.int64()),
        }
        if value_col is not None:
            v = g.column(value_col).to_numpy(zero_copy_only=False)[order]
            sums = np.add.reduceat(v, starts) if len(starts) else np.empty(0, np.int64)
            cols[sum_col] = pa.array(sums, type=pa.int64())
        if count_col is not None:
            counts = np.diff(np.append(starts, len(a)))
            cols[count_col] = pa.array(counts, type=pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__part")
        .map_groups(reduce_runs, batch_format="pyarrow")
    )


def cogroup(
    left,
    right,
    left_on: list[str],
    right_on: list[str] | None = None,
    num_parts: int = 32,
    batch_size: int = 65536,
    left_schema=None,
    right_schema=None,
):
    """Generic partitioned co-group (the union trick): tag each side with
    ``__part = hash(key) % P`` and ``__side``, null-pad to a shared
    schema, union, ``groupby(__part)``. Returns (grouped, split) where
    ``grouped`` is the Dataset to ``map_groups`` over and ``split(g)``
    recovers the two sides of a bucket as Arrow tables with their ORIGINAL
    schemas. The split stays Arrow-side: converting the null-padded union
    to pandas first would force int64-with-null columns to float64 and
    corrupt values above 2^53 (e.g. packed coord keys).

    ``right_on`` defaults to ``left_on``; both sides land in the same
    bucket iff their key hashes agree. This underlies ``hash_join`` and
    every bespoke assemble/verify co-group (intersect splitter, PBF way
    reassembly). Key-hash salting for skewed keys is the caller's job.

    ``left_schema``/``right_schema``: explicit pyarrow schemas for sides
    whose schema can't be inferred (a filter may leave a side EMPTY, and
    ``Dataset.schema()`` then returns None)."""
    right_on = right_on or left_on
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    if lschema is None or rschema is None:
        raise ValueError(
            "cogroup: a side's schema is unavailable (empty dataset?) — "
            "pass left_schema/right_schema explicitly"
        )
    lnames, rnames = list(lschema.names), list(rschema.names)

    def _pa_type(t):
        # pandas-backed blocks report numpy dtypes / Python classes, not
        # pa.DataType — normalize so the null-pad below always works
        if isinstance(t, pa.DataType):
            return t
        if t in (object, str):
            return pa.string()
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    types = {c: _pa_type(t) for c, t in zip(rschema.names, rschema.types)}
    types.update({c: _pa_type(t) for c, t in zip(lschema.names, lschema.types)})
    all_cols = lnames + [c for c in rnames if c not in lnames]

    def tag(side: int, have: list[str], on: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            part = _bucket_tbl(batch, on, num_parts)
            cols = {}
            for c in all_cols:
                if c in have:
                    cols[c] = batch[c]
                else:
                    cols[c] = pa.nulls(n, type=types[c])
            cols["__part"] = pa.array(part, type=pa.int64())
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return f

    lt = left.map_batches(tag(0, lnames, left_on), batch_format="pyarrow", batch_size=batch_size)
    rt = right.map_batches(tag(1, rnames, right_on), batch_format="pyarrow", batch_size=batch_size)
    both = lt.union(rt)

    def split(g: pa.Table) -> tuple[pa.Table, pa.Table]:
        import pyarrow.compute as pc

        lg = g.filter(pc.equal(g["__side"], pa.scalar(0, pa.int8()))).select(lnames)
        rg = g.filter(pc.equal(g["__side"], pa.scalar(1, pa.int8()))).select(rnames)
        return lg, rg

    return both.groupby("__part"), split


def detect_hot_keys(
    ds, keys: list[str], threshold: int, top_per_batch: int = 16
) -> set[tuple]:
    """Approximate heavy-hitter detection for join salting: each batch
    reports its ``top_per_batch`` most frequent key tuples (O(batches ×
    top_k) driver rows, never O(distinct keys)); the driver sums the
    partials and returns key tuples whose (under)count exceeds
    ``threshold``. Missing a hot key only costs performance, never
    correctness — salting is output-invariant."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        g = df.groupby(keys, as_index=False, sort=False).size()
        g = g.nlargest(top_per_batch, "size")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(pdf) == 0:
        return set()
    totals = pdf.groupby(keys, sort=False)["size"].sum()
    hot = totals[totals > threshold]
    return {k if isinstance(k, tuple) else (k,) for k in hot.index}


def _salted(ds, on: list[str], hot: set[tuple], factor: int, replicate: bool, batch_size: int):
    """Append a ``__salt`` column (0 everywhere except hot-key rows).
    ``replicate=False`` (fact side): hot rows get salt = row-hash % factor,
    splitting a hot key across ``factor`` buckets. ``replicate=True``
    (dimension side): hot rows are duplicated once per salt value, so every
    fact sub-bucket still finds its match. Output-invariant by
    construction: each (left row, right row) key match meets in exactly one
    (key, salt) bucket."""
    hot_df = pd.DataFrame(list(hot), columns=on)
    hot_df["__hot"] = True

    def tag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_hot = df.merge(hot_df, on=on, how="left")["__hot"].notna().to_numpy()
        if replicate:
            rep = np.where(is_hot, factor, 1)
            idx = np.repeat(np.arange(len(df)), rep)
            salt = np.concatenate([np.arange(k) for k in rep.tolist()]) if len(rep) else np.array([], dtype=np.int64)
            out = df.iloc[idx].copy()
            out["__salt"] = salt.astype(np.int64)
        else:
            # deterministic row-content hash -> block-structure-invariant.
            # List/array payload columns are unhashable and excluded; the
            # remaining columns (keys + scalars) still split a hot key as
            # long as its rows differ somewhere hashable.
            hcols = []
            for c in df.columns:
                s = df[c]
                if s.dtype != object:
                    hcols.append(c)
                    continue
                nn = s.dropna()
                if nn.empty or isinstance(nn.iloc[0], (str, bytes)):
                    hcols.append(c)
            rh = pd.util.hash_pandas_object(df[hcols], index=False).to_numpy().astype(np.uint64)
            out = df
            out["__salt"] = np.where(is_hot, (rh % np.uint64(factor)).astype(np.int64), 0)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)


def hash_join(
    left,
    right,
    on: list[str] | None = None,
    how: str = "inner",
    num_parts: int = 32,
    batch_size: int = 65536,
    left_on: list[str] | None = None,
    right_on: list[str] | None = None,
    skew_threshold: int | None = None,
    skew_factor: int = 8,
    left_schema=None,
    right_schema=None,
):
    """Partitioned hash join: co-group by key-hash bucket (``cogroup``),
    pandas-merge per bucket. Key columns may differ per side via
    ``left_on``/``right_on`` (both sides bucket on the hash of their own
    key values, so matching keys meet in the same bucket).

    ``skew_threshold``: hot-key guard (VERDICT r2 #4). Keys with more than
    this many LEFT-side rows (detected by a cheap heavy-hitter pre-pass)
    are salted: left rows spread over ``skew_factor`` sub-buckets by row
    hash, right hot rows replicated into each sub-bucket — one viral key no
    longer lands in a single bucket task. Inner joins only (an unmatched
    replicated right row would otherwise emit once per salt). Results are
    identical to the unsalted join (pinned by tests)."""
    if on is not None:
        left_on = right_on = on
    if left_on is None or right_on is None:
        raise ValueError("hash_join needs `on` or both `left_on` and `right_on`")

    bucket_l, bucket_r = list(left_on), list(right_on)
    if skew_threshold is not None:
        if how != "inner":
            raise ValueError("skew_threshold requires how='inner'")
        hot = detect_hot_keys(left, list(left_on), skew_threshold)
        if hot:
            left = _salted(left, list(left_on), hot, skew_factor, replicate=False,
                           batch_size=batch_size)
            # right keys may be named differently — map the hot tuples over
            right = _salted(right, list(right_on), hot, skew_factor, replicate=True,
                            batch_size=batch_size)
            bucket_l = list(left_on) + ["__salt"]
            bucket_r = list(right_on) + ["__salt"]

    grouped, split = cogroup(
        left, right, bucket_l, right_on=bucket_r, num_parts=num_parts,
        batch_size=batch_size, left_schema=left_schema, right_schema=right_schema,
    )
    merge_keys_same = on is not None

    def _no_nested(t: pa.Table) -> bool:
        # Acero's hash join rejects nested (list/struct) payload columns
        return all(not pa.types.is_nested(f.type) for f in t.schema)

    def merge(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        mk_l, mk_r = list(bucket_l), list(bucket_r)
        if merge_keys_same and how == "inner" and _no_nested(lg) and _no_nested(rg):
            # Acero hash join — no pandas round-trip; suffixes match the
            # pandas naming so the output schema is unchanged
            # use_threads=False: the merge already runs inside a Ray task
            # per bucket; Acero's own thread pool would oversubscribe CPUs
            out_t = lg.join(rg, keys=mk_l, join_type="inner",
                            left_suffix="_x", right_suffix="_y",
                            use_threads=False)
            drop_t = [c for c in out_t.schema.names if c.startswith("__salt")]
            if drop_t:
                out_t = out_t.drop_columns(drop_t)
            return out_t
        ldf, rdf = lg.to_pandas(), rg.to_pandas()
        if merge_keys_same:
            out = ldf.merge(rdf, on=mk_l, how=how)
        else:
            out = ldf.merge(rdf, left_on=mk_l, right_on=mk_r, how=how)
        drop = [c for c in out.columns if c.startswith("__salt")]
        if drop:
            out = out.drop(columns=drop)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return grouped.map_groups(merge, batch_format="pyarrow")


def pair_counts(
    ds,
    a_col: str,
    b_col: str,
    count_col: str = "n",
    num_parts: int = 32,
    batch_size: int = 65536,
):
    """Grouped COUNT over an (a, b) pair stream: one output row per
    distinct pair with its multiplicity — ``_pair_reduce`` with no value
    column (nothing extra ships through the shuffle)."""
    return _pair_reduce(
        ds, a_col, b_col, None, None, count_col, num_parts, batch_size
    )


def anti_join(
    left,
    right,
    left_key: str,
    right_key: str,
    num_parts: int = 32,
    batch_size: int = 65536,
    left_schema=None,
    right_schema=None,
):
    """Left rows whose key does NOT appear in right (NOT IN with non-null
    keys). Same one-shuffle cogroup as hash_join; each bucket filters
    with one np.isin against the bucket's right keys."""
    grouped, split = cogroup(
        left, right, [left_key], right_on=[right_key],
        num_parts=num_parts, batch_size=batch_size,
        left_schema=left_schema, right_schema=right_schema,
    )

    def merge(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        lk = lg.column(left_key).to_numpy(zero_copy_only=False)
        rk = rg.column(right_key).to_numpy(zero_copy_only=False)
        keep = ~np.isin(lk, rk)
        return lg.filter(pa.array(keep))

    return grouped.map_groups(merge, batch_format="pyarrow")


def lookup_join(
    left,
    right,
    left_key: str,
    right_key: str,
    take_cols: dict[str, str],
    num_parts: int = 32,
    batch_size: int = 65536,
    left_schema=None,
    right_schema=None,
):
    """Arrow-native inner equi-join against a UNIQUE-keyed right side:
    per bucket, right rows are located with one searchsorted and the
    requested columns attached to left via ``pyarrow.compute.take`` —
    no pandas round-trip, so list/binary payload columns (shingle sets,
    embedding vectors) never become per-row Python objects. Left rows
    whose key is absent from right are dropped (inner semantics).

    ``take_cols`` maps right-side column -> output name. Both sides
    shuffle once (the same cogroup as ``hash_join``); use this instead of
    ``hash_join`` whenever the right side is an entity table keyed by a
    unique id and the left just needs payload attached.

    ``left_schema``/``right_schema``: pass explicitly when a side is a
    LAZY shuffle output (e.g. a previous lookup_join in a chain) — the
    schema probe would otherwise execute that whole upstream shuffle for
    limit=1 and the real run would execute it again (CLAUDE.md rule).
    ``joined_schema`` builds the chained schema."""
    import pyarrow.compute as pc

    grouped, split = cogroup(
        left, right, [left_key], right_on=[right_key],
        num_parts=num_parts, batch_size=batch_size,
        left_schema=left_schema, right_schema=right_schema,
    )

    def merge(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        lk = lg.column(left_key).to_numpy(zero_copy_only=False)
        rk = rg.column(right_key).to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rks = rk[order]
        pos = np.searchsorted(rks, lk)
        pos[pos == len(rks)] = 0
        ok = (rks[pos] == lk) if len(rks) else np.zeros(len(lk), dtype=bool)
        if not ok.all():
            lg = lg.filter(pa.array(ok))
            pos = pos[ok]
        idx = pa.array(order[pos], type=pa.int64())
        cols = {c: lg[c] for c in lg.schema.names}
        for rc, out in take_cols.items():
            col = rg.column(rc)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[out] = pc.take(col, idx)
        return pa.table(cols)

    return grouped.map_groups(merge, batch_format="pyarrow")


def joined_schema(left_ds, right_ds, take_cols: dict[str, str]) -> pa.Schema:
    """The output schema of ``lookup_join(left, right, ..., take_cols)``,
    computed WITHOUT executing either side (both must already have cheap
    schemas — materialized or map-only). Pass the result as the next
    chained join's ``left_schema`` so its probe never re-executes the
    previous join."""
    lsch = pa.schema(left_ds.schema().base_schema)
    rsch = pa.schema(right_ds.schema().base_schema)
    fields = list(lsch)
    for rc, out in take_cols.items():
        fields.append(pa.field(out, rsch.field(rc).type))
    return pa.schema(fields)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR, Hacker's Delight 5-2)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming_selfjoin(prints, id_col: str, hash_col: str, max_hamming: int = 3):
    """EXACT all-pairs hamming join over a (id, 64-bit hash) table: every
    unordered pair with popcount(h_a ^ h_b) <= max_hamming, as
    (id_a, id_b, hamming) with id_a < id_b.

    The Manku/Jain/Sarma WWW'07 block-permutation scheme (the
    simhash_neardup plan, generalized): the 64-bit hash splits into 4
    16-bit blocks; a pair within hamming 3 differs in at most 3 blocks,
    so at least one block matches — banding each id under its 4
    (block, value) keys and pairing within buckets is a complete cover.
    Candidates dedup through one ``pair_counts`` shuffle; the popcount
    verify ships fingerprints via two skinny Arrow lookup_joins.
    ``prints`` MUST be pinned/materialized (it feeds the band stage and
    both verify sides). Same scale trade as simhash_neardup: a 16-bit
    block value shared by m ids contributes O(m²) candidates — run exact
    dedup first on duplicate-heavy inputs."""
    if max_hamming >= 4:
        raise ValueError("4-block pigeonhole cover requires max_hamming <= 3")

    def blocks(batch: pa.Table) -> pa.Table:
        h = batch.column(hash_col).to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_b, out_k, out_id = [], [], []
        for b in range(4):
            out_b.append(np.full(len(h), b, dtype=np.int32))
            out_k.append(
                ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            )
            out_id.append(ids)
        return pa.table(
            {
                "block": pa.array(np.concatenate(out_b), type=pa.int32()),
                "key": pa.array(np.concatenate(out_k), type=pa.int64()),
                "id": pa.array(np.concatenate(out_id), type=pa.int64()),
            }
        )

    banded = prints.map_batches(blocks, batch_format="pyarrow", batch_size=65536)
    cand = bucketed_pairs(banded, ["block", "key"], "id", "id_a", "id_b")
    counted = pair_counts(cand, "id_a", "id_b", "n_blocks")
    cand = counted.map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        batch_size=65536,
    ).materialize()

    paired = lookup_join(cand, prints, "id_a", id_col, {hash_col: "h_a"})
    paired = lookup_join(
        paired, prints, "id_b", id_col, {hash_col: "h_b"},
        left_schema=joined_schema(cand, prints, {hash_col: "h_a"}),
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        ha = batch.column("h_a").to_numpy(zero_copy_only=False).view(np.uint64)
        hb = batch.column("h_b").to_numpy(zero_copy_only=False).view(np.uint64)
        ham = popcount64(ha ^ hb)
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "hamming": pa.array(ham[keep], type=pa.int64()),
            }
        )

    return paired.map_batches(verify, batch_format="pyarrow", batch_size=65536)
