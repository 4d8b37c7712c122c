"""From-scratch mergeable Misra-Gries heavy-hitters summary (Misra &
Gries 1982; merge rule from Agarwal et al., "Mergeable Summaries",
PODS 2012).

Third sketch family beside the t-digest (percentiles) and HyperLogLog
(cardinality): approximate top-k / frequent items. Exact global top-k
(`top_tokens`) shuffles every distinct key once; a k-counter summary per
block moves O(k) rows per block instead and still guarantees that every
item with true count > n/k survives, with per-item undercount at most
n/k. Merge = add counters, then subtract the (k+1)-th largest and drop
non-positive — associative enough to keep the mergeable-summaries error
bound under any combine tree, which is what makes it a one-pass
map_batches + tiny reduce on Ray.

All kernels are numpy over (key, count) arrays — no Python dict loops.
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 256


def mg_partial(keys: np.ndarray, counts: np.ndarray | None, k: int = DEFAULT_K):
    """Misra-Gries summary of a weighted key stream, vectorized: sort,
    sum per distinct key (reduceat), keep the top-k by summed weight
    minus the (k+1)-th weight (the batched equivalent of k-counter
    decrements). Returns (keys, residual_counts), <= k rows."""
    if len(keys) == 0:
        return keys.astype(np.int64), np.zeros(0, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    ws = (
        np.ones(len(ks), dtype=np.int64)
        if counts is None
        else counts[order].astype(np.int64)
    )
    first = np.ones(len(ks), dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(ws, starts)
    uniq = ks[starts]
    return _trim(uniq, sums, k)


def _trim(keys: np.ndarray, counts: np.ndarray, k: int):
    """Keep at most k (key, count) rows: subtract the (k+1)-th largest
    count from everyone and drop non-positive residuals — the batch form
    of the classic decrement-all step; undercounts only, never over."""
    if len(keys) <= k:
        return keys.astype(np.int64), counts.astype(np.int64)
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    resid = counts - kth
    keep = resid > 0
    return keys[keep].astype(np.int64), resid[keep].astype(np.int64)


def mg_merge(keys_list, counts_list, k: int = DEFAULT_K):
    """Merge summaries: concatenate and re-run the weighted partial
    (sum per key, then one trim) — the PODS'12 mergeable-summaries rule."""
    allk = np.concatenate([np.asarray(a, dtype=np.int64) for a in keys_list])
    allc = np.concatenate([np.asarray(c, dtype=np.int64) for c in counts_list])
    return mg_partial(allk, allc, k)


def approx_top_k(
    ds, key_col: str, k: int = DEFAULT_K, top: int = 20, return_trimmed: bool = False
):
    """Approximate top-`top` most frequent values of an int64 column.
    One map_batches pass emits a <= k-row summary per batch; an
    intermediate combine shrinks summary rows; the driver merges the
    survivors and returns candidates ORDERED by residual count (every
    item with true frequency > n/k is guaranteed present).

    With ``return_trimmed=True`` also returns whether ANY stage trimmed
    (distinct keys at that stage exceeded k): trimmed=False certifies the
    residual counts are EXACT, which callers whose oracle assumes exact
    counts (heavy_users_mg) must assert instead of silently drifting."""
    import pyarrow as pa

    def _flagged(pk, pc_, trimmed: bool) -> pa.Table:
        # when every residual trims to zero (all counts tie above capacity)
        # the summary is empty — carry the flag on a zero-count sentinel
        # row so "trimmed" survives to the driver (cnt=0 rows are inert in
        # mg merges and filtered before the final ordering)
        if trimmed and len(pk) == 0:
            pk = np.zeros(1, dtype=np.int64)
            pc_ = np.zeros(1, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(pk),
                "cnt": pa.array(pc_),
                "trimmed": pa.array(np.full(len(pk), trimmed)),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pk, pc_ = mg_partial(v, None, k)
        return _flagged(pk, pc_, len(np.unique(v)) > k)

    def combine(batch: pa.Table) -> pa.Table:
        bk = batch.column("key").to_numpy(zero_copy_only=False)
        bc = batch.column("cnt").to_numpy(zero_copy_only=False)
        mk, mc = mg_partial(bk, bc, k)
        trimmed = bool(
            pa.compute.any(batch.column("trimmed")).as_py() or len(np.unique(bk)) > k
        )
        return _flagged(mk, mc, trimmed)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).map_batches(
        combine, batch_format="pyarrow", batch_size=65536
    )
    pdf = parts.to_pandas()
    if len(pdf) == 0:  # empty input: no summaries, no trim
        empty = np.zeros(0, dtype=np.int64)
        return (empty, empty, False) if return_trimmed else (empty, empty)
    keys_in = pdf["key"].to_numpy(dtype=np.int64)
    mk, mc = mg_partial(keys_in, pdf["cnt"].to_numpy(dtype=np.int64), k)
    any_trim = bool(pdf["trimmed"].any()) or len(np.unique(keys_in)) > k
    live = mc > 0  # drop inert sentinel rows
    mk, mc = mk[live], mc[live]
    order = np.lexsort((mk, -mc))[:top]
    if return_trimmed:
        return mk[order], mc[order], any_trim
    return mk[order], mc[order]
