"""From-scratch mergeable t-digest (Dunning & Ertl) for distributed
percentiles.

Used by the QA stage for the large-n branch of its percentile metrics
(reference computes ``sorted_values[int(n * q)]`` on a driver-resident
list, osm_waterway_extractor.py:1350-1355, :2683 — exact at fixture scale,
impossible at web scale). The sketch is built as a Dataset pipeline:

  map_batches (vectorized per-batch digest, <= delta centroids)
    -> map_batches (intermediate weighted compress, ~130x reduction)
    -> driver-side final compress + quantile interpolation

Every step is numpy-vectorized (sort + k-scale bucketing + reduceat);
no Python loop over values and no row streaming to the driver. Accuracy
is pinned by tests (sketch vs exact sorted-index percentile).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_DELTA = 500


def _k(q: np.ndarray, delta: float) -> np.ndarray:
    """k1 scale function: k(q) = delta/(2*pi) * asin(2q - 1) — centroid
    size limit shrinks toward the tails, giving relative tail accuracy."""
    return delta / (2.0 * np.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


def digest_values(values: np.ndarray, delta: float = DEFAULT_DELTA):
    """(means, weights) centroids for a flat value array. Vectorized:
    sort, map each value's mid-rank quantile through the scale function,
    bucket by floor(k), mean per bucket via reduceat."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.array([], dtype=np.float64), np.array([], dtype=np.float64)
    q = (np.arange(n) + 0.5) / n
    b = np.floor(_k(q, delta)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    counts = np.diff(np.r_[starts, n]).astype(np.float64)
    means = np.add.reduceat(v, starts) / counts
    return means, counts


def compress_weighted(
    means: np.ndarray, weights: np.ndarray, delta: float = DEFAULT_DELTA
):
    """Merge weighted centroids (from many partial digests) into a fresh
    <=~delta-centroid digest: sort by mean, bucket mid-quantiles through
    the scale function, weighted mean per bucket."""
    if len(means) == 0:
        return means, weights
    o = np.argsort(means, kind="stable")
    m, w = means[o], weights[o]
    W = w.sum()
    qmid = (np.cumsum(w) - w / 2.0) / W
    b = np.floor(_k(qmid, delta)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    ws = np.add.reduceat(w, starts)
    wm = np.add.reduceat(m * w, starts) / ws
    return wm, ws


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate the q-quantile by linear interpolation between centroid
    means at their cumulative mid-weights."""
    if len(means) == 0:
        return 0.0
    o = np.argsort(means, kind="stable")
    m, w = means[o], weights[o]
    W = w.sum()
    target = q * W
    cum = np.cumsum(w) - w / 2.0
    if target <= cum[0]:
        return float(m[0])
    if target >= cum[-1]:
        return float(m[-1])
    i = int(np.searchsorted(cum, target))
    t = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
    return float(m[i - 1] + t * (m[i] - m[i - 1]))


def digest_dataset(ds, column: str, delta: float = DEFAULT_DELTA):
    """Distributed digest of a Dataset column -> (means, weights) on the
    driver (<=~delta rows). Two reduction levels bound the driver pull:
    per-batch digests (<=delta centroids per ~64k values), an intermediate
    weighted compress over ~64k centroid rows, then the final compress."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        m, w = digest_values(v, delta)
        return pa.table(
            {
                "mean": pa.array(m, type=pa.float64()),
                "weight": pa.array(w, type=pa.float64()),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        m = batch.column("mean").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        cm, cw = compress_weighted(m, w, delta)
        return pa.table(
            {
                "mean": pa.array(cm, type=pa.float64()),
                "weight": pa.array(cw, type=pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).map_batches(
        combine, batch_format="pyarrow", batch_size=65536
    )
    pdf = parts.to_pandas()
    return compress_weighted(
        pdf["mean"].to_numpy(dtype=np.float64),
        pdf["weight"].to_numpy(dtype=np.float64),
        delta,
    )
