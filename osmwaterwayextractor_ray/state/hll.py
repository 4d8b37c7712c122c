"""From-scratch mergeable HyperLogLog (Flajolet, Fusy, Gandouet &
Meunier 2007) for distributed approximate COUNT DISTINCT.

Complements the t-digest (percentiles) as the second mergeable sketch:
exact distinct (`fastagg.distinct`) shuffles every key once, which is
the right answer when the distinct set itself is needed — but a
cardinality-only question at 10^12 rows should move 2^p bytes per
block, not the keys. Standard 64-bit-hash variant (no large-range
correction needed) with linear counting for the small regime.

Pipeline shape mirrors state/tdigest.py:

  map_batches (one 2^p-byte register row per batch, numpy maximum.at)
    -> map_batches (elementwise-max combine, ~batch_size x reduction)
    -> driver-side final max + estimate      (O(2^p) driver bytes)

Merging is elementwise max — associative and commutative, so the
estimate is invariant to block structure (pinned by tests).
"""

from __future__ import annotations

import numpy as np

DEFAULT_P = 14  # 16384 registers, ~0.81% standard error


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Vigna, public domain) — vectorized uint64
    avalanche so register index and rank bits are independent."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = DEFAULT_P) -> np.ndarray:
    """Registers (uint8[2^p]) for one flat array of int64/uint64 keys.
    rho = leading-zero rank of the low (64-p) hash bits; float64 frexp
    gives exact floor(log2) because 64-p <= 53 bits for p >= 11."""
    if p < 11 or p > 18:
        raise ValueError("p must be in [11, 18]")
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = _mix64(np.asarray(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - p)) - 1)
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    _, exp = np.frexp(rest[nz].astype(np.float64))
    rho[nz] = (64 - p + 1 - exp).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(regs: np.ndarray) -> np.ndarray:
    """Elementwise max over a (k, 2^p) stack of register rows."""
    return np.max(regs, axis=0).astype(np.uint8)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected harmonic-mean estimate with the standard
    linear-counting switch for the small regime."""
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, p: int = DEFAULT_P) -> int:
    """Approximate COUNT(DISTINCT col) over a Dataset of integer keys.
    Strings must be pre-hashed to int64 upstream (pd.util.hash_array).
    Driver receives exactly one 2^p register row."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        reg = hll_partial(v, p)
        return pa.table({"reg": pa.array([reg], type=pa.list_(pa.uint8()))})

    def combine(batch: pa.Table) -> pa.Table:
        rows = batch.column("reg")
        arr = rows.combine_chunks() if isinstance(rows, pa.ChunkedArray) else rows
        # .values ignores a slice's offset window — honor arr.offsets so a
        # sliced block (Ray splitting a larger block) reads the right rows.
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        flat = arr.values.to_numpy(zero_copy_only=False)
        flat = flat[offs[0] : offs[-1]].reshape(len(batch), -1)
        return pa.table({"reg": pa.array([hll_merge(flat)], type=pa.list_(pa.uint8()))})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    combined = partials.map_batches(combine, batch_format="pyarrow", batch_size=1024)
    rows = combined.take_all()
    regs = np.stack([np.asarray(r["reg"], dtype=np.uint8) for r in rows])
    return int(round(hll_estimate(hll_merge(regs))))
