"""Mergeable Bloom filter over 64-bit keys (Bloom 1970; Kirsch &
Mitzenmacher 2006 double hashing: g_i = h1 + i*h2 mod m).

The distributed-ingest prefilter shape: each task folds its keys into a
fixed m-bit numpy bitmap (pure vectorized bit math), partial bitmaps
merge by OR (associative/commutative — block-structure-invariant), the
merged filter broadcasts once (m/8 bytes via ray.put), and membership
tests are k vectorized gathers. False positives are possible (rate
(1 - e^(-kn/m))^k), false negatives are not — so a Bloom PREFILTER
composed with an exact verify of the positives yields exact results
while the definite-negative majority skips the verify shuffle entirely
(`textops.incremental_dedup`)."""

from __future__ import annotations

import numpy as np

M_BITS = 1 << 20  # 128 KiB bitmap — FP < 1e-9 at 4k keys, <0.2% at 100k
K_HASHES = 4


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing of the 64-bit key:
    h1 = low 32 bits, h2 = high 32 bits | 1 (odd, so strides cover m)."""
    keys = keys.astype(np.uint64, copy=False)
    h1 = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((keys >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits


def bloom_partial(
    keys: np.ndarray, m_bits: int = M_BITS, k: int = K_HASHES
) -> np.ndarray:
    """One task's bitmap (uint8 array of m_bits/8 bytes) with all keys set."""
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(keys, m_bits, k).ravel()
        np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bm


def bloom_merge(bitmaps, m_bits: int = M_BITS) -> np.ndarray:
    """OR-fold partial bitmaps (order-independent). An empty iterable
    (zero-block input) yields the empty filter, not None."""
    out = None
    for bm in bitmaps:
        out = bm.copy() if out is None else np.bitwise_or(out, bm)
    return out if out is not None else np.zeros(m_bits // 8, dtype=np.uint8)


def bloom_contains(
    bm: np.ndarray, keys: np.ndarray, m_bits: int = M_BITS, k: int = K_HASHES
) -> np.ndarray:
    """Vectorized membership: True = maybe present, False = DEFINITELY absent."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _positions(keys, m_bits, k)
    bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)
