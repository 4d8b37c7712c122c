"""Bloom filter over int64 keys (from scratch, numpy bit array).

The broadcast side of a semi/anti join: at web scale the key set itself
can be too big to broadcast, but an m-bit Bloom filter with k hashes
stays small (1.2 GB filter ≈ 10^10 keys at 1% FPR). Candidate hits are
then verified exactly (either against the true set when it fits, or by a
partitioned hash join on the survivors — the filter cuts that join's
input by the selectivity factor).

Hashes: k independent (a_i*x + b_i) mod 2^61-1 universal hashes of the
folded key (same family as the MinHash permutations) reduced mod m.
Deterministic (fixed seed), mergeable (bitwise OR).
"""

from __future__ import annotations

import numpy as np

_M61 = np.uint64((1 << 61) - 1)
_rng = np.random.RandomState(1729)
_MAXK = 8
_A = _rng.randint(1, 1 << 31, size=_MAXK).astype(np.uint64)
_B = _rng.randint(0, 1 << 31, size=_MAXK).astype(np.uint64)


class BloomFilter:
    __slots__ = ("bits", "m", "k")

    def __init__(self, n_expected: int, fpr: float = 0.01):
        m = int(max(64, -n_expected * np.log(fpr) / (np.log(2) ** 2)))
        self.m = m
        self.k = int(min(_MAXK, max(1, round(m / max(n_expected, 1) * np.log(2)))))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        x = keys.astype(np.int64).view(np.uint64)
        x32 = (x >> np.uint64(32)) ^ (x & np.uint64(0xFFFFFFFF))
        # (k, n) hash positions
        h = (_A[: self.k, None] * x32[None, :] + _B[: self.k, None]) % _M61
        return (h % np.uint64(self.m)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(keys))
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self
