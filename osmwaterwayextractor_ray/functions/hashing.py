"""Deterministic hashing + ID generation.

The reference generates node/edge ids as ``'n'+base62(xxh64(key))[:hash_length]``
(osm_waterway_extractor.py:1090-1150). The xxhash package is not available in
this environment, so ``xxh64`` below is a from-scratch pure-Python
implementation of the public XXH64 algorithm (Yann Collet, BSD — spec at
github.com/Cyan4973/xxHash). It is bit-identical to ``xxhash.xxh64`` (verified
against the published test vectors in tests/test_hashing.py).

ID semantics replicated exactly:
  node id  = 'n' + base62(xxh64(f"{round(lat,p)},{round(lon,p)}"))[:L]   (ref :1090-1105, :1122-1131)
  edge id  = 'e' + base62(xxh64(f"{from}-{to}-{way_id}-{seg_idx}"))[:L]  (ref :1133-1150)
  base62   = unsigned, alphabet 0-9A-Za-z, '0' for 0                     (ref :1107-1120)

The hashed coordinate string is the Python ``str`` of the *rounded* floats
(shortest-repr, e.g. "52.51,13.41"), so formatting must go through Python
floats — not numpy formatting.
"""

from __future__ import annotations

import numpy as np

_M64 = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Pure-Python XXH64; bit-identical to the C reference implementation."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def int_to_base62(num: int) -> str:
    """Unsigned base-62 (ref :1107-1120)."""
    if num == 0:
        return "0"
    num = abs(num)
    out = []
    while num > 0:
        out.append(_B62[num % 62])
        num //= 62
    return "".join(reversed(out))


def node_id(lat: float, lon: float, precision: int = 6, hash_length: int = 8) -> str:
    """Deterministic node id for a coordinate (ref :1090-1105, :1122-1131)."""
    rlat = round(float(lat), precision)
    rlon = round(float(lon), precision)
    h = xxh64(f"{rlat},{rlon}".encode())
    return "n" + int_to_base62(h)[:hash_length]


def edge_id(
    from_node_id: str, to_node_id: str, way_id: int, segment_index: int, hash_length: int = 8
) -> str:
    """Deterministic edge id (ref :1133-1150)."""
    h = xxh64(f"{from_node_id}-{to_node_id}-{way_id}-{segment_index}".encode())
    return "e" + int_to_base62(h)[:hash_length]


def node_ids_array(
    lats: np.ndarray, lons: np.ndarray, precision: int = 6, hash_length: int = 8
) -> np.ndarray:
    """Node ids for coordinate arrays, memoizing repeated coordinates within
    the batch (junction endpoints repeat heavily across edges)."""
    out = np.empty(len(lats), dtype=object)
    memo: dict[tuple[float, float], str] = {}
    lat_l = lats.tolist()
    lon_l = lons.tolist()
    for i, (la, lo) in enumerate(zip(lat_l, lon_l)):
        key = (la, lo)
        nid = memo.get(key)
        if nid is None:
            nid = node_id(la, lo, precision, hash_length)
            memo[key] = nid
        out[i] = nid
    return out


def xxh64_windows(data: bytes, k: int, seed: int = 0) -> np.ndarray:
    """XXH64 of EVERY k-byte sliding window of ``data`` (k < 32), fully
    vectorized — one numpy pass instead of a Python xxh64 call per window
    position. Bit-identical to ``xxh64(data[i:i+k])`` (pinned by tests);
    this is the shingling / winnowing hot path."""
    if not (0 < k < 32):
        raise ValueError("xxh64_windows supports 0 < k < 32")
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b) - k + 1
    if n <= 0:
        raise ValueError("data shorter than window")
    from numpy.lib.stride_tricks import sliding_window_view

    W = sliding_window_view(b, k)  # (n, k), zero-copy
    P1, P2, P3, P4, P5 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4, _P5))

    def rotl(x: np.ndarray, r: int) -> np.ndarray:
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def le_word(i: int, width: int) -> np.ndarray:
        v = np.zeros(n, dtype=np.uint64)
        for j in range(width):
            v |= W[:, i + j].astype(np.uint64) << np.uint64(8 * j)
        return v

    h = np.full(n, (seed + _P5 + k) & _M64, dtype=np.uint64)
    i = 0
    while i + 8 <= k:
        h ^= rotl(le_word(i, 8) * P2, 31) * P1
        h = rotl(h, 27) * P1 + P4
        i += 8
    if i + 4 <= k:
        h ^= le_word(i, 4) * P1
        h = rotl(h, 23) * P2 + P3
        i += 4
    while i < k:
        h ^= W[:, i].astype(np.uint64) * P5
        h = rotl(h, 11) * P1
        i += 1
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def text_hash64(texts: "list[str] | np.ndarray") -> np.ndarray:
    """xxh64 of utf-8 text, as uint64 numpy array (exact-dedup content key)."""
    return np.fromiter(
        (xxh64(t.encode("utf-8", "surrogatepass")) for t in texts),
        dtype=np.uint64,
        count=len(texts),
    )
