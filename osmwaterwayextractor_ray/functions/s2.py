"""From-scratch vectorized S2 cell ids (public algorithm).

The north-star design names "S2 level-12 cells" as the spatial shuffle
key; no S2 library exists in this container, so this module implements
the published S2 cell-id scheme directly (S2 geometry docs:
https://s2geometry.io/devguide/s2cell_hierarchy — cube-face projection,
quadratic st transform, Hilbert curve position, 64-bit id layout):

  id = [3 face bits][2*30 Hilbert position bits][1]   (uint64)

A cell at level L keeps the top 3 + 2L bits and sets the next bit —
``lsb = 1 << (2*(30-L))`` — so numerically id ∈ [range_min, range_max]
of every ancestor, levels are recoverable from the trailing-zero count,
and sorting ids gives Hilbert (locality-preserving) order: the property
the spatial shuffles want at 100 TB (a groupby on s2 keys lands
geographically-near points in near ranges instead of scattering them).

Everything is vectorized numpy over uint64; the two 1024-entry Hilbert
lookup tables are built once at import (LOOKUP_BITS=4, the standard
construction: each table entry maps 4 (i,j) sub-cell bits + 2
orientation bits to 4 position bits + the next orientation).

No external S2 library exists in this container to cross-validate
against, so the tests pin the *defining properties* instead: Hilbert
continuity (consecutive leaf positions are edge-adjacent in (i,j)),
center round-trips, parent containment, token round-trips, face
placement of the six axis points, and hierarchy/lsb arithmetic
(tests/test_s2.py).
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL

# Traversal order of the 4 sub-cells for each of the 4 orientations, and
# the orientation delta each sub-cell applies (standard S2/Hilbert tables).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)

    def init_cell(level, i, j, orig_orientation, pos, orientation):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            ij = r[index]
            init_cell(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orientation,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )

    for orientation in range(4):
        init_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()
_U = np.uint64  # shorthand for scalar casts


def _latlng_to_xyz(lats, lons) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lat = np.deg2rad(np.asarray(lats, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lons, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # u/v per face (the standard S2 face frame tables)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (uf, vf) in enumerate(
        (
            (lambda: y / x, lambda: z / x),       # face 0: +x
            (lambda: -x / y, lambda: z / y),      # face 1: +y
            (lambda: -x / z, lambda: -y / z),     # face 2: +z
            (lambda: z / x, lambda: y / x),       # face 3: -x
            (lambda: z / y, lambda: -x / y),      # face 4: -y
            (lambda: -y / z, lambda: -x / z),     # face 5: -z
        )
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = uf()[m]
                v[m] = vf()[m]
    return face, u, v


def _face_uv_to_xyz(face, u, v) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    one = np.ones_like(u)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xf, yf, zf) in enumerate(
        (
            (lambda: one, lambda: u, lambda: v),        # face 0
            (lambda: -u, lambda: one, lambda: v),       # face 1
            (lambda: -u, lambda: -v, lambda: one),      # face 2
            (lambda: -one, lambda: -v, lambda: -u),     # face 3
            (lambda: v, lambda: -one, lambda: -u),      # face 4
            (lambda: v, lambda: u, lambda: -one),       # face 5
        )
    ):
        m = face == f
        if m.any():
            x[m] = xf()[m]
            y[m] = yf()[m]
            z[m] = zf()[m]
    return x, y, z


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (the library default)."""
    with np.errstate(invalid="ignore"):  # the unselected branch may sqrt(<0)
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * MAX_SIZE), 0, MAX_SIZE - 1).astype(np.int64)


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf cell id from face + 30-bit (i, j): 8 Hilbert lookup rounds,
    fully vectorized (each round is two shifts + one table gather)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << _U(POS_BITS - 1)
    bits = face & _U(SWAP_MASK)
    mask = _U((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = _U(k * LOOKUP_BITS)
        cur = bits + (((i >> kk) & mask) << _U(LOOKUP_BITS + 2))
        cur += ((j >> kk) & mask) << _U(2)
        cur = _LOOKUP_POS[cur]
        n |= (cur >> _U(2)) << _U(k * 2 * LOOKUP_BITS)
        bits = cur & _U(SWAP_MASK | INVERT_MASK)
    return n * _U(2) + _U(1)


def to_face_ij(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Invert from_face_ij for LEAF ids → (face, i, j)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> _U(POS_BITS)).astype(np.int64)
    bits = (ids >> _U(POS_BITS)) & _U(SWAP_MASK)
    i = np.zeros(len(ids), dtype=np.uint64)
    j = np.zeros(len(ids), dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        cur = bits + (
            ((ids >> _U(k * 2 * LOOKUP_BITS + 1)) & _U((1 << (2 * nbits)) - 1)) << _U(2)
        )
        cur = _LOOKUP_IJ[cur]
        i += (cur >> _U(LOOKUP_BITS + 2)) << _U(k * LOOKUP_BITS)
        j += ((cur >> _U(2)) & _U((1 << LOOKUP_BITS) - 1)) << _U(k * LOOKUP_BITS)
        bits = cur & _U(SWAP_MASK | INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64)


def lsb_for_level(level: int) -> np.uint64:
    return _U(1) << _U(2 * (MAX_LEVEL - level))


def s2_parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` (ids must be at a level >= ``level``)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = lsb_for_level(level)
    # -lsb == ~(lsb - 1) in two's complement; keeps everything uint64
    return (ids & ~(lsb - _U(1))) | lsb


def s2_cell_id(lats, lons, level: int = 12) -> np.ndarray:
    """(lat°, lon°) → S2 cell id at ``level`` (default 12 per the design)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    x, y, z = _latlng_to_xyz(lats, lons)
    face, u, v = _xyz_to_face_uv(x, y, z)
    leaf = from_face_ij(face, _st_to_ij(_uv_to_st(u)), _st_to_ij(_uv_to_st(v)))
    return leaf if level == MAX_LEVEL else s2_parent(leaf, level)


def s2_level(ids: np.ndarray) -> np.ndarray:
    """Level from the trailing set bit (vectorized de Bruijn-free count)."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + _U(1))
    # position of the single set bit via float exponent (exact for 2^k < 2^64)
    tz = np.zeros(len(ids), dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (_U(1) << _U(shift))
        tz[big] += shift
        v[big] >>= _U(shift)
    return MAX_LEVEL - tz // 2


def s2_range_min(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + _U(1))
    return ids - (lsb - _U(1))


def s2_range_max(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + _U(1))
    return ids + (lsb - _U(1))


def s2_contains(parent_ids: np.ndarray, child_ids: np.ndarray) -> np.ndarray:
    child_ids = np.asarray(child_ids, dtype=np.uint64)
    return (s2_range_min(parent_ids) <= child_ids) & (
        child_ids <= s2_range_max(parent_ids)
    )


def s2_children(ids: np.ndarray) -> np.ndarray:
    """The 4 children of each cell, shape (n, 4) in Hilbert order."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + _U(1))
    # child lsb is lsb>>2; same-level siblings are 2*child_lsb apart
    starts = ids - lsb + (lsb >> _U(2))
    return starts[:, None] + np.arange(4, dtype=np.uint64)[None, :] * (
        lsb[:, None] >> _U(1)
    )


def s2_cell_center(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center → (lat°, lon°). Works at any level: the center is the
    midpoint of the cell's ij range on its face."""
    ids = np.asarray(ids, dtype=np.uint64)
    # decoding the raw id (trailing 1 + zeros included) yields the ij of a
    # leaf just inside the cell next to its center; the standard parity
    # delta then gives the exact center in si/ti (doubled-ij) space
    face, i, j = to_face_ij(ids)
    leaf = (ids & _U(1)) == _U(1)
    bit = ((ids >> _U(2)) & _U(1)).astype(np.int64)
    delta = np.where(leaf, 1, np.where((i ^ bit) & 1, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    s = si.astype(np.float64) / (2.0 * MAX_SIZE)
    t = ti.astype(np.float64) / (2.0 * MAX_SIZE)
    x, y, z = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
    lat = np.rad2deg(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.rad2deg(np.arctan2(y, x))
    return lat, lon


def s2_token(ids: np.ndarray) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    ids = np.asarray(ids, dtype=np.uint64)
    out = np.empty(len(ids), dtype=object)
    for n, ident in enumerate(ids):  # tokens are for display/API, not hot path
        h = format(int(ident), "016x").rstrip("0")
        out[n] = h if h else "X"  # the (invalid) zero id, per the S2 convention
    return out


def s2_token_to_id(tokens) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    for n, t in enumerate(tokens):
        out[n] = _U(0) if t == "X" else _U(int(t.ljust(16, "0"), 16))
    return out


def s2_cover_bbox(
    min_lat: float, min_lon: float, max_lat: float, max_lon: float, level: int
) -> np.ndarray:
    """Conservative S2 covering of a lat/lon bbox at ``level`` — the cell
    prefilter for the two-phase (cell -> exact) spatial joins.

    Returns a SUPERSET of every level-``level`` cell containing any point
    of the bbox (the exactness contract a prefilter needs): the bbox's
    boundary is sampled densely in (u, v) face space, the st range padded
    by one full cell, and the resulting ij rectangle enumerated. u and v
    attain their extrema over an axis-aligned lat/lon rectangle on its
    boundary (u depends only on lon; v is monotone in lat for fixed lon),
    so boundary sampling plus the one-cell pad bounds the range. Restricted
    to bboxes whose corners all project to ONE cube face (raises
    ValueError otherwise) — the multi-face general case needs the
    neighbor-wrap tables and is out of scope for the fixture regions."""
    if not (min_lat <= max_lat and min_lon <= max_lon):
        raise ValueError("malformed bbox")
    corners_lat = np.array([min_lat, min_lat, max_lat, max_lat])
    corners_lon = np.array([min_lon, max_lon, min_lon, max_lon])
    face_c, _, _ = _xyz_to_face_uv(*_latlng_to_xyz(corners_lat, corners_lon))
    if len(np.unique(face_c)) != 1:
        raise ValueError("s2_cover_bbox: bbox spans multiple cube faces")
    face = int(face_c[0])

    m = 1024  # boundary samples per edge
    ts = np.linspace(0.0, 1.0, m)
    blat = np.concatenate(
        [
            np.full(m, min_lat),
            np.full(m, max_lat),
            min_lat + (max_lat - min_lat) * ts,
            min_lat + (max_lat - min_lat) * ts,
        ]
    )
    blon = np.concatenate(
        [
            min_lon + (max_lon - min_lon) * ts,
            min_lon + (max_lon - min_lon) * ts,
            np.full(m, min_lon),
            np.full(m, max_lon),
        ]
    )
    bface, bu, bv = _xyz_to_face_uv(*_latlng_to_xyz(blat, blon))
    if (bface != face).any():
        raise ValueError("s2_cover_bbox: bbox spans multiple cube faces")
    s = _uv_to_st(bu)
    t = _uv_to_st(bv)
    cell_st = 1.0 / (1 << level)  # one cell side in st units (the pad)
    shift = 30 - level
    i0 = int(_st_to_ij(np.array([max(s.min() - cell_st, 0.0)]))[0]) >> shift
    i1 = int(_st_to_ij(np.array([min(s.max() + cell_st, 1.0)]))[0]) >> shift
    j0 = int(_st_to_ij(np.array([max(t.min() - cell_st, 0.0)]))[0]) >> shift
    j1 = int(_st_to_ij(np.array([min(t.max() + cell_st, 1.0)]))[0]) >> shift
    ii, jj = np.meshgrid(
        np.arange(i0, i1 + 1, dtype=np.int64), np.arange(j0, j1 + 1, dtype=np.int64),
        indexing="ij",
    )
    leaf = from_face_ij(
        np.full(ii.size, face, dtype=np.int64), ii.ravel() << shift, jj.ravel() << shift
    )
    return np.unique(s2_parent(leaf, level))
