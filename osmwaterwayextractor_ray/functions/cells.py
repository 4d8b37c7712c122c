"""Spatial cell index (equal-angle grid, from scratch).

H3/S2 libraries are unavailable in this environment, so the engine's
spatial-shuffle key is a deterministic equal-angle grid: at the default
``cell_deg = 0.01`` a cell is ~1.1 km on a side at the equator — the same
order as H3 res-7 (~1.2 km) / S2 level-12 cells named in the design. The
key is a single int64, invertible, SQL-expressible (the DuckDB oracles
reproduce it with floor arithmetic), and supports O(1) neighbor/halo
enumeration — the three properties the shuffles in stages/ rely on.

    lat_idx = floor((lat + 90)  / cell_deg)
    lon_idx = floor((lon + 180) / cell_deg)
    cell    = lat_idx * N_LON + lon_idx        (N_LON = ceil(360/cell_deg) + 1)

Also provides the scaled-int coordinate key used for exact coordinate
equality across workers: the reference compares rounded float tuples
(osm_waterway_extractor.py:1579-1583); the distributed equivalent is the
pair (round(lat*10^p), round(lon*10^p)) packed into one int64 — identical
equality semantics, stable hash partitioning.
"""

from __future__ import annotations

import numpy as np


def n_lon(cell_deg: float) -> int:
    return int(np.ceil(360.0 / cell_deg)) + 1


def cell_id(lats, lons, cell_deg: float = 0.01) -> np.ndarray:
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    lat_idx = np.floor((lats + 90.0) / cell_deg).astype(np.int64)
    lon_idx = np.floor((lons + 180.0) / cell_deg).astype(np.int64)
    return lat_idx * n_lon(cell_deg) + lon_idx


def cell_ids_with_halo(
    lats: np.ndarray, lons: np.ndarray, cell_deg: float, halo_deg: float
) -> tuple[np.ndarray, np.ndarray]:
    """For each point, its own cell plus every neighboring cell whose
    boundary lies within ``halo_deg``. Returns (row_index, cell) pairs.

    With halo_deg < cell_deg each point lands in at most 4 cells (its own
    plus up to 3 neighbors around the nearest corner) — the replication
    factor of the clustering shuffle is bounded by 4, and in practice is
    ~1 + 2*halo/cell.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    NL = n_lon(cell_deg)
    flat = (lats + 90.0) / cell_deg
    flon = (lons + 180.0) / cell_deg
    lat_idx = np.floor(flat).astype(np.int64)
    lon_idx = np.floor(flon).astype(np.int64)
    h = halo_deg / cell_deg  # halo in cell units
    rows = [np.arange(len(lats))]
    cells = [lat_idx * NL + lon_idx]
    lo_lat = (flat - lat_idx) < h
    hi_lat = (lat_idx + 1 - flat) < h
    lo_lon = (flon - lon_idx) < h
    hi_lon = (lon_idx + 1 - flon) < h
    for dlat, mlat in ((-1, lo_lat), (1, hi_lat)):
        idx = np.nonzero(mlat)[0]
        rows.append(idx)
        cells.append((lat_idx[idx] + dlat) * NL + lon_idx[idx])
    for dlon, mlon in ((-1, lo_lon), (1, hi_lon)):
        idx = np.nonzero(mlon)[0]
        rows.append(idx)
        cells.append(lat_idx[idx] * NL + lon_idx[idx] + dlon)
    for dlat, mlat in ((-1, lo_lat), (1, hi_lat)):
        for dlon, mlon in ((-1, lo_lon), (1, hi_lon)):
            idx = np.nonzero(mlat & mlon)[0]
            rows.append(idx)
            cells.append((lat_idx[idx] + dlat) * NL + lon_idx[idx] + dlon)
    return np.concatenate(rows), np.concatenate(cells)


def bbox_cells(
    min_lat: float, min_lon: float, max_lat: float, max_lon: float, cell_deg: float
) -> np.ndarray:
    """All cells covering a bounding box (used for polyline/polygon covers)."""
    NL = n_lon(cell_deg)
    la0 = int(np.floor((min_lat + 90.0) / cell_deg))
    la1 = int(np.floor((max_lat + 90.0) / cell_deg))
    lo0 = int(np.floor((min_lon + 180.0) / cell_deg))
    lo1 = int(np.floor((max_lon + 180.0) / cell_deg))
    la = np.arange(la0, la1 + 1, dtype=np.int64)
    lo = np.arange(lo0, lo1 + 1, dtype=np.int64)
    return (la[:, None] * NL + lo[None, :]).ravel()


# ---- scaled-int coordinate keys ----

_KEY_SHIFT = 1 << 30  # lon index < 360e6 < 2^29 at precision 6


def coord_key(lats, lons, precision: int = 6) -> np.ndarray:
    """Pack a rounded (lat, lon) into one int64; equality of keys ==
    equality of the reference's rounded float tuples."""
    scale = 10.0**precision
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    lat_i = np.rint((lats + 90.0) * scale).astype(np.int64)
    lon_i = np.rint((lons + 180.0) * scale).astype(np.int64)
    return lat_i * _KEY_SHIFT + lon_i


def key_to_coord(keys: np.ndarray, precision: int = 6) -> tuple[np.ndarray, np.ndarray]:
    """Invert coord_key. The final np.round re-snaps to the same float the
    original round(lat, precision) produced (the offset arithmetic would
    otherwise land 1-2 ulp away, which would change the id-hash strings)."""
    scale = 10.0**precision
    keys = np.asarray(keys, dtype=np.int64)
    lat_i = keys // _KEY_SHIFT
    lon_i = keys - lat_i * _KEY_SHIFT
    return (
        np.round(lat_i / scale - 90.0, precision),
        np.round(lon_i / scale - 180.0, precision),
    )
