"""Vectorized geodesic math on WGS84 (from scratch; pyproj is unavailable).

The reference computes distances with ``pyproj.Geod(ellps='WGS84').inv``
(osm_waterway_extractor.py:997-1035) and falls back to a flat-earth
approximation (:1022-1035). Here:

  * ``vincenty_m`` — numpy-vectorized Vincenty inverse on the WGS84
    ellipsoid (T. Vincenty 1975, public algorithm). Agrees with
    GeographicLib/pyproj to well under 1 mm for the non-antipodal distances
    this engine computes (consecutive waterway vertices, snap tolerances of
    meters); near-antipodal non-convergent pairs fall back to haversine.
  * ``haversine_m`` — great-circle distance on the WGS84 mean sphere.
    Used where a DuckDB-oracle-expressible distance is required.
  * ``approximate_m`` — the reference's flat-earth fallback, formula-for-
    formula (dx = dlat_rad*111000; dy = dlon_rad*111000*cos(mean lat)), ref
    :1022-1035.

All functions take numpy float64 arrays (broadcastable) of degrees and
return meters.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
# WGS84 mean earth radius (IUGG R1) used by the haversine path.
EARTH_R = 6371008.8


def haversine_m(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def approximate_m(lat1, lon1, lat2, lon2):
    """Reference's flat-earth fallback, ref :1022-1035 (note: it scales both
    axes by 111000 m/deg and corrects lon by cos(mean lat))."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    lat_avg = (lat1 + lat2) / 2.0
    dx = dlat * 111000.0
    dy = dlon * 111000.0 * np.cos(lat_avg)
    return np.sqrt(dx * dx + dy * dy)


def vincenty_m(lat1, lon1, lat2, lon2, max_iter: int = 50, tol: float = 1e-12):
    """Vectorized Vincenty inverse distance (meters) on WGS84."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    scalar = lat1.ndim == 0 and lat2.ndim == 0
    lat1, lon1, lat2, lon2 = np.broadcast_arrays(lat1, lon1, lat2, lon2)
    lat1 = np.atleast_1d(lat1).astype(np.float64)
    lon1 = np.atleast_1d(lon1).astype(np.float64)
    lat2 = np.atleast_1d(lat2).astype(np.float64)
    lon2 = np.atleast_1d(lon2).astype(np.float64)

    f = WGS84_F
    L = np.radians(lon2 - lon1)
    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    active = np.ones(lam.shape, dtype=bool)
    sinSigma = np.zeros_like(lam)
    cosSigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cosSqAlpha = np.ones_like(lam)
    cos2SigmaM = np.zeros_like(lam)

    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(max_iter):
            if not active.any():
                break
            sinLam = np.sin(lam)
            cosLam = np.cos(lam)
            t1 = cosU2 * sinLam
            t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLam
            sS = np.sqrt(t1 * t1 + t2 * t2)
            cS = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
            sig = np.arctan2(sS, cS)
            sinAlpha = np.where(sS != 0.0, cosU1 * cosU2 * sinLam / np.where(sS == 0.0, 1.0, sS), 0.0)
            cSqA = 1.0 - sinAlpha * sinAlpha
            c2SM = np.where(cSqA != 0.0, cS - 2.0 * sinU1 * sinU2 / np.where(cSqA == 0.0, 1.0, cSqA), 0.0)
            C = f / 16.0 * cSqA * (4.0 + f * (4.0 - 3.0 * cSqA))
            lamNew = L + (1.0 - C) * f * sinAlpha * (
                sig + C * sS * (c2SM + C * cS * (-1.0 + 2.0 * c2SM * c2SM))
            )
            upd = active
            sinSigma = np.where(upd, sS, sinSigma)
            cosSigma = np.where(upd, cS, cosSigma)
            sigma = np.where(upd, sig, sigma)
            cosSqAlpha = np.where(upd, cSqA, cosSqAlpha)
            cos2SigmaM = np.where(upd, c2SM, cos2SigmaM)
            delta = np.abs(lamNew - lam)
            lam = np.where(upd, lamNew, lam)
            active = active & (delta > tol)

    uSq = cosSqAlpha * (WGS84_A**2 - WGS84_B**2) / (WGS84_B**2)
    A = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    B = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    deltaSigma = (
        B
        * sinSigma
        * (
            cos2SigmaM
            + B
            / 4.0
            * (
                cosSigma * (-1.0 + 2.0 * cos2SigmaM**2)
                - B
                / 6.0
                * cos2SigmaM
                * (-3.0 + 4.0 * sinSigma**2)
                * (-3.0 + 4.0 * cos2SigmaM**2)
            )
        )
    )
    dist = WGS84_B * A * (sigma - deltaSigma)

    # Coincident points -> exactly 0; non-converged (near-antipodal) -> haversine.
    coincident = (lat1 == lat2) & (lon1 == lon2)
    dist = np.where(coincident, 0.0, dist)
    if active.any():
        bad = active & ~coincident
        if bad.any():
            dist = np.where(bad, haversine_m(lat1, lon1, lat2, lon2), dist)
    dist = np.where(np.isnan(dist), 0.0, dist)
    return float(dist[0]) if scalar else dist


_METHODS = {
    "geodesic": vincenty_m,
    "haversine": haversine_m,
    "approximate": approximate_m,
    "projected": approximate_m,  # ref treats any non-"geodesic" as approximate (:1014-1020)
}


def distance_m(lat1, lon1, lat2, lon2, method: str = "geodesic"):
    return _METHODS.get(method, approximate_m)(lat1, lon1, lat2, lon2)


def polyline_lengths_m(
    flat_lats: np.ndarray, flat_lons: np.ndarray, offsets: np.ndarray, method: str = "geodesic"
) -> np.ndarray:
    """Total geodesic length per polyline, vectorized across a whole batch.

    ``flat_lats/flat_lons`` are the concatenated vertices of all polylines;
    ``offsets`` is the Arrow-style offsets array (len = n_lines + 1). One
    distance kernel call covers every consecutive-vertex pair in the batch
    (the reference loops per line, ref :1037-1076).
    """
    n = len(offsets) - 1
    if len(flat_lats) < 2:
        return np.zeros(n, dtype=np.float64)
    seg = distance_m(flat_lats[:-1], flat_lons[:-1], flat_lats[1:], flat_lons[1:], method)
    # Zero out the "segments" that bridge consecutive polylines.
    seg = np.asarray(seg, dtype=np.float64).copy()
    ends = offsets[1:-1] - 1  # index of last vertex of each line except the final one
    seg[ends] = 0.0
    # Per-line sequential sums via reduceat — NOT a batch-global cumsum
    # prefix difference, whose low bits would depend on which other lines
    # share the batch (results must not vary with block structure). The
    # zeroed bridge segment a range picks up is exact (+0.0). Degenerate
    # (<2-vertex) lines get a clipped/empty reduceat range whose garbage
    # value is masked to 0.
    if len(seg) == 0:  # only degenerate (<2-vertex) lines in the batch
        return np.zeros(n, dtype=np.float64)
    starts = np.minimum(offsets[:-1], len(seg) - 1)
    sums = np.add.reduceat(seg, starts)
    return np.where(np.diff(offsets) >= 2, sums, 0.0)
