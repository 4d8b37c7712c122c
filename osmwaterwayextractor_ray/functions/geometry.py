"""Planar geometry kernels in lon/lat degree space (from scratch; shapely is
unavailable here).

The reference does all exact geometry in *degree space* via shapely with
(x=lon, y=lat): Douglas-Peucker simplification (osm_waterway_extractor.py
:1710-1748, tolerance_m * 1e-5 degrees, preserve_topology=True),
LineString×LineString intersection (:1818-1932, Point/MultiPoint results
only — collinear overlaps deliberately ignored), point-to-line distance and
project() for intersection insertion (:2094-2107). These kernels reproduce
that degree-space math with numpy.
"""

from __future__ import annotations

import numpy as np


# ---------- Douglas-Peucker ----------

def _perp_dist_sq(px, py, ax, ay, bx, by):
    """Squared distance from points (px,py) to segment (a,b) — vectorized."""
    dx, dy = bx - ax, by - ay
    seg_len_sq = dx * dx + dy * dy
    if seg_len_sq == 0.0:
        ex, ey = px - ax, py - ay
        return ex * ex + ey * ey
    t = ((px - ax) * dx + (py - ay) * dy) / seg_len_sq
    t = np.clip(t, 0.0, 1.0)
    ex = px - (ax + t * dx)
    ey = py - (ay + t * dy)
    return ex * ex + ey * ey


def simplify_dp(lats: np.ndarray, lons: np.ndarray, tol_deg: float) -> np.ndarray:
    """Douglas-Peucker on one polyline in degree space; returns a boolean
    keep-mask over vertices. Matches shapely's simplify for LineStrings
    (preserve_topology only differs for self-intersecting results, which
    cannot arise from DP on a polyline's own vertices in the non-degenerate
    cases this pipeline feeds it; divergence documented in SURVEY §2.2 M3).

    Iterative stack implementation; distance tests vectorized per span.
    """
    n = len(lats)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    tol_sq = tol_deg * tol_deg
    stack = [(0, n - 1)]
    x, y = lons, lats
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = slice(i + 1, j)
        d2 = _perp_dist_sq(x[seg], y[seg], x[i], y[i], x[j], y[j])
        k = int(np.argmax(d2))
        if d2[k] > tol_sq:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


# ---------- segment-segment intersection ----------

def polyline_intersections(
    lats_a: np.ndarray, lons_a: np.ndarray, lats_b: np.ndarray, lons_b: np.ndarray
) -> list[tuple[float, float]]:
    """All point intersections between two polylines in degree space.

    Reproduces what the reference consumes from
    ``LineString(a).intersection(LineString(b))`` (:1874-1896): single- and
    multi-point crossings *including endpoint touches*; collinear-overlap
    (LineString) results are ignored, as the reference does (:1895-1896).

    Vectorized over the full ni×nj segment-pair cross product with a bbox
    prefilter. Returns unique (lat, lon) points.
    """
    ax, ay = lons_a[:-1], lats_a[:-1]
    bx, by = lons_a[1:], lats_a[1:]
    cx, cy = lons_b[:-1], lats_b[:-1]
    dx, dy = lons_b[1:], lats_b[1:]
    if len(ax) == 0 or len(cx) == 0:
        return []

    # bbox prefilter (pairs of segments whose boxes overlap)
    a_minx, a_maxx = np.minimum(ax, bx), np.maximum(ax, bx)
    a_miny, a_maxy = np.minimum(ay, by), np.maximum(ay, by)
    c_minx, c_maxx = np.minimum(cx, dx), np.maximum(cx, dx)
    c_miny, c_maxy = np.minimum(cy, dy), np.maximum(cy, dy)
    overlap = (
        (a_minx[:, None] <= c_maxx[None, :])
        & (a_maxx[:, None] >= c_minx[None, :])
        & (a_miny[:, None] <= c_maxy[None, :])
        & (a_maxy[:, None] >= c_miny[None, :])
    )
    ii, jj = np.nonzero(overlap)
    if len(ii) == 0:
        return []

    p0x, p0y = ax[ii], ay[ii]
    r_x, r_y = bx[ii] - p0x, by[ii] - p0y
    q0x, q0y = cx[jj], cy[jj]
    s_x, s_y = dx[jj] - q0x, dy[jj] - q0y

    denom = r_x * s_y - r_y * s_x
    qp_x, qp_y = q0x - p0x, q0y - p0y
    nonpar = denom != 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(nonpar, (qp_x * s_y - qp_y * s_x) / denom, -1.0)
        u = np.where(nonpar, (qp_x * r_y - qp_y * r_x) / denom, -1.0)
    hit = nonpar & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    px = (p0x[hit] + t[hit] * r_x[hit]).tolist()
    py = (p0y[hit] + t[hit] * r_y[hit]).tolist()

    # Collinear segments touching at exactly one point also intersect in a
    # Point (shapely reports these — e.g. a way continuing another way along
    # the same bearing); collinear *overlaps* (a segment) are ignored, ref
    # :1895-1896.
    collin = (~nonpar) & (qp_x * r_y - qp_y * r_x == 0.0)
    if collin.any():
        ci = np.nonzero(collin)[0]
        rlen2 = r_x[ci] ** 2 + r_y[ci] ** 2
        safe = np.where(rlen2 == 0.0, 1.0, rlen2)
        t0 = (qp_x[ci] * r_x[ci] + qp_y[ci] * r_y[ci]) / safe
        t1 = ((qp_x[ci] + s_x[ci]) * r_x[ci] + (qp_y[ci] + s_y[ci]) * r_y[ci]) / safe
        lo = np.maximum(0.0, np.minimum(t0, t1))
        hi = np.minimum(1.0, np.maximum(t0, t1))
        touch = (lo == hi) & (lo >= 0.0) & (lo <= 1.0) & (rlen2 > 0.0)
        ti = ci[touch]
        px.extend((p0x[ti] + lo[touch] * r_x[ti]).tolist())
        py.extend((p0y[ti] + lo[touch] * r_y[ti]).tolist())

    if not px:
        return []
    pts = {}
    for x, y in zip(px, py):
        pts[(y, x)] = None  # (lat, lon), dedupe exact duplicates (shared vertices)
    return list(pts.keys())


# ---------- point-to-polyline distance & position-along-line ----------

def project_points_on_polyline(
    lats: np.ndarray, lons: np.ndarray, pt_lats: np.ndarray, pt_lons: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """For each point: (min distance to polyline, arclength position of the
    globally nearest point) in degree space — the semantics of shapely's
    ``line.distance(pt)`` / ``line.project(pt)`` used at ref :2094-2099.
    """
    x, y = lons, lats
    ax, ay = x[:-1], y[:-1]
    bx, by = x[1:], y[1:]
    seg_dx, seg_dy = bx - ax, by - ay
    seg_len = np.sqrt(seg_dx * seg_dx + seg_dy * seg_dy)
    cum = np.concatenate(([0.0], np.cumsum(seg_len)))
    seg_len_sq = seg_dx * seg_dx + seg_dy * seg_dy
    safe = np.where(seg_len_sq == 0.0, 1.0, seg_len_sq)

    px = pt_lons[:, None]
    py = pt_lats[:, None]
    t = ((px - ax) * seg_dx + (py - ay) * seg_dy) / safe
    t = np.where(seg_len_sq == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    ex = px - (ax + t * seg_dx)
    ey = py - (ay + t * seg_dy)
    d2 = ex * ex + ey * ey
    k = np.argmin(d2, axis=1)
    rows = np.arange(len(pt_lats))
    dist = np.sqrt(d2[rows, k])
    pos = cum[k] + t[rows, k] * seg_len[k]
    return dist, pos


def vertex_positions(lats: np.ndarray, lons: np.ndarray) -> np.ndarray:
    """Cumulative degree-space arclength of each vertex (= line.project(vertex)
    for non-self-approaching lines; the reference calls project() on each
    vertex at :2118-2120, which equals the cumulative arclength unless the
    line passes closer to the vertex elsewhere — documented divergence for
    pathological self-approaching lines)."""
    dx = np.diff(lons)
    dy = np.diff(lats)
    return np.concatenate(([0.0], np.cumsum(np.sqrt(dx * dx + dy * dy))))


# ---------- point in polygon ----------

def points_in_ring(
    pt_lats: np.ndarray, pt_lons: np.ndarray, ring_lats: np.ndarray, ring_lons: np.ndarray
) -> np.ndarray:
    """Ray-crossing (even-odd) point-in-ring test, vectorized over points.

    Boundary behavior: the half-open crossing rule (y1 <= p < y2) — points
    exactly on a horizontal edge or on a vertex follow the standard
    even-odd convention. The engine's spatial-join fixtures avoid exact
    boundary points so the DuckDB oracle (half-plane CASE expressions)
    agrees bit-for-bit.
    """
    x = np.asarray(pt_lons, dtype=np.float64)
    y = np.asarray(pt_lats, dtype=np.float64)
    vx = np.asarray(ring_lons, dtype=np.float64)
    vy = np.asarray(ring_lats, dtype=np.float64)
    if vx[0] != vx[-1] or vy[0] != vy[-1]:
        vx = np.concatenate((vx, vx[:1]))
        vy = np.concatenate((vy, vy[:1]))
    inside = np.zeros(len(x), dtype=bool)
    for i in range(len(vx) - 1):
        x1, y1, x2, y2 = vx[i], vy[i], vx[i + 1], vy[i + 1]
        crosses = (y1 <= y[:]) != (y2 <= y[:])
        if y2 != y1:
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            inside ^= crosses & (x < xint)
    return inside


def points_in_polygon(
    pt_lats: np.ndarray, pt_lons: np.ndarray, rings: "list[tuple[np.ndarray, np.ndarray]]"
) -> np.ndarray:
    """Point-in-polygon with holes: even-odd rule across ALL rings (outer
    ring first, hole rings after — a point inside an odd number of rings is
    inside the polygon). Each ring is (lats, lons)."""
    inside = np.zeros(len(np.asarray(pt_lats)), dtype=bool)
    for ring_lats, ring_lons in rings:
        inside ^= points_in_ring(pt_lats, pt_lons, ring_lats, ring_lons)
    return inside
