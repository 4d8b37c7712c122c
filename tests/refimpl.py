"""Sequential, reference-faithful waterway-graph oracle (tests only).

The reference script cannot run in this environment (osmium/shapely/pyproj
absent), so parity is checked against this sequential re-implementation of
its exact control flow (cited per function), built on the same from-scratch
kernels the distributed engine uses. The distributed pipeline must produce
identical node/edge sets, adjacency, ids and lengths for any input this
oracle can handle — randomized networks included (hypothesis tests).

Divergences from the reference (documented, unobservable here):
  * geodesic distances: Vincenty instead of pyproj/Karney (<1mm difference);
  * cluster-centroid summation order: sorted-by-coord-key (the reference
    sums in CPython dict order);
  * vertex position-along-line uses cumulative arclength (shapely project()
    equals this except for pathological self-approaching lines).
"""

from __future__ import annotations

import numpy as np

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import coord_key
from osmwaterwayextractor_ray.functions.geodesy import distance_m
from osmwaterwayextractor_ray.functions.geometry import (
    polyline_intersections,
    project_points_on_polyline,
    simplify_dp,
    vertex_positions,
)
from osmwaterwayextractor_ray.functions.hashing import edge_id, node_id
from osmwaterwayextractor_ray.functions.width import parse_width


def _dist(c1, c2, cfg: Config) -> float:
    return float(
        distance_m(
            np.array([c1[0]]), np.array([c1[1]]), np.array([c2[0]]), np.array([c2[1]]),
            cfg.distance_calculation_method,
        )[0]
    )


def process_waterways(waterways: list[dict], cfg: Config) -> list[dict]:
    """ref :1569-1599 — round + consecutive-dedup + drop <2."""
    out = []
    for w in waterways:
        coords = w["coordinates"]
        if len(coords) < 2:
            continue
        rc = [(round(a, cfg.coordinate_precision) + 0.0, round(b, cfg.coordinate_precision) + 0.0) for a, b in coords]
        ded = [rc[0]]
        for c in rc[1:]:
            if c != ded[-1]:
                ded.append(c)
        if len(ded) >= 2:
            out.append({"id": w["id"], "coordinates": ded, "tags": w["tags"]})
    return out


def simplify_waterways(waterways: list[dict], cfg: Config) -> list[dict]:
    """ref :1710-1748."""
    if not cfg.enable_geometry_simplification:
        return waterways
    tol_deg = cfg.simplification_tolerance_m * 1e-5
    out = []
    for w in waterways:
        coords = w["coordinates"]
        if len(coords) < 2:
            continue
        lats = np.array([c[0] for c in coords])
        lons = np.array([c[1] for c in coords])
        keep = simplify_dp(lats, lons, tol_deg)
        sc = [c for c, k in zip(coords, keep) if k]
        if len(sc) >= 2:
            out.append({"id": w["id"], "coordinates": sc, "tags": w["tags"]})
    return out


def detect_intersection_points(waterways: list[dict]) -> list[tuple[float, float]]:
    """ref :1818-1932 — all pairwise Point/MultiPoint intersections, i<j."""
    pts: list[tuple[float, float]] = []
    geoms = []
    for w in waterways:
        c = w["coordinates"]
        geoms.append((np.array([p[0] for p in c]), np.array([p[1] for p in c])))
    for i in range(len(waterways)):
        for j in range(i + 1, len(waterways)):
            pts.extend(polyline_intersections(geoms[i][0], geoms[i][1], geoms[j][0], geoms[j][1]))
    return pts


def split_at_intersections(
    waterways: list[dict], points: list[tuple[float, float]], cfg: Config
) -> list[dict]:
    """ref :2039-2152."""
    if len(waterways) < 2 or not points:
        return waterways
    tol_deg = cfg.snap_tolerance_m * 1e-5
    p_lat = np.array([p[0] for p in points])
    p_lon = np.array([p[1] for p in points])
    out = []
    for w in waterways:
        coords = w["coordinates"]
        if len(coords) < 2:
            out.append(w)
            continue
        lats = np.array([c[0] for c in coords])
        lons = np.array([c[1] for c in coords])
        dist, pos = project_points_on_polyline(lats, lons, p_lat, p_lon)
        on = dist < tol_deg
        if not on.any():
            out.append(w)
            continue
        order = np.argsort(pos[on], kind="stable")
        sel_pos = pos[on][order]
        sel_lat = p_lat[on][order]
        sel_lon = p_lon[on][order]
        vpos = vertex_positions(lats, lons)
        new_coords: list[tuple[float, float]] = []
        for i, c in enumerate(coords):
            new_coords.append(c)
            if i < len(coords) - 1:
                in_seg = (sel_pos > vpos[i]) & (sel_pos < vpos[i + 1])
                for la, lo in zip(sel_lat[in_seg].tolist(), sel_lon[in_seg].tolist()):
                    r = (round(la, cfg.coordinate_precision), round(lo, cfg.coordinate_precision))
                    if r not in new_coords:
                        new_coords.append(r)
        ded = [new_coords[0]]
        for c in new_coords[1:]:
            if c != ded[-1]:
                ded.append(c)
        out.append({"id": w["id"], "coordinates": ded, "tags": w["tags"]})
    return out


def extract_endpoints_and_junctions(waterways: list[dict]):
    """ref :2286-2316."""
    from collections import Counter

    endpoint_count: Counter = Counter()
    all_count: Counter = Counter()
    all_endpoints = []
    for w in waterways:
        coords = w["coordinates"]
        endpoint_count[coords[0]] += 1
        endpoint_count[coords[-1]] += 1
        all_endpoints.extend([coords[0], coords[-1]])
        for c in coords:
            all_count[c] += 1
    ep_junctions = [c for c, n in endpoint_count.items() if n > 1]
    interior = [c for c, n in all_count.items() if n > 1 and c not in ep_junctions]
    return list(set(all_endpoints)), ep_junctions + interior


def cluster_endpoints(points: list[tuple[float, float]], cfg: Config):
    """ref :1253-1331 — global union-find + arithmetic-mean centroids,
    displacement validation. Summation in sorted-key order (see module doc)."""
    from osmwaterwayextractor_ray.state.unionfind import UnionFind

    pts = list(dict.fromkeys(points))  # UF.add dedups
    lats = np.array([p[0] for p in pts])
    lons = np.array([p[1] for p in pts])
    keys = coord_key(lats, lons, cfg.coordinate_precision)
    uf = UnionFind()
    for k in keys.tolist():
        uf.add(k)
    # bbox prefilter quirk replicated from ref :1195-1216: the rtree query
    # buffer is tol * (1/111000)/max(cos(lat),0.01) at the QUERY point's
    # latitude; a pair is unioned iff either endpoint's query sees the
    # other AND exact distance <= tol. (The buffer slightly under-covers
    # meridian distances near the equator — the reference misses those
    # pairs and so do we.)
    buf = cfg.snap_tolerance_m * (1.0 / 111000.0) / np.maximum(
        np.cos(np.radians(lats)), 0.01
    )
    for i in range(len(pts)):
        dlat = np.abs(lats - lats[i])
        dlon = np.abs(lons - lons[i])
        cand = (dlat <= buf[i]) & (dlon <= buf[i])
        if not cand.any():
            continue
        d = distance_m(
            np.full(len(pts), lats[i]), np.full(len(pts), lons[i]), lats, lons,
            cfg.distance_calculation_method,
        )
        for j in np.nonzero(cand & (d <= cfg.snap_tolerance_m))[0]:
            if j != i:
                uf.union(int(keys[i]), int(keys[j]))
    roots = uf.components_min_root()
    by_root: dict[int, list[int]] = {}
    for i, k in enumerate(keys.tolist()):
        by_root.setdefault(roots[k], []).append(i)
    coord_mapping: dict[tuple[float, float], tuple[float, float]] = {}
    scale = 10.0**cfg.coordinate_precision
    for root, members in by_root.items():
        members = sorted(members, key=lambda i: int(keys[i]))
        if len(members) == 1:
            c = pts[members[0]]
            coord_mapping[c] = c
            continue
        # centroid via exact scaled-integer sums — order-independent (the
        # reference's float sum depends on dict order; divergence is at the
        # last ulp and documented in the module docstring)
        lat_i = (keys[members] // (1 << 30)).astype(np.int64)
        lon_i = (keys[members] - lat_i * (1 << 30)).astype(np.int64)
        n = len(members)
        centroid = (
            float((int(lat_i.sum()) / n) / scale - 90.0),
            float((int(lon_i.sum()) / n) / scale - 180.0),
        )
        max_disp = 0.0
        for i in members:
            disp = _dist(pts[i], centroid, cfg)
            max_disp = max(max_disp, disp)
            coord_mapping[pts[i]] = centroid
        if max_disp > cfg.snap_tolerance_m * cfg.max_displacement_multiplier:
            raise ValueError("Cluster displacement exceeds safety threshold")
    return coord_mapping


def create_edges(waterways: list[dict], coord_mapping: dict, cfg: Config) -> list[dict]:
    """ref :2466-2605 (sequential path) including the junction-set quirk."""
    junction_coords = set(coord_mapping.keys())  # see stages/edges.py doc
    edges = []
    for w in waterways:
        coords = [coord_mapping.get(c, c) for c in w["coordinates"]]
        way_id = w["id"]
        tags = w["tags"]
        if len(coords) < 2:
            continue
        jidx = [
            i
            for i, c in enumerate(coords)
            if c in junction_coords or i == 0 or i == len(coords) - 1
        ]
        for i in range(len(jidx) - 1):
            a, b = jidx[i], jidx[i + 1]
            if b <= a:
                continue
            seg = coords[a : b + 1]
            if len(seg) < 2:
                continue
            la = np.array([c[0] for c in seg])
            lo = np.array([c[1] for c in seg])
            length = float(
                np.sum(distance_m(la[:-1], lo[:-1], la[1:], lo[1:], cfg.distance_calculation_method))
            )
            f_id = node_id(seg[0][0], seg[0][1], cfg.coordinate_precision, cfg.hash_length)
            t_id = node_id(seg[-1][0], seg[-1][1], cfg.coordinate_precision, cfg.hash_length)
            w_m, w_src = parse_width(tags.get("width", ""))
            edges.append(
                {
                    "id": edge_id(f_id, t_id, way_id, i, cfg.hash_length),
                    "from_node_id": f_id,
                    "to_node_id": t_id,
                    "length_m": length,
                    "coordinates": seg,
                    "name": tags.get("name", ""),
                    "type": tags.get("waterway", ""),
                    "width_raw": tags.get("width", ""),
                    "width_m": w_m,
                    "width_source": w_src,
                    "original_way_id": way_id,
                }
            )
    return [e for e in edges if e["length_m"] >= cfg.min_fragment_length_m]


def build_nodes(coord_mapping: dict, cfg: Config) -> list[dict]:
    """ref :2643-2660."""
    uniq = set(coord_mapping.values())
    return [
        {
            "id": node_id(la, lo, cfg.coordinate_precision, cfg.hash_length),
            "lat": la,
            "lon": lo,
            "type": "junction",
        }
        for la, lo in uniq
    ]


def build_graph(waterways: list[dict], cfg: Config):
    """Full sequential pipeline, ref :1433-1523 step order."""
    processed = process_waterways(waterways, cfg)
    simplified = simplify_waterways(processed, cfg)
    if cfg.enable_intersection_detection and len(simplified) >= 2:
        pts = detect_intersection_points(simplified)
        with_x = split_at_intersections(simplified, pts, cfg)
    else:
        with_x = simplified
    endpoints, junctions = extract_endpoints_and_junctions(with_x)
    coord_mapping = cluster_endpoints(endpoints + junctions, cfg)
    edges = create_edges(with_x, coord_mapping, cfg)
    nodes = build_nodes(coord_mapping, cfg)
    return nodes, edges, coord_mapping
