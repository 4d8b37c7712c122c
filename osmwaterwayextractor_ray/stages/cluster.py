"""Stage 3 — distributed snap-tolerance clustering (C4, SURVEY §4.3).

The reference builds ONE driver-resident R-tree + union-find over every
endpoint/junction (osm_waterway_extractor.py:1253-1331). Here the same
result is computed distributedly:

  1. every point is emitted to its own grid cell plus any neighbor cell
     whose boundary lies within the snap tolerance (halo ring; replication
     factor <= 4 because tolerance << cell edge);
  2. ``groupby(cell).map_groups``: exact pairwise geodesic distances within
     the cell(+halo) group -> local union-find -> (key, root) rows, with
     root = min member key (deterministic regardless of union order);
  3. boundary merge: a point linked in two different cell groups carries two
     different roots -> those roots are equivalent. The equivalence edges
     (tiny: only clusters straddling cell boundaries) are collected to the
     driver, closed with union-find, and broadcast back as a root remap;
  4. ``groupby(final_root).map_groups``: centroid = arithmetic mean of the
     member coordinates (summed in sorted-key order for cross-partition
     determinism; the reference sums in Python-dict order, ref :1333-1343),
     displacement validation per ref :1305-1324 (hard ValueError when any
     member moved more than snap_tolerance * max_displacement_multiplier).

Every pair within tolerance is discovered in >= 1 common group (both points
fall inside that cell's halo), so the union of local components + boundary
merge equals the reference's global connected components exactly — the
parity tests check this against a faithful sequential re-implementation.

Skew note: a pathological cell with > ``hot_cell_row_limit`` points is
processed in chunked pair-blocks inside the group kernel to bound memory
(the O(n^2) distance matrix is never materialized whole).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import cell_ids_with_halo
from osmwaterwayextractor_ray.functions.geodesy import distance_m
from osmwaterwayextractor_ray.state.unionfind import UnionFind, connected_components_from_pairs


def _halo_deg(lats: np.ndarray, tol_m: float) -> np.ndarray:
    """Conservative per-point degree radius for a metric tolerance — the
    reference's bbox buffer formula (ref :1195-1198)."""
    lat_deg_per_m = 1.0 / 111000.0
    cosv = np.maximum(np.cos(np.radians(lats)), 0.01)
    return tol_m * lat_deg_per_m / cosv


def emit_halo_cells(points_ds, config: Config):
    cell_deg = config.cluster_cell_deg
    tol = config.snap_tolerance_m

    def emit(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        lats = batch.column("lat").to_numpy(zero_copy_only=False)
        lons = batch.column("lon").to_numpy(zero_copy_only=False)
        rows, cells = cell_ids_with_halo(lats, lons, cell_deg, _halo_deg(lats, tol))
        return pa.table(
            {
                "cell": pa.array(cells, type=pa.int64()),
                "key": pa.array(keys[rows], type=pa.int64()),
                "lat": pa.array(lats[rows], type=pa.float64()),
                "lon": pa.array(lons[rows], type=pa.float64()),
            }
        )

    return points_ds.map_batches(emit, batch_format="pyarrow")


def _pairs_within_tol(
    lats: np.ndarray, lons: np.ndarray, tol_m: float, method: str, block: int = 2048
) -> tuple[np.ndarray, np.ndarray]:
    """Indices (i, j), i<j, of point pairs within geodesic tolerance.
    Degree-space bbox prefilter, then the exact configured distance —
    mirroring the reference's rtree-prefilter + geodesic check."""
    n = len(lats)
    out_i, out_j = [], []
    halo = _halo_deg(lats, tol_m)
    for s in range(0, n, block):
        e = min(n, s + block)
        dlat = np.abs(lats[s:e, None] - lats[None, :])
        dlon = np.abs(lons[s:e, None] - lons[None, :])
        cand = (dlat <= halo[s:e, None]) & (dlon <= halo[s:e, None])
        ii, jj = np.nonzero(cand)
        ii = ii + s
        m = ii < jj
        ii, jj = ii[m], jj[m]
        if len(ii) == 0:
            continue
        d = distance_m(lats[ii], lons[ii], lats[jj], lons[jj], method)
        hit = d <= tol_m
        out_i.append(ii[hit])
        out_j.append(jj[hit])
    if not out_i:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    return np.concatenate(out_i), np.concatenate(out_j)


def make_cell_cluster_fn(config: Config):
    tol = config.snap_tolerance_m
    method = config.distance_calculation_method

    def cell_cluster(group: pd.DataFrame) -> pd.DataFrame:
        # group rows may contain duplicate keys (a point emitted to this cell
        # both as owner and... no — one emission per (point, cell)); keys unique
        keys = group["key"].to_numpy()
        lats = group["lat"].to_numpy()
        lons = group["lon"].to_numpy()
        order = np.argsort(keys)
        keys, lats, lons = keys[order], lats[order], lons[order]
        ii, jj = _pairs_within_tol(lats, lons, tol, method)
        uf = UnionFind()
        for k in keys.tolist():
            uf.add(k)
        ki = keys[ii]
        kj = keys[jj]
        for a, b in zip(ki.tolist(), kj.tolist()):
            uf.union(a, b)
        roots = uf.components_min_root()
        return pd.DataFrame(
            {"key": keys, "root": np.fromiter((roots[k] for k in keys.tolist()), dtype=np.int64, count=len(keys))}
        )

    return cell_cluster


def cluster_points(points_ds, config: Config):
    """points(key, lat, lon) -> coord_mapping Dataset
    (key, lat, lon, c_lat, c_lon, displacement_m, cluster_size)."""
    emitted = emit_halo_cells(points_ds, config)
    assignments = emitted.groupby("cell").map_groups(
        make_cell_cluster_fn(config), batch_format="pandas"
    )

    # ---- boundary merge (root equivalences across cells) ----
    def root_edges(group: pd.DataFrame) -> pd.DataFrame:
        roots = group["root"].unique()
        if len(roots) <= 1:
            return pd.DataFrame({"ra": np.array([], dtype=np.int64), "rb": np.array([], dtype=np.int64)})
        m = roots.min()
        other = roots[roots != m]
        return pd.DataFrame({"ra": other.astype(np.int64), "rb": np.full(len(other), m, dtype=np.int64)})

    edges = assignments.groupby("key").map_groups(root_edges, batch_format="pandas")
    edges_pdf = edges.to_pandas()  # tiny: only clusters straddling cell boundaries
    if len(edges_pdf):
        remap = connected_components_from_pairs(
            edges_pdf["ra"].to_numpy(), edges_pdf["rb"].to_numpy()
        )
    else:
        remap = {}
    remap_ref = ray.put(remap)

    def apply_remap(batch: pa.Table) -> pa.Table:
        rm = ray.get(remap_ref)
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        roots = batch.column("root").to_numpy(zero_copy_only=False)
        if rm:
            roots = np.fromiter((rm.get(r, r) for r in roots.tolist()), dtype=np.int64, count=len(roots))
        return pa.table(
            {"key": pa.array(keys, type=pa.int64()), "root": pa.array(roots, type=pa.int64())}
        )

    final_assign = assignments.map_batches(apply_remap, batch_format="pyarrow")

    # dedupe (a point appears once per cell it was emitted to)
    def dedupe(group: pd.DataFrame) -> pd.DataFrame:
        return group.iloc[:1]

    distinct = final_assign.groupby("key").map_groups(dedupe, batch_format="pandas")

    # ---- centroids + displacement validation per final root ----
    precision = config.coordinate_precision
    tol = config.snap_tolerance_m
    max_allowed = tol * config.max_displacement_multiplier
    method = config.distance_calculation_method

    def centroid_group(group: pd.DataFrame) -> pd.DataFrame:
        from osmwaterwayextractor_ray.functions.cells import key_to_coord

        keys = np.sort(group["key"].to_numpy())
        lats, lons = key_to_coord(keys, precision)
        n = len(keys)
        if n == 1:
            return pd.DataFrame(
                {
                    "key": keys,
                    "lat": lats,
                    "lon": lons,
                    "c_lat": lats,
                    "c_lon": lons,
                    "displacement_m": np.zeros(1),
                    "cluster_size": np.ones(1, dtype=np.int64),
                }
            )
        c_lat = float(np.sum(lats) / n)
        c_lon = float(np.sum(lons) / n)
        disp = np.asarray(distance_m(lats, lons, c_lat, c_lon, method), dtype=np.float64)
        if disp.max() > max_allowed:
            raise ValueError(
                f"Cluster displacement {disp.max():.2f}m exceeds safety threshold {max_allowed:.2f}m"
            )
        return pd.DataFrame(
            {
                "key": keys,
                "lat": lats,
                "lon": lons,
                "c_lat": np.full(n, c_lat),
                "c_lon": np.full(n, c_lon),
                "displacement_m": disp,
                "cluster_size": np.full(n, n, dtype=np.int64),
            }
        )

    return distinct.groupby("root").map_groups(centroid_group, batch_format="pandas")
