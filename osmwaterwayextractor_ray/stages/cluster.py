"""Stage 3 — distributed snap-tolerance clustering (C4, SURVEY §4.3).

The reference builds ONE driver-resident R-tree + union-find over every
endpoint/junction (osm_waterway_extractor.py:1253-1331). Here the same
connected components are computed distributedly:

  1. every point is emitted to its own grid cell plus any neighbor cell
     whose boundary lies within the snap tolerance (halo; replication <= 4
     because tolerance << cell edge — ~1.00004x at the 2 m default);
  2. ``groupby(cell).map_groups``: local union-find per cell. The pair
     search inside a group is a lat-sweep (sorted-latitude window +
     longitude filter + exact geodesic check), not an n² matrix, so cells
     can be large — the cell size is a pure grouping knob (default 1°;
     shrink it for denser data, the results are identical for any size);
  3. SINGLE-PASS boundary merge: hash-bucket the (key, root) assignments
     by key (every replica of a key lands in one bucket), emit per key the
     min root as its primary assignment plus — for keys that saw more than
     one distinct root — every other root as an equivalence row. The full
     per-key root sets make the driver union-find closure complete in one
     round (a min/max fixpoint needs a round per extra root). The
     equivalence set is O(points near cell/salt borders) — tiny. Every
     pair within tolerance is discovered in ≥ 1 common group (both points
     fall inside that cell's halo), so the merged components equal the
     reference's global components exactly (pinned by the parity tests
     against the sequential oracle);
  4. centroid + member-attach fused into ONE bucket shuffle on the root:
     per-root exact integer sums of the key's scaled coordinate parts
     (c_lat = (Σ lat_i / n) / 1e6 - 90) via a vectorized in-bucket
     transform. Integer sums are exact and order-independent →
     bit-identical centroids for ANY partitioning or execution order (the
     reference's float sum depends on CPython dict order; refimpl.py
     documents this divergence). Singletons map to themselves exactly
     (identity, per ref :1301-1303);
  5. per-member displacement validation (hard ValueError past
     snap_tolerance * max_displacement_multiplier, ref :1314-1317) inside
     the same bucket pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import cell_ids_with_halo, key_to_coord, _KEY_SHIFT
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
    lats: np.ndarray, lons: np.ndarray, tol_m: float, method: str
) -> tuple[np.ndarray, np.ndarray]:
    """Indices (i, j), i<j, of point pairs within geodesic tolerance.

    Lat-sweep: points sorted by latitude; for each point only the window of
    points within the degree buffer in latitude is examined, then filtered
    by longitude and the exact configured distance — the same
    prefilter-then-exact structure as the reference's rtree query
    (:1191-1216), but sort-based and allocation-light."""
    n = len(lats)
    if n < 2:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    order = np.argsort(lats, kind="stable")
    slat = lats[order]
    slon = lons[order]
    halo = _halo_deg(slat, tol_m)
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    # Quirk parity: the reference unions a pair if EITHER endpoint's bbox
    # query (buffer computed at that endpoint's latitude, ref :1195-1198)
    # sees the other AND the exact distance passes. The sweep window uses
    # the group's max buffer (superset), then applies the exact either-bbox
    # condition before the distance test.
    hmax = float(halo.max())
    ends = np.searchsorted(slat, slat + hmax, side="right")
    for i in range(n):
        e = ends[i]
        if e <= i + 1:
            continue
        j = np.arange(i + 1, e)
        dlat = slat[j] - slat[i]
        dlon = np.abs(slon[j] - slon[i])
        bbox = ((dlat <= halo[i]) & (dlon <= halo[i])) | (
            (dlat <= halo[j]) & (dlon <= halo[j])
        )
        j = j[bbox]
        if len(j) == 0:
            continue
        d = distance_m(
            np.full(len(j), slat[i]), np.full(len(j), slon[i]), slat[j], slon[j], method
        )
        j = j[np.asarray(d) <= tol_m]
        if len(j):
            out_i.append(np.full(len(j), i, dtype=np.int64))
            out_j.append(j.astype(np.int64))
    if not out_i:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    return order[ii], order[jj]


def _task_cluster(
    task: int,
    keys: np.ndarray,
    lats: np.ndarray,
    lons: np.ndarray,
    ep: np.ndarray | None,
    tot: np.ndarray | None,
    sgrp: np.ndarray | None,
    combine_counts: bool,
    tol: float,
    method: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Union-find kernel for ONE cell task (or salted sub-task). With
    ``combine_counts`` the rows are per-batch partial endpoint/junction
    counts: sum per key (global totals — every batch's partial row for a
    key lands in the same halo cell set), apply the cluster-input
    predicate (ep >= 1 or tot > 1), then cluster — fusing the reference's
    separate counting pass (ref :2286-2316) into the single cell shuffle.
    lat/lon/sgrp are functions of the key, so taking any row's value per
    key is order-independent. Returns (keys, min-root per key)."""
    from osmwaterwayextractor_ray.stages.salt import pair_mask_for_task

    if combine_counts:
        o = np.argsort(keys, kind="stable")
        ks = keys[o]
        first = np.ones(len(ks), dtype=bool)
        if len(ks):
            first[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(first)
        ep_s = np.add.reduceat(ep[o], starts) if len(ks) else np.zeros(0, dtype=np.int64)
        tot_s = np.add.reduceat(tot[o], starts) if len(ks) else np.zeros(0, dtype=np.int64)
        m = (ep_s >= 1) | (tot_s > 1)
        keys = ks[starts][m]
        lats = lats[o][starts][m]
        lons = lons[o][starts][m]
        sgrp = sgrp[o][starts][m] if sgrp is not None else None

    ii, jj = _pairs_within_tol(lats, lons, tol, method)
    if len(ii) and sgrp is not None:
        sm = pair_mask_for_task(task, sgrp[ii], sgrp[jj])
        if sm is not None:  # salted cross task: different sub-groups only
            ii, jj = ii[sm], jj[sm]
    if len(ii) == 0:
        return keys, keys
    uf = UnionFind()
    for a, b in zip(keys[ii].tolist(), keys[jj].tolist()):
        uf.add(a)
        uf.add(b)
        uf.union(a, b)
    roots = uf.components_min_root()
    roots_arr = np.fromiter(
        (roots.get(k, k) for k in keys.tolist()), dtype=np.int64, count=len(keys)
    )
    return keys, roots_arr


def make_bucket_cluster_fn(config: Config, combine_counts: bool = False):
    """Kernel for ONE coarse hash bucket of cell tasks (the same
    bucketing that replaced the fine per-task groupby in
    stages/intersect.py): one sort by task, per-task runs resolved with
    numpy, no per-group Python finalize and no pandas conversion."""
    tol = config.snap_tolerance_m
    method = config.distance_calculation_method

    def bucket_cluster(g: pa.Table) -> pa.Table:
        names = set(g.schema.names)
        task = g.column("task").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        lats = g.column("lat").to_numpy(zero_copy_only=False)
        lons = g.column("lon").to_numpy(zero_copy_only=False)
        ep = g.column("ep").to_numpy(zero_copy_only=False) if "ep" in names else None
        tot = g.column("tot").to_numpy(zero_copy_only=False) if "tot" in names else None
        sgrp = g.column("sgrp").to_numpy(zero_copy_only=False) if "sgrp" in names else None
        o = np.lexsort((keys, task))
        task, keys, lats, lons = task[o], keys[o], lats[o], lons[o]
        ep = ep[o] if ep is not None else None
        tot = tot[o] if tot is not None else None
        sgrp = sgrp[o] if sgrp is not None else None
        n = len(task)
        starts = np.flatnonzero(np.concatenate(([True], task[1:] != task[:-1])))
        ends = np.append(starts[1:], n)
        k_parts, r_parts = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            k_out, r_out = _task_cluster(
                int(task[s]), keys[s:e], lats[s:e], lons[s:e],
                ep[s:e] if ep is not None else None,
                tot[s:e] if tot is not None else None,
                sgrp[s:e] if sgrp is not None else None,
                combine_counts, tol, method,
            )
            if len(k_out):
                k_parts.append(k_out)
                r_parts.append(r_out)
        k_all = np.concatenate(k_parts) if k_parts else np.zeros(0, dtype=np.int64)
        r_all = np.concatenate(r_parts) if r_parts else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(k_all, type=pa.int64()),
                "root": pa.array(r_all, type=pa.int64()),
            }
        )

    return bucket_cluster


def emit_halo_partials(ways_ds, config: Config):
    """waterways -> (cell, key, lat, lon, ep, tot) per-batch partial counts
    with halo-cell replication — the fused-shuffle input (counting and
    clustering share ONE cell shuffle; see make_cell_cluster_fn)."""
    from osmwaterwayextractor_ray.functions.cells import cell_ids_with_halo, key_to_coord
    from osmwaterwayextractor_ray.stages.endpoints import make_partial_counts_fn

    partial = make_partial_counts_fn(config)
    cell_deg = config.cluster_cell_deg
    tol = config.snap_tolerance_m
    precision = config.coordinate_precision

    def emit(batch: pa.Table) -> pa.Table:
        t = partial(batch)
        keys = t.column("key").to_numpy(zero_copy_only=False)
        ep = t.column("ep").to_numpy(zero_copy_only=False)
        tot = t.column("tot").to_numpy(zero_copy_only=False)
        lat, lon = key_to_coord(keys, precision)
        rows, cells = cell_ids_with_halo(lat, lon, cell_deg, _halo_deg(lat, tol))
        return pa.table(
            {
                "cell": pa.array(cells, type=pa.int64()),
                "key": pa.array(keys[rows], type=pa.int64()),
                "lat": pa.array(lat[rows], type=pa.float64()),
                "lon": pa.array(lon[rows], type=pa.float64()),
                "ep": pa.array(ep[rows], type=pa.int64()),
                "tot": pa.array(tot[rows], type=pa.int64()),
            }
        )

    return ways_ds.map_batches(emit, batch_format="pyarrow", batch_size=config.batch_size)


def _cluster_assignments(emitted, config: Config, combine_counts: bool):
    """Shared tail: hot-cell salting + per-cell-task union-find."""
    from osmwaterwayextractor_ray.stages.salt import apply_salt, compute_hot_cells

    emitted = emitted.materialize()
    # cheap skip: if the whole dataset is smaller than the per-cell limit,
    # no cell can be hot and the counting pre-pass is pure overhead
    limit = config.cluster_hot_row_limit
    hot = (
        compute_hot_cells(emitted, "cell", limit)
        if emitted.count() > limit
        else {}
    )
    salted = apply_salt(emitted, "cell", "key", hot)
    # A point of a salted hot cell appears in S tasks and can come back
    # with S different local roots — exactly what the boundary-merge
    # fixpoint below reconciles (same mechanism as cross-cell halo merges).
    from osmwaterwayextractor_ray.stages._pool import pool_max

    import os

    num_parts = int(os.environ.get("WWX_BUCKET_FACTOR", "4")) * pool_max()

    def tag(batch: pa.Table) -> pa.Table:
        # multiplicative hash: task = cell*1024 + salt-pair, a plain
        # modulo would bucket by the salt bits (stages/intersect.py)
        t = batch.column("task").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((t * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(num_parts)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    tagged = salted.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("__part").map_groups(
        make_bucket_cluster_fn(config, combine_counts=combine_counts),
        batch_format="pyarrow",
    )


def cluster_points_from_ways(ways_ds, config: Config):
    """Fused counting+clustering: waterways -> coord_mapping with ONE cell
    shuffle (no separate endpoint_junction_counts key shuffle). Identical
    results to cluster_points(cluster_input_points(endpoint_junction_counts
    (ways))) — pinned by tests."""
    assignments = _cluster_assignments(emit_halo_partials(ways_ds, config), config, True)
    return _finish_clustering(assignments, config)


def cluster_points(points_ds, config: Config):
    """points(key, lat, lon) -> coord_mapping Dataset
    (key, lat, lon, c_lat, c_lon, displacement_m, cluster_size)."""
    assignments = _cluster_assignments(emit_halo_cells(points_ds, config), config, False)
    return _finish_clustering(assignments, config)


def _finish_clustering(assignments, config: Config):
    # ---- boundary merge to fixpoint (native aggregates; no per-key UDFs).
    # One aggregate per round serves both conflict detection AND (in the
    # final round) the distinct per-point assignment. ----
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

    # ---- boundary merge in ONE pass: hash-bucket by key (every copy of a
    # key lands in the same bucket), emit per key its min root as the
    # primary assignment plus — for keys that saw >1 distinct root — every
    # other root as an equivalence row. The full per-key root SETS make the
    # driver union-find closure complete in a single round (the min/max
    # fixpoint alternative needs a round per extra root). ----
    def merge_partial(batch: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl

        d = batch.select(["key", "root"]).group_by(
            ["key", "root"], use_threads=False
        ).aggregate([])
        return d.append_column(
            "__part",
            pa.array(_bucket_tbl(d, ["key"], config.join_partitions), type=pa.int64()),
        )

    def merge_combine(g: pa.Table) -> pa.Table:
        k = g.column("key").to_numpy(zero_copy_only=False)
        r = g.column("root").to_numpy(zero_copy_only=False)
        o = np.lexsort((r, k))
        k, r = k[o], r[o]
        new_key = np.ones(len(k), dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        # drop duplicate (key, root) rows surviving across partial blocks
        dd = np.ones(len(k), dtype=bool)
        dd[1:] = new_key[1:] | (r[1:] != r[:-1])
        k, r, new_key = k[dd], r[dd], new_key[dd]
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, len(k)))
        run_id = np.repeat(np.arange(len(starts)), sizes)
        mins = r[starts][run_id]  # r sorted within key -> first = min
        return pa.table(
            {
                "key": pa.array(k, type=pa.int64()),
                "root": pa.array(r, type=pa.int64()),
                "min_root": pa.array(mins, type=pa.int64()),
                "primary": pa.array(r == mins),
                "conflicted": pa.array(sizes[run_id] > 1),
            }
        )

    merged = (
        assignments.map_batches(merge_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge_combine, batch_format="pyarrow")
        .materialize()
    )
    conflicts = merged.map_batches(
        lambda t: t.filter(t["conflicted"]).select(["root", "min_root"]),
        batch_format="pyarrow",
    ).to_pandas()  # tiny: only clusters straddling cell/salt-task borders
    if len(conflicts):
        remap = connected_components_from_pairs(
            conflicts["root"].to_numpy(), conflicts["min_root"].to_numpy()
        )
    else:
        remap = {}
    remap_ref = ray.put(remap)

    def finalize_distinct(batch: pa.Table) -> pa.Table:
        rm = ray.get(remap_ref)
        t = batch.filter(batch["primary"])
        roots = t.column("root").to_numpy(zero_copy_only=False)
        if rm:
            ks = np.fromiter(rm.keys(), dtype=np.int64, count=len(rm))
            vs = np.fromiter(rm.values(), dtype=np.int64, count=len(rm))
            order = np.argsort(ks)
            ks, vs = ks[order], vs[order]
            pos = np.clip(np.searchsorted(ks, roots), 0, len(ks) - 1)
            hit = ks[pos] == roots
            roots = np.where(hit, vs[pos], roots)
        return pa.table(
            {"key": t["key"], "root": pa.array(roots, type=pa.int64())}
        )

    distinct = merged.map_batches(finalize_distinct, batch_format="pyarrow")

    # ---- centroids via exact integer sums of the key's scaled coords ----
    def add_scaled(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        lat_i = keys // _KEY_SHIFT
        lon_i = keys - lat_i * _KEY_SHIFT
        return pa.table(
            {
                "key": batch["key"],
                "root": batch["root"],
                "lat_i": pa.array(lat_i, type=pa.int64()),
                "lon_i": pa.array(lon_i, type=pa.int64()),
            }
        )

    scaled = distinct.map_batches(add_scaled, batch_format="pyarrow")

    # ---- centroid + member-attach FUSED into one bucket shuffle: every row
    # of a root hashes to the same bucket, so the per-root integer sums AND
    # the per-member output rows come out of a single groupby(__part) pass
    # (a separate aggregate + hash join would cost two more sort barriers;
    # hot-root salting is not needed because a cluster's size is bounded by
    # the snap-tolerance ball, not by data volume) ----
    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl

    n_parts = max(8, config.join_partitions)

    def bucket_by_root(batch: pa.Table) -> pa.Table:
        part = _bucket_tbl(batch, ["root"], n_parts)
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    bucketed = scaled.map_batches(bucket_by_root, batch_format="pyarrow")

    def centroid_bucket(g: pa.Table) -> pa.Table:
        # per-root integer sums + member counts via one sort + reduceat
        # (exact int64 sums — same totals in any order), broadcast back to
        # member rows so centroid rows and member rows leave in one pass
        root = g.column("root").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        lat_i = g.column("lat_i").to_numpy(zero_copy_only=False)
        lon_i = g.column("lon_i").to_numpy(zero_copy_only=False)
        o = np.argsort(root, kind="stable")
        r_s, k_s = root[o], keys[o]
        la_s, lo_s = lat_i[o], lon_i[o]
        first = np.ones(len(r_s), dtype=bool)
        if len(r_s):
            first[1:] = r_s[1:] != r_s[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(r_s)))
        run = np.repeat(np.arange(len(starts)), sizes)
        sum_lat_i = np.add.reduceat(la_s, starts)[run] if len(r_s) else la_s
        sum_lon_i = np.add.reduceat(lo_s, starts)[run] if len(r_s) else lo_s
        n = sizes[run] if len(r_s) else np.zeros(0, dtype=np.int64)
        return _finalize_arrays(k_s, n, sum_lat_i, sum_lon_i)

    precision = config.coordinate_precision
    tol = config.snap_tolerance_m
    max_allowed = tol * config.max_displacement_multiplier
    method = config.distance_calculation_method
    scale = 10.0**precision

    def _finalize_arrays(keys, n, sum_lat_i, sum_lon_i) -> pa.Table:
        lat, lon = key_to_coord(keys, precision)
        c_lat = (sum_lat_i / n) / scale - 90.0
        c_lon = (sum_lon_i / n) / scale - 180.0
        # singletons: exact identity (ref :1301-1303)
        single = n == 1
        c_lat = np.where(single, lat, c_lat)
        c_lon = np.where(single, lon, c_lon)
        disp = np.where(
            single, 0.0, np.asarray(distance_m(lat, lon, c_lat, c_lon, method), dtype=np.float64)
        )
        if len(disp) and disp.max() > max_allowed:
            raise ValueError(
                f"Cluster displacement {disp.max():.2f}m exceeds safety threshold "
                f"{max_allowed:.2f}m"
            )
        return pa.table(
            {
                "key": pa.array(keys, type=pa.int64()),
                "lat": pa.array(lat, type=pa.float64()),
                "lon": pa.array(lon, type=pa.float64()),
                "c_lat": pa.array(c_lat, type=pa.float64()),
                "c_lon": pa.array(c_lon, type=pa.float64()),
                "displacement_m": pa.array(disp, type=pa.float64()),
                "cluster_size": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return bucketed.groupby("__part").map_groups(centroid_bucket, batch_format="pyarrow")
