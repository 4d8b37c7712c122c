"""Stage 1.75 — line-intersection detection + splitting (J1/J2).

Reference (osm_waterway_extractor.py:1818-2152): a driver-resident R-tree
self-join over all waterway lines, exact shapely intersections (Point /
MultiPoint only, collinear overlaps ignored), then intersection-point
insertion into each line's vertex sequence.

Ray mapping — a two-phase cell-partitioned spatial self-join (PBSM):
  detect:
    1. each way flat_maps its *segments* to the grid cells their bboxes
       touch (per-segment cover — replication grows with line length /
       cell, not bbox area);
    2. ``groupby(cell).map_groups``: vectorized all-pairs segment
       intersection between segments of different ways;
    3. duplicate avoidance: a found point is kept only by the cell that
       contains it (cell_of(point) == group cell) — each geometric point is
       reported exactly once even when the pair shares many cells.
  split:
    intersection points are tiny relative to ways -> broadcast them
    (ray.put of a cell->points bucket index) and insert per way inside
    ``map_batches``, reproducing the reference's insertion contract
    (:2094-2152): candidate points whose degree-space distance to the line
    is < snap_tolerance_m*1e-5, ordered by position-along-line, inserted
    strictly inside the bracketing original-vertex positions, skipped when
    the rounded point is already present anywhere in the accumulated
    coordinate list; consecutive-duplicate removal afterwards.
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import ray

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import cell_id, n_lon
from osmwaterwayextractor_ray.stages._arrow import (
    empty_waterways_table,
    list_column,
    str_column,
    waterways_table,
)

from osmwaterwayextractor_ray.stages._pool import pool_max


def emit_segments(ds, config: Config):
    cell_deg = config.intersect_cell_deg
    NL = n_lon(cell_deg)

    def emit(batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        way_ids = batch.column("way_id").to_numpy(zero_copy_only=False)
        n_v = len(lats)
        if n_v < 2:
            return pa.table(
                {
                    "cell": pa.array([], type=pa.int64()),
                    "way_id": pa.array([], type=pa.int64()),
                    "lat1": pa.array([], type=pa.float64()),
                    "lon1": pa.array([], type=pa.float64()),
                    "lat2": pa.array([], type=pa.float64()),
                    "lon2": pa.array([], type=pa.float64()),
                }
            )
        # segment arrays (drop the bridges between rows)
        row_of_vertex = np.repeat(
            np.arange(len(offsets) - 1), np.diff(offsets)
        )
        a_lat, a_lon = lats[:-1], lons[:-1]
        b_lat, b_lon = lats[1:], lons[1:]
        same_row = row_of_vertex[:-1] == row_of_vertex[1:]
        a_lat, a_lon, b_lat, b_lon = (
            a_lat[same_row],
            a_lon[same_row],
            b_lat[same_row],
            b_lon[same_row],
        )
        seg_way = way_ids[row_of_vertex[:-1][same_row]]
        # cell range of each segment's bbox
        min_lat = np.minimum(a_lat, b_lat)
        max_lat = np.maximum(a_lat, b_lat)
        min_lon = np.minimum(a_lon, b_lon)
        max_lon = np.maximum(a_lon, b_lon)
        la0 = np.floor((min_lat + 90.0) / cell_deg).astype(np.int64)
        la1 = np.floor((max_lat + 90.0) / cell_deg).astype(np.int64)
        lo0 = np.floor((min_lon + 180.0) / cell_deg).astype(np.int64)
        lo1 = np.floor((max_lon + 180.0) / cell_deg).astype(np.int64)
        counts = (la1 - la0 + 1) * (lo1 - lo0 + 1)
        seg_idx = np.repeat(np.arange(len(seg_way)), counts)
        # enumerate the (la, lo) lattice per segment
        cum = np.concatenate(([0], np.cumsum(counts)))
        local = np.arange(cum[-1]) - cum[seg_idx]
        width = (lo1 - lo0 + 1)[seg_idx]
        la = la0[seg_idx] + local // width
        lo = lo0[seg_idx] + local % width
        cells = la * NL + lo
        return pa.table(
            {
                "cell": pa.array(cells, type=pa.int64()),
                "way_id": pa.array(seg_way[seg_idx], type=pa.int64()),
                "lat1": pa.array(a_lat[seg_idx], type=pa.float64()),
                "lon1": pa.array(a_lon[seg_idx], type=pa.float64()),
                "lat2": pa.array(b_lat[seg_idx], type=pa.float64()),
                "lon2": pa.array(b_lon[seg_idx], type=pa.float64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow", batch_size=config.batch_size)


def _task_intersect(
    task: int,
    cell: int,
    sgrp: np.ndarray,
    way: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    cell_deg: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Pairwise intersection kernel for ONE spatial task (= one cell, or one
    salted sub-task of a hot cell). Inputs must already be sorted by the
    total within-task key (way, ax, ay, bx, by, sgrp) — the i<j pairing
    assigns which segment is "p" vs "s" in the intersection formula and the
    two role assignments round differently, so the sort pins the low bits
    against block-arrival order. Returns (lat, lon) of the task's owned,
    deduped intersection points."""
    from osmwaterwayextractor_ray.stages.salt import pair_mask_for_task

    n = len(way)
    out_lat: list[float] = []
    out_lon: list[float] = []
    if n >= 2:
        # all pairs (i<j) of segments with different way ids whose bboxes
        # overlap — row-blocked so a hot cell never materializes an n²
        # matrix (memory bound: BLOCK x n booleans)
        minx, maxx = np.minimum(ax, bx), np.maximum(ax, bx)
        miny, maxy = np.minimum(ay, by), np.maximum(ay, by)
        BLOCK = 2048
        ii_parts, jj_parts = [], []
        for s in range(0, n, BLOCK):
            e = min(n, s + BLOCK)
            ov = (
                (minx[s:e, None] <= maxx[None, :])
                & (maxx[s:e, None] >= minx[None, :])
                & (miny[s:e, None] <= maxy[None, :])
                & (maxy[s:e, None] >= miny[None, :])
                & (way[s:e, None] != way[None, :])
            )
            bi, bj = np.nonzero(ov)
            bi = bi + s
            keep = bi < bj
            bi, bj = bi[keep], bj[keep]
            sm = pair_mask_for_task(task, sgrp[bi], sgrp[bj])
            if sm is not None:  # salted cross task: different sub-groups only
                bi, bj = bi[sm], bj[sm]
            ii_parts.append(bi)
            jj_parts.append(bj)
        ii = np.concatenate(ii_parts) if ii_parts else np.array([], dtype=np.int64)
        jj = np.concatenate(jj_parts) if jj_parts else np.array([], dtype=np.int64)
        if len(ii):
            p0x, p0y = ax[ii], ay[ii]
            r_x, r_y = bx[ii] - p0x, by[ii] - p0y
            q0x, q0y = ax[jj], ay[jj]
            s_x, s_y = bx[jj] - q0x, by[jj] - q0y
            denom = r_x * s_y - r_y * s_x
            qp_x, qp_y = q0x - p0x, q0y - p0y
            nonpar = denom != 0.0
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(nonpar, (qp_x * s_y - qp_y * s_x) / denom, -1.0)
                u = np.where(nonpar, (qp_x * r_y - qp_y * r_x) / denom, -1.0)
            hit = nonpar & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
            px = (p0x[hit] + t[hit] * r_x[hit]).tolist()
            py = (p0y[hit] + t[hit] * r_y[hit]).tolist()
            # collinear touch points (see functions/geometry.py)
            collin = (~nonpar) & (qp_x * r_y - qp_y * r_x == 0.0)
            if collin.any():
                ci = np.nonzero(collin)[0]
                rl2 = r_x[ci] ** 2 + r_y[ci] ** 2
                safe = np.where(rl2 == 0.0, 1.0, rl2)
                t0 = (qp_x[ci] * r_x[ci] + qp_y[ci] * r_y[ci]) / safe
                t1 = ((qp_x[ci] + s_x[ci]) * r_x[ci] + (qp_y[ci] + s_y[ci]) * r_y[ci]) / safe
                lo_ = np.maximum(0.0, np.minimum(t0, t1))
                hi_ = np.minimum(1.0, np.maximum(t0, t1))
                touch = (lo_ == hi_) & (rl2 > 0.0)
                ti = ci[touch]  # indices into the PAIR arrays (p0*, r_*)
                px.extend((p0x[ti] + lo_[touch] * r_x[ti]).tolist())
                py.extend((p0y[ti] + lo_[touch] * r_y[ti]).tolist())
            out_lon, out_lat = px, py
    empty = np.array([], dtype=np.float64)
    if not out_lat:
        return empty, empty
    plat = np.asarray(out_lat)
    plon = np.asarray(out_lon)
    own = cell_id(plat, plon, cell_deg) == cell  # PBSM ownership dedupe
    plat, plon = plat[own], plon[own]
    # exact-dup dedupe within the cell (same point from touching segment pairs)
    if len(plat):
        uniq = {}
        for la_, lo2 in zip(plat.tolist(), plon.tolist()):
            uniq[(la_, lo2)] = None
        plat = np.array([k[0] for k in uniq], dtype=np.float64)
        plon = np.array([k[1] for k in uniq], dtype=np.float64)
    return plat, plon


def make_bucket_intersect_fn(config: Config):
    """Kernel for ONE coarse hash bucket holding many spatial tasks: one
    global lexsort (task primary, then the within-task total key), then the
    per-task pairwise kernel over each contiguous run. Replaces the old
    per-task ``groupby("task")`` — Ray's fine-grained groupby paid a sort
    over every distinct cell plus a Python finalize per group (~130 µs x
    tens of thousands of cells), the same bottleneck ``fastagg`` documents;
    P coarse buckets keep the shuffle key cardinality tiny while the task
    runs are resolved with numpy inside the bucket. Results are identical:
    each task's computation is independent and its input order is pinned by
    the same total key."""
    cell_deg = config.intersect_cell_deg

    def bucket_intersect(g: pa.Table) -> pa.Table:
        task = g.column("task").to_numpy(zero_copy_only=False)
        cell = g.column("cell").to_numpy(zero_copy_only=False)
        sgrp = g.column("sgrp").to_numpy(zero_copy_only=False)
        way = g.column("way_id").to_numpy(zero_copy_only=False)
        ax = g.column("lon1").to_numpy(zero_copy_only=False)
        ay = g.column("lat1").to_numpy(zero_copy_only=False)
        bx = g.column("lon2").to_numpy(zero_copy_only=False)
        by = g.column("lat2").to_numpy(zero_copy_only=False)
        o = np.lexsort((sgrp, by, bx, ay, ax, way, task))
        task, cell, sgrp = task[o], cell[o], sgrp[o]
        way, ax, ay, bx, by = way[o], ax[o], ay[o], bx[o], by[o]
        n = len(task)
        starts = np.flatnonzero(np.concatenate(([True], task[1:] != task[:-1])))
        ends = np.append(starts[1:], n)
        lat_parts, lon_parts = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            plat, plon = _task_intersect(
                int(task[s]), int(cell[s]),
                sgrp[s:e], way[s:e], ax[s:e], ay[s:e], bx[s:e], by[s:e],
                cell_deg,
            )
            if len(plat):
                lat_parts.append(plat)
                lon_parts.append(plon)
        out_lat = np.concatenate(lat_parts) if lat_parts else np.array([], dtype=np.float64)
        out_lon = np.concatenate(lon_parts) if lon_parts else np.array([], dtype=np.float64)
        return pa.table(
            {
                "lat": pa.array(out_lat, type=pa.float64()),
                "lon": pa.array(out_lon, type=pa.float64()),
            }
        )

    return bucket_intersect


def detect_intersections(ds, config: Config):
    """waterways -> Dataset(lat, lon) of distinct intersection points.
    Hot cells (> hot_cell_row_limit segments) are salted into triangle
    sub-tasks (stages/salt.py), tasks land in P coarse hash buckets, and
    each bucket runs the vectorized per-task pairwise kernel."""
    from osmwaterwayextractor_ray.stages.salt import apply_salt, compute_hot_cells

    from osmwaterwayextractor_ray.stages._prof import prof_mark

    segs = emit_segments(ds, config).materialize()
    prof_mark("emit_segments materialize")
    limit = config.hot_cell_row_limit
    hot = (
        compute_hot_cells(segs, "cell", limit) if segs.count() > limit else {}
    )
    prof_mark("hot-cell count pass")
    salted = apply_salt(segs, "cell", "way_id", hot)
    import os

    num_parts = int(os.environ.get("WWX_BUCKET_FACTOR", "4")) * pool_max()

    def tag(batch: pa.Table) -> pa.Table:
        # multiplicative hash: task = cell*1024 + salt-pair, so a plain
        # modulo would bucket by the salt bits alone (spatially correlated)
        t = batch.column("task").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((t * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(num_parts)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    tagged = salted.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("__part").map_groups(
        make_bucket_intersect_fn(config), batch_format="pyarrow"
    )


class IntersectionSplitter:
    """map_batches actor-pool stage holding the broadcast intersection-point
    bucket index (cell -> points)."""

    def __init__(self, points_ref, config: Config):
        blob = ray.get(points_ref)
        self.pt_lat = blob["lat"]
        self.pt_lon = blob["lon"]
        self.pt_cell = blob["cell"]  # sorted
        self.cell_deg = config.intersect_cell_deg
        self.tol_deg = config.snap_tolerance_m * 1e-5  # ref :2048 verbatim
        self.precision = config.coordinate_precision

    def _candidates(self, min_lat, min_lon, max_lat, max_lon) -> tuple[np.ndarray, np.ndarray]:
        """Points whose tol-buffered position touches the way bbox, via the
        cell buckets (superset of the reference's rtree candidates; exactness
        comes from the distance test that follows)."""
        NL = n_lon(self.cell_deg)
        la0 = int(np.floor((min_lat - self.tol_deg + 90.0) / self.cell_deg))
        la1 = int(np.floor((max_lat + self.tol_deg + 90.0) / self.cell_deg))
        lo0 = int(np.floor((min_lon - self.tol_deg + 180.0) / self.cell_deg))
        lo1 = int(np.floor((max_lon + self.tol_deg + 180.0) / self.cell_deg))
        idx_parts = []
        for la in range(la0, la1 + 1):
            lo_s = np.searchsorted(self.pt_cell, la * NL + lo0, side="left")
            lo_e = np.searchsorted(self.pt_cell, la * NL + lo1, side="right")
            if lo_e > lo_s:
                idx_parts.append(np.arange(lo_s, lo_e))
        if not idx_parts:
            return np.array([], dtype=np.float64), np.array([], dtype=np.float64)
        idx = np.concatenate(idx_parts)
        return self.pt_lat[idx], self.pt_lon[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched splitter: per-way candidate bucket query (cheap), then
        the shared vectorized projection/insertion kernel."""
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        way_ids = batch.column("way_id").to_numpy(zero_copy_only=False)
        names = str_column(batch, "name")
        wtypes = str_column(batch, "wtype")
        widths = str_column(batch, "width")
        n_ways = len(offsets) - 1

        if len(self.pt_lat) == 0 or len(lats) < 2:
            return waterways_table(way_ids, lats, lons, offsets, names, wtypes, widths)

        # vectorized per-way candidate lookup (replaces a per-way Python
        # loop): per-way bbox via reduceat, tol-buffered cell-lattice rows
        # enumerated with the ragged repeat/cumsum trick, ONE searchsorted
        # pair over all (way, lat-row) keys, then ragged range gather.
        # Candidate order per way (row-major lattice) matches the old loop
        # bit-for-bit — and is irrelevant anyway (insertion sorts totally).
        NL = n_lon(self.cell_deg)
        n_verts = np.diff(offsets)
        valid = n_verts >= 2
        starts = np.minimum(offsets[:-1], max(len(lats) - 1, 0))
        mn_lat = np.minimum.reduceat(lats, starts)
        mx_lat = np.maximum.reduceat(lats, starts)
        mn_lon = np.minimum.reduceat(lons, starts)
        mx_lon = np.maximum.reduceat(lons, starts)
        la0 = np.floor((mn_lat - self.tol_deg + 90.0) / self.cell_deg).astype(np.int64)
        la1 = np.floor((mx_lat + self.tol_deg + 90.0) / self.cell_deg).astype(np.int64)
        lo0 = np.floor((mn_lon - self.tol_deg + 180.0) / self.cell_deg).astype(np.int64)
        lo1 = np.floor((mx_lon + self.tol_deg + 180.0) / self.cell_deg).astype(np.int64)
        rows = np.where(valid, la1 - la0 + 1, 0)
        R = int(rows.sum())
        if R == 0:
            return waterways_table(way_ids, lats, lons, offsets, names, wtypes, widths)
        row_pref = np.concatenate(([0], np.cumsum(rows)))[:-1]
        way_of_row = np.repeat(np.arange(n_ways), rows)
        local_row = np.arange(R) - np.repeat(row_pref, rows)
        la = la0[way_of_row] + local_row
        ls = np.searchsorted(self.pt_cell, la * NL + lo0[way_of_row], side="left")
        le = np.searchsorted(self.pt_cell, la * NL + lo1[way_of_row], side="right")
        cnt = le - ls
        total = int(cnt.sum())
        if total == 0:
            return waterways_table(way_ids, lats, lons, offsets, names, wtypes, widths)
        cnt_pref = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        idx = np.repeat(ls - cnt_pref, cnt) + np.arange(total)
        cand_lat = self.pt_lat[idx]
        cand_lon = self.pt_lon[idx]
        n_c = np.bincount(way_of_row, weights=cnt, minlength=n_ways).astype(np.int64)
        return _split_ways_with_candidates(
            way_ids, lats, lons, offsets, names, wtypes, widths,
            cand_lat, cand_lon, n_c, self.tol_deg, self.precision,
        )


def _split_ways_with_candidates(
    way_ids,
    lats: np.ndarray,
    lons: np.ndarray,
    offsets: np.ndarray,
    names,
    wtypes,
    widths,
    cand_lat: np.ndarray,
    cand_lon: np.ndarray,
    n_c: np.ndarray,
    tol_deg: float,
    precision: int,
) -> pa.Table:
    """Shared batched splitter kernel: candidate→segment projection is ONE
    vectorized pass over every (candidate, segment) pair (ragged layout via
    repeat/cumsum indexing + reduceat minima); only the insertions stay
    per-way. ``n_c[r]`` = number of candidate points for way row ``r``;
    candidate arrays are their way-order concatenation. Candidate ORDER
    within a way is irrelevant: insertion sorts by (position, lat, lon) —
    a total order — so the broadcast and distributed paths agree exactly.
    Insertion contract is the reference's (:2094-2152)."""
    n_ways = len(offsets) - 1
    n_verts = np.diff(offsets)

    def passthrough():
        return waterways_table(way_ids, lats, lons, offsets, names, wtypes, widths)

    if len(lats) < 2:
        return passthrough()
    n_s = np.maximum(n_verts - 1, 0)
    # drop candidates attached to degenerate (<2-vertex) ways so the
    # reduceat segment ranges below are never empty
    if ((n_s == 0) & (n_c > 0)).any():
        keep = np.repeat(n_s > 0, n_c)
        cand_lat, cand_lon = cand_lat[keep], cand_lon[keep]
        n_c = np.where(n_s > 0, n_c, 0)
    C = int(n_c.sum())
    if C == 0:
        return passthrough()
    cand_start = np.concatenate(([0], np.cumsum(n_c)))

    # --- one vectorized (candidate x segment) projection pass ---
    way_of_cand = np.repeat(np.arange(n_ways), n_c)
    ppc = n_s[way_of_cand]  # segments examined per candidate
    P = int(ppc.sum())
    pair_start = np.concatenate(([0], np.cumsum(ppc)))[:-1]
    cand_of_pair = np.repeat(np.arange(C), ppc)
    local_seg = np.arange(P) - np.repeat(pair_start, ppc)
    vg = np.repeat(offsets[way_of_cand], ppc) + local_seg  # first vertex of segment

    ax, ay = lons[vg], lats[vg]
    bx, by = lons[vg + 1], lats[vg + 1]
    px, py = cand_lon[cand_of_pair], cand_lat[cand_of_pair]
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    safe = np.where(L2 == 0.0, 1.0, L2)
    t = ((px - ax) * dx + (py - ay) * dy) / safe
    t = np.where(L2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    ex = px - (ax + t * dx)
    ey = py - (ay + t * dy)
    d2 = ex * ex + ey * ey

    # degree-space cumulative vertex positions (shared across ways; the
    # within-way difference never crosses a bridge segment)
    seg_len_all = np.sqrt(np.diff(lons) ** 2 + np.diff(lats) ** 2)
    cs = np.concatenate(([0.0], np.cumsum(seg_len_all)))
    base = np.repeat(cs[offsets[way_of_cand]], ppc)
    pos_pair = (cs[vg] - base) + t * seg_len_all[vg]

    dmin = np.minimum.reduceat(d2, pair_start)
    cond = d2 == np.repeat(dmin, ppc)
    idxP = np.where(cond, np.arange(P), P)
    first = np.minimum.reduceat(idxP, pair_start)  # first argmin per cand
    dist = np.sqrt(dmin)
    pos = pos_pair[first]
    on = dist < tol_deg  # ref :2097 strict <

    ok = np.flatnonzero(on)
    if len(ok) == 0:
        return passthrough()

    # --- fully vectorized insertion (r4; replaces the per-touched-way
    # Python loop — the dominant split-kernel cost when most ways receive
    # a point). Exactness argument, mirroring the loop's contract:
    #   * processing order within a way is (pos, lat, lon) — reproduced by
    #     one global merge lexsort of vertices+candidates keyed
    #     (way, pos, kind[vertex first on ties], lat, lon);
    #   * a candidate's bracketing segment = vertices seen before it in
    #     that merge minus 1; "strictly inside" fails exactly when its pos
    #     equals the previous vertex's pos (right-boundary ties sort AFTER
    #     the vertex and become left-boundary ties of the next segment);
    #   * the seen-set rules decompose into (a) skip if some vertex j <=
    #     seg has an equal coordinate pair — j monotone in seg, so only
    #     the MIN j per (way, key) matters; (b) skip if an earlier
    #     same-key candidate inserted — since rule (a) failing is
    #     monotone in seg, that earlier inserter is exactly the FIRST
    #     rule-passing candidate of the (way, key) group;
    #   * the final consecutive-dedup compares equal floats, and float
    #     equality is transitive, so compare-with-previous-element equals
    #     the loop's compare-with-last-kept.
    # Candidate coords are rounded with np.round (the loop used Python
    # round(); np.round is the rounding already applied to every vertex in
    # stages/clean.py — refimpl parity pins the equivalence on this data).
    c_way = way_of_cand[ok]
    c_pos = pos[ok]
    c_lat_u = cand_lat[ok]
    c_lon_u = cand_lon[ok]
    c_rlat = np.round(c_lat_u, precision) + 0.0
    c_rlon = np.round(c_lon_u, precision) + 0.0

    V = len(lats)
    K = len(ok)
    M = V + K
    vert_way = np.repeat(np.arange(n_ways), n_verts)
    vpos_all = cs[:V] - np.repeat(cs[offsets[:-1]], n_verts)

    m_way = np.concatenate([vert_way, c_way])
    m_pos = np.concatenate([vpos_all, c_pos])
    m_kind = np.concatenate([np.zeros(V, dtype=np.int8), np.ones(K, dtype=np.int8)])
    m_lat = np.concatenate([lats, c_lat_u])
    m_lon = np.concatenate([lons, c_lon_u])
    m_ord = np.lexsort((m_lon, m_lat, m_kind, m_pos, m_way))
    way_s = m_way[m_ord]
    pos_s = m_pos[m_ord]
    v_ind = m_kind[m_ord] == 0

    # bracketing segment per entry: vertices of this way seen so far - 1
    cum_v = np.cumsum(v_ind.astype(np.int64))
    way_start = np.ones(M, dtype=bool)
    way_start[1:] = way_s[1:] != way_s[:-1]
    start_idx = np.maximum.accumulate(np.where(way_start, np.arange(M), 0))
    # the first entry of every way is a vertex (pos 0 is minimal and
    # vertex sorts first on ties; ways with candidates have >= 2 vertices)
    before_way = (cum_v - v_ind.astype(np.int64))[start_idx]
    seg = (cum_v - before_way) - 1
    prev_v_idx = np.maximum.accumulate(np.where(v_ind, np.arange(M), -1))
    last_vpos = pos_s[prev_v_idx]
    nv_here = n_verts[way_s]
    pos_ok_s = (~v_ind) & (seg >= 0) & (seg <= nv_here - 2) & (pos_s != last_vpos)

    # scatter merge-order facts back to candidate id space
    ce = np.flatnonzero(~v_ind)
    cid_s = m_ord[ce] - V
    seg_of_cand = np.empty(K, dtype=np.int64)
    seg_of_cand[cid_s] = seg[ce]
    posok = np.zeros(K, dtype=bool)
    posok[cid_s] = pos_ok_s[ce]
    rank_of_cand = np.empty(K, dtype=np.int64)
    rank_of_cand[cid_s] = ce

    # rule (a): min vertex index per (way, key); vertices carry their
    # EXACT coords (already rounded upstream), candidates their rounded
    g_lat = np.concatenate([lats, c_rlat])
    g_lon = np.concatenate([lons, c_rlon])
    j_local = np.arange(V) - np.repeat(offsets[:-1], n_verts)
    g_rank = np.concatenate([j_local, np.zeros(K, dtype=np.int64)])
    g_ord = np.lexsort((g_rank, m_kind, g_lon, g_lat, m_way))
    gw = m_way[g_ord]
    gla = g_lat[g_ord]
    glo = g_lon[g_ord]
    new_grp = np.ones(M, dtype=bool)
    new_grp[1:] = (gw[1:] != gw[:-1]) | (gla[1:] != gla[:-1]) | (glo[1:] != glo[:-1])
    leader = np.maximum.accumulate(np.where(new_grp, np.arange(M), 0))
    lead_entry = g_ord[leader]
    lead_is_vert = lead_entry < V
    is_cand_g = g_ord >= V
    cg = g_ord[is_cand_g] - V
    min_vidx = np.full(K, np.iinfo(np.int64).max)
    hv = lead_is_vert[is_cand_g]
    min_vidx[cg[hv]] = g_rank[lead_entry[is_cand_g][hv]]

    eligible = posok & (min_vidx > seg_of_cand)

    # rule (b): first ELIGIBLE candidate per (way, rounded key) in
    # processing order inserts; later same-key candidates hit the seen set
    o2 = np.lexsort((rank_of_cand, c_rlon, c_rlat, c_way))
    w2, a2, b2 = c_way[o2], c_rlat[o2], c_rlon[o2]
    e2 = eligible[o2]
    ng2 = np.ones(K, dtype=bool)
    ng2[1:] = (w2[1:] != w2[:-1]) | (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
    elig_before = np.cumsum(e2.astype(np.int64)) - e2.astype(np.int64)
    grp_base = np.maximum.accumulate(np.where(ng2, elig_before, -1))
    first_elig = e2 & (elig_before == grp_base)
    insert = np.zeros(K, dtype=bool)
    insert[o2] = first_elig

    # assemble in merge order: vertices + inserting candidates (rounded)
    keep_entry = v_ind.copy()
    keep_entry[ce] = insert[cid_s]
    out_lat_m = m_lat[m_ord]
    out_lon_m = m_lon[m_ord]
    out_lat_m[ce] = c_rlat[cid_s]
    out_lon_m[ce] = c_rlon[cid_s]
    lat_k = out_lat_m[keep_entry]
    lon_k = out_lon_m[keep_entry]
    way_k = way_s[keep_entry]
    dd = np.ones(len(lat_k), dtype=bool)
    dd[1:] = (
        (lat_k[1:] != lat_k[:-1])
        | (lon_k[1:] != lon_k[:-1])
        | (way_k[1:] != way_k[:-1])
    )
    lat_f = lat_k[dd]
    lon_f = lon_k[dd]
    counts_out = np.bincount(way_k[dd], minlength=n_ways)
    out_off = np.concatenate(([0], np.cumsum(counts_out)))
    return waterways_table(
        way_ids,
        lat_f,
        lon_f,
        out_off.astype(np.int64),
        names,
        wtypes,
        widths,
    )


def split_at_intersections(ds, points_ds, config: Config):
    import os

    # guard BEFORE collecting: pin the (small, O(junctions)) points in the
    # object store, then count() is metadata-cheap — the driver never holds
    # an over-budget blob, and the detection kernel never runs twice
    points_ds = points_ds.materialize()
    from osmwaterwayextractor_ray.stages._prof import prof_mark as _pm

    _pm("detect_intersections kernel")
    n_points = points_ds.count()
    budget = int(os.environ.get("WWX_MAX_BROADCAST_ROWS", 50_000_000))
    if n_points > budget:
        raise ValueError(
            f"broadcast intersection splitter would ship {n_points} points to "
            f"every task, above the WWX_MAX_BROADCAST_ROWS budget ({budget}); "
            f"set intersection_splitter='distributed' (identical results, "
            f"pinned by tests)"
        )
    pdf = points_ds.to_pandas()
    lat = pdf["lat"].to_numpy(dtype=np.float64)
    lon = pdf["lon"].to_numpy(dtype=np.float64)
    cells = cell_id(lat, lon, config.intersect_cell_deg)
    order = np.argsort(cells, kind="stable")
    blob = {"lat": lat[order], "lon": lon[order], "cell": cells[order]}
    points_ref = ray.put(blob)
    _pm("split: driver point-blob prep")

    # Plain tasks, not an actor pool: the per-task "setup" is one zero-copy
    # ray.get of the pre-sorted broadcast arrays (sub-ms), and stateless
    # tasks use the warm worker pool elastically — measured 3x faster than
    # an autoscaling actor pool on this Ray version (pool scale-up lag).
    def split_fn(batch: pa.Table) -> pa.Table:
        return IntersectionSplitter(points_ref, config)(batch)

    return ds.map_batches(
        split_fn, batch_format="pyarrow", batch_size=config.batch_size
    )


def split_at_intersections_distributed(ds, points_ds, config: Config):
    """Distributed twin of ``split_at_intersections``: no driver-resident
    point index, no broadcast. Points carry their PBSM cell; each way
    emits the cells its tol-expanded SEGMENT bboxes touch (deduped per
    way — a tighter candidate superset than the broadcast path's whole-way
    bbox lattice, but both contain every point within tol of the line, and
    the strict dist<tol test plus the order-free insertion sort make the
    outputs exactly equal); a partitioned hash join on cell attaches the
    candidate points; ways + candidates then co-group by way_id hash
    bucket and run the shared kernel. For topologies whose junction count
    outgrows the broadcast budget. Pinned equal to the broadcast path by
    tests (both modes, end-to-end)."""
    from osmwaterwayextractor_ray.stages.fastagg import cogroup, hash_join

    cell_deg = config.intersect_cell_deg
    tol_deg = config.snap_tolerance_m * 1e-5
    NL = n_lon(cell_deg)
    n_parts = max(8, config.join_partitions)
    precision = config.coordinate_precision

    def point_cells(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch.column("lon").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "cell": pa.array(cell_id(lat, lon, cell_deg), type=pa.int64()),
                "p_lat": pa.array(lat, type=pa.float64()),
                "p_lon": pa.array(lon, type=pa.float64()),
            }
        )

    # pinned: points_ds is the lazy detect-intersections groupby output,
    # and hash_join's schema probe would execute that whole shuffle for
    # limit=1 before the real run executes it again (CLAUDE.md rule)
    pts = points_ds.map_batches(point_cells, batch_format="pyarrow").materialize()

    def way_cells(batch: pa.Table) -> pa.Table:
        """(cell, way_id) for every grid cell touched by a tol-expanded
        segment bbox, deduped per way (a point within tol of the line is
        within tol of some segment, hence inside this cover)."""
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        way_ids = batch.column("way_id").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "cell": pa.array([], type=pa.int64()),
                "way_id": pa.array([], type=pa.int64()),
            }
        )
        if len(lats) < 2:
            return empty
        row_of_vertex = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        a_lat, a_lon = lats[:-1], lons[:-1]
        b_lat, b_lon = lats[1:], lons[1:]
        same_row = row_of_vertex[:-1] == row_of_vertex[1:]
        a_lat, a_lon, b_lat, b_lon = (
            a_lat[same_row],
            a_lon[same_row],
            b_lat[same_row],
            b_lon[same_row],
        )
        seg_way = way_ids[row_of_vertex[:-1][same_row]]
        if not len(seg_way):
            return empty
        la0 = np.floor((np.minimum(a_lat, b_lat) - tol_deg + 90.0) / cell_deg).astype(np.int64)
        la1 = np.floor((np.maximum(a_lat, b_lat) + tol_deg + 90.0) / cell_deg).astype(np.int64)
        lo0 = np.floor((np.minimum(a_lon, b_lon) - tol_deg + 180.0) / cell_deg).astype(np.int64)
        lo1 = np.floor((np.maximum(a_lon, b_lon) + tol_deg + 180.0) / cell_deg).astype(np.int64)
        counts = (la1 - la0 + 1) * (lo1 - lo0 + 1)
        seg_idx = np.repeat(np.arange(len(seg_way)), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))
        local = np.arange(cum[-1]) - cum[seg_idx]
        width = (lo1 - lo0 + 1)[seg_idx]
        cells = (la0[seg_idx] + local // width) * NL + (lo0[seg_idx] + local % width)
        w = seg_way[seg_idx]
        o = np.lexsort((cells, w))
        w, cells = w[o], cells[o]
        keep = np.ones(len(w), dtype=bool)
        keep[1:] = (w[1:] != w[:-1]) | (cells[1:] != cells[:-1])
        return pa.table(
            {
                "cell": pa.array(cells[keep], type=pa.int64()),
                "way_id": pa.array(w[keep], type=pa.int64()),
            }
        )

    wcells = ds.map_batches(way_cells, batch_format="pyarrow", batch_size=config.batch_size)
    # (cell, way_id, p_lat, p_lon): each pair appears exactly once — the
    # cell cover is deduped per way and each point lives in one cell
    pairs = hash_join(wcells, pts, on=["cell"], num_parts=n_parts)

    # pinned for the same reason: cands is a lazy hash_join output and
    # the cogroup below would schema-probe-execute it, then run it again
    cands = pairs.map_batches(
        lambda t: t.select(["way_id", "p_lat", "p_lon"]), batch_format="pyarrow"
    ).materialize()
    grouped, split = cogroup(cands, ds, ["way_id"], num_parts=n_parts)

    def split_bucket(g: pa.Table) -> pa.Table:
        cand_t, ways_t = split(g)
        if ways_t.num_rows == 0:
            return empty_waterways_table()
        lats, offsets = list_column(ways_t, "lats")
        lons, _ = list_column(ways_t, "lons")
        way_ids = ways_t.column("way_id").to_numpy(zero_copy_only=False)
        names = str_column(ways_t, "name")
        wtypes = str_column(ways_t, "wtype")
        widths = str_column(ways_t, "width")
        cw = cand_t.column("way_id").to_numpy(zero_copy_only=False)
        cl = cand_t.column("p_lat").to_numpy(zero_copy_only=False).astype(np.float64)
        cn = cand_t.column("p_lon").to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.argsort(cw, kind="stable")
        cw, cl, cn = cw[o], cl[o], cn[o]
        s_ = np.searchsorted(cw, way_ids, side="left")
        e_ = np.searchsorted(cw, way_ids, side="right")
        n_c = e_ - s_
        tot = int(n_c.sum())
        if tot:
            base = np.concatenate(([0], np.cumsum(n_c)))[:-1]
            idx = np.repeat(s_ - base, n_c) + np.arange(tot)
            cand_lat, cand_lon = cl[idx], cn[idx]
        else:
            cand_lat = np.array([], dtype=np.float64)
            cand_lon = np.array([], dtype=np.float64)
        return _split_ways_with_candidates(
            way_ids, lats, lons, offsets, names, wtypes, widths,
            cand_lat, cand_lon, n_c, tol_deg, precision,
        )

    return grouped.map_groups(split_bucket, batch_format="pyarrow")


def detect_and_split(ds, config: Config):
    if not config.enable_intersection_detection:
        return ds
    # both the segment emission and the splitter consume `ds` — pin it once
    # or the whole upstream lineage (clean+simplify) executes twice
    from osmwaterwayextractor_ray.stages._prof import prof_mark

    ds = ds.materialize()
    prof_mark("clean+simplify materialize")
    points = detect_intersections(ds, config)
    if config.intersection_splitter == "distributed":
        return split_at_intersections_distributed(ds, points, config)
    return split_at_intersections(ds, points, config)