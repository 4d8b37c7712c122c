"""Cell keys, coord keys, DP simplification, intersections, PIP."""

import numpy as np
import pytest

from osmwaterwayextractor_ray.functions.cells import (
    bbox_cells,
    cell_id,
    cell_ids_with_halo,
    coord_key,
    key_to_coord,
)
from osmwaterwayextractor_ray.functions.geometry import (
    points_in_ring,
    polyline_intersections,
    project_points_on_polyline,
    simplify_dp,
    vertex_positions,
)
from osmwaterwayextractor_ray.functions.hashing import node_id


def test_cell_id_basic():
    c = cell_id([0.0, 0.005, 0.011], [0.0, 0.0, 0.0], 0.01)
    assert c[0] == c[1] != c[2]
    # distinct lon cells differ by 1
    c2 = cell_id([0.0], [0.011], 0.01)
    assert c2[0] == c[0] + 1


def test_cell_halo_bounded_replication():
    lats = np.array([0.0001, 0.005, 0.0099])
    lons = np.array([0.005, 0.005, 0.0099])
    rows, cells = cell_ids_with_halo(lats, lons, 0.01, 0.0002)
    # point 0 near lat-low boundary -> 2 cells; point 1 interior -> 1 cell;
    # point 2 near lat-high AND lon-high -> 4 cells
    from collections import Counter

    counts = Counter(rows.tolist())
    assert counts[0] == 2 and counts[1] == 1 and counts[2] == 4
    # all pairs unique
    assert len(set(zip(rows.tolist(), cells.tolist()))) == len(rows)


def test_bbox_cells():
    cells = bbox_cells(0.0, 0.0, 0.025, 0.015, 0.01)
    assert len(cells) == 3 * 2


def test_coord_key_roundtrip_preserves_id_hash():
    lats = np.array([52.51, -33.456789, 0.0, 89.999999])
    lons = np.array([13.41, -70.123456, 0.0, 179.999999])
    keys = coord_key(lats, lons, 6)
    rlat, rlon = key_to_coord(keys, 6)
    np.testing.assert_array_equal(rlat, lats)
    np.testing.assert_array_equal(rlon, lons)
    # ids computed from reconstructed coords identical (repr-string parity)
    for a, b, c, d in zip(lats, lons, rlat, rlon):
        assert node_id(a, b) == node_id(c, d)


def test_coord_key_equality_semantics():
    # coordinates equal after rounding to 6 -> same key
    k1 = coord_key(np.array([52.5100000004]), np.array([13.41]), 6)
    k2 = coord_key(np.array([52.51]), np.array([13.4099999996]), 6)
    assert k1[0] == k2[0]


def test_simplify_dp_collinear_and_spike():
    # collinear interior points dropped
    lats = np.array([0.0, 0.5, 1.0])
    lons = np.array([0.0, 0.5, 1.0])
    keep = simplify_dp(lats, lons, 1e-6)
    assert keep.tolist() == [True, False, True]
    # spike above tolerance kept
    lats2 = np.array([0.0, 0.5, 1.0])
    lons2 = np.array([0.0, 0.6, 1.0])
    keep2 = simplify_dp(lats2, lons2, 1e-3)
    assert keep2.tolist() == [True, True, True]


def test_polyline_intersections_cross_and_touch():
    # X crossing at (0.5, 0.5)
    pts = polyline_intersections(
        np.array([0.0, 1.0]), np.array([0.0, 1.0]), np.array([1.0, 0.0]), np.array([0.0, 1.0])
    )
    assert len(pts) == 1
    assert pts[0][0] == pytest.approx(0.5) and pts[0][1] == pytest.approx(0.5)
    # endpoint touch reported as a point (shapely does the same)
    pts2 = polyline_intersections(
        np.array([0.0, 1.0]), np.array([0.0, 0.0]), np.array([1.0, 2.0]), np.array([0.0, 0.0])
    )
    assert pts2 == [(1.0, 0.0)]
    # disjoint
    assert (
        polyline_intersections(
            np.array([0.0, 1.0]), np.array([0.0, 0.0]), np.array([5.0, 6.0]), np.array([5.0, 5.0])
        )
        == []
    )


def test_project_points_on_polyline():
    lats = np.array([0.0, 0.0, 1.0])
    lons = np.array([0.0, 1.0, 1.0])
    dist, pos = project_points_on_polyline(
        lats, lons, np.array([0.1, 0.5]), np.array([0.5, 1.0])
    )
    assert dist[0] == pytest.approx(0.1)
    assert pos[0] == pytest.approx(0.5)
    assert dist[1] == pytest.approx(0.0)
    assert pos[1] == pytest.approx(1.5)
    vp = vertex_positions(lats, lons)
    np.testing.assert_allclose(vp, [0.0, 1.0, 2.0])


def test_points_in_ring():
    ring_lat = np.array([0.0, 0.0, 1.0, 1.0])
    ring_lon = np.array([0.0, 1.0, 1.0, 0.0])
    inside = points_in_ring(
        np.array([0.5, 1.5, 0.5]), np.array([0.5, 0.5, 1.5]), ring_lat, ring_lon
    )
    assert inside.tolist() == [True, False, False]
    # concave polygon with a left-side notch: vertices (0,0),(0,2),(2,2),(2,0),(1,1)
    rl = np.array([0.0, 0.0, 2.0, 2.0, 1.0])
    rn = np.array([0.0, 2.0, 2.0, 0.0, 1.0])
    # (1.0, 0.5) sits in the notch (outside); (1.5, 1.0) is inside
    res = points_in_ring(np.array([1.0, 1.5]), np.array([0.5, 1.0]), rl, rn)
    assert res.tolist() == [False, True]


def test_points_in_polygon_with_hole():
    from osmwaterwayextractor_ray.functions.geometry import points_in_polygon

    outer = (np.array([0.0, 0.0, 4.0, 4.0]), np.array([0.0, 4.0, 4.0, 0.0]))
    hole = (np.array([1.0, 1.0, 3.0, 3.0]), np.array([1.0, 3.0, 3.0, 1.0]))
    lats = np.array([0.5, 2.0, 3.5, 5.0])
    lons = np.array([0.5, 2.0, 3.5, 5.0])
    res = points_in_polygon(lats, lons, [outer, hole])
    # inside outer, inside hole (=outside polygon), inside outer, outside
    assert res.tolist() == [True, False, True, False]


def test_simplify_mask_matches_per_row_dp():
    """The batched keep-mask (vectorized n==3 fast path + recursive
    fallback) must equal per-row simplify_dp for every row shape."""
    from osmwaterwayextractor_ray.stages.clean import _simplify_mask

    rng = np.random.default_rng(7)
    rows = []
    for n in [1, 2, 3, 3, 3, 4, 5, 9, 17]:
        rows.append((rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)))
    # degenerate 3-point rows: collinear, duplicate endpoints, zero-length
    rows.append((np.array([0.0, 0.5, 1.0]), np.array([0.0, 0.5, 1.0])))
    rows.append((np.array([0.0, 5.0, 0.0]), np.array([0.0, 5.0, 0.0])))
    rows.append((np.array([1.0, 1.0, 1.0]), np.array([2.0, 2.0, 2.0])))
    lats = np.concatenate([r[0] for r in rows])
    lons = np.concatenate([r[1] for r in rows])
    offsets = np.concatenate(([0], np.cumsum([len(r[0]) for r in rows])))
    for tol in [1e-9, 1e-3, 0.3, 10.0]:
        got = _simplify_mask(lats, lons, offsets, tol)
        want = np.ones(len(lats), dtype=bool)
        for i in range(len(offsets) - 1):
            s, e = offsets[i], offsets[i + 1]
            if e - s >= 2:
                want[s:e] = simplify_dp(lats[s:e], lons[s:e], tol)
        assert np.array_equal(got, want), f"tol={tol}"


def test_split_insertion_vectorized_matches_loop_reference():
    """The r4 vectorized splitter insertion must reproduce the reference
    insertion contract (osm_waterway_extractor.py:2094-2152) exactly; the
    reference loop is re-implemented independently here (sets + per-way
    python), including the order-dependent seen-set semantics."""
    from osmwaterwayextractor_ray.stages.intersect import _split_ways_with_candidates
    from osmwaterwayextractor_ray.stages._arrow import list_column

    rng = np.random.default_rng(42)
    precision, tol = 6, 5e-3

    for trial in range(30):
        n_ways = int(rng.integers(1, 8))
        way_ids, flat_la, flat_lo, offs = [], [], [], [0]
        cand_la, cand_lo, n_c = [], [], []
        for w in range(n_ways):
            nv = int(rng.integers(2, 7))
            la = np.round(rng.uniform(0, 0.01, nv), precision)
            lo = np.round(rng.uniform(0, 0.01, nv), precision)
            # force some consecutive-distinct structure (clean contract)
            for i in range(1, nv):
                if la[i] == la[i - 1] and lo[i] == lo[i - 1]:
                    lo[i] = round(lo[i] + 1e-6, precision)
            flat_la += la.tolist(); flat_lo += lo.tolist()
            offs.append(len(flat_la))
            way_ids.append(w + 1)
            k = int(rng.integers(0, 6))
            for _ in range(k):
                if rng.random() < 0.5 and nv >= 2:
                    # on-line candidate: a point near a segment interior
                    j = int(rng.integers(0, nv - 1))
                    t = float(rng.uniform(0.1, 0.9))
                    cla = la[j] + t * (la[j + 1] - la[j]) + rng.uniform(-tol / 3, tol / 3)
                    clo = lo[j] + t * (lo[j + 1] - lo[j]) + rng.uniform(-tol / 3, tol / 3)
                elif rng.random() < 0.3:
                    # duplicate of an existing vertex (seen-set path)
                    j = int(rng.integers(0, nv))
                    cla, clo = float(la[j]), float(lo[j])
                else:
                    cla, clo = float(rng.uniform(0, 0.01)), float(rng.uniform(0, 0.01))
                cand_la.append(cla); cand_lo.append(clo)
            n_c.append(k)

        lats = np.asarray(flat_la); lons = np.asarray(flat_lo)
        offsets = np.asarray(offs, dtype=np.int64)
        got = _split_ways_with_candidates(
            np.asarray(way_ids, dtype=np.int64), lats, lons, offsets,
            [f"n{w}" for w in way_ids], ["river"] * n_ways, [""] * n_ways,
            np.asarray(cand_la), np.asarray(cand_lo),
            np.asarray(n_c, dtype=np.int64), tol, precision,
        )
        g_lats, g_offs = list_column(got, "lats")
        g_lons, _ = list_column(got, "lons")

        # reference loop (the pre-r4 per-way implementation): same float
        # paths as the engine's projection — GLOBAL cumulative positions
        # (cs over the whole flat array, bridges included), d2 compared
        # without sqrt, first-argmin segment, pos relative to way start
        seg_len_all = np.sqrt(np.diff(lons) ** 2 + np.diff(lats) ** 2)
        cs = np.concatenate(([0.0], np.cumsum(seg_len_all)))
        cstart = np.concatenate(([0], np.cumsum(n_c)))
        exp_rows = []
        for w in range(n_ways):
            s, e = offsets[w], offsets[w + 1]
            wla, wlo = lats[s:e], lons[s:e]
            cands = []
            for ci in range(cstart[w], cstart[w + 1]):
                px, py = cand_lo[ci], cand_la[ci]
                best_d2, best_pos = None, None
                for j in range(len(wla) - 1):
                    vg = s + j
                    ax, ay, bx, by = lons[vg], lats[vg], lons[vg + 1], lats[vg + 1]
                    dx, dy = bx - ax, by - ay
                    L2 = dx * dx + dy * dy
                    t = 0.0 if L2 == 0.0 else np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
                    ex, ey = px - (ax + t * dx), py - (ay + t * dy)
                    d2 = ex * ex + ey * ey
                    if best_d2 is None or d2 < best_d2:
                        best_d2 = d2
                        best_pos = (cs[vg] - cs[s]) + t * seg_len_all[vg]
                if best_d2 is not None and np.sqrt(best_d2) < tol:
                    cands.append((best_pos, cand_la[ci], cand_lo[ci]))
            cands.sort()
            vpos = cs[s:e] - cs[s]
            new, seen = [], set()
            for i in range(len(wla)):
                new.append((wla[i], wlo[i])); seen.add((wla[i], wlo[i]))
                if i < len(wla) - 1:
                    for p, cla, clo in cands:
                        if vpos[i] < p < vpos[i + 1]:
                            r = (np.round(cla, precision) + 0.0, np.round(clo, precision) + 0.0)
                            if r not in seen:
                                new.append(r); seen.add(r)
            ded = [new[0]]
            for pt in new[1:]:
                if pt != ded[-1]:
                    ded.append(pt)
            exp_rows.append(ded)

        assert len(g_offs) - 1 == n_ways, trial
        for w in range(n_ways):
            got_row = list(zip(g_lats[g_offs[w]:g_offs[w+1]].tolist(),
                               g_lons[g_offs[w]:g_offs[w+1]].tolist()))
            assert got_row == exp_rows[w], (trial, w, got_row, exp_rows[w])
