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
