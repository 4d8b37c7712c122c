"""S2 cell-id properties (functions/s2.py).

No S2 library exists in this container, so instead of fixture vectors the
suite pins the DEFINING properties of the published scheme: the Hilbert
curve's continuity (consecutive leaf positions are edge-adjacent in ij),
exact center round-trips at every level, parent/child containment and id
arithmetic, face placement of the axis points, and token round-trips.
Together these admit exactly one curve per lookup-table orientation
convention, which is fixed by the standard tables in the module."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmwaterwayextractor_ray.functions.s2 import (
    MAX_LEVEL,
    MAX_SIZE,
    POS_BITS,
    from_face_ij,
    lsb_for_level,
    s2_cell_center,
    s2_cell_id,
    s2_children,
    s2_contains,
    s2_level,
    s2_parent,
    s2_range_max,
    s2_range_min,
    s2_token,
    s2_token_to_id,
    to_face_ij,
)

rng = np.random.default_rng(42)


def rand_latlon(n):
    return rng.uniform(-89.9, 89.9, n), rng.uniform(-179.9, 179.9, n)


# ---- Hilbert curve structure ----


def test_hilbert_continuity_within_face():
    """Consecutive curve positions decode to edge-adjacent (i, j) cells —
    the property that makes sorted s2 keys spatially local."""
    U = np.uint64
    for face in range(6):
        pos = rng.integers(0, (1 << 60) - 1, 2000, dtype=np.uint64)
        ids0 = (U(face) << U(POS_BITS)) | (pos << U(1)) | U(1)
        ids1 = (U(face) << U(POS_BITS)) | ((pos + U(1)) << U(1)) | U(1)
        f0, i0, j0 = to_face_ij(ids0)
        f1, i1, j1 = to_face_ij(ids1)
        assert (f0 == face).all() and (f1 == face).all()
        manhattan = np.abs(i1 - i0) + np.abs(j1 - j0)
        assert (manhattan == 1).all()


def test_face_ij_roundtrip():
    face = rng.integers(0, 6, 5000)
    i = rng.integers(0, MAX_SIZE, 5000)
    j = rng.integers(0, MAX_SIZE, 5000)
    ids = from_face_ij(face, i, j)
    f2, i2, j2 = to_face_ij(ids)
    np.testing.assert_array_equal(f2, face)
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(j2, j)


def test_curve_positions_are_a_bijection_on_a_block():
    """All 4^5 (i, j) cells of a 32x32 block map to distinct positions
    forming a contiguous range (space-filling, no gaps)."""
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    base_i, base_j = 7 << 5, 11 << 5  # an arbitrary aligned 32x32 block
    ids = from_face_ij(
        np.full(1024, 2), (base_i + ii.ravel()), (base_j + jj.ravel())
    )
    pos = np.sort((ids >> np.uint64(1)) & np.uint64((1 << 60) - 1))
    assert len(np.unique(pos)) == 1024
    assert int(pos[-1] - pos[0]) == 1023  # contiguous Hilbert range


# ---- hierarchy arithmetic ----


def test_level_and_lsb():
    lats, lons = rand_latlon(2000)
    for level in (0, 1, 7, 12, 20, 30):
        ids = s2_cell_id(lats, lons, level)
        assert (s2_level(ids) == level).all()
        assert (ids & (lsb_for_level(level) - np.uint64(1)) == 0).all()
        assert (ids & lsb_for_level(level) != 0).all()


def test_parent_contains_child_and_point():
    lats, lons = rand_latlon(2000)
    leaf = s2_cell_id(lats, lons, MAX_LEVEL)
    for level in (3, 9, 12, 19):
        parents = s2_cell_id(lats, lons, level)
        assert (s2_parent(leaf, level) == parents).all()
        assert s2_contains(parents, leaf).all()
        # strictly nested ranges
        assert (s2_range_min(parents) <= s2_range_min(leaf)).all()
        assert (s2_range_max(parents) >= s2_range_max(leaf)).all()


def test_children_partition_parent():
    lats, lons = rand_latlon(500)
    parents = s2_cell_id(lats, lons, 10)
    kids = s2_children(parents)
    assert kids.shape == (500, 4)
    assert (s2_level(kids.ravel()) == 11).all()
    # children tile the parent range exactly, in order, without overlap
    kmin = s2_range_min(kids.ravel()).reshape(500, 4)
    kmax = s2_range_max(kids.ravel()).reshape(500, 4)
    np.testing.assert_array_equal(kmin[:, 0], s2_range_min(parents))
    np.testing.assert_array_equal(kmax[:, 3], s2_range_max(parents))
    # leaf ids are odd: consecutive sibling ranges skip the even gap value
    assert (kmin[:, 1:] == kmax[:, :-1] + np.uint64(2)).all()
    assert s2_contains(parents, kids[:, 2]).all()


# ---- geometry ----


def test_center_reencodes_to_same_cell():
    lats, lons = rand_latlon(3000)
    for level in (4, 12, 30):
        ids = s2_cell_id(lats, lons, level)
        clat, clon = s2_cell_center(ids)
        np.testing.assert_array_equal(s2_cell_id(clat, clon, level), ids)


def test_center_is_near_the_point():
    # at level 12 a cell is ~3-6 km across; centers must be within ~one
    # cell diagonal of the encoded point
    lats, lons = rand_latlon(3000)
    ids = s2_cell_id(lats, lons, 12)
    clat, clon = s2_cell_center(ids)
    dlat = np.abs(clat - lats)
    dlon = np.abs(clon - lons) * np.cos(np.deg2rad(lats))
    assert (np.sqrt(dlat**2 + dlon**2) < 0.1).all()


def test_axis_points_land_on_their_faces():
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = s2_cell_id(lats, lons, MAX_LEVEL)
    faces = (ids >> np.uint64(POS_BITS)).astype(int)
    np.testing.assert_array_equal(faces, [0, 1, 2, 3, 4, 5])
    # each face center is the exact middle of its face's ij grid
    _, i, j = to_face_ij(ids)
    assert set(np.unique(i)) <= {MAX_SIZE // 2 - 1, MAX_SIZE // 2}
    assert set(np.unique(j)) <= {MAX_SIZE // 2 - 1, MAX_SIZE // 2}


def test_nearby_points_share_coarse_cells_far_points_do_not():
    base_lat, base_lon = 41.2, -7.3
    near = s2_cell_id([base_lat + 1e-4], [base_lon + 1e-4], 12)
    here = s2_cell_id([base_lat], [base_lon], 12)
    far = s2_cell_id([base_lat + 5.0], [base_lon], 12)
    assert s2_parent(near, 8) == s2_parent(here, 8)
    assert far != here


# ---- tokens ----


def test_token_roundtrip():
    lats, lons = rand_latlon(500)
    for level in (0, 12, 30):
        ids = s2_cell_id(lats, lons, level)
        toks = s2_token(ids)
        np.testing.assert_array_equal(s2_token_to_id(toks), ids)
        for t in toks[:50]:
            assert not t.endswith("0") and 1 <= len(t) <= 16


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-89.999, max_value=89.999),
    st.floats(min_value=-179.999, max_value=179.999),
    st.integers(min_value=0, max_value=30),
)
def test_hypothesis_invariants(lat, lon, level):
    ids = s2_cell_id([lat], [lon], level)
    assert s2_level(ids)[0] == level
    clat, clon = s2_cell_center(ids)
    assert s2_cell_id(clat, clon, level)[0] == ids[0]
    if level > 0:
        assert s2_contains(s2_parent(ids, level - 1), ids)[0]


def test_invalid_level_raises():
    with pytest.raises(ValueError):
        s2_cell_id([0.0], [0.0], 31)


# ---- bbox covering (the cell prefilter for two-phase spatial joins) ----


def test_cover_bbox_is_superset_of_interior_points():
    from osmwaterwayextractor_ray.functions.s2 import s2_cover_bbox

    for (lo_lat, lo_lon, hi_lat, hi_lon) in [
        (-3.0007, -8.0003, 1.9993, -2.0003),   # the fixture rectangle
        (0.0007, 0.0013, 4.4013, 4.2007),      # triangle 2's bbox
        (12.3, 33.1, 17.9, 40.6),              # off-fixture, single face
    ]:
        for level in (6, 8, 10):
            cover = np.sort(s2_cover_bbox(lo_lat, lo_lon, hi_lat, hi_lon, level))
            assert len(cover) == len(np.unique(cover))
            lats = rng.uniform(lo_lat, hi_lat, 4000)
            lons = rng.uniform(lo_lon, hi_lon, 4000)
            cells = s2_cell_id(lats, lons, level)
            pos = np.searchsorted(cover, cells)
            pos[pos == len(cover)] = 0
            assert (cover[pos] == cells).all(), (level, lo_lat)
            # corners too (boundary of the closed bbox)
            ccells = s2_cell_id(
                np.array([lo_lat, lo_lat, hi_lat, hi_lat]),
                np.array([lo_lon, hi_lon, lo_lon, hi_lon]),
                level,
            )
            cpos = np.searchsorted(cover, ccells)
            cpos[cpos == len(cover)] = 0
            assert (cover[cpos] == ccells).all()


def test_cover_bbox_rejects_multi_face_and_malformed():
    from osmwaterwayextractor_ray.functions.s2 import s2_cover_bbox

    with pytest.raises(ValueError):
        s2_cover_bbox(-10.0, 30.0, 10.0, 60.0, 8)  # crosses face boundary at 45 deg
    with pytest.raises(ValueError):
        s2_cover_bbox(5.0, 5.0, -5.0, 6.0, 8)  # malformed


def test_pip_join_s2_equals_flat_pip_join(ray_session):
    from osmwaterwayextractor_ray.pipelines import geo

    sf = "/root/testdata/sf0.001"
    a = geo.pip_join(sf).to_pandas().sort_values(["event_id", "poly_id"]).reset_index(drop=True)
    b = geo.pip_join_s2(sf).to_pandas().sort_values(["event_id", "poly_id"]).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_s2_rollup_parent_invariant(ray_session):
    """Every coarse cell's count equals the sum of its fine descendants
    (the zoom-pyramid correctness property), and each level's total
    equals the point count."""
    import numpy as np

    from osmwaterwayextractor_ray.functions.s2 import s2_parent, s2_token_to_id
    from osmwaterwayextractor_ray.pipelines.geo import s2_rollup

    df = s2_rollup("/root/testdata/sf0.001").to_pandas()
    totals = df.groupby("level")["n_points"].sum()
    assert totals.nunique() == 1  # same points counted at every level
    fine = df[df["level"] == 12]
    fids = s2_token_to_id(fine["cell_token"].tolist())
    for lvl in (8, 4):
        coarse = df[df["level"] == lvl].set_index("cell_token")["n_points"]
        parents = s2_parent(fids, lvl)
        from osmwaterwayextractor_ray.functions.s2 import s2_token
        got = (
            fine.assign(parent=s2_token(parents))
            .groupby("parent")["n_points"].sum()
        )
        assert got.sort_index().equals(coarse.sort_index())
