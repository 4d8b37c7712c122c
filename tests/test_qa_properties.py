"""QA metrics (C5/C6) + hypothesis property tests for the pure kernels."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import coord_key, key_to_coord
from osmwaterwayextractor_ray.functions.hashing import node_id
from osmwaterwayextractor_ray.functions.width import parse_width, parse_width_batch


def test_qa_metrics(ray_session):
    from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
    from osmwaterwayextractor_ray.sources.waterways import fixture_waterways_ds

    cfg = Config(min_fragment_length_m=0.0)
    result = build_graph(fixture_waterways_ds(), cfg, with_qa=True)
    qa = result.qa
    assert qa["original_waterways"] == 4
    assert qa["final_edges"] == result.edges.count()
    assert qa["final_nodes"] == result.nodes.count()
    # fixture: ways 1+2 share an endpoint exactly -> singleton clusters only
    # (coincident coords are ONE distinct coord, not a 2-cluster)
    assert qa["singleton_clusters"] == qa["total_clusters"]
    assert qa["displacement_p50_m"] == 0.0
    # all 3 width tags parse ('10 m', '3 m', '2 m'), way 3 has none
    assert qa["width_parse_success_rate"] == 100.0
    assert 0 < qa["pct_edges_with_width_raw"] < 100
    assert qa["edge_length_p5_m"] <= qa["edge_length_p50_m"] <= qa["edge_length_p95_m"]
    assert qa["mean_edge_length_m"] > 0


@given(
    lat=st.floats(min_value=-89.999999, max_value=89.999999),
    lon=st.floats(min_value=-179.999999, max_value=179.999999),
)
@settings(max_examples=300, deadline=None)
def test_coord_key_roundtrip_property(lat, lon):
    """For any rounded coordinate, key packing is exact and invertible to
    the identical float (id-hash parity depends on this)."""
    rlat, rlon = round(lat, 6) + 0.0, round(lon, 6) + 0.0  # -0.0 normalized (see stages/clean.py)
    k = coord_key(np.array([rlat]), np.array([rlon]), 6)
    la2, lo2 = key_to_coord(k, 6)
    assert la2[0] == rlat and lo2[0] == rlon
    assert node_id(rlat, rlon) == node_id(la2[0], lo2[0])


@given(st.text(max_size=20))
@settings(max_examples=300, deadline=None)
def test_width_parser_property(raw):
    """Batch parser always matches the scalar reference-faithful parser and
    never throws, for arbitrary inputs."""
    m, src = parse_width(raw)
    mb, sb = parse_width_batch([raw])
    assert sb[0] == src
    if m is None:
        assert np.isnan(mb[0])
    else:
        assert mb[0] == m
        assert 0 < m <= 1000


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-60, max_value=60),
            st.floats(min_value=-170, max_value=170),
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_polyline_length_property(coords):
    from osmwaterwayextractor_ray.functions.geodesy import polyline_lengths_m, vincenty_m

    lats = np.array([c[0] for c in coords])
    lons = np.array([c[1] for c in coords])
    offsets = np.array([0, len(coords)])
    total = polyline_lengths_m(lats, lons, offsets)[0]
    manual = sum(
        float(vincenty_m(lats[i], lons[i], lats[i + 1], lons[i + 1]))
        for i in range(len(coords) - 1)
    )
    assert total == pytest.approx(manual, rel=1e-9, abs=1e-6)
    assert total >= 0
