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


def test_tdigest_bounded_error():
    """Sketch percentiles within 1% relative error of the exact
    sorted-index value on heavy-tailed data."""
    import numpy as np

    from osmwaterwayextractor_ray.state.tdigest import digest_values, quantile

    rng = np.random.default_rng(7)
    v = rng.lognormal(3.0, 1.0, 200_000)
    m, w = digest_values(v)
    assert len(m) <= 600  # bounded sketch size
    assert float(w.sum()) == float(len(v))
    sv = np.sort(v)
    for q in (0.05, 0.5, 0.95, 0.99):
        exact = sv[int(len(v) * q)]
        est = quantile(m, w, (int(len(v) * q) + 0.5) / len(v))
        assert abs(est - exact) <= 0.01 * exact, (q, est, exact)


def test_tdigest_merge_consistency():
    """Digesting shards and merging must stay as accurate as one pass."""
    import numpy as np

    from osmwaterwayextractor_ray.state.tdigest import (
        compress_weighted,
        digest_values,
        quantile,
    )

    rng = np.random.default_rng(11)
    v = rng.normal(100.0, 15.0, 120_000)
    parts = np.array_split(v, 37)
    ms, ws = [], []
    for p in parts:
        m, w = digest_values(p)
        ms.append(m)
        ws.append(w)
    m, w = compress_weighted(np.concatenate(ms), np.concatenate(ws))
    assert len(m) <= 600
    sv = np.sort(v)
    for q in (0.05, 0.5, 0.95, 0.99):
        exact = sv[int(len(v) * q)]
        est = quantile(m, w, (int(len(v) * q) + 0.5) / len(v))
        assert abs(est - exact) <= 0.01 * abs(exact), (q, est, exact)


def test_qa_percentile_sketch_branch(ray_session):
    """The large-n QA branch (t-digest over a Dataset) must agree with the
    exact rank-prefix branch on the same data."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.qa import _sorted_index_percentiles

    rng = np.random.default_rng(3)
    vals = rng.lognormal(2.0, 0.8, 50_000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(13)
    qs = [0.05, 0.5, 0.95, 0.99]
    exact, m_exact = _sorted_index_percentiles(ds, "x", qs, exact_rank_limit=10**9)
    sketch, m_sketch = _sorted_index_percentiles(ds, "x", qs, exact_rank_limit=1)
    assert (m_exact, m_sketch) == ("exact", "tdigest")
    for q in qs:
        assert abs(sketch[q] - exact[q]) <= 0.01 * exact[q], (q, sketch[q], exact[q])
