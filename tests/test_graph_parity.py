"""End-to-end parity: distributed Ray pipeline vs the sequential
reference-faithful oracle (tests/refimpl.py), on the reference's own
4-waterway conformance fixture plus deterministic scaled/randomized
networks and both shipped config variants."""

import math

import numpy as np
import pytest

import tests.refimpl as refimpl
from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
from osmwaterwayextractor_ray.sources.waterways import (
    fixture_waterways_pylist,
    fixture_waterways_ds,
    synth_waterways_ds,
)
from osmwaterwayextractor_ray.stages._arrow import waterways_table


def _pylist_to_ds(waterways):
    import ray.data as rd

    flat_lat, flat_lon, offsets = [], [], [0]
    way_ids, names, wtypes, widths = [], [], [], []
    for w in waterways:
        for la, lo in w["coordinates"]:
            flat_lat.append(la)
            flat_lon.append(lo)
        offsets.append(len(flat_lat))
        way_ids.append(w["id"])
        names.append(w["tags"].get("name", ""))
        wtypes.append(w["tags"].get("waterway", ""))
        widths.append(w["tags"].get("width", ""))
    return rd.from_arrow(
        waterways_table(
            np.asarray(way_ids), flat_lat, flat_lon, np.asarray(offsets), names, wtypes, widths
        )
    )


def _ds_to_motif_pylist(n):
    """Same rows synth_waterways_ds produces, as reference dicts."""
    from osmwaterwayextractor_ray.sources.waterways import _MOTIF

    out = []
    for w in range(n):
        g, t = divmod(w, 4)
        coords, name, wtype, width = _MOTIF[t]
        dlat = 0.1 * (g // 100)
        dlon = 0.1 * (g % 100)
        tags = {"waterway": wtype, "name": name}
        if width:
            tags["width"] = width
        out.append(
            {
                "id": w + 1,
                "coordinates": [(round(la + dlat, 6), round(lo + dlon, 6)) for la, lo in coords],
                "tags": tags,
            }
        )
    return out


def _assert_graph_parity(result, ref_nodes, ref_edges):
    got_nodes = result.nodes.to_pandas()
    got_edges = result.edges.to_pandas()

    ref_node_set = {(n["id"], n["lat"], n["lon"], n["type"]) for n in ref_nodes}
    got_node_set = {
        (r["id"], r["lat"], r["lon"], r["type"]) for r in got_nodes.to_dict("records")
    }
    assert got_node_set == ref_node_set

    def edge_key(e):
        return (e["id"], e["from_node_id"], e["to_node_id"], e["original_way_id"])

    ref_by_key = {edge_key(e): e for e in ref_edges}
    got_records = got_edges.to_dict("records")
    got_by_key = {edge_key(e): e for e in got_records}
    assert set(got_by_key) == set(ref_by_key)
    for k, ge in got_by_key.items():
        re_ = ref_by_key[k]
        assert ge["length_m"] == pytest.approx(re_["length_m"], rel=1e-9, abs=1e-6)
        assert ge["name"] == re_["name"] and ge["type"] == re_["type"]
        assert ge["width_raw"] == re_["width_raw"]
        if re_["width_m"] is None:
            assert ge["width_m"] is None or (isinstance(ge["width_m"], float) and math.isnan(ge["width_m"]))
        else:
            assert ge["width_m"] == pytest.approx(re_["width_m"])
        assert ge["width_source"] == re_["width_source"]
        got_coords = list(zip(ge["lats"], ge["lons"]))
        assert got_coords == [(a, b) for a, b in re_["coordinates"]]


CONFIGS = [
    Config(),  # shipped defaults (snap 2.0, simplify on)
    Config(snap_tolerance_m=5.0, enable_geometry_simplification=False,
           max_displacement_multiplier=1.5, warning_displacement_multiplier=1.2),
    Config(snap_tolerance_m=6.0, min_fragment_length_m=0.0),
]


@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
def test_fixture_parity(ray_session, cfg_idx):
    cfg = CONFIGS[cfg_idx]
    ref_nodes, ref_edges, _ = refimpl.build_graph(fixture_waterways_pylist(), cfg)
    result = build_graph(fixture_waterways_ds(), cfg)
    _assert_graph_parity(result, ref_nodes, ref_edges)


def test_fixture_expected_topology(ray_session):
    """Hand-checkable expectations on the reference fixture with defaults.

    Worked through by hand + confirmed by the sequential oracle:
    way 4 is collinear with way 1 (both on lon = lat - 39.1), so their
    overlap is a LineString intersection the reference ignores (:1895-1896)
    — but Douglas-Peucker first straightens ways 2 and 4 (their vertices
    are collinear), after which way 2's chord genuinely crosses ways 1/4 at
    (52.510999, 13.410999). Insertions: way 1 gains the crossing ->
    junctions at 52.51 + crossing -> 3 edges; way 4 gains 52.51 (touch with
    way 2), the crossing, and 52.52 (touch with way 3) -> 4 edges; ways 2
    and 3 stay whole."""
    cfg = Config(min_fragment_length_m=0.0)
    result = build_graph(fixture_waterways_ds(), cfg)
    nodes = result.nodes.to_pandas()
    edges = result.edges.to_pandas()
    by_way = edges.groupby("original_way_id").size().to_dict()
    assert by_way == {1: 3, 2: 1, 3: 1, 4: 4}
    # every edge endpoint has a node row
    node_ids = set(nodes["id"])
    assert set(edges["from_node_id"]) <= node_ids
    assert set(edges["to_node_id"]) <= node_ids


def test_scaled_motif_parity(ray_session):
    n = 40  # 10 motif copies
    cfg = Config(min_fragment_length_m=0.0)
    ref_nodes, ref_edges, _ = refimpl.build_graph(_ds_to_motif_pylist(n), cfg)
    result = build_graph(synth_waterways_ds(n), cfg)
    _assert_graph_parity(result, ref_nodes, ref_edges)


@pytest.mark.parametrize("seed", [1234, 777, 424242])
def test_random_networks_parity(ray_session, seed):
    """Deterministic pseudo-random networks: near-miss endpoints around the
    snap tolerance, crossings, short fragments, consecutive duplicates."""
    rng = np.random.default_rng(seed)
    waterways = []
    wid = 1
    for _ in range(30):
        base_lat = float(rng.uniform(-50, 50))
        base_lon = float(rng.uniform(-100, 100))
        n_pts = int(rng.integers(2, 6))
        lats = base_lat + np.cumsum(rng.uniform(-0.01, 0.01, n_pts))
        lons = base_lon + np.cumsum(rng.uniform(-0.01, 0.01, n_pts))
        coords = list(zip(lats.tolist(), lons.tolist()))
        if rng.random() < 0.3:
            coords.insert(1, coords[0])  # consecutive duplicate after rounding
        waterways.append(
            {"id": wid, "coordinates": coords, "tags": {"waterway": "river", "name": f"r{wid}",
                                                         "width": ["5 m", "3", "", "x"][wid % 4]}}
        )
        wid += 1
        if rng.random() < 0.5:
            # a second way starting within ~snap tolerance of the previous end
            jitter = rng.uniform(-2e-5, 2e-5, 2)
            start = (coords[-1][0] + float(jitter[0]), coords[-1][1] + float(jitter[1]))
            n2 = int(rng.integers(2, 4))
            lats2 = start[0] + np.cumsum(rng.uniform(-0.01, 0.01, n2))
            lons2 = start[1] + np.cumsum(rng.uniform(-0.01, 0.01, n2))
            coords2 = [start] + list(zip(lats2.tolist(), lons2.tolist()))
            waterways.append(
                {"id": wid, "coordinates": coords2, "tags": {"waterway": "stream", "name": f"s{wid}"}}
            )
            wid += 1
    cfg = Config(snap_tolerance_m=5.0, min_fragment_length_m=10.0)
    ref_nodes, ref_edges, _ = refimpl.build_graph(waterways, cfg)
    result = build_graph(_pylist_to_ds(waterways), cfg)
    _assert_graph_parity(result, ref_nodes, ref_edges)


def test_hot_cell_salting_parity(ray_session):
    """Forcing a tiny hot-cell limit makes every cell salt into triangle
    sub-tasks; the result must be identical to the unsalted run (and to
    the sequential oracle)."""
    n = 40
    cfg_salted = Config(min_fragment_length_m=0.0, hot_cell_row_limit=10)
    ref_nodes, ref_edges, _ = refimpl.build_graph(_ds_to_motif_pylist(n), cfg_salted)
    result = build_graph(synth_waterways_ds(n), cfg_salted)
    _assert_graph_parity(result, ref_nodes, ref_edges)


def test_dense_crossing_network_parity(ray_session):
    """Many ways crossing inside a single cell — exercises the pairwise
    kernel where pair indices diverge from segment indices (regression:
    collinear-touch used pair indices on segment arrays)."""
    waterways = []
    wid = 1
    # a grid of horizontal and vertical ways all crossing each other,
    # plus collinear continuations that touch end-to-end
    for i in range(8):
        y = 10.0 + i * 0.003
        waterways.append({"id": wid, "coordinates": [(y, 20.0), (y, 20.03)],
                          "tags": {"waterway": "river", "name": f"h{i}"}})
        wid += 1
    for j in range(8):
        x = 20.0 + j * 0.003
        waterways.append({"id": wid, "coordinates": [(10.0 - 0.001, x), (10.0 + 0.025, x)],
                          "tags": {"waterway": "stream", "name": f"v{j}"}})
        wid += 1
    # collinear touching chains
    waterways.append({"id": wid, "coordinates": [(10.05, 20.0), (10.05, 20.01)],
                      "tags": {"waterway": "river", "name": "c1"}})
    wid += 1
    waterways.append({"id": wid, "coordinates": [(10.05, 20.01), (10.05, 20.02)],
                      "tags": {"waterway": "river", "name": "c2"}})
    cfg = Config(min_fragment_length_m=0.0)
    ref_nodes, ref_edges, _ = refimpl.build_graph(waterways, cfg)
    result = build_graph(_pylist_to_ds(waterways), cfg)
    _assert_graph_parity(result, ref_nodes, ref_edges)


def test_partitioning_invariance(ray_session):
    """SURVEY §5(d): identical sorted outputs regardless of input block
    structure (the single-node stand-in for 'two parallelism levels' — the
    block count is what parallelism changes)."""
    import pandas as pd

    cfg = Config(min_fragment_length_m=0.0)
    base = synth_waterways_ds(48)
    outs = []
    for blocks in (1, 7, 31):
        r = build_graph(base.repartition(blocks), cfg)
        e = r.edges.to_pandas().sort_values("id").reset_index(drop=True)
        n = r.nodes.to_pandas().sort_values("id").reset_index(drop=True)
        outs.append((e, n))
    for e, n in outs[1:]:
        pd.testing.assert_frame_equal(outs[0][0], e)
        pd.testing.assert_frame_equal(outs[0][1], n)


def test_distributed_edge_assembly_equals_broadcast(ray_session):
    """The fully distributed edge path (partitioned hash joins, no
    driver-resident coord_mapping) must produce exactly the broadcast
    path's edges."""
    import pandas as pd

    from osmwaterwayextractor_ray.stages.clean import clean_waterways, simplify_waterways
    from osmwaterwayextractor_ray.stages.cluster import cluster_points
    from osmwaterwayextractor_ray.stages.edges import create_edges, create_edges_distributed
    from osmwaterwayextractor_ray.stages.endpoints import (
        cluster_input_points,
        endpoint_junction_counts,
    )
    from osmwaterwayextractor_ray.stages.intersect import detect_and_split

    cfg = Config(min_fragment_length_m=0.0, snap_tolerance_m=5.0)
    wx = detect_and_split(
        simplify_waterways(clean_waterways(synth_waterways_ds(40), cfg), cfg), cfg
    ).materialize()
    cm = cluster_points(
        cluster_input_points(endpoint_junction_counts(wx, cfg), cfg), cfg
    ).materialize()

    broadcast = create_edges(wx, cm, cfg).to_pandas()
    distributed = create_edges_distributed(wx, cm, cfg).to_pandas()
    a = broadcast.sort_values("id").reset_index(drop=True)
    b = distributed.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_full_graph_distributed_mode(ray_session):
    """build_graph(edge_assembly='distributed') end-to-end equals the
    broadcast-mode graph."""
    import pandas as pd

    cfg_b = Config(min_fragment_length_m=0.0)
    cfg_d = Config(min_fragment_length_m=0.0, edge_assembly="distributed")
    rb = build_graph(synth_waterways_ds(24), cfg_b)
    rd_ = build_graph(synth_waterways_ds(24), cfg_d)
    eb = rb.edges.to_pandas().sort_values("id").reset_index(drop=True)
    ed = rd_.edges.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(eb, ed)
    nb = rb.nodes.to_pandas().sort_values("id").reset_index(drop=True)
    nd = rd_.nodes.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(nb, nd)


def test_fused_clustering_equals_unfused(ray_session):
    """cluster_points_from_ways (ONE fused cell shuffle) must equal the
    two-shuffle path (endpoint_junction_counts -> cluster_input_points ->
    cluster_points) exactly, including under forced hot-cell salting."""
    import pandas as pd

    from osmwaterwayextractor_ray.stages.clean import clean_waterways, simplify_waterways
    from osmwaterwayextractor_ray.stages.cluster import cluster_points, cluster_points_from_ways
    from osmwaterwayextractor_ray.stages.endpoints import (
        cluster_input_points,
        endpoint_junction_counts,
    )
    from osmwaterwayextractor_ray.stages.intersect import detect_and_split

    for cfg in [
        Config(min_fragment_length_m=0.0, snap_tolerance_m=5.0),
        Config(min_fragment_length_m=0.0, snap_tolerance_m=5.0, cluster_hot_row_limit=4),
    ]:
        wx = detect_and_split(
            simplify_waterways(clean_waterways(synth_waterways_ds(60), cfg), cfg), cfg
        ).materialize()
        unfused = cluster_points(
            cluster_input_points(endpoint_junction_counts(wx, cfg), cfg), cfg
        ).to_pandas().sort_values("key").reset_index(drop=True)
        fused = (
            cluster_points_from_ways(wx, cfg)
            .to_pandas().sort_values("key").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fused, unfused)


def test_distributed_splitter_equals_broadcast(ray_session):
    """The distributed splitter (cell hash-join + way-bucket co-group, no
    broadcast point index) must produce exactly the broadcast splitter's
    ways."""
    import pandas as pd

    from osmwaterwayextractor_ray.stages.clean import clean_waterways, simplify_waterways
    from osmwaterwayextractor_ray.stages.intersect import (
        detect_intersections,
        split_at_intersections,
        split_at_intersections_distributed,
    )

    cfg = Config(min_fragment_length_m=0.0, snap_tolerance_m=5.0)
    base = simplify_waterways(
        clean_waterways(synth_waterways_ds(40), cfg), cfg
    ).materialize()
    points = detect_intersections(base, cfg).materialize()
    a = split_at_intersections(base, points, cfg).to_pandas()
    b = split_at_intersections_distributed(base, points, cfg).to_pandas()
    for df in (a, b):
        df["lats"] = df["lats"].map(tuple)
        df["lons"] = df["lons"].map(tuple)
    a = a.sort_values("way_id").reset_index(drop=True)
    b = b.sort_values("way_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_broadcast_splitter_budget_guard(ray_session, monkeypatch):
    """With WWX_MAX_BROADCAST_ROWS below the point count, the broadcast
    splitter must refuse (pointing at the distributed twin) instead of
    silently shipping an over-budget blob."""
    import pytest as _pytest

    from osmwaterwayextractor_ray.stages.clean import clean_waterways, simplify_waterways
    from osmwaterwayextractor_ray.stages.intersect import (
        detect_intersections,
        split_at_intersections,
    )

    cfg = Config(min_fragment_length_m=0.0, snap_tolerance_m=5.0)
    base = simplify_waterways(
        clean_waterways(synth_waterways_ds(20), cfg), cfg
    ).materialize()
    points = detect_intersections(base, cfg).materialize()
    assert points.count() > 1
    monkeypatch.setenv("WWX_MAX_BROADCAST_ROWS", "1")
    with _pytest.raises(ValueError, match="distributed"):
        split_at_intersections(base, points, cfg)


def test_full_graph_all_distributed_mode(ray_session):
    """build_graph with BOTH distributed paths (splitter + edge assembly)
    end-to-end equals the broadcast-mode graph."""
    import pandas as pd

    cfg_b = Config(min_fragment_length_m=0.0)
    cfg_d = Config(
        min_fragment_length_m=0.0,
        intersection_splitter="distributed",
        edge_assembly="distributed",
    )
    rb = build_graph(synth_waterways_ds(24), cfg_b)
    rd_ = build_graph(synth_waterways_ds(24), cfg_d)
    eb = rb.edges.to_pandas().sort_values("id").reset_index(drop=True)
    ed = rd_.edges.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(eb, ed)
    nb = rb.nodes.to_pandas().sort_values("id").reset_index(drop=True)
    nd = rd_.nodes.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(nb, nd)


def test_cell_size_invariance(ray_session):
    """The spatial-shuffle cell sizes are pure grouping knobs (config.py
    claims results identical for any size) — pin it: the full graph must
    be bit-identical across cell-size combinations."""
    import pandas as pd

    outs = []
    for cl, ix in [(1.0, 0.5), (0.35, 0.2), (2.0, 1.0)]:
        cfg = Config(
            min_fragment_length_m=0.0,
            snap_tolerance_m=5.0,
            cluster_cell_deg=cl,
            intersect_cell_deg=ix,
        )
        r = build_graph(synth_waterways_ds(48), cfg)
        e = r.edges.to_pandas().sort_values("id").reset_index(drop=True)
        e["lats"] = e["lats"].map(tuple)
        e["lons"] = e["lons"].map(tuple)
        n = r.nodes.to_pandas().sort_values("id").reset_index(drop=True)
        outs.append((e, n))
    for e, n in outs[1:]:
        pd.testing.assert_frame_equal(outs[0][0], e)
        pd.testing.assert_frame_equal(outs[0][1], n)


def test_execution_knob_invariance(ray_session):
    """batch_size / join_partitions are execution-only knobs — the graph
    must be bit-identical across them (in both assembly modes)."""
    import pandas as pd

    outs = []
    for bs, jp, ea in [(4096, 16, "broadcast"), (512, 5, "distributed"), (20000, 8, "broadcast")]:
        cfg = Config(
            min_fragment_length_m=0.0,
            snap_tolerance_m=5.0,
            batch_size=bs,
            join_partitions=jp,
            edge_assembly=ea,
        )
        r = build_graph(synth_waterways_ds(48), cfg)
        e = r.edges.to_pandas().sort_values("id").reset_index(drop=True)
        e["lats"] = e["lats"].map(tuple)
        e["lons"] = e["lons"].map(tuple)
        outs.append(e)
    for e in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], e)
