"""Round-trip: graphs written by the legacy sinks load back as Datasets
with identical content (sources/legacy.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def graph(ray_session, tmp_path_factory):
    from osmwaterwayextractor_ray.config import Config
    from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
    from osmwaterwayextractor_ray.sources.waterways import synth_waterways_ds

    cfg = Config()
    res = build_graph(synth_waterways_ds(200), cfg)
    return res.nodes.materialize(), res.edges.materialize()


def _node_coords_sorted_by_id(nodes_ds):
    df = nodes_ds.to_pandas().sort_values("id").reset_index(drop=True)
    return df["lat"].to_numpy(), df["lon"].to_numpy()


def _check_jsongz(nodes_ds, edges_ds, base):
    from osmwaterwayextractor_ray.sources.legacy import read_jsongz

    rn, re_ = read_jsongz(str(base))
    lat, lon = _node_coords_sorted_by_id(nodes_ds)
    rdf = rn.to_pandas().sort_values("node_idx")
    assert np.array_equal(rdf["lat"].to_numpy(), lat)
    assert np.array_equal(rdf["lon"].to_numpy(), lon)

    edf = re_.to_pandas()
    src = edges_ds.to_pandas()
    assert len(edf) == len(src)
    # every edge's start/end index resolves to its from/to node coords
    got = sorted(
        (lat[r.start], lon[r.start], lat[r.end], lon[r.end], round(r.length, 6))
        for r in edf.itertuples()
    )
    nmap = nodes_ds.to_pandas().set_index("id")
    want = sorted(
        (
            nmap.loc[r.from_node_id, "lat"],
            nmap.loc[r.from_node_id, "lon"],
            nmap.loc[r.to_node_id, "lat"],
            nmap.loc[r.to_node_id, "lon"],
            round(r.length_m, 6),
        )
        for r in src.itertuples()
    )
    assert got == want
    # geometry survives byte-exact
    total_coords = sum(len(x) for x in edf["lats"])
    src_total = sum(len(x) for x in src["lats"])
    assert total_coords == src_total


def test_jsongz_roundtrip_single(graph, tmp_path):
    from osmwaterwayextractor_ray.stages.sinks import save_jsongz

    nodes_ds, edges_ds = graph
    base = tmp_path / "g"
    save_jsongz(nodes_ds, edges_ds, str(base))
    _check_jsongz(nodes_ds, edges_ds, base)


def test_jsongz_roundtrip_sharded(graph, tmp_path):
    from osmwaterwayextractor_ray.stages.sinks import save_jsongz

    nodes_ds, edges_ds = graph
    base = tmp_path / "g"
    save_jsongz(nodes_ds, edges_ds, str(base), shards=4)
    _check_jsongz(nodes_ds, edges_ds, base)


def test_mobile_csv_roundtrip(graph, tmp_path):
    from osmwaterwayextractor_ray.sources.legacy import read_mobile_csv
    from osmwaterwayextractor_ray.stages.sinks import save_mobile_csv, to_mobile

    nodes_ds, edges_ds = graph
    base = tmp_path / "g"
    save_mobile_csv(nodes_ds, edges_ds, str(base))
    rn, re_ = read_mobile_csv(str(base))
    mn, me = to_mobile(nodes_ds, edges_ds)
    rdf = rn.to_pandas().sort_values("id").reset_index(drop=True)
    assert np.array_equal(rdf["id"].to_numpy(), mn["id"].to_numpy())
    assert np.allclose(rdf["lat"].to_numpy(), mn["lat"].to_numpy())
    edf = re_.to_pandas().sort_values("id").reset_index(drop=True)
    me = me.sort_values("id").reset_index(drop=True)
    assert np.array_equal(edf["from_node_id"].to_numpy(), me["from_node_id"].to_numpy())
    assert np.array_equal(edf["to_node_id"].to_numpy(), me["to_node_id"].to_numpy())


@pytest.mark.parametrize("shards", [None, 3])
def test_geojson_roundtrip(graph, tmp_path, shards):
    from osmwaterwayextractor_ray.sources.legacy import read_geojson
    from osmwaterwayextractor_ray.stages.sinks import save_geojson

    _, edges_ds = graph
    path = str(tmp_path / ("parts" if shards else "g.geojson"))
    save_geojson(edges_ds, path, shards=shards)
    got = read_geojson(path).to_pandas().sort_values("id").reset_index(drop=True)
    want = edges_ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert np.array_equal(got["id"].to_numpy(), want["id"].to_numpy())
    assert np.allclose(got["length_m"].to_numpy(), want["length_m"].to_numpy())
    for a, b in zip(got["lats"], want["lats"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
