"""Sinks (parquet/csv/geojson/jsongz/mobile/qa/manifest) + checkpoint layer."""

import gzip
import json
import os

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
from osmwaterwayextractor_ray.sources.waterways import synth_waterways_ds
from osmwaterwayextractor_ray.stages import sinks


@pytest.fixture(scope="module")
def graph(ray_session):
    cfg = Config(min_fragment_length_m=0.0)
    r = build_graph(synth_waterways_ds(16), cfg)
    return r.nodes.materialize(), r.edges.materialize()


def test_parquet_and_csv(graph, tmp_path):
    nodes, edges = graph
    out = sinks.save_parquet(nodes, edges, str(tmp_path / "pq"))
    ndf = pd.read_parquet(out["nodes"])
    edf = pd.read_parquet(out["edges"])
    assert len(ndf) == nodes.count() and len(edf) == edges.count()
    assert "lats" in edf.columns

    out = sinks.save_csv(nodes, edges, str(tmp_path / "csv"), compression=False)
    files = os.listdir(out["edges"])
    assert files
    edf_csv = pd.concat([pd.read_csv(os.path.join(out["edges"], f)) for f in files])
    assert len(edf_csv) == edges.count()
    assert "coordinates" in edf_csv.columns
    # coordinates column is the reference's repr-of-tuple-list
    first = edf_csv["coordinates"].iloc[0]
    assert first.startswith("[(") and first.endswith(")]")


def test_single_file_sink_budget_guard(graph, tmp_path, monkeypatch):
    """With WWX_MAX_BROADCAST_ROWS below the node count, the single-file
    legacy sinks must refuse (pointing at the sharded twin) instead of
    building an over-budget driver dict; the sharded path stays usable."""
    import pytest as _pytest

    nodes, edges = graph
    monkeypatch.setenv("WWX_MAX_BROADCAST_ROWS", "1")
    with _pytest.raises(ValueError, match="shards"):
        sinks.save_jsongz(nodes, edges, str(tmp_path / "g"))
    out = sinks.save_jsongz(nodes, edges, str(tmp_path / "gs"), shards=2)
    assert os.path.exists(out["nodes"])


def test_geojson(graph, tmp_path):
    nodes, edges = graph
    path = sinks.save_geojson(edges, str(tmp_path / "edges.geojson"))
    fc = json.load(open(path))
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == edges.count()
    f0 = fc["features"][0]
    # (lon, lat) order in geojson
    lon, lat = f0["geometry"]["coordinates"][0]
    assert -180 <= lon <= 180 and -90 <= lat <= 90
    edf = edges.to_pandas()
    row = edf[edf["id"] == f0["properties"]["id"]].iloc[0]
    assert lat == row["lats"][0] and lon == row["lons"][0]


def test_jsongz(graph, tmp_path):
    nodes, edges = graph
    out = sinks.save_jsongz(nodes, edges, str(tmp_path / "g"))
    jn = json.load(gzip.open(out["nodes"], "rt"))
    je = json.load(gzip.open(out["edges"], "rt"))
    assert len(jn) == nodes.count() and len(je) == edges.count()
    # node indices valid and edges consistent with the sorted-id contract
    ndf = nodes.to_pandas().sort_values("id").reset_index(drop=True)
    for e in je[:10]:
        assert 0 <= e["start"] < len(jn) and 0 <= e["end"] < len(jn)
        assert jn[e["start"]] == [ndf["lat"][e["start"]], ndf["lon"][e["start"]]]
        assert e["coordinates"][0] == jn[e["start"]]


def test_mobile(graph, tmp_path):
    nodes, edges = graph
    mnodes, medges = sinks.to_mobile(nodes, edges)
    assert list(mnodes["id"]) == list(range(1, len(mnodes) + 1))
    assert list(medges["id"]) == list(range(1, len(medges) + 1))
    assert medges["from_node_id"].between(1, len(mnodes)).all()
    out = sinks.save_mobile_csv(nodes, edges, str(tmp_path / "m"))
    assert os.path.exists(out["nodes"]) and os.path.exists(out["edges"])


def test_mobile_streaming_twin_matches(graph):
    """to_mobile_ds (streaming) renders the same tables as the driver
    convenience to_mobile once sorted by mobile id."""
    nodes, edges = graph
    mnodes, medges = sinks.to_mobile(nodes, edges)
    dn, de = sinks.to_mobile_ds(nodes, edges)
    dn = dn.to_pandas().sort_values("id").reset_index(drop=True)
    de = de.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dn, mnodes.reset_index(drop=True))
    pd.testing.assert_frame_equal(de, medges.reset_index(drop=True))


def test_mobile_budget_guard(graph, monkeypatch):
    """Above WWX_MAX_BROADCAST_ROWS, to_mobile refuses the driver
    collect and points at the streaming twins; to_mobile_ds still
    streams fine."""
    nodes, edges = graph
    monkeypatch.setenv("WWX_MAX_BROADCAST_ROWS", "1")
    with pytest.raises(ValueError, match="to_mobile_ds"):
        sinks.to_mobile(nodes, edges)
    dn, _ = sinks.to_mobile_ds(nodes, edges)
    assert dn.count() == nodes.count()


def test_qa_and_manifest(graph, tmp_path):
    nodes, edges = graph
    cfg = Config()
    qa = {"final_nodes": nodes.count(), "final_edges": edges.count()}
    p = sinks.save_qa(qa, str(tmp_path / "qa.json"))
    assert json.load(open(p))["final_nodes"] == nodes.count()
    m = sinks.generate_manifest("synth16", cfg, qa, {"parquet": "out"})
    assert m["config_hash"] == sinks.generate_manifest("synth16", cfg, qa, {})["config_hash"]
    assert m["config_hash"] != sinks.generate_manifest(
        "synth16", Config(snap_tolerance_m=9.9), qa, {}
    )["config_hash"]


def test_manifest_input_content_hash(tmp_path):
    """The manifest embeds a sha-256 of the INPUT BYTES (ref :2974-2983,
    :3024-3035): two runs on different inputs can never produce
    identical-looking manifests."""
    cfg = Config()
    a, b = tmp_path / "a.parquet", tmp_path / "b.parquet"
    a.write_bytes(b"payload-one")
    b.write_bytes(b"payload-two")
    ma = sinks.generate_manifest(str(a), cfg, {}, {})
    mb = sinks.generate_manifest(str(b), cfg, {}, {})
    assert ma["input"]["sha256_hash"] and mb["input"]["sha256_hash"]
    assert ma["input"]["sha256_hash"] != mb["input"]["sha256_hash"]
    assert ma["input"]["file_size_bytes"] == len(b"payload-one")
    # same bytes -> same hash (path-independent fingerprint of contents)
    c = tmp_path / "c.parquet"
    c.write_bytes(b"payload-one")
    assert sinks.generate_manifest(str(c), cfg, {}, {})["input"]["sha256_hash"] == (
        ma["input"]["sha256_hash"]
    )
    # directory inputs fingerprint the per-part contents
    d1, d2 = tmp_path / "d1", tmp_path / "d2"
    for d, payload in ((d1, b"x"), (d2, b"y")):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(payload)
    h1 = sinks.generate_manifest(str(d1), cfg, {}, {})["input"]["sha256_hash"]
    h2 = sinks.generate_manifest(str(d2), cfg, {}, {})["input"]["sha256_hash"]
    assert h1 and h2 and h1 != h2
    # non-path input descriptor (e.g. 'test'): empty hash, no crash
    assert sinks.generate_manifest("synth16", cfg, {}, {})["input"]["sha256_hash"] == ""


def test_mobile_sharded_parts_match_single_file(graph, tmp_path):
    """shards=N mobile edges: concatenated parts hold exactly the
    single-file rows (same global mobile ids), deterministically."""
    nodes, edges = graph
    single = sinks.save_mobile_csv(nodes, edges, str(tmp_path / "s"))
    sharded = sinks.save_mobile_csv(nodes, edges, str(tmp_path / "p"), shards=3)
    edf1 = pd.read_csv(single["edges"]).sort_values("id").reset_index(drop=True)
    parts = sorted(os.listdir(sharded["edges"]))
    assert len(parts) == 3
    edf2 = (
        pd.concat([pd.read_csv(os.path.join(sharded["edges"], f)) for f in parts])
        .sort_values("id")
        .reset_index(drop=True)
    )
    for c in ("name", "type"):
        edf1[c] = edf1[c].fillna("")
        edf2[c] = edf2[c].fillna("")
    pd.testing.assert_frame_equal(edf1, edf2, check_dtype=False)


def test_id_mapping(graph, tmp_path):
    """id_mapping.json: det-id -> mobile sequential id for nodes and
    edges, matching the to_mobile ordering contract (sorted det ids)."""
    nodes, edges = graph
    p = sinks.save_id_mapping(nodes, edges, str(tmp_path / "idmap.json"))
    m = json.load(open(p))
    node_ids = sorted(nodes.to_pandas()["id"])
    edge_ids = sorted(edges.to_pandas()["id"])
    assert m["nodes"] == {i: r + 1 for r, i in enumerate(node_ids)}
    assert m["edges"] == {i: r + 1 for r, i in enumerate(edge_ids)}


def test_cli_server_formats(tmp_path):
    """The CLI writes exactly the sinks configured via server_formats /
    generate_mobile_csv / generate_id_mapping (ref OutputManager
    :2747-2782)."""
    import yaml

    from osmwaterwayextractor_ray.__main__ import main

    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(
        yaml.safe_dump(
            {
                "output": {
                    "server_formats": ["geojson"],
                    "generate_mobile_csv": True,
                    "generate_id_mapping": True,
                },
                "processing": {"min_fragment_length_m": 0.0},
            }
        )
    )
    out = tmp_path / "out"
    assert main(["test", "-c", str(cfgp), "-o", str(out)]) == 0
    assert (out / "edges.geojson").exists()
    assert (out / "graph.mobile.nodes.csv.gz").exists()
    assert (out / "id_mapping.json").exists()
    assert not (out / "parquet").exists()
    assert not (out / "csv").exists()
    assert not (out / "graph.nodes.json.gz").exists()


def test_checkpoint_resume(ray_session, tmp_path):
    from osmwaterwayextractor_ray.stages.checkpoint import checkpoint_path, checkpointed

    cfg = Config(enable_checkpoints=True, checkpoint_dir=str(tmp_path / "ckpt"),
                 min_fragment_length_m=0.0)
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return synth_waterways_ds(8)

    ds1 = checkpointed(factory, "intersections", cfg)
    assert calls["n"] == 1
    assert ds1.count() == 8
    manifest = json.load(
        open(os.path.join(checkpoint_path(cfg, "intersections"), "_manifest.json"))
    )
    assert manifest["row_count"] == 8 and manifest["n_files"] >= 1
    # second run: factory NOT called again
    ds2 = checkpointed(factory, "intersections", cfg)
    assert calls["n"] == 1
    assert ds2.count() == 8
    # changing a parameter in the step's closure invalidates the cache
    cfg2 = Config(enable_checkpoints=True, checkpoint_dir=str(tmp_path / "ckpt"),
                  simplification_tolerance_m=5.0)
    checkpointed(factory, "intersections", cfg2)
    assert calls["n"] == 2


def test_full_graph_with_checkpoints(ray_session, tmp_path):
    cfg = Config(enable_checkpoints=True, checkpoint_dir=str(tmp_path / "ck2"),
                 min_fragment_length_m=0.0)
    r1 = build_graph(synth_waterways_ds(16), cfg)
    e1 = r1.edges.to_pandas().sort_values("id").reset_index(drop=True)
    # resume: same params -> clustering + intersections read from checkpoints
    r2 = build_graph(synth_waterways_ds(16), cfg)
    e2 = r2.edges.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(e1, e2)
    # parity with the non-checkpointed run
    r3 = build_graph(synth_waterways_ds(16), Config(min_fragment_length_m=0.0))
    e3 = r3.edges.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(e1, e3)


def test_pipeline_steps_protocol(ray_session):
    """The PipelineStep composition must produce the same result as the
    direct stage chain, and custom steps slot in."""
    import pyarrow as pa

    from osmwaterwayextractor_ray.pipelines.steps import (
        DEFAULT_LINE_STEPS,
        PipelineStep,
        run_steps,
        step_param_hash,
    )
    from osmwaterwayextractor_ray.stages.clean import clean_waterways, simplify_waterways
    from osmwaterwayextractor_ray.stages.intersect import detect_and_split
    from osmwaterwayextractor_ray.sources.waterways import synth_waterways_ds

    cfg = Config(min_fragment_length_m=0.0)
    via_steps = run_steps(synth_waterways_ds(8), DEFAULT_LINE_STEPS, cfg).to_pandas()
    direct = detect_and_split(
        simplify_waterways(clean_waterways(synth_waterways_ds(8), cfg), cfg), cfg
    ).to_pandas()
    a = via_steps.sort_values("way_id").reset_index(drop=True)
    b = direct.sort_values("way_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # custom user step conforms to the protocol
    class DropShort:
        name = "drop_short"
        params = ()

        def apply(self, ds, config):
            return ds.map_batches(
                lambda t: t.filter(pa.compute.greater(pa.compute.list_value_length(t["lats"]), 2)),
                batch_format="pyarrow",
            )

    assert isinstance(DropShort(), PipelineStep)
    out = run_steps(synth_waterways_ds(8), list(DEFAULT_LINE_STEPS) + [DropShort()], cfg)
    assert out.count() <= len(b)
    # param hashes respond to the declared params only
    h1 = step_param_hash(DEFAULT_LINE_STEPS[2], cfg)
    h2 = step_param_hash(DEFAULT_LINE_STEPS[2], Config(snap_tolerance_m=9.0))
    h3 = step_param_hash(DEFAULT_LINE_STEPS[0], Config(snap_tolerance_m=9.0))
    assert h1 != h2
    assert step_param_hash(DEFAULT_LINE_STEPS[0], cfg) == h3  # clean ignores snap


def test_reference_config_yaml_loads():
    """Both of the reference's shipped YAML configs load with their values
    (nested sections flattened, unknown knobs ignored) — a reference user
    can point the CLI at their existing config file."""
    cfg = Config.from_yaml("/root/reference/config.yaml")
    assert cfg.snap_tolerance_m == 6.0
    assert cfg.coordinate_precision == 5
    assert cfg.max_displacement_multiplier == 3.0
    assert cfg.waterway_types == ["river", "canal"]
    assert cfg.enable_geometry_simplification is True
    assert cfg.simplification_tolerance_m == 5.0

    cfg2 = Config.from_yaml("/root/reference/test_config_no_simplify.yaml")
    assert cfg2.enable_geometry_simplification is False
    assert cfg2.snap_tolerance_m == 5.0
    # flat engine-style config still loads
    cfg3 = Config.from_yaml("config.example.yaml")
    assert cfg3.snap_tolerance_m == 2.0 and cfg3.edge_assembly == "broadcast"


def test_geojson_sharded(graph, tmp_path):
    """Sharded geojson parts must union to exactly the single-file features."""
    nodes, edges = graph
    single = sinks.save_geojson(edges, str(tmp_path / "one.geojson"))
    outdir = sinks.save_geojson(edges, str(tmp_path / "parts"), shards=4)
    feats = []
    for fn in sorted(os.listdir(outdir)):
        fc = json.load(open(os.path.join(outdir, fn)))
        assert fc["type"] == "FeatureCollection"
        feats.extend(fc["features"])
    one = json.load(open(single))["features"]
    key = lambda f: f["properties"]["id"]
    assert sorted(feats, key=key) == sorted(one, key=key)


def test_jsongz_sharded(graph, tmp_path):
    nodes, edges = graph
    out1 = sinks.save_jsongz(nodes, edges, str(tmp_path / "g1"))
    out2 = sinks.save_jsongz(nodes, edges, str(tmp_path / "g2"), shards=3)
    assert json.load(gzip.open(out1["nodes"], "rt")) == json.load(
        gzip.open(out2["nodes"], "rt")
    )
    je1 = json.load(gzip.open(out1["edges"], "rt"))
    je2 = []
    for fn in sorted(os.listdir(out2["edges"])):
        je2.extend(json.load(gzip.open(os.path.join(out2["edges"], fn), "rt")))
    k = lambda e: (e["start"], e["end"], e["length"])
    assert sorted(je1, key=k) == sorted(je2, key=k)


def test_mobile_streaming_equals_dataframe(graph, tmp_path):
    """save_mobile_csv (streamed, no pd.concat) must write exactly the
    to_mobile DataFrames."""
    nodes, edges = graph
    mnodes, medges = sinks.to_mobile(nodes, edges)
    out = sinks.save_mobile_csv(nodes, edges, str(tmp_path / "m"))
    ndf = pd.read_csv(out["nodes"])
    edf = pd.read_csv(out["edges"])
    for c in ("name", "type"):
        edf[c] = edf[c].fillna("")
        medges[c] = medges[c].fillna("")
    pd.testing.assert_frame_equal(ndf, mnodes.reset_index(drop=True), check_dtype=False)
    pd.testing.assert_frame_equal(edf, medges, check_dtype=False)


def test_partitioned_checkpoint_resume(ray_session, tmp_path):
    """Kill a partitioned checkpoint mid-step (manifest absent, some part
    files missing): the resume must rewrite ONLY the missing partitions and
    leave survivors byte-untouched."""
    import time as _time

    from osmwaterwayextractor_ray.stages.checkpoint import (
        checkpoint_path,
        checkpointed,
    )

    cfg = Config(
        enable_checkpoints=True,
        checkpoint_dir=str(tmp_path / "ck"),
        checkpoint_partitions=8,
        min_fragment_length_m=0.0,
    )
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return synth_waterways_ds(64)

    def canon(ds):
        df = ds.to_pandas()
        df["lats"] = df["lats"].map(tuple)
        df["lons"] = df["lons"].map(tuple)
        return df.sort_values("way_id").reset_index(drop=True)

    ds1 = checkpointed(factory, "intersections", cfg, partition_key="way_id")
    base = canon(ds1)
    assert calls["n"] == 1 and len(base) == 64
    path = checkpoint_path(cfg, "intersections")
    parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    assert len(parts) == 8

    # simulate the crash: no manifest, first 3 partitions never landed
    os.remove(os.path.join(path, "_manifest.json"))
    for f in parts[:3]:
        os.remove(os.path.join(path, f))
    mtimes = {f: os.path.getmtime(os.path.join(path, f)) for f in parts[3:]}
    _time.sleep(0.05)

    ds2 = checkpointed(factory, "intersections", cfg, partition_key="way_id")
    assert calls["n"] == 2  # factory re-ran once for the resume
    for f, m in mtimes.items():  # survivors not rewritten
        assert os.path.getmtime(os.path.join(path, f)) == m
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["num_partitions"] == 8
    assert sorted(manifest["resumed_partitions"]) == [0, 1, 2]
    pd.testing.assert_frame_equal(canon(ds2), base)

    # third call: complete manifest -> straight cache hit, no factory run
    ds3 = checkpointed(factory, "intersections", cfg, partition_key="way_id")
    assert calls["n"] == 2
    pd.testing.assert_frame_equal(canon(ds3), base)


def test_node_ranks_distributed(graph):
    """node_ranks (distributed first-char range assignment) must equal the
    broadcast sorted-id dict ranks exactly."""
    nodes, _ = graph
    ranks = sinks.node_ranks(nodes).to_pandas().sort_values("rank")
    want = nodes.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(ranks["rank"]) == list(range(len(want)))
    assert list(ranks["id"]) == list(want["id"])
    assert list(ranks["lat"]) == list(want["lat"])
