"""Block-offset .osm.pbf datasource (SURVEY S1): codec pinned against
protobuf-spec vectors, blob framing, exact roundtrip through the writer,
the reference's skip semantics (unresolvable refs / <2 points), and
full-graph equality PBF source vs direct Dataset source."""

import numpy as np
import pytest

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.sources.pbf import (
    decode_varints,
    encode_packed,
    encode_varint,
    scan_pbf_blobs,
    unzigzag,
    waterways_from_pbf,
    write_pbf,
    zigzag,
)


def test_varint_spec_vectors():
    # protobuf language-guide examples
    assert encode_varint(1) == b"\x01"
    assert encode_varint(300) == b"\xac\x02"
    assert decode_varints(b"\xac\x02").tolist() == [300]
    vals = np.array([0, 1, 127, 128, 300, 16383, 16384, 2**40, 2**63 - 1], dtype=np.uint64)
    assert decode_varints(encode_packed(vals)).tolist() == vals.tolist()


def test_zigzag_spec_vectors():
    # protobuf sint encoding table
    assert zigzag(np.array([0, -1, 1, -2, 2147483647, -2147483648])).tolist() == [
        0, 1, 2, 3, 4294967294, 4294967295,
    ]
    v = np.array([-5, 0, 7, -(2**40), 2**40], dtype=np.int64)
    assert unzigzag(zigzag(v)).tolist() == v.tolist()


@pytest.fixture(scope="module")
def fixture_pbf(tmp_path_factory):
    from osmwaterwayextractor_ray.sources.waterways import fixture_waterways_pylist

    path = str(tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf")
    write_pbf(fixture_waterways_pylist(), path)
    return path


def test_blob_framing(fixture_pbf):
    blobs = scan_pbf_blobs(fixture_pbf)
    assert blobs[0]["type"] == "OSMHeader"
    assert all(b["type"] == "OSMData" for b in blobs[1:]) and len(blobs) >= 3


def test_roundtrip_exact(ray_session, fixture_pbf):
    from osmwaterwayextractor_ray.sources.waterways import fixture_waterways_pylist

    cfg = Config(waterway_types=["river", "canal", "stream"])
    df = (
        waterways_from_pbf(fixture_pbf, cfg)
        .to_pandas()
        .sort_values("way_id")
        .reset_index(drop=True)
    )
    orig = {w["id"]: w for w in fixture_waterways_pylist()}
    assert len(df) == len(orig)
    for _, r in df.iterrows():
        w = orig[r["way_id"]]
        got = list(zip(np.asarray(r["lats"]).tolist(), np.asarray(r["lons"]).tolist()))
        assert got == [(la, lo) for la, lo in w["coordinates"]]
        assert r["name"] == w["tags"].get("name", "")
        assert r["wtype"] == w["tags"].get("waterway", "")
        assert r["width"] == w["tags"].get("width", "")


def test_source_tag_filter(ray_session, fixture_pbf):
    """Default config keeps river+canal only (the reference's handler
    filter, ref :1388) — the fixture's 2 streams are dropped at source."""
    df = waterways_from_pbf(fixture_pbf, Config()).to_pandas()
    assert sorted(df["way_id"]) == [1, 3]
    assert set(df["wtype"]) == {"river"}


def test_skip_semantics(ray_session, tmp_path):
    """Ways with any unresolvable node ref, or <2 points, are skipped
    (ref :1395-1412) — simulate by corrupting a ref id."""
    ways = [
        {"id": 1, "coordinates": [(1.0, 1.0), (1.1, 1.1)], "tags": {"waterway": "river"}},
        {"id": 2, "coordinates": [(2.0, 2.0)], "tags": {"waterway": "river"}},  # 1 point
        {"id": 3, "coordinates": [(3.0, 3.0), (3.1, 3.1), (3.2, 3.2)], "tags": {"waterway": "river"}},
    ]
    path = str(tmp_path / "skip.pbf")
    write_pbf(ways, path)
    df = waterways_from_pbf(path, Config()).to_pandas()
    assert sorted(df["way_id"]) == [1, 3]


def test_multiblock(ray_session, tmp_path):
    """Many tiny dense-node/way blocks parse identically (block-offset
    parallelism exercised: every blob is its own read unit)."""
    from osmwaterwayextractor_ray.sources.waterways import _MOTIF

    ways = []
    for w in range(40):
        g, t = divmod(w, 4)
        coords, name, wtype, width = _MOTIF[t]
        tags = {"waterway": wtype, "name": name}
        if width:
            tags["width"] = width
        ways.append(
            {
                "id": w + 1,
                "coordinates": [
                    (round(la + 0.1 * g, 6), round(lo + 0.1 * g, 6)) for la, lo in coords
                ],
                "tags": tags,
            }
        )
    path = str(tmp_path / "multi.pbf")
    write_pbf(ways, path, nodes_per_block=7)
    blobs = scan_pbf_blobs(path)
    assert len([b for b in blobs if b["type"] == "OSMData"]) > 10
    cfg = Config(waterway_types=["river", "canal", "stream"])
    df = waterways_from_pbf(path, cfg).to_pandas()
    assert len(df) == 40
    got = {int(r["way_id"]): list(zip(np.asarray(r["lats"]), np.asarray(r["lons"]))) for _, r in df.iterrows()}
    for w in ways:
        assert got[w["id"]] == w["coordinates"]


def test_full_graph_from_pbf(ray_session, fixture_pbf):
    """build_graph over the PBF source equals build_graph over the same
    ways fed directly as a Dataset."""
    import pandas as pd

    from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
    from osmwaterwayextractor_ray.sources.waterways import fixture_waterways_ds

    # include streams so the PBF source-filter passes all 4 fixture ways,
    # matching the unfiltered direct Dataset
    cfg = Config(min_fragment_length_m=0.0, waterway_types=["river", "canal", "stream"])
    rp = build_graph(waterways_from_pbf(fixture_pbf, cfg), cfg)
    rd_ = build_graph(fixture_waterways_ds(), cfg)
    ep = rp.edges.to_pandas().sort_values("id").reset_index(drop=True)
    ed = rd_.edges.to_pandas().sort_values("id").reset_index(drop=True)
    for df in (ep, ed):
        df["lats"] = df["lats"].map(tuple)
        df["lons"] = df["lons"].map(tuple)
    pd.testing.assert_frame_equal(ep, ed)


def test_plain_node_group_and_unsupported_compression(tmp_path):
    """Spec-valid plain Node messages (group field 1) parse like dense
    nodes; unimplemented blob compression raises instead of yielding an
    empty block."""
    import struct
    import zlib

    from osmwaterwayextractor_ray.sources.pbf import (
        _blob_payload,
        _field,
        _parse_block,
        _parse_dense_nodes,
        encode_varint,
    )

    def z(v):
        return (v << 1) ^ (v >> 63) if v >= 0 else ((v << 1) ^ -1) & (2**64 - 1)

    node = _field(1, 0, z(42)) + _field(8, 0, z(525100000)) + _field(9, 0, z(-134000000))
    group = _field(1, 2, node)
    block = _field(1, 2, _field(1, 2, b"")) + _field(2, 2, group)
    strings, gran, lat_off, lon_off, groups = _parse_block(block)
    ids, lats, lons = _parse_dense_nodes(groups[0], gran, lat_off, lon_off)
    assert ids.tolist() == [42]
    assert lats.tolist() == [52.51] and lons.tolist() == [-13.4]

    bad_blob = _field(2, 0, 10) + _field(7, 2, b"\x00\x01")  # zstd field
    with pytest.raises(ValueError, match="zstd"):
        _blob_payload(bad_blob)


def test_partitioned_checkpoint_layout_pinned(ray_session, tmp_path):
    """A resume after P changed in config must keep the crashed run's
    partition layout (recorded in _layout.json), not silently drop rows."""
    import json as _json

    from osmwaterwayextractor_ray.config import Config
    from osmwaterwayextractor_ray.sources.waterways import synth_waterways_ds
    from osmwaterwayextractor_ray.stages.checkpoint import checkpoint_path, checkpointed

    import os as _os

    cfg32 = Config(
        enable_checkpoints=True, checkpoint_dir=str(tmp_path / "ck"), checkpoint_partitions=8
    )
    checkpointed(lambda: synth_waterways_ds(40), "intersections", cfg32, partition_key="way_id")
    path = checkpoint_path(cfg32, "intersections")
    # crash simulation + config change to P=4
    _os.remove(_os.path.join(path, "_manifest.json"))
    parts = sorted(f for f in _os.listdir(path) if f.endswith(".parquet"))
    for f in parts[:3]:
        _os.remove(_os.path.join(path, f))
    cfg4 = Config(
        enable_checkpoints=True, checkpoint_dir=str(tmp_path / "ck"), checkpoint_partitions=4
    )
    ds = checkpointed(lambda: synth_waterways_ds(40), "intersections", cfg4, partition_key="way_id")
    assert ds.count() == 40  # no rows lost despite the P change
    manifest = _json.load(open(_os.path.join(path, "_manifest.json")))
    assert manifest["num_partitions"] == 8  # crashed run's layout kept


def test_varint_roundtrip_property():
    """Property: decode(encode(x)) == x for random uint64 vectors."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=50))
    def check(vals):
        arr = np.array(vals, dtype=np.uint64)
        assert decode_varints(encode_packed(arr)).tolist() == arr.tolist()

    check()


def test_zigzag_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=50))
    def check(vals):
        arr = np.array(vals, dtype=np.int64)
        assert unzigzag(zigzag(arr)).tolist() == arr.tolist()

    check()
