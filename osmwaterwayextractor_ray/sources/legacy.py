"""Readers for the engine's (and the reference's) legacy output formats,
so existing jsongz / mobile-CSV graph exports load back as Datasets —
round-trip with stages/sinks.py is pinned by tests/test_legacy_roundtrip.py.

Format contracts (identical to the reference's writer, ref :2784-2839,
:2912-2941, replicated by stages/sinks.py):

  {base}.nodes.json.gz   gzip JSON ``[[lat, lon], ...]`` — the array
                         POSITION is the node id.
  {base}.edges.json.gz   gzip JSON array of
                         ``{"start": i, "end": j, "length": m,
                            "coordinates": [[lat, lon], ...]}``.
  {base}.edges.parts/    sharded twin: part-%05d.json.gz files, each a
                         JSON array of the same edge objects — the
                         parallel read path (one task per part).
  {base}.mobile.{nodes,edges}.csv.gz   plain CSVs with sequential ids.

The single-file variants are parsed on the driver (they are the
reference's inherently single-process format — a file the reference
could write always fits one parser); the sharded edges read in parallel
via ``read_binary_files`` + a per-part parse task.
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow as pa


def _edges_table(rows: list[dict]) -> pa.Table:
    starts = np.fromiter((r["start"] for r in rows), dtype=np.int64, count=len(rows))
    ends = np.fromiter((r["end"] for r in rows), dtype=np.int64, count=len(rows))
    lengths = np.fromiter((r["length"] for r in rows), dtype=np.float64, count=len(rows))
    n_coords = np.fromiter(
        (len(r["coordinates"]) for r in rows), dtype=np.int64, count=len(rows)
    )
    offsets = np.concatenate(([0], np.cumsum(n_coords))).astype(np.int32)
    flat_lat = np.fromiter(
        (c[0] for r in rows for c in r["coordinates"]), dtype=np.float64
    )
    flat_lon = np.fromiter(
        (c[1] for r in rows for c in r["coordinates"]), dtype=np.float64
    )
    off_arr = pa.array(offsets, type=pa.int32())
    return pa.table(
        {
            "start": pa.array(starts),
            "end": pa.array(ends),
            "length": pa.array(lengths),
            "lats": pa.ListArray.from_arrays(off_arr, pa.array(flat_lat)),
            "lons": pa.ListArray.from_arrays(off_arr, pa.array(flat_lon)),
        }
    )


def read_jsongz_nodes(nodes_file: str):
    """nodes.json.gz -> Dataset(node_idx, lat, lon). Positional ids are
    made explicit as ``node_idx`` so downstream joins don't depend on
    row order."""
    import ray.data as rd

    with gzip.open(nodes_file, "rt", encoding="utf-8") as f:
        arr = json.load(f)
    lat = np.array([p[0] for p in arr], dtype=np.float64)
    lon = np.array([p[1] for p in arr], dtype=np.float64)
    t = pa.table(
        {
            "node_idx": pa.array(np.arange(len(arr), dtype=np.int64)),
            "lat": pa.array(lat),
            "lon": pa.array(lon),
        }
    )
    return rd.from_arrow(t)


def read_jsongz_edges(edges_path: str):
    """edges.json.gz (single file) OR a .edges.parts/ directory ->
    Dataset(start, end, length, lats, lons). Sharded parts parse in
    PARALLEL, one task per part file."""
    import ray.data as rd

    if os.path.isdir(edges_path):
        files = sorted(
            os.path.join(edges_path, p)
            for p in os.listdir(edges_path)
            if p.endswith(".json.gz")
        )
        ds = rd.read_binary_files(files)

        def parse(batch: pa.Table) -> pa.Table:
            out = []
            for blob in batch.column("bytes").to_pylist():
                # read_binary_files may already have inflated .gz content
                raw = blob if blob[:2] != b"\x1f\x8b" else gzip.decompress(blob)
                rows = json.loads(raw.decode("utf-8"))
                if rows:
                    out.append(_edges_table(rows))
            if not out:
                return _edges_table([])
            return pa.concat_tables(out)

        return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)

    with gzip.open(edges_path, "rt", encoding="utf-8") as f:
        rows = json.load(f)
    return rd.from_arrow(_edges_table(rows))


def read_jsongz(base: str):
    """(nodes_ds, edges_ds) from a ``save_jsongz`` output base path —
    sharded parts dir preferred when both exist."""
    nodes = read_jsongz_nodes(f"{base}.nodes.json.gz")
    parts_dir = f"{base}.edges.parts"
    edges_path = parts_dir if os.path.isdir(parts_dir) else f"{base}.edges.json.gz"
    return nodes, read_jsongz_edges(edges_path)


def read_mobile_csv(base: str):
    """(nodes_ds, edges_ds) from ``save_mobile_csv`` output (sequential
    int ids). Plain ``read_csv`` with a gzip input stream — the columns
    come back exactly as written."""
    import ray.data as rd

    open_args = {"compression": "gzip"}
    nodes = rd.read_csv(f"{base}.mobile.nodes.csv.gz", arrow_open_stream_args=open_args)
    edges = rd.read_csv(f"{base}.mobile.edges.csv.gz", arrow_open_stream_args=open_args)
    return nodes, edges


def _features_table(features: list[dict]) -> pa.Table:
    ids = [f["properties"]["id"] for f in features]
    lengths = np.array(
        [f["properties"]["length_m"] for f in features], dtype=np.float64
    )
    names = [f["properties"]["name"] for f in features]
    types = [f["properties"]["type"] for f in features]
    widths = [f["properties"]["width_m"] for f in features]
    coords = [f["geometry"]["coordinates"] for f in features]
    n = np.fromiter((len(c) for c in coords), dtype=np.int64, count=len(coords))
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(n))).astype(np.int32), type=pa.int32()
    )
    # GeoJSON is (lon, lat) — flip back to the engine's (lat, lon)
    flat_lat = np.fromiter((p[1] for c in coords for p in c), dtype=np.float64)
    flat_lon = np.fromiter((p[0] for c in coords for p in c), dtype=np.float64)
    return pa.table(
        {
            "id": pa.array(ids, type=pa.string()),
            "length_m": pa.array(lengths),
            "name": pa.array(names, type=pa.string()),
            "type": pa.array(types, type=pa.string()),
            "width_m": pa.array(widths, type=pa.float64()),
            "lats": pa.ListArray.from_arrays(offsets, pa.array(flat_lat)),
            "lons": pa.ListArray.from_arrays(offsets, pa.array(flat_lon)),
        }
    )


def read_geojson(path: str):
    """FeatureCollection file OR sharded directory -> edges Dataset
    (id, length_m, name, type, width_m, lats, lons) with the
    (lon,lat)->(lat,lon) flip undone. Sharded parts parse in parallel."""
    import ray.data as rd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, p) for p in os.listdir(path) if p.endswith(".geojson")
        )
        ds = rd.read_binary_files(files)

        def parse(batch: pa.Table) -> pa.Table:
            out = []
            for blob in batch.column("bytes").to_pylist():
                fc = json.loads(blob.decode("utf-8"))
                if fc["features"]:
                    out.append(_features_table(fc["features"]))
            if not out:
                return _features_table([])
            return pa.concat_tables(out)

        return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)

    with open(path) as f:
        fc = json.load(f)
    return rd.from_arrow(_features_table(fc["features"]))
