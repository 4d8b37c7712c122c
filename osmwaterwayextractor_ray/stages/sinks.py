"""Sinks (S3-S8): parquet / csv / geojson / jsongz / mobile / qa+manifest.

Reference: OutputManager (osm_waterway_extractor.py:2747-2963). Formats are
reproduced column-for-column; the two ORDER-dependent formats (jsongz's
positional node indices, :2810-2839, and mobile's sequential int ids,
:2912-2941) depended on CPython dict/set iteration order in the reference —
here the ordering contract is explicit and documented: **rows sorted by the
deterministic id string**. That makes both formats reproducible across
runs, partitionings and cluster sizes.

Large outputs (parquet/csv) stream via Dataset writers into a directory of
part files (resumable layout); the driver-side formats (geojson
FeatureCollection, compact jsongz) are assembled via streamed iter_batches
so no full in-memory list of Python dicts is built.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from typing import Any

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.stages._arrow import list_column


def _coords_repr_column(batch: pa.Table) -> pa.Table:
    """Stringify (lats, lons) list columns into the reference CSV's
    'coordinates' column (Python repr of a list of (lat, lon) tuples, which
    is what pd.DataFrame(list_of_dicts).to_csv produced, ref :2874-2876)."""
    lats, offsets = list_column(batch, "lats")
    lons, _ = list_column(batch, "lons")
    reprs = []
    lat_l = lats.tolist()
    lon_l = lons.tolist()
    for i in range(len(offsets) - 1):
        s, e = offsets[i], offsets[i + 1]
        reprs.append(repr(list(zip(lat_l[s:e], lon_l[s:e]))))
    out = batch.drop_columns(["lats", "lons"])
    return out.append_column("coordinates", pa.array(reprs, type=pa.string()))


def save_parquet(nodes_ds, edges_ds, out_dir: str, compression: bool = True) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    codec = "snappy" if compression else "none"
    nodes_ds.write_parquet(f"{out_dir}/nodes.parquet", compression=codec)
    edges_ds.write_parquet(f"{out_dir}/edges.parquet", compression=codec)
    return {"nodes": f"{out_dir}/nodes.parquet", "edges": f"{out_dir}/edges.parquet"}


def save_csv(nodes_ds, edges_ds, out_dir: str, compression: bool = True) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    args = {"compression": "gzip"} if compression else {}
    nodes_ds.write_csv(f"{out_dir}/nodes.csv", arrow_open_stream_args=args)
    edges_flat = edges_ds.map_batches(_coords_repr_column, batch_format="pyarrow")
    edges_flat.write_csv(f"{out_dir}/edges.csv", arrow_open_stream_args=args)
    return {"nodes": f"{out_dir}/nodes.csv", "edges": f"{out_dir}/edges.csv"}


def save_geojson(edges_ds, path: str) -> str:
    """GeoJSON FeatureCollection of edges with the (lat,lon)->(lon,lat)
    flip (ref :2884-2899). Streamed feature-by-feature to the file."""
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [')
        first = True
        for batch in edges_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            lats, offsets = list_column(batch, "lats")
            lons, _ = list_column(batch, "lons")
            ids = batch.column("id").to_pylist()
            lengths = batch.column("length_m").to_pylist()
            names = batch.column("name").to_pylist()
            types = batch.column("type").to_pylist()
            widths = batch.column("width_m").to_pylist()
            lat_l, lon_l = lats.tolist(), lons.tolist()
            for i in range(len(ids)):
                s, e = offsets[i], offsets[i + 1]
                feature = {
                    "type": "Feature",
                    "geometry": {
                        "type": "LineString",
                        "coordinates": [[lon_l[k], lat_l[k]] for k in range(s, e)],
                    },
                    "properties": {
                        "id": ids[i],
                        "length_m": lengths[i],
                        "name": names[i],
                        "type": types[i],
                        "width_m": widths[i],
                    },
                }
                f.write(("" if first else ",") + json.dumps(feature))
                first = False
        f.write("]}")
    return path


def _sorted_node_index(nodes_ds) -> tuple[list, dict[str, int]]:
    """Nodes sorted by deterministic id -> positional index (the explicit
    ordering contract replacing the reference's dict-iteration order)."""
    rows = nodes_ds.sort("id").take_all()
    idx = {r["id"]: i for i, r in enumerate(rows)}
    return rows, idx


def save_jsongz(nodes_ds, edges_ds, base: str) -> dict:
    """Legacy compact format (ref :2784-2839): nodes = [[lat,lon],...] with
    positional ids; edges reference node indices."""
    import ray

    rows, idx = _sorted_node_index(nodes_ds)
    nodes_payload = [[r["lat"], r["lon"]] for r in rows]
    nodes_file = f"{base}.nodes.json.gz"
    with gzip.open(nodes_file, "wt", encoding="utf-8") as f:
        json.dump(nodes_payload, f, separators=(",", ":"))

    idx_ref = ray.put(idx)

    def to_jsongz(batch: pa.Table) -> pa.Table:
        m = ray.get(idx_ref)
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        froms = batch.column("from_node_id").to_pylist()
        tos = batch.column("to_node_id").to_pylist()
        lengths = batch.column("length_m").to_pylist()
        lat_l, lon_l = lats.tolist(), lons.tolist()
        out = []
        for i in range(len(froms)):
            s, e = offsets[i], offsets[i + 1]
            out.append(
                json.dumps(
                    {
                        "start": m[froms[i]],
                        "end": m[tos[i]],
                        "length": lengths[i],
                        "coordinates": [[lat_l[k], lon_l[k]] for k in range(s, e)],
                    },
                    separators=(",", ":"),
                )
            )
        return pa.table({"j": pa.array(out, type=pa.string())})

    edges_file = f"{base}.edges.json.gz"
    # sorted by edge id for a deterministic file; streamed assembly
    parts = edges_ds.sort("id").map_batches(to_jsongz, batch_format="pyarrow")
    with gzip.open(edges_file, "wt", encoding="utf-8") as f:
        f.write("[")
        first = True
        for batch in parts.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for s in batch.column("j").to_pylist():
                f.write(("" if first else ",") + s)
                first = False
        f.write("]")
    return {"nodes": nodes_file, "edges": edges_file}


def to_mobile(nodes_ds, edges_ds):
    """Mobile format (ref :2912-2941): sequential int ids. Ordering
    contract: mobile node id = 1 + rank of the node's deterministic id in
    sorted order; mobile edge id likewise. Node-rank assignment per block =
    global offset of the block + local position (no driver-side counter)."""
    import ray

    rows, idx = _sorted_node_index(nodes_ds)
    mobile_nodes = [
        {"id": i + 1, "lat": r["lat"], "lon": r["lon"]} for i, r in enumerate(rows)
    ]
    idx_ref = ray.put(idx)

    sorted_edges = edges_ds.sort("id")

    def renumber(batch: pa.Table, base: int) -> pa.Table:
        m = ray.get(idx_ref)
        froms = batch.column("from_node_id").to_pylist()
        tos = batch.column("to_node_id").to_pylist()
        return pa.table(
            {
                "id": pa.array(range(base + 1, base + 1 + len(froms)), type=pa.int64()),
                "from_node_id": pa.array([m[x] + 1 for x in froms], type=pa.int64()),
                "to_node_id": pa.array([m[x] + 1 for x in tos], type=pa.int64()),
                "length_m": batch["length_m"],
                "name": batch["name"],
                "type": batch["type"],
                "width_m": batch["width_m"],
            }
        )

    # per-block base offsets from block row counts (global sequential ids
    # without a driver loop)
    import pandas as pd

    blocks = []
    base = 0
    for batch in sorted_edges.iter_batches(batch_size=8192, batch_format="pyarrow"):
        blocks.append(renumber(batch, base).to_pandas())
        base += batch.num_rows
    mobile_edges = (
        pd.concat(blocks, ignore_index=True) if blocks else pd.DataFrame(
            columns=["id", "from_node_id", "to_node_id", "length_m", "name", "type", "width_m"]
        )
    )
    return pd.DataFrame(mobile_nodes), mobile_edges


def save_mobile_csv(nodes_ds, edges_ds, base: str) -> dict:
    mnodes, medges = to_mobile(nodes_ds, edges_ds)
    nf, ef = f"{base}.mobile.nodes.csv.gz", f"{base}.mobile.edges.csv.gz"
    mnodes.to_csv(nf, index=False, compression="gzip")
    medges.to_csv(ef, index=False, compression="gzip")
    return {"nodes": nf, "edges": ef}


def save_qa(qa_metrics: dict, path: str) -> str:
    with open(path, "w") as f:
        json.dump(qa_metrics, f, indent=2, default=str)
    return path


def generate_manifest(
    input_desc: str, config: Config, qa_metrics: dict, outputs: dict
) -> dict:
    """Reproducibility manifest mirroring ManifestGenerator (ref
    :2966-3035): input fingerprint + result-parameter hash + outputs."""
    cfg_blob = json.dumps(config.result_params(), sort_keys=True)
    return {
        "input": input_desc,
        "config_hash": hashlib.sha256(cfg_blob.encode()).hexdigest(),
        "config": config.result_params(),
        "qa_summary": qa_metrics,
        "outputs": outputs,
        "engine": "osmwaterwayextractor_ray",
    }
