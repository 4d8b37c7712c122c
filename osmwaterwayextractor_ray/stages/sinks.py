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

def _max_broadcast_rows() -> int:
    """Budget for the single-file legacy formats' driver-resident id->rank
    dict (O(nodes)); beyond it the sharded twins (save_jsongz(shards=N) /
    save_geojson(shards=N)) must be used — they assign ranks distributedly.
    Read at call time so a deployment (or a test) can tighten it via env."""
    return int(os.environ.get("WWX_MAX_BROADCAST_ROWS", 50_000_000))


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


def _feature_strings(batch: pa.Table) -> list[str]:
    """GeoJSON Feature JSON strings for an edge batch, with the
    (lat,lon)->(lon,lat) flip (ref :2884-2899)."""
    lats, offsets = list_column(batch, "lats")
    lons, _ = list_column(batch, "lons")
    ids = batch.column("id").to_pylist()
    lengths = batch.column("length_m").to_pylist()
    names = batch.column("name").to_pylist()
    types = batch.column("type").to_pylist()
    widths = batch.column("width_m").to_pylist()
    lat_l, lon_l = lats.tolist(), lons.tolist()
    out = []
    for i in range(len(ids)):
        s, e = offsets[i], offsets[i + 1]
        out.append(
            json.dumps(
                {
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
            )
        )
    return out


def _shard_column(batch: pa.Table, shards: int) -> pa.Table:
    """Deterministic shard assignment from the edge-id hash (pandas
    siphash with its fixed default key — stable across processes)."""
    import pandas as pd

    h = pd.util.hash_array(np.asarray(batch.column("id").to_pylist(), dtype=object))
    return batch.append_column(
        "__shard", pa.array((h % np.uint64(shards)).astype(np.int64), type=pa.int64())
    )


def save_geojson(edges_ds, path: str, shards: int | None = None) -> str:
    """GeoJSON of edges. Default: ONE FeatureCollection file streamed
    feature-by-feature (the reference's layout, :2884-2899 — driver memory
    is bounded by a batch, but the single file is a throughput bottleneck
    for huge graphs). ``shards=N``: `path` becomes a DIRECTORY of N part
    files written in parallel by the cluster, each a self-contained
    FeatureCollection holding the edges whose id-hash maps to that shard,
    sorted by id — per-part contents are deterministic and independent of
    partitioning, so a failed write can be resumed per part."""
    if shards is None:
        with open(path, "w") as f:
            f.write('{"type": "FeatureCollection", "features": [')
            first = True
            for batch in edges_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
                for s in _feature_strings(batch):
                    f.write(("" if first else ",") + s)
                    first = False
            f.write("]}")
        return path

    os.makedirs(path, exist_ok=True)

    def write_shard(g: pa.Table) -> pa.Table:
        sh = int(g.column("__shard")[0].as_py())
        g = g.sort_by("id")
        part = os.path.join(path, f"part-{sh:05d}.geojson")
        with open(part, "w") as f:
            f.write('{"type": "FeatureCollection", "features": [')
            f.write(",".join(_feature_strings(g)))
            f.write("]}")
        return pa.table(
            {"path": pa.array([part]), "rows": pa.array([g.num_rows], type=pa.int64())}
        )

    written = (
        edges_ds.map_batches(lambda t: _shard_column(t, shards), batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()  # O(shards) rows
    )
    # a shard that received zero edges still gets an (empty) part file, so a
    # missing part always means a crashed write, never an empty shard
    have = {os.path.basename(p) for p in written["path"]} if len(written) else set()
    for sh in range(shards):
        name = f"part-{sh:05d}.geojson"
        if name not in have:
            with open(os.path.join(path, name), "w") as f:
                f.write('{"type": "FeatureCollection", "features": []}')
    return path


_B62 = sorted("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
_B62_POS = {c: i for i, c in enumerate(_B62)}


def id_ranks(ds, keep: list[str]):
    """Dataset(id, rank, *keep): rank = position of the row's id in
    global sorted order, assigned DISTRIBUTEDLY — no O(rows) driver
    state. Engine ids are a one-char prefix ('n'/'e') + a fixed-length
    base62 hash (uniformly distributed past the constant prefix), so the
    62 SECOND-character buckets are contiguous ranges of the global sort
    order: one partial-count pass gives each range's base offset (62
    ints), then each range sorts its own ids and adds the offset.
    (Bucketing on the first character would land every row in the single
    prefix bucket — ADVICE r2.) Used by the sharded jsongz path and the
    mobile sink; the single-file jsongz keeps the broadcast dict (the
    mapping the reference ships to its pool workers)."""

    def range_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        r = np.array([_B62_POS[i[1]] for i in ids], dtype=np.int64)
        uniq, n = np.unique(r, return_counts=True)
        return pa.table(
            {"r": pa.array(uniq, type=pa.int64()), "n": pa.array(n, type=pa.int64())}
        )

    pdf = ds.map_batches(range_counts, batch_format="pyarrow").to_pandas()
    base = np.zeros(63, dtype=np.int64)
    if len(pdf):
        totals = pdf.groupby("r")["n"].sum()
        counts = np.zeros(62, dtype=np.int64)
        counts[totals.index.to_numpy()] = totals.to_numpy()
        base[1:] = np.cumsum(counts)

    def tag_range(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        r = np.array([_B62_POS[i[1]] for i in ids], dtype=np.int64)
        return batch.append_column("__range", pa.array(r, type=pa.int64()))

    def rank_range(g: pa.Table) -> pa.Table:
        rr = int(g.column("__range")[0].as_py())
        df = g.select(["id", *keep]).to_pandas().sort_values("id", kind="stable")
        df["rank"] = base[rr] + np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(tag_range, batch_format="pyarrow")
        .groupby("__range")
        .map_groups(rank_range, batch_format="pyarrow")
    )


def node_ranks(nodes_ds):
    """Dataset(id, lat, lon, rank) — see id_ranks."""
    return id_ranks(nodes_ds, keep=["lat", "lon"])


def _node_index_stream(nodes_ds):
    """(materialized nodes sorted by id, id -> positional rank dict).

    The explicit ordering contract replacing the reference's
    dict-iteration order. The dict is the broadcast small side for edge
    renumbering — the same O(nodes) mapping the reference serializes to
    its pool workers — built by streaming id batches (never a take_all
    row list); node payloads are re-streamed from the returned sorted
    Dataset."""
    sorted_nodes = nodes_ds.sort("id").materialize()
    n = sorted_nodes.count()
    if n > _max_broadcast_rows():
        raise ValueError(
            f"single-file legacy sink needs a driver-resident id->rank dict of "
            f"{n} nodes, above the WWX_MAX_BROADCAST_ROWS budget "
            f"({_max_broadcast_rows()}); use the sharded twin (shards=N), which "
            f"assigns node ranks distributedly with no O(nodes) driver state"
        )
    idx: dict[str, int] = {}
    base = 0
    for b in sorted_nodes.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for i, v in enumerate(b.column("id").to_pylist()):
            idx[v] = base + i
        base += b.num_rows
    return sorted_nodes, idx


def _edge_json_strings(batch: pa.Table, idx: dict[str, int]) -> list[str]:
    """Compact legacy edge JSON (ref :2810-2839) with positional node ids."""
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
                    "start": idx[froms[i]],
                    "end": idx[tos[i]],
                    "length": lengths[i],
                    "coordinates": [[lat_l[k], lon_l[k]] for k in range(s, e)],
                },
                separators=(",", ":"),
            )
        )
    return out


def save_jsongz(nodes_ds, edges_ds, base: str, shards: int | None = None) -> dict:
    """Legacy compact format (ref :2784-2839): nodes = [[lat,lon],...] with
    positional ids; edges reference node indices. Node payload and edges
    are streamed batch-by-batch (driver holds one batch + the id->rank
    dict, never full row lists). ``shards=N`` writes the edges as N
    deterministic id-hash part files in parallel instead of one file."""
    import ray

    nodes_file = f"{base}.nodes.json.gz"

    def write_nodes_stream(node_batches):
        with gzip.open(nodes_file, "wt", encoding="utf-8") as f:
            f.write("[")
            first = True
            for b in node_batches:
                for la, lo in zip(
                    b.column("lat").to_pylist(), b.column("lon").to_pylist()
                ):
                    f.write(
                        ("" if first else ",") + json.dumps([la, lo], separators=(",", ":"))
                    )
                    first = False
            f.write("]")

    if shards is None:
        sorted_nodes, idx = _node_index_stream(nodes_ds)
        write_nodes_stream(sorted_nodes.iter_batches(batch_size=65536, batch_format="pyarrow"))
        idx_ref = ray.put(idx)

        def to_jsongz(batch: pa.Table) -> pa.Table:
            m = ray.get(idx_ref)
            return pa.table({"j": pa.array(_edge_json_strings(batch, m), type=pa.string())})

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

    # sharded path: node ranks assigned DISTRIBUTEDLY (node_ranks — no
    # broadcast dict anywhere), edge start/end indices attached via two
    # partitioned hash joins, parts written in parallel
    from osmwaterwayextractor_ray.stages.fastagg import hash_join

    ranks = node_ranks(nodes_ds).materialize()
    write_nodes_stream(
        ranks.sort("rank").iter_batches(batch_size=65536, batch_format="pyarrow")
    )

    def side(id_col: str, out_col: str):
        return ranks.map_batches(
            lambda t, ic=id_col, oc=out_col: pa.table({ic: t["id"], oc: t["rank"]}),
            batch_format="pyarrow",
        )

    with_idx = hash_join(
        edges_ds.map_batches(
            lambda t: t.select(
                ["id", "from_node_id", "to_node_id", "length_m", "lats", "lons"]
            ),
            batch_format="pyarrow",
        ),
        side("from_node_id", "start"),
        on=["from_node_id"],
    )
    with_idx = hash_join(with_idx, side("to_node_id", "end"), on=["to_node_id"])

    parts_dir = f"{base}.edges.parts"
    os.makedirs(parts_dir, exist_ok=True)

    def write_shard(g: pa.Table) -> pa.Table:
        sh = int(g.column("__shard")[0].as_py())
        g = g.sort_by("id")
        lats, offsets = list_column(g, "lats")
        lons, _ = list_column(g, "lons")
        starts = g.column("start").to_pylist()
        ends = g.column("end").to_pylist()
        lengths = g.column("length_m").to_pylist()
        lat_l, lon_l = lats.tolist(), lons.tolist()
        rows = []
        for i in range(len(starts)):
            s, e = offsets[i], offsets[i + 1]
            rows.append(
                json.dumps(
                    {
                        "start": int(starts[i]),
                        "end": int(ends[i]),
                        "length": lengths[i],
                        "coordinates": [[lat_l[k], lon_l[k]] for k in range(s, e)],
                    },
                    separators=(",", ":"),
                )
            )
        part = os.path.join(parts_dir, f"part-{sh:05d}.json.gz")
        with gzip.open(part, "wt", encoding="utf-8") as f:
            f.write("[" + ",".join(rows) + "]")
        return pa.table(
            {"path": pa.array([part]), "rows": pa.array([g.num_rows], type=pa.int64())}
        )

    written = (
        with_idx.map_batches(lambda t: _shard_column(t, shards), batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()  # O(shards) rows
    )
    # empty shards still get a part file (missing part == crashed write)
    have = {os.path.basename(p) for p in written["path"]} if len(written) else set()
    for sh in range(shards):
        name = f"part-{sh:05d}.json.gz"
        if name not in have:
            with gzip.open(os.path.join(parts_dir, name), "wt", encoding="utf-8") as f:
                f.write("[]")
    return {"nodes": nodes_file, "edges": parts_dir}


_MOBILE_EDGE_COLS = ["id", "from_node_id", "to_node_id", "length_m", "name", "type", "width_m"]


def mobile_edges_renumbered(nodes_ds, edges_ds, node_ranks_ds=None):
    """Edges with mobile start/end node ids (= 1 + rank of the node's
    deterministic id in global sorted order) attached DISTRIBUTEDLY via
    two Arrow-native lookup_joins — no O(nodes) driver dict (the
    reference keeps this mapping in a process-wide IDGenerator dict,
    ref :1152-1164, :2912-2941). Returns a Dataset with columns
    (id, __from, __to, length_m, name, type, width_m); the mobile edge
    id (position in edge-id sorted order) is assigned by the caller —
    streamed (single file) or via id_ranks (sharded)."""
    from osmwaterwayextractor_ray.stages.fastagg import joined_schema, lookup_join

    ranks = node_ranks_ds if node_ranks_ds is not None else node_ranks(nodes_ds).materialize()

    def side(id_col: str, out_col: str):
        return ranks.map_batches(
            lambda t, ic=id_col, oc=out_col: pa.table({ic: t["id"], oc: t["rank"]}),
            batch_format="pyarrow",
        )

    left = edges_ds.map_batches(
        lambda t: t.select(_MOBILE_EDGE_COLS), batch_format="pyarrow"
    )
    j1 = lookup_join(left, side("from_node_id", "__from"), "from_node_id",
                     "from_node_id", {"__from": "__from"})
    j1_schema = joined_schema(left, side("from_node_id", "__from"), {"__from": "__from"})
    return lookup_join(
        j1, side("to_node_id", "__to"), "to_node_id", "to_node_id",
        {"__to": "__to"}, left_schema=j1_schema,
    )


def _mobile_edge_table(batch: pa.Table, ids: np.ndarray) -> pa.Table:
    """Mobile edge rows (ref :2912-2941 column layout) from a renumbered
    batch: sequential edge ids + 1-based node indices, all vectorized."""
    f = batch.column("__from").to_numpy(zero_copy_only=False) + 1
    t = batch.column("__to").to_numpy(zero_copy_only=False) + 1
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "from_node_id": pa.array(f, type=pa.int64()),
            "to_node_id": pa.array(t, type=pa.int64()),
            "length_m": batch["length_m"],
            "name": batch["name"],
            "type": batch["type"],
            "width_m": batch["width_m"],
        }
    )


def to_mobile_ds(nodes_ds, edges_ds):
    """Mobile format (ref :2912-2941) as STREAMING Datasets — the scale
    twin of ``to_mobile``. Mobile node id = 1 + rank of the node's
    deterministic id in global sorted order (``node_ranks``, distributed);
    mobile edge id = 1 + rank of the edge id likewise (``id_ranks`` —
    the same device the sharded jsongz/CSV paths use). Nothing O(nodes)
    or O(edges) touches the driver; rows are unordered (impose order at
    the consumer, as any shuffle output)."""
    import pyarrow.compute as pc

    ranks = node_ranks(nodes_ds).materialize()
    mobile_nodes = ranks.map_batches(
        lambda t: pa.table(
            {
                "id": pc.add(t["rank"], pa.scalar(1, pa.int64())),
                "lat": t["lat"],
                "lon": t["lon"],
            }
        ),
        batch_format="pyarrow",
    )
    renumbered = mobile_edges_renumbered(nodes_ds, edges_ds, node_ranks_ds=ranks)
    eranks = id_ranks(
        renumbered.materialize(),
        keep=["__from", "__to", "length_m", "name", "type", "width_m"],
    )
    mobile_edges = eranks.map_batches(
        lambda t: _mobile_edge_table(
            t, t.column("rank").to_numpy(zero_copy_only=False) + 1
        ),
        batch_format="pyarrow",
    )
    return mobile_nodes, mobile_edges


def to_mobile(nodes_ds, edges_ds):
    """Mobile format as driver-resident DataFrames — small-scale / test
    convenience over ``to_mobile_ds`` (which streams), with the same
    WWX_MAX_BROADCAST_ROWS guard as every other deliberate driver
    materialization in this module: above the budget this raises and
    points at the streaming twins instead of silently collecting
    O(nodes+edges) rows on the driver. The scale sinks are
    ``save_mobile_csv`` (streams each renumbered block into the gzip
    writer) and ``to_mobile_ds``."""
    mn_ds, me_ds = to_mobile_ds(nodes_ds, edges_ds)
    mn_ds, me_ds = mn_ds.materialize(), me_ds.materialize()
    n = mn_ds.count() + me_ds.count()
    if n > _max_broadcast_rows():
        raise ValueError(
            f"to_mobile collects {n} rows on the driver, above the "
            f"WWX_MAX_BROADCAST_ROWS budget ({_max_broadcast_rows()}); use "
            "the streaming twins to_mobile_ds / save_mobile_csv instead"
        )
    mobile_nodes = mn_ds.sort("id").to_pandas()
    mobile_edges = me_ds.sort("id").to_pandas()
    return mobile_nodes, mobile_edges


def save_mobile_csv(nodes_ds, edges_ds, base: str, shards: int | None = None) -> dict:
    """Mobile CSVs, renumbered DISTRIBUTEDLY (mobile_edges_renumbered —
    no O(nodes) driver dict, no per-row Python loops). Default: one gzip
    CSV per table, each renumbered block streamed straight into the
    writer (driver memory bounded by one batch). ``shards=N``: the edges
    become a directory of N part files written in parallel, each holding
    the edges whose id-hash maps to that shard with their GLOBAL mobile
    ids (id_ranks over edge ids) — per-part contents deterministic and
    partitioning-independent, resumable per part."""
    import pandas as pd

    ranks = node_ranks(nodes_ds).materialize()
    nf = f"{base}.mobile.nodes.csv.gz"
    with gzip.open(nf, "wt", encoding="utf-8", newline="") as f:
        first = True
        base_i = 0
        for b in ranks.sort("rank").iter_batches(batch_size=65536, batch_format="pyarrow"):
            pd.DataFrame(
                {
                    "id": np.arange(base_i + 1, base_i + 1 + b.num_rows),
                    "lat": b.column("lat").to_pylist(),
                    "lon": b.column("lon").to_pylist(),
                }
            ).to_csv(f, index=False, header=first)
            first = False
            base_i += b.num_rows

    renumbered = mobile_edges_renumbered(nodes_ds, edges_ds, node_ranks_ds=ranks)

    if shards is None:
        ef = f"{base}.mobile.edges.csv.gz"
        with gzip.open(ef, "wt", encoding="utf-8", newline="") as f:
            first = True
            base_i = 0
            for b in renumbered.sort("id").iter_batches(batch_size=8192, batch_format="pyarrow"):
                ids = np.arange(base_i + 1, base_i + 1 + b.num_rows, dtype=np.int64)
                _mobile_edge_table(b, ids).to_pandas().to_csv(f, index=False, header=first)
                first = False
                base_i += b.num_rows
        return {"nodes": nf, "edges": ef}

    # sharded path: global mobile edge ids from id_ranks (edge ids are
    # 'e'+base62, same contiguous-range trick), parts written in parallel.
    # Pin the renumber chain first: id_ranks runs a counting pass AND the
    # ranking pass over its input (CLAUDE.md lazy-shuffle rule).
    renumbered = renumbered.materialize()
    with_rank = id_ranks(
        renumbered, keep=["__from", "__to", "length_m", "name", "type", "width_m"]
    )
    parts_dir = f"{base}.mobile.edges.parts"
    os.makedirs(parts_dir, exist_ok=True)

    def write_shard(g: pa.Table) -> pa.Table:
        sh = int(g.column("__shard")[0].as_py())
        g = g.sort_by("rank")
        ids = g.column("rank").to_numpy(zero_copy_only=False) + 1
        part = os.path.join(parts_dir, f"part-{sh:05d}.csv.gz")
        with gzip.open(part, "wt", encoding="utf-8", newline="") as f:
            _mobile_edge_table(g, ids).to_pandas().to_csv(f, index=False, header=True)
        return pa.table(
            {"path": pa.array([part]), "rows": pa.array([g.num_rows], type=pa.int64())}
        )

    written = (
        with_rank.map_batches(lambda t: _shard_column(t, shards), batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()  # O(shards) rows
    )
    have = {os.path.basename(p) for p in written["path"]} if len(written) else set()
    for sh in range(shards):
        name = f"part-{sh:05d}.csv.gz"
        if name not in have:
            with gzip.open(os.path.join(parts_dir, name), "wt", encoding="utf-8", newline="") as f:
                pd.DataFrame(columns=_MOBILE_EDGE_COLS).to_csv(f, index=False, header=True)
    return {"nodes": nf, "edges": parts_dir}


def save_id_mapping(nodes_ds, edges_ds, path: str) -> str:
    """Deterministic-id -> mobile sequential id mapping JSON (ref
    IDGenerator.mobile_id_mapping :1088,:1152-1164, saved at :2777-2780:
    {'nodes': {det_id: seq}, 'edges': {det_id: seq}}). Ranks come from
    the distributed id_ranks pass and are streamed into the JSON writer
    batch-by-batch in rank order — the file is O(rows) like the
    reference's, but driver MEMORY stays bounded by one batch."""

    def write_section(f, ranked):
        first = True
        for b in ranked.iter_batches(batch_size=65536, batch_format="pyarrow"):
            ids = b.column("id").to_pylist()
            rks = b.column("rank").to_numpy(zero_copy_only=False)
            for i, r in zip(ids, rks):
                f.write(("" if first else ",") + json.dumps(i) + f":{int(r) + 1}")
                first = False

    with open(path, "w") as f:
        f.write('{"nodes":{')
        write_section(f, id_ranks(nodes_ds, keep=[]).materialize().sort("rank"))
        f.write('},"edges":{')
        write_section(f, id_ranks(edges_ds, keep=[]).materialize().sort("rank"))
        f.write("}}")
    return path


def save_qa(qa_metrics: dict, path: str) -> str:
    with open(path, "w") as f:
        json.dump(qa_metrics, f, indent=2, default=str)
    return path


def _file_sha256(path: str) -> str:
    """SHA-256 of a file's bytes (ref _calculate_file_hash :3024-3035:
    '' for missing paths or directories). For a DIRECTORY of parquet
    parts, hashes the sorted (name, per-file sha256) list so the
    fingerprint still pins the input contents."""
    if not os.path.exists(path):
        return ""
    h = hashlib.sha256()
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if not f.startswith(".")
        )
        if not parts:
            return ""
        for name in parts:
            sub = _file_sha256(os.path.join(path, name))
            h.update(f"{name}:{sub};".encode())
        return h.hexdigest()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def generate_manifest(
    input_desc: str, config: Config, qa_metrics: dict, outputs: dict
) -> dict:
    """Reproducibility manifest mirroring ManifestGenerator (ref
    :2966-3035): input CONTENT fingerprint (sha-256 of the input bytes,
    ref :2974-2983 — two runs on different inputs can never produce
    identical manifests) + result-parameter hash + outputs."""
    cfg_blob = json.dumps(config.result_params(), sort_keys=True)
    is_path = os.path.exists(input_desc)
    return {
        "input": {
            "file_path": input_desc,
            "file_size_bytes": (
                os.path.getsize(input_desc) if is_path and os.path.isfile(input_desc) else 0
            ),
            "sha256_hash": _file_sha256(input_desc) if is_path else "",
        },
        "config_hash": hashlib.sha256(cfg_blob.encode()).hexdigest(),
        "config": config.result_params(),
        "qa_summary": qa_metrics,
        "outputs": outputs,
        "engine": "osmwaterwayextractor_ray",
    }
