"""Stage 4 — edge creation: coord_mapping broadcast join + junction split +
geodesic lengths + deterministic ids (J3, M5-M10, M8).

Reference semantics (osm_waterway_extractor.py:2466-2605) with its quirks
replicated exactly:
  * mapped_coords = coord_mapping.get(coord, coord) per vertex (:2475)
  * junction_coords = ALL keys of coord_mapping (the `... or
    _is_junction_coord` predicate at :2546-2548 is tautologically true for
    every key), and membership is tested against the *mapped* coordinates —
    so a multi-point cluster centroid that equals no original key does NOT
    split a way passing through it, while singleton (identity-mapped)
    points do;
  * split segments between consecutive junction indices, endpoints always
    included; segment_index for the edge id = the split-loop counter;
  * edge length = geodesic polyline length of the mapped segment;
  * edges shorter than min_fragment_length_m dropped AFTER splitting;
  * width parsed from the way's raw width tag (M4 quirks).

Ray mapping: coord_mapping is a broadcast small side (`ray.put` of sorted
key->centroid arrays read once per task; the reference itself serializes
coord_mapping to every pool worker, :525-550, validating the broadcast
design). At 10^12-page scale this switches to a partitioned hash join on
`key` — the broadcast guard logs the mapping size. Per-batch work is
vectorized: one geodesic kernel call per batch over all segment vertices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import coord_key
from osmwaterwayextractor_ray.functions.geodesy import polyline_lengths_m
from osmwaterwayextractor_ray.functions.hashing import edge_id, node_id
from osmwaterwayextractor_ray.functions.width import parse_width_batch
from osmwaterwayextractor_ray.stages._arrow import list_column, make_list_array, str_column

from osmwaterwayextractor_ray.stages._pool import pool_max


def collect_coord_mapping(coord_mapping_ds, config: Config):
    """Materialize the (small) coord_mapping table into sorted numpy arrays
    and put them in the object store once."""
    pdf = coord_mapping_ds.to_pandas()
    keys = pdf["key"].to_numpy(dtype=np.int64)
    order = np.argsort(keys)
    blob = {
        "keys": keys[order],
        "lat": pdf["lat"].to_numpy(dtype=np.float64)[order],
        "lon": pdf["lon"].to_numpy(dtype=np.float64)[order],
        "c_lat": pdf["c_lat"].to_numpy(dtype=np.float64)[order],
        "c_lon": pdf["c_lon"].to_numpy(dtype=np.float64)[order],
    }
    return ray.put(blob)


class EdgeAssembler:
    """Actor-pool map_batches stage: holds the broadcast coord_mapping
    (fetched once per actor in __init__, not per batch)."""

    def __init__(self, mapping_ref, config: Config):
        m = ray.get(mapping_ref)
        self.keys = m["keys"]
        self.key_lat = m["lat"]
        self.key_lon = m["lon"]
        self.c_lat = m["c_lat"]
        self.c_lon = m["c_lon"]
        self.precision = config.coordinate_precision
        self.hash_length = config.hash_length
        self.method = config.distance_calculation_method

    def _lookup(self, lats: np.ndarray, lons: np.ndarray):
        """Vectorized coord_mapping.get(coord, coord) + key-membership of the
        *given* (exact float) coordinates."""
        k = coord_key(lats, lons, self.precision)
        pos = np.searchsorted(self.keys, k)
        pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
        if len(self.keys) == 0:
            return lats, lons, np.zeros(len(lats), dtype=bool)
        found = (
            (self.keys[pos_c] == k)
            & (self.key_lat[pos_c] == lats)
            & (self.key_lon[pos_c] == lons)
        )
        out_lat = np.where(found, self.c_lat[pos_c], lats)
        out_lon = np.where(found, self.c_lon[pos_c], lons)
        return out_lat, out_lon, found

    def __call__(self, batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        way_ids = batch.column("way_id").to_numpy(zero_copy_only=False)
        names = str_column(batch, "name")
        wtypes = str_column(batch, "wtype")
        widths = str_column(batch, "width")

        # vertex-level: map through clustering, then junction membership of
        # the MAPPED coords against the original key set (the reference quirk)
        m_lat, m_lon, _ = self._lookup(lats, lons)
        _, _, mapped_is_key = self._lookup_membership(m_lat, m_lon)
        return assemble_edges_from_mapped(
            m_lat, m_lon, offsets, mapped_is_key, way_ids, names, wtypes, widths,
            self.precision, self.hash_length, self.method,
        )

    def _lookup_membership(self, lats: np.ndarray, lons: np.ndarray):
        """Membership of exact float coords in the key set (no mapping)."""
        if len(self.keys) == 0:
            return None, None, np.zeros(len(lats), dtype=bool)
        k = coord_key(lats, lons, self.precision)
        pos = np.clip(np.searchsorted(self.keys, k), 0, len(self.keys) - 1)
        found = (
            (self.keys[pos] == k)
            & (self.key_lat[pos] == lats)
            & (self.key_lon[pos] == lons)
        )
        return None, None, found


def assemble_edges_from_mapped(
    m_lat: np.ndarray,
    m_lon: np.ndarray,
    offsets: np.ndarray,
    mapped_is_key: np.ndarray,
    way_ids: np.ndarray,
    names,
    wtypes,
    widths,
    precision: int,
    hash_length: int,
    method: str,
) -> pa.Table:
    """Shared junction-split + length + id kernel over already-mapped
    vertex arrays (ref :2546-2597 semantics). Used by both the broadcast
    path (EdgeAssembler) and the distributed-join path."""
    # per-way split -> segment descriptor lists
    seg_way: list[int] = []      # index into batch rows
    seg_index: list[int] = []    # reference's split-loop counter
    seg_starts: list[int] = []   # into flat mapped arrays
    seg_ends: list[int] = []     # inclusive end
    for r in range(len(offsets) - 1):
        s, e = int(offsets[r]), int(offsets[r + 1])
        n = e - s
        if n < 2:
            continue
        jmask = mapped_is_key[s:e].copy()
        jmask[0] = True
        jmask[-1] = True
        jidx = np.nonzero(jmask)[0]
        for i in range(len(jidx) - 1):
            a, b = int(jidx[i]), int(jidx[i + 1])
            if b > a:  # ref guard :2569
                seg_way.append(r)
                seg_index.append(i)
                seg_starts.append(s + a)
                seg_ends.append(s + b)

    n_seg = len(seg_way)
    if n_seg == 0:
        return _empty_edges_table()

    # flatten all segment vertices for ONE geodesic kernel call
    seg_starts_a = np.asarray(seg_starts, dtype=np.int64)
    seg_ends_a = np.asarray(seg_ends, dtype=np.int64)
    lens = seg_ends_a - seg_starts_a + 1
    new_offsets = np.concatenate(([0], np.cumsum(lens)))
    idx = np.concatenate([np.arange(a, b + 1) for a, b in zip(seg_starts, seg_ends)])
    flat_lat = m_lat[idx]
    flat_lon = m_lon[idx]
    lengths = polyline_lengths_m(flat_lat, flat_lon, new_offsets, method)

    start_lat = m_lat[seg_starts_a]
    start_lon = m_lon[seg_starts_a]
    end_lat = m_lat[seg_ends_a]
    end_lon = m_lon[seg_ends_a]

    memo: dict[tuple[float, float], str] = {}

    def nid(la: float, lo: float) -> str:
        kk = (la, lo)
        v = memo.get(kk)
        if v is None:
            v = node_id(la, lo, precision, hash_length)
            memo[kk] = v
        return v

    from_ids = [nid(a, b) for a, b in zip(start_lat.tolist(), start_lon.tolist())]
    to_ids = [nid(a, b) for a, b in zip(end_lat.tolist(), end_lon.tolist())]
    eids = [
        edge_id(f, t, int(way_ids[w]), si, hash_length)
        for f, t, w, si in zip(from_ids, to_ids, seg_way, seg_index)
    ]
    width_raw = [widths[w] for w in seg_way]
    width_m, width_src = parse_width_batch(width_raw)

    return pa.table(
        {
            "id": pa.array(eids, type=pa.string()),
            "from_node_id": pa.array(from_ids, type=pa.string()),
            "to_node_id": pa.array(to_ids, type=pa.string()),
            "length_m": pa.array(lengths, type=pa.float64()),
            "lats": make_list_array(flat_lat, new_offsets),
            "lons": make_list_array(flat_lon, new_offsets),
            "name": pa.array([names[w] for w in seg_way], type=pa.string()),
            "type": pa.array([wtypes[w] for w in seg_way], type=pa.string()),
            "width_raw": pa.array(width_raw, type=pa.string()),
            "width_m": pa.array(
                [None if np.isnan(v) else float(v) for v in width_m], type=pa.float64()
            ),
            "width_source": pa.array(list(width_src), type=pa.string()),
            "original_way_id": pa.array(
                [int(way_ids[w]) for w in seg_way], type=pa.int64()
            ),
        }
    )


def _empty_edges_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([], type=pa.string()),
            "from_node_id": pa.array([], type=pa.string()),
            "to_node_id": pa.array([], type=pa.string()),
            "length_m": pa.array([], type=pa.float64()),
            "lats": pa.array([], type=pa.list_(pa.float64())),
            "lons": pa.array([], type=pa.list_(pa.float64())),
            "name": pa.array([], type=pa.string()),
            "type": pa.array([], type=pa.string()),
            "width_raw": pa.array([], type=pa.string()),
            "width_m": pa.array([], type=pa.float64()),
            "width_source": pa.array([], type=pa.string()),
            "original_way_id": pa.array([], type=pa.int64()),
        }
    )


def create_edges(waterways_ds, coord_mapping_ds, config: Config, mapping_ref=None):
    import pyarrow.compute as pc

    if mapping_ref is None:
        mapping_ref = collect_coord_mapping(coord_mapping_ds, config)

    # Plain tasks: per-task setup is a zero-copy ray.get of the sorted
    # mapping arrays; stateless tasks scale elastically over the warm
    # worker pool (autoscaling actor pools lagged 3x behind, measured).
    def assemble_fn(batch: pa.Table) -> pa.Table:
        return EdgeAssembler(mapping_ref, config)(batch)

    edges = waterways_ds.map_batches(
        assemble_fn, batch_format="pyarrow", batch_size=config.batch_size
    )
    min_len = config.min_fragment_length_m
    edges = edges.map_batches(
        lambda t: t.filter(pc.greater_equal(pc.field("length_m"), pa.scalar(float(min_len)))),
        batch_format="pyarrow",
    )
    return edges

# ---------------------------------------------------------------------------
# Fully distributed edge assembly (no driver-resident coord_mapping).
#
# The broadcast path above collects coord_mapping (O(endpoints+junctions))
# to the object store once — exactly what the reference itself ships to its
# worker pool (:525-550), and fine up to ~10^8 junctions. Past broadcast
# budgets (the 10^12-page regime) this path keeps everything distributed:
#
#   1. the RARE coincidental matches (a multi-point centroid that lands
#      exactly on some original key's floats — the junction-membership
#      quirk) are found with a partitioned hash join of distinct centroids
#      against keys; that set is tiny at any scale and is broadcast;
#   2. ways explode into (way_id, vertex_idx, key) rows; a partitioned
#      hash join on `key` attaches (c_lat, c_lon, cluster_size);
#   3. rows hash-bucket by way_id together with the way-metadata rows
#      (union trick), each bucket reassembles its ways (sort by vertex
#      idx) and runs the same split kernel as the broadcast path.
#
# Equality with the broadcast path is pinned by tests.
# ---------------------------------------------------------------------------

def create_edges_distributed(waterways_ds, coord_mapping_ds, config: Config):
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import _bucket, hash_join

    precision = config.coordinate_precision
    n_parts = max(8, config.join_partitions)

    # ---- 1. coincidental centroid==key float matches (tiny; broadcast) ----
    def centroid_candidates(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["cluster_size"], pa.scalar(1)))
        c_lat = t.column("c_lat").to_numpy(zero_copy_only=False)
        c_lon = t.column("c_lon").to_numpy(zero_copy_only=False)
        kk = coord_key(c_lat, c_lon, precision)
        return pa.table(
            {
                "kk": pa.array(kk, type=pa.int64()),
                "cl_lat": pa.array(c_lat, type=pa.float64()),
                "cl_lon": pa.array(c_lon, type=pa.float64()),
            }
        )

    def key_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kk": batch["key"],
                "k_lat": batch["lat"],
                "k_lon": batch["lon"],
            }
        )

    cands = coord_mapping_ds.map_batches(centroid_candidates, batch_format="pyarrow")
    keyside = coord_mapping_ds.map_batches(key_side, batch_format="pyarrow")
    matched = hash_join(cands, keyside, on=["kk"], num_parts=n_parts).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["cl_lat"], t["k_lat"]), pc.equal(t["cl_lon"], t["k_lon"])
            )
        ).select(["cl_lat", "cl_lon"]),
        batch_format="pyarrow",
    )
    coincid_pdf = matched.to_pandas()  # tiny at any scale
    coincid_set = set(
        zip(
            coincid_pdf["cl_lat"].to_numpy().view(np.int64).tolist(),
            coincid_pdf["cl_lon"].to_numpy().view(np.int64).tolist(),
        )
        if len(coincid_pdf)
        else []
    )
    coincid_ref = ray.put(coincid_set)

    # ---- 2. vertex explosion + distributed mapping join ----
    def explode(batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        way_ids = batch.column("way_id").to_numpy(zero_copy_only=False)
        row_of_vertex = np.repeat(way_ids, np.diff(offsets))
        starts = np.repeat(offsets[:-1], np.diff(offsets))
        vidx = np.arange(len(lats)) - starts
        return pa.table(
            {
                "way_id": pa.array(row_of_vertex, type=pa.int64()),
                "vidx": pa.array(vidx, type=pa.int64()),
                "key": pa.array(coord_key(lats, lons, precision), type=pa.int64()),
                "v_lat": pa.array(lats, type=pa.float64()),
                "v_lon": pa.array(lons, type=pa.float64()),
            }
        )

    vertices = waterways_ds.map_batches(explode, batch_format="pyarrow")
    mapping_rows = coord_mapping_ds.map_batches(
        lambda t: t.select(["key", "lat", "lon", "c_lat", "c_lon", "cluster_size"]),
        batch_format="pyarrow",
    )
    joined = hash_join(vertices, mapping_rows, on=["key"], how="left", num_parts=n_parts)

    # ---- 3. bucket by way, reassemble, shared split kernel ----
    def bucket_vertices(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        part = _bucket(df, ["way_id"], n_parts)
        return batch.append_column("__part", pa.array(part, type=pa.int64())).append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )

    def bucket_meta(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["way_id"]]
        part = _bucket(df, ["way_id"], n_parts)
        return pa.table(
            {
                "way_id": batch["way_id"],
                "name": batch["name"],
                "wtype": batch["wtype"],
                "width": batch["width"],
                "__part": pa.array(part, type=pa.int64()),
                "__side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    vcols = ["way_id", "vidx", "v_lat", "v_lon", "c_lat", "c_lon", "cluster_size"]

    def pad(batch: pa.Table, want: list[str]) -> pa.Table:
        cols = {}
        for c in want + ["__part", "__side"]:
            if c in batch.schema.names:
                col = batch[c]
                # pin dtypes that pandas merge makes batch-dependent (a
                # chunk with no unmatched rows keeps int64, others float64)
                if c == "cluster_size":
                    col = col.cast(pa.float64()) if col.type != pa.float64() else col
                cols[c] = col
            else:
                typ = pa.string() if c in ("name", "wtype", "width") else pa.float64()
                # cluster_size stays float64: the left join nulls it for
                # unmatched vertices (pandas promotes int64-with-NaN)
                if c in ("way_id", "vidx"):
                    typ = pa.int64()
                cols[c] = pa.nulls(batch.num_rows, type=typ)
        return pa.table(cols)

    all_cols = vcols + ["name", "wtype", "width"]
    vb = joined.map_batches(bucket_vertices, batch_format="pyarrow").map_batches(
        lambda t: pad(t, all_cols), batch_format="pyarrow"
    )
    mb = waterways_ds.map_batches(bucket_meta, batch_format="pyarrow").map_batches(
        lambda t: pad(t, all_cols), batch_format="pyarrow"
    )
    both = vb.union(mb)

    hash_length = config.hash_length
    method = config.distance_calculation_method

    def assemble_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        cset = ray.get(coincid_ref)
        vtx = g.filter(_pc.equal(g["__side"], pa.scalar(0, pa.int8())))
        meta = g.filter(_pc.equal(g["__side"], pa.scalar(1, pa.int8())))
        if vtx.num_rows == 0:
            return _empty_edges_table()
        vdf = vtx.select(vcols).to_pandas()
        vdf = vdf.sort_values(["way_id", "vidx"], kind="stable").reset_index(drop=True)
        mdf = (
            meta.select(["way_id", "name", "wtype", "width"]).to_pandas()
            .drop_duplicates("way_id")
            .set_index("way_id")
        )
        matched_m = vdf["cluster_size"].notna().to_numpy()
        m_lat = np.where(matched_m, vdf["c_lat"].to_numpy(), vdf["v_lat"].to_numpy())
        m_lon = np.where(matched_m, vdf["c_lon"].to_numpy(), vdf["v_lon"].to_numpy())
        size = vdf["cluster_size"].fillna(0).to_numpy()
        mapped_is_key = matched_m & (size == 1)
        if cset:
            bits = list(zip(m_lat.view(np.int64).tolist(), m_lon.view(np.int64).tolist()))
            coinc = np.fromiter((b in cset for b in bits), dtype=bool, count=len(bits))
            mapped_is_key = mapped_is_key | coinc
        wids = vdf["way_id"].to_numpy()
        w_change = np.ones(len(wids), dtype=bool)
        w_change[1:] = wids[1:] != wids[:-1]
        starts = np.nonzero(w_change)[0]
        offsets = np.concatenate((starts, [len(wids)]))
        uniq_ways = wids[starts]
        names = [mdf.at[w, "name"] if w in mdf.index else "" for w in uniq_ways.tolist()]
        wtypes = [mdf.at[w, "wtype"] if w in mdf.index else "" for w in uniq_ways.tolist()]
        widths = [mdf.at[w, "width"] if w in mdf.index else "" for w in uniq_ways.tolist()]
        return assemble_edges_from_mapped(
            m_lat, m_lon, offsets, mapped_is_key, uniq_ways, names, wtypes, widths,
            precision, hash_length, method,
        )

    edges = both.groupby("__part").map_groups(assemble_bucket, batch_format="pyarrow")
    min_len = config.min_fragment_length_m
    return edges.map_batches(
        lambda t: t.filter(pc.greater_equal(pc.field("length_m"), pa.scalar(float(min_len)))),
        batch_format="pyarrow",
    )
