"""Stage 5 — node build (C7).

Reference: ``_build_nodes`` (osm_waterway_extractor.py:2643-2660) —
one node per distinct *exact float* centroid in coord_mapping.values().
Quirk replicated: nodes are built from coord_mapping independently of the
surviving edges, so a centroid whose every incident edge was dropped by the
min-length filter still yields a node.

Distinct-by-exact-float = native groupby on the raw float64 bit patterns
(two int64 columns) — hash-partition + per-group first via the vectorized
aggregate path, never a driver-side set() and never per-group Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.hashing import node_id


def build_nodes(coord_mapping_ds, config: Config, mapping_ref=None):
    precision = config.coordinate_precision
    hash_length = config.hash_length

    if mapping_ref is not None:
        # Fast path: coord_mapping was already collected for the edge-stage
        # broadcast (stages/edges.collect_coord_mapping) — dedupe the exact
        # float centroid pairs on those arrays (vectorized lexsort, no extra
        # shuffle) and distribute only the id hashing.
        import ray
        import ray.data as rd

        m = ray.get(mapping_ref)
        a = m["c_lat"].view(np.int64)
        b = m["c_lon"].view(np.int64)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        first = np.ones(len(a_s), dtype=bool)
        first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        uniq = pa.table(
            {
                "lat_bits": pa.array(a_s[first], type=pa.int64()),
                "lon_bits": pa.array(b_s[first], type=pa.int64()),
            }
        )
        from osmwaterwayextractor_ray.stages._pool import pool_max

        n_chunks = max(1, min(pool_max(), uniq.num_rows // 4096))
        step = -(-uniq.num_rows // n_chunks) if uniq.num_rows else 1
        chunks = [uniq.slice(i, step) for i in range(0, max(uniq.num_rows, 1), step)]
        return rd.from_arrow(chunks).map_batches(
            _make_to_nodes(precision, hash_length), batch_format="pyarrow"
        )

    def add_bits(batch: pa.Table) -> pa.Table:
        c_lat = batch.column("c_lat").to_numpy(zero_copy_only=False)
        c_lon = batch.column("c_lon").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lat_bits": pa.array(c_lat.view(np.int64), type=pa.int64()),
                "lon_bits": pa.array(c_lon.view(np.int64), type=pa.int64()),
            }
        )

    from osmwaterwayextractor_ray.stages.fastagg import distinct as fa_distinct

    distinct = fa_distinct(
        coord_mapping_ds.map_batches(add_bits, batch_format="pyarrow"),
        ["lat_bits", "lon_bits"],
    )

    return distinct.map_batches(
        _make_to_nodes(precision, hash_length), batch_format="pyarrow"
    )


def _make_to_nodes(precision: int, hash_length: int):
    def to_nodes(batch: pa.Table) -> pa.Table:
        la = batch.column("lat_bits").to_numpy(zero_copy_only=False).view(np.float64)
        lo = batch.column("lon_bits").to_numpy(zero_copy_only=False).view(np.float64)
        ids = [
            node_id(a, b, precision, hash_length) for a, b in zip(la.tolist(), lo.tolist())
        ]
        return pa.table(
            {
                "id": pa.array(ids, type=pa.string()),
                "lat": pa.array(la, type=pa.float64()),
                "lon": pa.array(lo, type=pa.float64()),
                "type": pa.array(["junction"] * len(ids), type=pa.string()),
            }
        )

    return to_nodes
