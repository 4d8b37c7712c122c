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


def build_nodes(coord_mapping_ds, config: Config):
    precision = config.coordinate_precision
    hash_length = config.hash_length

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

    return distinct.map_batches(to_nodes, batch_format="pyarrow")
