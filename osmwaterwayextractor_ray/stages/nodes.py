"""Stage 5 — node build (C7).

Reference: ``_build_nodes`` (osm_waterway_extractor.py:2643-2660) —
one node per distinct *exact float* centroid in coord_mapping.values().
Quirk replicated: nodes are built from coord_mapping independently of the
surviving edges, so a centroid whose every incident edge was dropped by the
min-length filter still yields a node.

Distinct-by-exact-float = groupby on the raw float64 bit patterns (two
int64 columns), i.e. hash-partition + per-group first — never a driver-side
set().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
                "c_lat": pa.array(c_lat, type=pa.float64()),
                "c_lon": pa.array(c_lon, type=pa.float64()),
                "lat_bits": pa.array(c_lat.view(np.int64), type=pa.int64()),
                "lon_bits": pa.array(c_lon.view(np.int64), type=pa.int64()),
            }
        )

    def first_to_node(group: pd.DataFrame) -> pd.DataFrame:
        la = float(group["c_lat"].iloc[0])
        lo = float(group["c_lon"].iloc[0])
        return pd.DataFrame(
            {
                "id": [node_id(la, lo, precision, hash_length)],
                "lat": [la],
                "lon": [lo],
                "type": ["junction"],
            }
        )

    return (
        coord_mapping_ds.map_batches(add_bits, batch_format="pyarrow")
        .groupby(["lat_bits", "lon_bits"])
        .map_groups(first_to_node, batch_format="pandas")
    )
