"""Stage 2 — endpoint & junction detection (C1/C2).

Reference semantics (osm_waterway_extractor.py:2286-2316):
  * endpoint_count[coord] += 1 for each way's first and last coordinate
  * all_coordinates_count[coord] += 1 for EVERY coordinate occurrence
  * endpoint junctions: endpoint_count > 1
  * interior junctions: all_count > 1 and not an endpoint junction
  * clustering input = distinct(endpoints) ∪ junctions
    (= coords with endpoint_count >= 1 OR all_count > 1)

Ray mapping: partial aggregation inside ``map_batches`` (one row per
distinct coord per batch — the same partial/merge structure the reference's
multiprocessing path uses, ref :2264-2271) followed by a small
``groupby(key).sum`` shuffle. The packed int64 coord key
(functions/cells.coord_key) is the shuffle key; lat/lon are recovered
exactly via key_to_coord (bit-identical floats, tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.cells import coord_key, key_to_coord
from osmwaterwayextractor_ray.stages._arrow import list_column


def make_partial_counts_fn(config: Config):
    precision = config.coordinate_precision

    def partial_counts(batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        keys = coord_key(lats, lons, precision)
        n_rows = len(offsets) - 1
        is_endpoint = np.zeros(len(lats), dtype=np.int64)
        if len(lats):
            starts = offsets[:-1][offsets[:-1] < offsets[1:]]
            ends = offsets[1:][offsets[:-1] < offsets[1:]] - 1
            # first and last vertex of each non-empty row; a 1-vertex row's
            # single coord counts twice as endpoint in the reference
            np.add.at(is_endpoint, starts, 1)
            np.add.at(is_endpoint, ends, 1)
        uniq, inv = np.unique(keys, return_inverse=True)
        ep = np.zeros(len(uniq), dtype=np.int64)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(ep, inv, is_endpoint)
        np.add.at(tot, inv, 1)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "ep": pa.array(ep, type=pa.int64()),
                "tot": pa.array(tot, type=pa.int64()),
            }
        )

    return partial_counts


def endpoint_junction_counts(ds, config: Config):
    """waterways Dataset -> Dataset(key, ep_count, total_count).

    Partial counts per batch (the reference's partial/merge structure,
    :2264-2271) then the vectorized hash-bucket combine (stages/fastagg —
    the native per-group aggregate is ~130µs/group on this Ray version)."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    partials = ds.map_batches(
        make_partial_counts_fn(config), batch_format="pyarrow", batch_size=config.batch_size
    )
    return grouped_agg(
        partials,
        ["key"],
        {"ep_count": ("ep", "sum"), "total_count": ("tot", "sum")},
    )


def cluster_input_points(counts_ds, config: Config):
    """Filter to the clustering point set and attach exact lat/lon."""
    precision = config.coordinate_precision

    def to_points(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        ep = batch.column("ep_count").to_numpy(zero_copy_only=False)
        tot = batch.column("total_count").to_numpy(zero_copy_only=False)
        mask = (ep >= 1) | (tot > 1)
        keys = keys[mask]
        lat, lon = key_to_coord(keys, precision)
        return pa.table(
            {
                "key": pa.array(keys, type=pa.int64()),
                "lat": pa.array(lat, type=pa.float64()),
                "lon": pa.array(lon, type=pa.float64()),
            }
        )

    return counts_ds.map_batches(to_points, batch_format="pyarrow")
