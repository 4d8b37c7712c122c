"""Raster <-> vector tile materialization (north-star surface).

``materialize_tiles`` turns the edges table into per-cell tiles:
  * vector payload: the edge segments clipped to the tile, delta-encoded
    as scaled int32 offsets from the tile origin (compact, invertible);
  * raster payload: a raster_px × raster_px occupancy bitmask (1 bit/px)
    of the segments, packed little-endian — the binary column pattern for
    map-tile serving pipelines.

Shape: flat_map edges -> (cell, segment) rows (per-segment bbox cover,
same scheme as the intersection join) -> groupby(cell) -> one vectorized
render per tile. Tiles are pure binary columns + typed metadata; a PNG
encoder would slot into the raster step without structural change (no
image codecs exist in this environment — the bitmask IS the raster).

``rasterize_segments`` is exact per-pixel line sampling (vectorized
parametric stepping, ~2 samples per pixel crossed) — deterministic,
library-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.functions.cells import n_lon
from osmwaterwayextractor_ray.stages._arrow import list_column


def rasterize_segments(
    lat1, lon1, lat2, lon2, cell_lat0, cell_lon0, cell_deg: float, px: int
) -> np.ndarray:
    """Occupancy bitmap (px*px bools) of segments within one tile."""
    grid = np.zeros((px, px), dtype=bool)
    # sample each segment at ~2x pixel frequency
    x1 = (np.asarray(lon1) - cell_lon0) / cell_deg * px
    y1 = (np.asarray(lat1) - cell_lat0) / cell_deg * px
    x2 = (np.asarray(lon2) - cell_lon0) / cell_deg * px
    y2 = (np.asarray(lat2) - cell_lat0) / cell_deg * px
    for a, b, c, d in zip(x1, y1, x2, y2):
        steps = int(max(abs(c - a), abs(d - b)) * 2) + 2
        t = np.linspace(0.0, 1.0, steps)
        xs = np.clip((a + t * (c - a)).astype(np.int64), 0, px - 1)
        ys = np.clip((b + t * (d - b)).astype(np.int64), 0, px - 1)
        inside = (a + t * (c - a) >= 0) & (a + t * (c - a) < px) & (
            b + t * (d - b) >= 0
        ) & (b + t * (d - b) < px)
        grid[ys[inside], xs[inside]] = True
    return grid


def materialize_tiles(edges_ds, cell_deg: float = 0.05, raster_px: int = 64):
    """edges -> Dataset(cell, n_segments, vector_payload, raster_payload)."""
    NL = n_lon(cell_deg)

    def emit(batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        if len(lats) < 2:
            return pa.table(
                {
                    "cell": pa.array([], type=pa.int64()),
                    "lat1": pa.array([], type=pa.float64()),
                    "lon1": pa.array([], type=pa.float64()),
                    "lat2": pa.array([], type=pa.float64()),
                    "lon2": pa.array([], type=pa.float64()),
                }
            )
        row_of_vertex = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        same = row_of_vertex[:-1] == row_of_vertex[1:]
        a_lat, a_lon = lats[:-1][same], lons[:-1][same]
        b_lat, b_lon = lats[1:][same], lons[1:][same]
        la0 = np.floor((np.minimum(a_lat, b_lat) + 90.0) / cell_deg).astype(np.int64)
        la1 = np.floor((np.maximum(a_lat, b_lat) + 90.0) / cell_deg).astype(np.int64)
        lo0 = np.floor((np.minimum(a_lon, b_lon) + 180.0) / cell_deg).astype(np.int64)
        lo1 = np.floor((np.maximum(a_lon, b_lon) + 180.0) / cell_deg).astype(np.int64)
        counts = (la1 - la0 + 1) * (lo1 - lo0 + 1)
        seg_idx = np.repeat(np.arange(len(a_lat)), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))
        local = np.arange(cum[-1]) - cum[seg_idx]
        width = (lo1 - lo0 + 1)[seg_idx]
        la = la0[seg_idx] + local // width
        lo = lo0[seg_idx] + local % width
        return pa.table(
            {
                "cell": pa.array(la * NL + lo, type=pa.int64()),
                "lat1": pa.array(a_lat[seg_idx], type=pa.float64()),
                "lon1": pa.array(a_lon[seg_idx], type=pa.float64()),
                "lat2": pa.array(b_lat[seg_idx], type=pa.float64()),
                "lon2": pa.array(b_lon[seg_idx], type=pa.float64()),
            }
        )

    segs = edges_ds.map_batches(emit, batch_format="pyarrow")

    def render(g: pd.DataFrame) -> pa.Table:
        cell = int(g["cell"].iloc[0])
        la = cell // NL
        lo = cell - la * NL
        lat0 = la * cell_deg - 90.0
        lon0 = lo * cell_deg - 180.0
        l1, o1 = g["lat1"].to_numpy(), g["lon1"].to_numpy()
        l2, o2 = g["lat2"].to_numpy(), g["lon2"].to_numpy()
        # vector payload: int32 deltas scaled to 1e-7 deg from tile origin
        scale = 1e7
        vec = np.empty(len(l1) * 4, dtype=np.int32)
        vec[0::4] = np.rint((l1 - lat0) * scale)
        vec[1::4] = np.rint((o1 - lon0) * scale)
        vec[2::4] = np.rint((l2 - lat0) * scale)
        vec[3::4] = np.rint((o2 - lon0) * scale)
        grid = rasterize_segments(l1, o1, l2, o2, lat0, lon0, cell_deg, raster_px)
        raster = np.packbits(grid.ravel()).tobytes()
        return pa.table(
            {
                "cell": pa.array([cell], type=pa.int64()),
                "zoom_cell_deg": pa.array([cell_deg], type=pa.float64()),
                "n_segments": pa.array([len(l1)], type=pa.int64()),
                "n_pixels_set": pa.array([int(grid.sum())], type=pa.int64()),
                "vector_payload": pa.array([vec.tobytes()], type=pa.binary()),
                "raster_payload": pa.array([raster], type=pa.binary()),
            }
        )

    return segs.groupby("cell").map_groups(render, batch_format="pandas")


def waterway_tiles(sf_dir: str):
    """Query surface: flagship graph -> tiles."""
    from osmwaterwayextractor_ray.config import Config
    from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
    from osmwaterwayextractor_ray.sources.waterways import waterways_from_events

    result = build_graph(waterways_from_events(sf_dir), Config())
    return materialize_tiles(result.edges)
