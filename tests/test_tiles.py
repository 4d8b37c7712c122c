"""Tile materialization: raster occupancy + vector delta payloads."""

import numpy as np
import pytest

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.pipelines.tiles import materialize_tiles, rasterize_segments
from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
from osmwaterwayextractor_ray.sources.waterways import synth_waterways_ds


def test_rasterize_diagonal():
    grid = rasterize_segments(
        np.array([0.0]), np.array([0.0]), np.array([0.01]), np.array([0.01]),
        0.0, 0.0, 0.01, 16,
    )
    # the full diagonal lights up ~one pixel per row
    assert grid.sum() >= 16
    assert grid[0, 0] and grid[15, 15]
    # off-tile segment renders nothing
    empty = rasterize_segments(
        np.array([5.0]), np.array([5.0]), np.array([5.01]), np.array([5.01]),
        0.0, 0.0, 0.01, 16,
    )
    assert empty.sum() == 0


def test_materialize_tiles(ray_session):
    cfg = Config(min_fragment_length_m=0.0)
    r = build_graph(synth_waterways_ds(16), cfg)
    tiles = materialize_tiles(r.edges, cell_deg=0.05, raster_px=32).to_pandas()
    assert len(tiles) > 0
    assert (tiles["n_segments"] > 0).all()
    assert (tiles["n_pixels_set"] > 0).all()
    # raster payload is the packed 32x32 bitmask
    assert all(len(p) == 32 * 32 // 8 for p in tiles["raster_payload"])
    # vector payload is int32 quads per segment, invertible to tile coords
    row = tiles.iloc[0]
    vec = np.frombuffer(row["vector_payload"], dtype=np.int32)
    assert len(vec) == 4 * row["n_segments"]
    # deltas are within the tile + small tolerance (segments clipped by bbox cover)
    span = int(0.05 * 1e7)
    assert np.abs(vec).max() <= span * 40  # neighbor-cell overhang bounded

    # deterministic across runs
    tiles2 = materialize_tiles(r.edges, cell_deg=0.05, raster_px=32).to_pandas()
    a = tiles.sort_values("cell").reset_index(drop=True)
    b = tiles2.sort_values("cell").reset_index(drop=True)
    assert (a["raster_payload"] == b["raster_payload"]).all()
    assert (a["vector_payload"] == b["vector_payload"]).all()
