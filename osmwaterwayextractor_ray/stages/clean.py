"""Stage 1 — coordinate rounding + consecutive-duplicate removal (M2), and
Stage 1.5 — Douglas-Peucker geometry simplification (M3).

Reference semantics (osm_waterway_extractor.py:1569-1599, :1710-1748):
  * round every (lat, lon) to ``coordinate_precision`` decimals
  * drop consecutive equal coordinates
  * drop the waterway if < 2 coordinates remain
  * simplify with tolerance ``simplification_tolerance_m * 1e-5`` degrees
    (the reference's crude m->deg conversion, kept verbatim); keep the
    original on failure; drop results with < 2 points.

Both are stateless, fully vectorized ``map_batches`` transforms over the
Arrow list columns (no per-row Python in the rounding/dedup path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.functions.geometry import simplify_dp
from osmwaterwayextractor_ray.stages._arrow import (
    list_column,
    str_column,
    waterways_table,
)


def _rebuild(batch: pa.Table, keep_vertex: np.ndarray, offsets: np.ndarray, lats, lons):
    """Rebuild a waterways table from a vertex keep-mask, dropping rows with
    < 2 surviving vertices."""
    n = len(offsets) - 1
    csum = np.concatenate(([0], np.cumsum(keep_vertex.astype(np.int64))))
    kept_per_row = csum[offsets[1:]] - csum[offsets[:-1]]
    row_ok = kept_per_row >= 2
    new_offsets = np.concatenate(([0], np.cumsum(kept_per_row[row_ok])))
    # vertex mask restricted to surviving rows
    row_of_vertex = np.repeat(np.arange(n), np.diff(offsets))
    vmask = keep_vertex & row_ok[row_of_vertex]
    way_ids = batch.column("way_id").to_numpy(zero_copy_only=False)
    names = str_column(batch, "name")
    wtypes = str_column(batch, "wtype")
    widths = str_column(batch, "width")
    sel = np.nonzero(row_ok)[0]
    return waterways_table(
        way_ids[row_ok],
        lats[vmask],
        lons[vmask],
        new_offsets,
        [names[i] for i in sel],
        [wtypes[i] for i in sel],
        [widths[i] for i in sel],
    )


def make_clean_fn(config: Config):
    precision = config.coordinate_precision

    def clean(batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        # + 0.0 normalizes -0.0 -> +0.0 (the reference's float-tuple dict
        # keys treat them as equal but keep whichever repr was seen first —
        # an order-dependent id; we pin the deterministic choice)
        lats = np.round(lats, precision) + 0.0
        lons = np.round(lons, precision) + 0.0
        n_v = len(lats)
        if n_v == 0:
            return _rebuild(batch, np.zeros(0, dtype=bool), offsets, lats, lons)
        same_as_prev = np.zeros(n_v, dtype=bool)
        same_as_prev[1:] = (lats[1:] == lats[:-1]) & (lons[1:] == lons[:-1])
        same_as_prev[offsets[:-1][offsets[:-1] < n_v]] = False  # first vertex of each row always kept
        keep = ~same_as_prev
        return _rebuild(batch, keep, offsets, lats, lons)

    return clean


def _simplify_mask(lats, lons, offsets, tol_deg: float) -> np.ndarray:
    """DP keep-mask over all vertices of a batch. The 3-vertex case — the
    overwhelmingly common one for short ways — is fully vectorized across
    rows (one DP level: keep the middle vertex iff its clamped distance to
    the (first, last) segment exceeds tol; exactly what simplify_dp computes
    for n=3). Longer rows fall back to the recursive per-row kernel."""
    keep = np.ones(len(lats), dtype=bool)
    n_verts = np.diff(offsets)
    tol_sq = tol_deg * tol_deg

    idx3 = np.flatnonzero(n_verts == 3)
    if len(idx3):
        s = offsets[idx3]
        ax, ay = lons[s], lats[s]
        mx, my = lons[s + 1], lats[s + 1]
        bx, by = lons[s + 2], lats[s + 2]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        safe = np.where(L2 == 0.0, 1.0, L2)
        t = np.clip(((mx - ax) * dx + (my - ay) * dy) / safe, 0.0, 1.0)
        t = np.where(L2 == 0.0, 0.0, t)
        ex = mx - (ax + t * dx)
        ey = my - (ay + t * dy)
        keep[s + 1] = (ex * ex + ey * ey) > tol_sq

    for i in np.flatnonzero(n_verts >= 4).tolist():
        s, e = offsets[i], offsets[i + 1]
        keep[s:e] = simplify_dp(lats[s:e], lons[s:e], tol_deg)
    return keep


def make_simplify_fn(config: Config):
    tol_deg = config.simplification_tolerance_m * 1e-5  # ref :1725-1727 verbatim

    def simplify(batch: pa.Table) -> pa.Table:
        lats, offsets = list_column(batch, "lats")
        lons, _ = list_column(batch, "lons")
        keep = _simplify_mask(lats, lons, offsets, tol_deg)
        return _rebuild(batch, keep, offsets, lats, lons)

    return simplify


def clean_waterways(ds, config: Config):
    return ds.map_batches(make_clean_fn(config), batch_format="pyarrow", batch_size=config.batch_size)


def simplify_waterways(ds, config: Config):
    if not config.enable_geometry_simplification:
        return ds
    return ds.map_batches(make_simplify_fn(config), batch_format="pyarrow", batch_size=config.batch_size)


def clean_and_simplify_waterways(ds, config: Config):
    """Fused round+dedup+DP stage: one map_batches, one intermediate table
    instead of two stage boundaries (same per-batch functions composed, so
    outputs are identical to clean_waterways |> simplify_waterways)."""
    if not config.enable_geometry_simplification:
        return clean_waterways(ds, config)
    cfn = make_clean_fn(config)
    sfn = make_simplify_fn(config)

    def both(batch: pa.Table) -> pa.Table:
        return sfn(cfn(batch))

    return ds.map_batches(both, batch_format="pyarrow", batch_size=config.batch_size)
