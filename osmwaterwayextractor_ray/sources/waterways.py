"""Waterway inputs.

* ``fixture_waterways()`` — the reference's own 4-way synthetic conformance
  network, verbatim from ``create_test_waterways`` (osm_waterway_extractor
  .py:3141-3165): main river, touching tributary, collinear continuation,
  and a crossing stream, with width tags '10 m'/'3 m'/missing/'2 m'.
* ``synth_waterways_table(n)`` — deterministic scale-out: copy g of the
  4-way motif is translated by (0.1° * grid position); way_id = g*4 +
  template index. No RNG, no external data; used by queries()/bench over
  the driver testdata row counts.
* ``waterways_from_events(sf_dir)`` — derives the synthetic table from the
  driver's `events` parquet (one way per event row) so the benchmark input
  scales with sf and flows through ray.data.read_parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.stages._arrow import waterways_table

# (way offset coords, name, wtype, width)
_MOTIF = [
    ([(52.5, 13.4), (52.51, 13.41), (52.52, 13.42)], "Test River", "river", "10 m"),
    ([(52.51, 13.41), (52.515, 13.405), (52.52, 13.40)], "Test Stream", "stream", "3 m"),
    ([(52.52, 13.42), (52.53, 13.43), (52.54, 13.44)], "Test River", "river", ""),
    ([(52.505, 13.405), (52.515, 13.415), (52.525, 13.425)], "Test Crossing Stream", "stream", "2 m"),
]


def fixture_waterways_pylist() -> list[dict]:
    """Reference fixture in the reference's dict shape (for the sequential
    parity oracle)."""
    out = []
    for i, (coords, name, wtype, width) in enumerate(_MOTIF):
        tags = {"waterway": wtype, "name": name}
        if width:
            tags["width"] = width
        out.append({"id": i + 1, "coordinates": list(coords), "tags": tags})
    return out


def _motif_table(n_ways: int, grid_cols: int = 100) -> pa.Table:
    """First n_ways rows of the translated-motif sequence."""
    way_ids = []
    flat_lat: list[float] = []
    flat_lon: list[float] = []
    offsets = [0]
    names, wtypes, widths = [], [], []
    for w in range(n_ways):
        g, t = divmod(w, 4)
        coords, name, wtype, width = _MOTIF[t]
        dlat = 0.1 * (g // grid_cols)
        dlon = 0.1 * (g % grid_cols)
        for la, lo in coords:
            flat_lat.append(round(la + dlat, 6))
            flat_lon.append(round(lo + dlon, 6))
        offsets.append(len(flat_lat))
        way_ids.append(w + 1)
        names.append(name)
        wtypes.append(wtype)
        widths.append(width)
    return waterways_table(
        np.asarray(way_ids), flat_lat, flat_lon, np.asarray(offsets), names, wtypes, widths
    )


def fixture_waterways_table() -> pa.Table:
    return _motif_table(4)


def fixture_waterways_ds():
    import ray.data as rd

    return rd.from_arrow(fixture_waterways_table())


def synth_waterways_ds(n_ways: int):
    import ray.data as rd

    return rd.from_arrow(_motif_table(n_ways))


def waterways_from_events(sf_dir: str, batch_size: int | None = None, repeat: int = 1):
    """Synthetic waterways derived from the `events` rows (``repeat`` ways
    per event) — the deterministic per-row derivation keeps input size tied
    to the scale factor while the data itself stays fully reproducible.
    ``repeat`` > 1 scales the benchmark workload without changing the
    derivation scheme (way w = event_id * repeat + r)."""
    import ray.data as rd

    from osmwaterwayextractor_ray.stages._pool import pool_max

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id"])
    # spread the tiny id column across the cluster BEFORE the (heavier)
    # synthesis map: a single-file read arrives in a handful of blocks and
    # would cap to_ways' parallelism at that block count. batch_size is
    # sized to the per-block row count (count() here is parquet metadata,
    # no scan): with the default 8192 the executor would re-bundle the
    # spread blocks into ~n/8192 fat synthesis tasks and the balanced
    # block structure would be lost again (measured: 12 tasks of 131-206k
    # ways each at sf0.1x24, forcing the downstream repartition to move
    # 230 MB of geometry — ds.stats(), NOTES_r3.md).
    import os

    n_blocks = int(os.environ.get("WWX_SPREAD_FACTOR", "2")) * pool_max()
    if batch_size is None:
        batch_size = max(1, -(-ds.count() // n_blocks))
    ds = ds.repartition(n_blocks)

    # motif geometry as arrays for the vectorized synthesis below
    _m_lat = np.array([[la for la, _ in coords] for coords, *_ in _MOTIF])  # (4, 3)
    _m_lon = np.array([[lo for _, lo in coords] for coords, *_ in _MOTIF])
    _m_name = np.array([name for _, name, _, _ in _MOTIF])
    _m_type = np.array([wtype for _, _, wtype, _ in _MOTIF])
    _m_width = np.array([width for _, _, _, width in _MOTIF])

    def to_ways(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = (ids[:, None] * repeat + np.arange(repeat, dtype=np.int64)).ravel()
        g, t = np.divmod(w, 4)
        dlat = 0.1 * ((g // 100) % 380) - 19.0
        dlon = 0.1 * (g % 100)
        flat_lat = np.round(_m_lat[t] + dlat[:, None], 6).ravel()
        flat_lon = np.round(_m_lon[t] + dlon[:, None], 6).ravel()
        offsets = np.arange(0, (len(w) + 1) * 3, 3, dtype=np.int64)
        return waterways_table(
            w + 1,
            flat_lat,
            flat_lon,
            offsets,
            _m_name[t].tolist(),
            _m_type[t].tolist(),
            _m_width[t].tolist(),
        )

    return ds.map_batches(to_ways, batch_format="pyarrow", batch_size=batch_size)


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)
