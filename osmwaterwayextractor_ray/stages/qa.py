"""Stage 6 — QA metrics (C5/C6).

Reference: ``_generate_qa_metrics`` (osm_waterway_extractor.py:2662-2701) +
cluster metrics (:1345-1365). Percentiles use the reference's
sorted-index convention (``values[int(n * q)]``): exact at fixture/bench
scale via a distributed sort + rank-prefix take, and at scale via a
distributed t-digest sketch (state/tdigest.py — per-batch vectorized
digests merged down to the driver, no sort and no row streaming; error
bound pinned by tests). Counts come from Dataset aggregates.
"""

from __future__ import annotations

import numpy as np


def _sorted_index_percentiles(
    ds, column: str, qs: list[float], exact_rank_limit: int = 10000
) -> tuple[dict[float, float], str]:
    """Returns ({q: value}, method) where method is "exact" (sorted-index
    rank take) or "tdigest" (~1% relative error, documented in the metrics
    dict as percentile_method — ADVICE r2)."""
    n = ds.count()
    if n == 0:
        return {q: 0.0 for q in qs}, "exact"
    ranks = sorted({min(int(n * q), n - 1) for q in qs})
    vals: dict[int, float] = {}
    method = "exact"
    if max(ranks) < exact_rank_limit:
        # exact sorted-index values: pull only the needed rank prefix
        taken = ds.sort(column).take(max(ranks) + 1)
        for r in ranks:
            vals[r] = float(taken[r][column])
    else:
        # large data: distributed t-digest sketch (no sort, no row
        # streaming to the driver; error bound pinned by tests)
        from osmwaterwayextractor_ray.state.tdigest import digest_dataset, quantile

        method = "tdigest"
        means, weights = digest_dataset(ds, column)
        for r in ranks:
            vals[r] = quantile(means, weights, (r + 0.5) / n)
    return {q: vals[min(int(n * q), n - 1)] for q in qs}, method


def generate_qa_metrics(
    original_count: int,
    processed_count: int,
    nodes_ds,
    edges_ds,
    coord_mapping_ds,
    config,
    processing_time: float = 0.0,
) -> dict:
    from ray.data.aggregate import Count, Max, Mean, Sum

    metrics: dict = {
        "processing_time_seconds": processing_time,
        "original_waterways": original_count,
        "processed_waterways": processed_count,
        "final_nodes": nodes_ds.count(),
        "final_edges": edges_ds.count(),
        "distance_calculation_method": config.distance_calculation_method,
        "coordinate_precision": config.coordinate_precision,
        "snap_tolerance_m": config.snap_tolerance_m,
        "min_fragment_length_m": config.min_fragment_length_m,
    }

    # cluster metrics (ref :1345-1365)
    n_points = coord_mapping_ds.count()
    if n_points:
        import pyarrow.compute as pc

        singles = coord_mapping_ds.filter(expr="cluster_size == 1").count()
        # total clusters = singletons + distinct multi-clusters
        multi = coord_mapping_ds.filter(expr="cluster_size > 1")
        multi_rows = multi.count()
        agg = coord_mapping_ds.aggregate(Max("cluster_size"))
        largest = int(agg["max(cluster_size)"] or 0)
        # displacements list covers only multi-cluster members (ref appends
        # displacements only in the else-branch :1310-1313)
        n_disp = multi_rows
        if n_disp:
            ps, method = _sorted_index_percentiles(multi, "displacement_m", [0.5, 0.95, 0.99])
            metrics["displacement_percentile_method"] = method
            metrics.update(
                {
                    "displacement_p50_m": ps[0.5],
                    "displacement_p95_m": ps[0.95],
                    "displacement_p99_m": ps[0.99],
                }
            )
        else:
            metrics.update(
                {"displacement_p50_m": 0.0, "displacement_p95_m": 0.0, "displacement_p99_m": 0.0}
            )
        warn_thr = config.snap_tolerance_m * config.warning_displacement_multiplier
        # clusters with any displacement above warning threshold
        above = (
            multi.filter(expr=f"displacement_m > {warn_thr!r}")
            .groupby(["c_lat", "c_lon"])
            .count()
            .count()
            if multi_rows
            else 0
        )
        n_multi_clusters = multi.groupby(["c_lat", "c_lon"]).count().count() if multi_rows else 0
        metrics.update(
            {
                "total_clusters": singles + n_multi_clusters,
                "singleton_clusters": singles,
                "largest_cluster_size": max(largest, 1),
                "clusters_above_threshold": above,
            }
        )

    # edge stats (ref :2680-2701)
    n_edges = metrics["final_edges"]
    if n_edges:
        ps, method = _sorted_index_percentiles(edges_ds, "length_m", [0.05, 0.5, 0.95])
        metrics["edge_length_percentile_method"] = method
        mean_agg = edges_ds.aggregate(Mean("length_m"))
        metrics.update(
            {
                "edge_length_p5_m": ps[0.05],
                "edge_length_p50_m": ps[0.5],
                "edge_length_p95_m": ps[0.95],
                "mean_edge_length_m": float(mean_agg["mean(length_m)"]),
            }
        )
        import pyarrow as pa
        import pyarrow.compute as pc

        def width_counts(t: pa.Table) -> pa.Table:
            raw = pc.sum(pc.cast(pc.not_equal(t["width_raw"], pa.scalar("")), pa.int64())).as_py() or 0
            m = pc.sum(pc.cast(pc.is_valid(t["width_m"]), pa.int64())).as_py() or 0
            return pa.table({"raw": pa.array([raw], type=pa.int64()), "m": pa.array([m], type=pa.int64())})

        wagg = edges_ds.map_batches(width_counts, batch_format="pyarrow").aggregate(
            Sum("raw", alias_name="raw"), Sum("m", alias_name="m")
        )
        with_raw = int(wagg["raw"] or 0)
        with_m = int(wagg["m"] or 0)
        metrics.update(
            {
                "pct_edges_with_width_raw": with_raw / n_edges * 100,
                "pct_edges_with_width_m": with_m / n_edges * 100,
                "width_parse_success_rate": (with_m / with_raw * 100) if with_raw else 0,
            }
        )
    else:
        metrics.update(
            {
                "pct_edges_with_width_raw": 0,
                "pct_edges_with_width_m": 0,
                "width_parse_success_rate": 0,
            }
        )
    return metrics
