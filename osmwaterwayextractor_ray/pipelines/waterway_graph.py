"""Flagship pipeline — waterway network graph assembly.

Composes the six reference build steps (osm_waterway_extractor.py
:1433-1523) as a lazy Ray Data pipeline:

  waterways ──ᶜˡᵉᵃⁿ→ round+dedup ──ˢⁱᵐᵖˡⁱᶠʸ→ DP ──ⁱⁿᵗᵉʳˢᵉᶜᵗ→ split at
  crossings ──ᵉⁿᵈᵖᵒⁱⁿᵗˢ→ groupby(coord) counts ──ᶜˡᵘˢᵗᵉʳ→ per-cell UF +
  boundary merge + centroids ──ᵉᵈᵍᵉˢ→ broadcast-join split ──ⁿᵒᵈᵉˢ→ distinct
  centroids ──ᵠᵃ→ metrics

Only three points materialize small side-data on the driver: the
intersection-point set (broadcast for insertion), the root-equivalence
edges (boundary merge), and coord_mapping (broadcast for edge assembly) —
each is O(junctions), not O(input), mirroring the state the reference
itself broadcasts to its worker pool (:525-550).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.stages.clean import clean_and_simplify_waterways
from osmwaterwayextractor_ray.stages.edges import create_edges
from osmwaterwayextractor_ray.stages.intersect import detect_and_split
from osmwaterwayextractor_ray.stages.nodes import build_nodes
from osmwaterwayextractor_ray.stages.qa import generate_qa_metrics


@dataclass
class GraphResult:
    nodes: Any          # Dataset(id, lat, lon, type)
    edges: Any          # Dataset(id, from/to, length_m, lats, lons, ...)
    coord_mapping: Any  # Dataset(key, lat, lon, c_lat, c_lon, displacement_m, cluster_size)
    qa: dict


def build_graph(
    waterways_ds,
    config: Config | None = None,
    with_qa: bool = False,
    spread_input: bool = True,
) -> GraphResult:
    config = config or Config()
    t0 = time.time()
    from osmwaterwayextractor_ray.stages._prof import prof_mark, prof_reset

    prof_reset()
    original_count = None

    from osmwaterwayextractor_ray.stages.checkpoint import checkpointed
    from osmwaterwayextractor_ray.stages._pool import pool_max

    # Spread the input across ~4 blocks per CPU: downstream actor pools can
    # only parallelize across blocks, and a source that arrives in a handful
    # of large blocks (small parquet files, dense synth batches) would cap
    # every stage's parallelism at that block count. Keep this ON even for
    # pre-spread sources: skipping it for waterways_from_events was
    # MEASURED SLOWER at both 8 and 32 CPUs (the post-synthesis repartition
    # rebalances the heavy geometry blocks even when block counts already
    # match — NOTES_r2.md). spread_input=False exists for callers that feed
    # an already-materialized, balanced waterways Dataset.
    if spread_input:
        import os

        # 2 blocks/CPU (r4 re-measurement): r2 chose 4/CPU when the per-row
        # kernels were heavier; after this round's vectorizations the
        # per-task overhead dominates and 2/CPU wins 4/4 interleaved at 32
        # cpus (min 12.9 vs 14.8 s) and ties at 8. Env-overridable.
        factor = int(os.environ.get("WWX_SPREAD_FACTOR", "2"))
        waterways_ds = waterways_ds.repartition(factor * pool_max())

    def _intersections():
        prepared = clean_and_simplify_waterways(waterways_ds, config)
        return detect_and_split(prepared, config)

    # the post-intersection waterways feed both the counting shuffle and the
    # edge assembly — checkpoint (param-hashed parquet) or materialize once
    # so the shared prefix isn't re-executed per consumer
    with_intersections = checkpointed(
        _intersections, "intersections", config, partition_key="way_id"
    )
    prof_mark("split pipeline constructed")
    if not config.enable_checkpoints:
        with_intersections = with_intersections.materialize()
    prof_mark("with_intersections (split kernel)")

    def _clustering():
        # two-shuffle path: skinny (key, ep, tot) partial-agg shuffle, then
        # the small cell shuffle over junction/endpoint points only. The
        # fused single-shuffle alternative (cluster_points_from_ways) was
        # measured ~20% SLOWER at 32 cpus: it pushes every per-batch
        # partial-count row (6 wide columns) through the sort instead of
        # the narrow hash-bucket combine + a tiny cell shuffle.
        from osmwaterwayextractor_ray.stages.cluster import cluster_points
        from osmwaterwayextractor_ray.stages.endpoints import (
            cluster_input_points,
            endpoint_junction_counts,
        )

        counts = endpoint_junction_counts(with_intersections, config)
        points = cluster_input_points(counts, config)
        return cluster_points(points, config)

    coord_mapping = checkpointed(_clustering, "clustering", config, partition_key="key")
    if not config.enable_checkpoints:
        coord_mapping = coord_mapping.materialize()
    prof_mark("coord_mapping (count+cluster)")

    if config.edge_assembly == "distributed":
        # partitioned hash joins end to end — no driver-resident mapping
        # (the 10^12-junction regime); identical results, pinned by tests
        from osmwaterwayextractor_ray.stages.edges import create_edges_distributed

        edges = create_edges_distributed(with_intersections, coord_mapping, config)
        nodes = build_nodes(coord_mapping, config)
    else:
        # coord_mapping is collected ONCE (sorted key->centroid arrays in
        # the object store) and shared by the edge-assembly broadcast AND
        # the node build — the same state the reference ships to its worker
        # pool (:525-550); O(junctions), fine up to ~10^8
        from osmwaterwayextractor_ray.stages.edges import collect_coord_mapping

        mapping_ref = collect_coord_mapping(coord_mapping, config)
        prof_mark("collect_coord_mapping")
        edges = create_edges(with_intersections, coord_mapping, config, mapping_ref=mapping_ref)
        nodes = build_nodes(coord_mapping, config, mapping_ref=mapping_ref)

    qa: dict = {}
    if with_qa:
        original_count = waterways_ds.count()
        processed_count = with_intersections.count()
        edges = edges.materialize()
        nodes = nodes.materialize()
        qa = generate_qa_metrics(
            original_count,
            processed_count,
            nodes,
            edges,
            coord_mapping,
            config,
            processing_time=time.time() - t0,
        )
    return GraphResult(nodes=nodes, edges=edges, coord_mapping=coord_mapping, qa=qa)
