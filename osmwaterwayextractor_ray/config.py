"""Engine configuration.

Mirrors the reference's ``Config`` dataclass (osm_waterway_extractor.py:99-162)
field-for-field where the field affects results, plus Ray-engine execution
knobs (cell sizes, batch sizes, concurrency) that the single-process
reference has no counterpart for.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict
from typing import Any


@dataclass
class Config:
    # --- result-affecting parameters (parity with reference defaults) ---
    snap_tolerance_m: float = 2.0
    min_fragment_length_m: float = 50.0
    coordinate_precision: int = 6
    distance_calculation_method: str = "geodesic"  # "geodesic" | "haversine" | "approximate"
    waterway_types: list[str] = field(default_factory=lambda: ["river", "canal"])

    enable_geometry_simplification: bool = True
    simplification_tolerance_m: float = 1.0

    enable_intersection_detection: bool = True

    max_displacement_multiplier: float = 1.5
    warning_displacement_multiplier: float = 1.2
    max_cluster_size_warning: int = 10

    hash_length: int = 8  # chars of base62(xxh64) kept in ids (ref :1106)

    # --- output-format selection (ref Config :129-133, consumed by
    # OutputManager.save_outputs :2747-2782) ---
    server_formats: list[str] = field(
        default_factory=lambda: ["parquet", "csv", "geojson", "jsongz"]
    )
    generate_mobile_csv: bool = False
    generate_id_mapping: bool = False

    # --- Ray execution knobs (new engine only; do not affect results) ---
    # Equal-angle grid cell edge (degrees) used for the spatial shuffles.
    # Pure grouping knobs: results are identical for any size (parity
    # tests run at several). Group kernels are sweep/bbox-prefiltered, not
    # n², so cells can be large; shrink for very dense data (a 1° cell of
    # dense OSM Europe would hold ~10^6 endpoints — at that density use
    # 0.05-0.1, the halo bound still holds because tolerance << cell).
    cluster_cell_deg: float = 1.0
    intersect_cell_deg: float = 0.5
    batch_size: int = 4096
    # Cells whose group exceeds this row count get salted into sub-buckets
    # before pairwise work (hot coastal/river cells). The intersect kernel
    # is block-quadratic per cell -> low limit; the cluster kernel is a
    # lat-sweep -> it tolerates much larger cells before salting pays off.
    hot_cell_row_limit: int = 50_000
    cluster_hot_row_limit: int = 1_000_000
    # hash-join fan-out for the centroid->member attach (cluster stage)
    join_partitions: int = 16
    # edge assembly: "broadcast" collects coord_mapping (O(junctions)) to
    # the object store once — right up to ~10^8 junctions; "distributed"
    # keeps everything as partitioned hash joins (the 10^12-page regime).
    # Identical results (pinned by tests).
    edge_assembly: str = "broadcast"
    # intersection splitting: "broadcast" ships the (small) sorted point
    # index to every task; "distributed" joins points to ways by PBSM cell
    # (partitioned hash join + way-bucket co-group) — for topologies whose
    # junction count outgrows the broadcast budget. Identical results
    # (pinned by tests).
    intersection_splitter: str = "broadcast"

    # --- checkpointing ---
    enable_checkpoints: bool = False
    checkpoint_dir: str = "/tmp/wwx_checkpoints"
    # partition fan-out for per-partition checkpoint resume (stable
    # hash(partition_key) % P part files; see stages/checkpoint.py)
    checkpoint_partitions: int = 32

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        """Load a flat engine config OR the reference's nested config.yaml
        layout (sections processing:/clustering:/ids:/output:/qa:/caching:,
        flattened exactly as the reference's Config.from_yaml does,
        osm_waterway_extractor.py:163-237). Output-selection keys
        (server_formats, generate_mobile_csv, generate_id_mapping) are
        honored; unknown keys (e.g. the reference's parallel_workers) are
        ignored — Ray's executor replaces that machinery."""
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        flat: dict[str, Any] = {}
        for k, v in raw.items():
            if isinstance(v, dict):
                flat.update(v)  # one level of reference-style sections
            else:
                flat[k] = v
        known = {k: v for k, v in flat.items() if k in cls.__dataclass_fields__}
        return cls(**known)

    def result_params(self) -> dict[str, Any]:
        """Parameters that affect pipeline *results* (not execution layout)."""
        keys = [
            "snap_tolerance_m",
            "min_fragment_length_m",
            "coordinate_precision",
            "distance_calculation_method",
            "waterway_types",
            "enable_geometry_simplification",
            "simplification_tolerance_m",
            "enable_intersection_detection",
            "max_displacement_multiplier",
            "hash_length",
        ]
        d = asdict(self)
        return {k: d[k] for k in keys}

    def step_param_hash(self, step: str) -> str:
        """Per-step lineage hash, mirroring the reference's parameter-based
        cache keys (osm_waterway_extractor.py:245-334): the hash covers the
        transitive closure of parameters affecting that step, so changing
        e.g. ``snap_tolerance_m`` invalidates clustering onward but keeps
        the cleaned/simplified checkpoints."""
        closure = {
            "processed": ["coordinate_precision", "waterway_types"],
            "simplified": [
                "coordinate_precision",
                "waterway_types",
                "enable_geometry_simplification",
                "simplification_tolerance_m",
            ],
            "intersections": [
                "coordinate_precision",
                "waterway_types",
                "enable_geometry_simplification",
                "simplification_tolerance_m",
                "enable_intersection_detection",
                "snap_tolerance_m",
            ],
        }
        base = closure.get(step)
        params = (
            {k: asdict(self)[k] for k in base} if base is not None else self.result_params()
        )
        blob = json.dumps({"step": step, "params": params}, sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]
