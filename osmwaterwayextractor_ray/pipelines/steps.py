"""PipelineStep protocol — the engine's user-extension surface (§2.8).

The reference's only extension point is its YAML config; here pipeline
stages compose as named ``Dataset -> Dataset`` steps that each declare the
config parameters affecting their results (feeding the same per-step
parameter-hash lineage the checkpoint layer uses, ref :245-334).

    class MyStep:
        name = "my_step"
        params = ("snap_tolerance_m",)
        def apply(self, ds, config): return ds.map_batches(...)

    ds = run_steps(ds, [CleanStep(), SimplifyStep(), MyStep()], config)

Steps with ``checkpoint = True`` are wrapped in the param-hashed Parquet
checkpoint (stages/checkpoint.py) when the config enables it.
"""

from __future__ import annotations

from typing import Any, Protocol, Sequence, runtime_checkable

from osmwaterwayextractor_ray.config import Config


@runtime_checkable
class PipelineStep(Protocol):
    name: str
    params: tuple[str, ...]  # result-affecting Config fields

    def apply(self, ds: Any, config: Config) -> Any: ...


def step_param_hash(step: PipelineStep, config: Config) -> str:
    import hashlib
    import json
    from dataclasses import asdict

    d = asdict(config)
    blob = json.dumps(
        {"step": step.name, "params": {k: d[k] for k in step.params if k in d}},
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def run_steps(ds: Any, steps: Sequence[PipelineStep], config: Config) -> Any:
    from osmwaterwayextractor_ray.stages.checkpoint import checkpointed

    for step in steps:
        if getattr(step, "checkpoint", False) and config.enable_checkpoints:
            captured = ds

            def factory(s=step, d=captured):
                return s.apply(d, config)

            ds = checkpointed(factory, step.name, config)
        else:
            ds = step.apply(ds, config)
    return ds


# ---- the built-in steps, exposed through the protocol ----

class CleanStep:
    name = "processed"
    params = ("coordinate_precision", "waterway_types")
    checkpoint = False

    def apply(self, ds, config):
        from osmwaterwayextractor_ray.stages.clean import clean_waterways

        return clean_waterways(ds, config)


class SimplifyStep:
    name = "simplified"
    params = (
        "coordinate_precision",
        "enable_geometry_simplification",
        "simplification_tolerance_m",
    )
    checkpoint = False

    def apply(self, ds, config):
        from osmwaterwayextractor_ray.stages.clean import simplify_waterways

        return simplify_waterways(ds, config)


class IntersectStep:
    name = "intersections"
    params = (
        "coordinate_precision",
        "enable_geometry_simplification",
        "simplification_tolerance_m",
        "enable_intersection_detection",
        "snap_tolerance_m",
    )
    checkpoint = True

    def apply(self, ds, config):
        from osmwaterwayextractor_ray.stages.intersect import detect_and_split

        return detect_and_split(ds, config)


DEFAULT_LINE_STEPS: tuple = (CleanStep(), SimplifyStep(), IntersectStep())
