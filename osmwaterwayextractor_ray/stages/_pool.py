"""Actor-pool sizing: scale stage concurrency to the cluster, not a
hard-coded constant (a fixed cap of 8 silently serialized the heaviest
stages on 32-CPU runs — the scaling-efficiency bug)."""

from __future__ import annotations


def pool_max(fraction: float = 1.0, floor: int = 2) -> int:
    """Max actors for a map_batches pool: fraction of cluster CPUs."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(floor, int(cpus * fraction))
