"""Parameter-hashed Parquet checkpoints with per-partition lineage (S9).

The reference caches every pipeline step as a gzip-JSON file keyed by the
SHA-256 of the parameters that affect that step (get_step_parameter_hash,
osm_waterway_extractor.py:245-334, 3038-3119): changing snap_tolerance_m
invalidates clustering onward but keeps the cleaned/simplified caches.

Here the same idea at partitioned-Parquet granularity, per the north-rule's
"resumable from checkpoint with per-partition lineage + metrics":

    <checkpoint_dir>/<step>/<param_hash>/
        part-*.parquet          (one per block; written by the stream)
        _manifest.json          {step, param_hash, params, row_count,
                                 n_files, files: [{name, rows, bytes}],
                                 wall_time_s}

``checkpointed(factory, step, config)`` returns the cached Dataset when a
complete manifest exists (a crashed partial write has no manifest and is
re-done), otherwise runs the factory, writes the checkpoint, and reads it
back — so downstream stages always consume the on-disk lineage, and a
re-run of the whole pipeline skips every finished step.
"""

from __future__ import annotations

import json
import os
import time

from osmwaterwayextractor_ray.config import Config


def checkpoint_path(config: Config, step: str) -> str:
    return os.path.join(config.checkpoint_dir, step, config.step_param_hash(step))


def checkpointed(factory, step: str, config: Config):
    """factory: () -> Dataset. Returns a Dataset backed by the checkpoint."""
    import ray.data as rd

    if not config.enable_checkpoints:
        return factory()

    path = checkpoint_path(config, step)
    manifest_file = os.path.join(path, "_manifest.json")
    if os.path.exists(manifest_file):
        return rd.read_parquet(path, file_extensions=["parquet"])

    t0 = time.time()
    ds = factory()
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    files = []
    total_rows = 0
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(path, name)
        md = pq.read_metadata(fp)
        files.append({"name": name, "rows": md.num_rows, "bytes": os.path.getsize(fp)})
        total_rows += md.num_rows
    manifest = {
        "step": step,
        "param_hash": config.step_param_hash(step),
        "params": config.result_params(),
        "row_count": total_rows,
        "n_files": len(files),
        "files": files,
        "wall_time_s": round(time.time() - t0, 3),
    }
    tmp = manifest_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, manifest_file)  # manifest appears atomically = step done
    return rd.read_parquet(path, file_extensions=["parquet"])
