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

With ``partition_key`` the checkpoint is written as one atomically-renamed
file per STABLE partition (``hash(key) % P``, content-deterministic — not
Ray's arbitrary block structure), and a resume after a mid-step crash
diffs the surviving part files against the expected partition set and
writes ONLY the missing partitions: finished parts are neither recomputed
downstream of the filter nor rewritten. That is the north-rule's
"resumable from checkpoint with per-partition lineage".
"""

from __future__ import annotations

import json
import os
import time

from osmwaterwayextractor_ray.config import Config


def checkpoint_path(config: Config, step: str) -> str:
    return os.path.join(config.checkpoint_dir, step, config.step_param_hash(step))


def _part_name(k: int) -> str:
    return f"part-{k:05d}.parquet"


def _valid_parts(path: str, P: int) -> set[int]:
    """Partition ids whose part file exists and has a readable footer
    (atomic rename makes torn files unlikely; validate anyway)."""
    import pyarrow.parquet as pq

    done = set()
    for k in range(P):
        fp = os.path.join(path, _part_name(k))
        if os.path.exists(fp):
            try:
                pq.read_metadata(fp)
                done.add(k)
            except Exception:
                os.remove(fp)  # torn partial file: rewrite this partition
    return done


def _write_manifest(path: str, step: str, config: Config, t0: float, extra: dict):
    import pyarrow.parquet as pq

    files = []
    total_rows = 0
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
        **extra,
    }
    manifest_file = os.path.join(path, "_manifest.json")
    tmp = manifest_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, manifest_file)  # manifest appears atomically = step done


def checkpointed(
    factory,
    step: str,
    config: Config,
    partition_key: str | None = None,
    num_partitions: int | None = None,
):
    """factory: () -> Dataset. Returns a Dataset backed by the checkpoint.

    ``partition_key``: a stable row column (e.g. way_id) switching on the
    per-partition layout/resume described in the module docstring."""
    import ray.data as rd

    if not config.enable_checkpoints:
        return factory()

    path = checkpoint_path(config, step)
    manifest_file = os.path.join(path, "_manifest.json")
    if os.path.exists(manifest_file):
        return rd.read_parquet(path, file_extensions=["parquet"])

    t0 = time.time()
    if partition_key is None:
        ds = factory()
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
        _write_manifest(path, step, config, t0, {})
        return rd.read_parquet(path, file_extensions=["parquet"])

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    P = num_partitions or config.checkpoint_partitions
    os.makedirs(path, exist_ok=True)
    # Pin the partition layout BEFORE any part is written: a resume must
    # use the layout of the crashed run, not the current config — with a
    # changed P the surviving hash%P_old parts would silently drop or
    # duplicate rows against a hash%P_new expectation.
    layout_file = os.path.join(path, "_layout.json")
    if os.path.exists(layout_file):
        with open(layout_file) as f:
            P = int(json.load(f)["num_partitions"])
    else:
        tmp = layout_file + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"num_partitions": P}, f)
        os.replace(tmp, layout_file)
    done = _valid_parts(path, P)
    missing = sorted(set(range(P)) - done)

    if missing:
        ds = factory()
        missing_arr = np.array(missing, dtype=np.int64)

        def tag_and_filter(batch: pa.Table) -> pa.Table:
            col = batch.column(partition_key).to_numpy(zero_copy_only=False)
            if col.dtype.kind in "iu":
                h = col.astype(np.uint64)
            else:
                h = pd.util.hash_array(np.asarray(col, dtype=object))
            part = (h % np.uint64(P)).astype(np.int64)
            keep = np.isin(part, missing_arr)
            return batch.append_column(
                "__ckpt_part", pa.array(part, type=pa.int64())
            ).filter(pa.array(keep))

        def write_part(g: pa.Table) -> pa.Table:
            k = int(g.column("__ckpt_part")[0].as_py())
            fp = os.path.join(path, _part_name(k))
            tmp = fp + f".tmp{os.getpid()}"
            pq.write_table(g.drop_columns(["__ckpt_part"]), tmp)
            os.replace(tmp, fp)
            return pa.table({"part": pa.array([k], type=pa.int64())})

        tagged = ds.map_batches(tag_and_filter, batch_format="pyarrow")
        tagged.groupby("__ckpt_part").map_groups(
            write_part, batch_format="pyarrow"
        ).materialize()
        # partitions that received no rows still need an (empty) part file
        # so the next resume knows they are complete, not missing
        written = _valid_parts(path, P)
        still = sorted(set(missing) - written)
        if still:
            if written:
                schema = pq.read_schema(os.path.join(path, _part_name(min(written))))
            else:
                schema = pa.schema(ds.schema().base_schema)
            schema = pa.schema([f for f in schema if f.name != "__ckpt_part"])
            empty = schema.empty_table()
            for k in still:
                fp = os.path.join(path, _part_name(k))
                tmp = fp + f".tmp{os.getpid()}"
                pq.write_table(empty, tmp)
                os.replace(tmp, fp)

    _write_manifest(
        path, step, config, t0,
        {"partition_key": partition_key, "num_partitions": P,
         "resumed_partitions": missing if done else None},
    )
    return rd.read_parquet(path, file_extensions=["parquet"])
