"""Corpus-pin strategy switch (VERDICT r3 #5 — the `edge_assembly` pattern
applied to the near-dup family's full-corpus pins).

A Dataset consumed by several downstream stages must be pinned once or the
whole upstream lineage re-executes per consumer. Two strategies:

* ``materialize`` (default): object-store blocks. Fastest at bench scale
  (measured, NOTES_r3 #8/#13) — Ray spills to disk under pressure, but the
  pin still holds a primary copy of the WHOLE corpus alive for the
  pipeline's duration, which is the wrong call at 100 TB.
* ``parquet``: spill the pinned stage to partitioned parquet under
  ``WWX_PIN_DIR`` (default /tmp/wwx_pins) and hand consumers a lazy
  ``read_parquet`` Dataset — nothing corpus-sized stays resident; each
  consumer streams the files. This is the 100 TB setting.
* ``auto``: materialize, then if the pinned size exceeds
  ``WWX_PIN_BUDGET_BYTES`` (default 8 GiB) convert to the parquet spill
  and release the in-memory pin. (The budget check needs the size, and
  the size needs execution — so auto transiently holds the corpus once;
  fleet jobs that KNOW they are over budget should set
  ``WWX_PIN_MODE=parquet`` outright.)

Outputs are identical in all modes (pinned by tests): the spill is a
byte-faithful arrow->parquet->arrow round-trip of the same rows, and every
downstream kernel imposes its own total order.
"""

from __future__ import annotations

import os
import uuid


def _mode() -> str:
    return os.environ.get("WWX_PIN_MODE", "materialize")


def _budget() -> int:
    return int(os.environ.get("WWX_PIN_BUDGET_BYTES", 8 << 30))


def _spill(ds, name: str):
    import ray.data as rd

    root = os.environ.get("WWX_PIN_DIR", "/tmp/wwx_pins")
    path = os.path.join(root, f"{name}-{os.getpid()}-{uuid.uuid4().hex[:8]}")
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        # write_parquet emits NO files for an empty dataset and
        # read_parquet refuses an empty dir — iterative pipelines (scc's
        # peel rounds, bowtie) legitimately pin empty intermediates, so
        # hand back a typed empty dataset instead. The schema() probe
        # re-executes the lineage SINCE THE NEAREST UPSTREAM PIN (pins
        # cut lineage), which is bounded and only paid on the empty path.
        import pyarrow as pa

        schema = ds.schema()
        if schema is None:
            raise ValueError(
                f"pin({name!r}): empty spill with unknown schema — cannot "
                "type the empty dataset"
            )
        empty = pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in pa.schema(schema.base_schema)],
            schema=pa.schema(schema.base_schema),
        )
        return rd.from_arrow(empty)
    return rd.read_parquet(path, file_extensions=["parquet"])


def pin(ds, name: str):
    """Pin a multiply-consumed Dataset per WWX_PIN_MODE (see module doc)."""
    mode = _mode()
    if mode == "parquet":
        return _spill(ds, name)
    m = ds.materialize()
    if mode == "auto" and m.size_bytes() > _budget():
        spilled = _spill(m, name)
        del m  # release the object-store pin; consumers stream the files
        return spilled
    return m
