"""Hot-cell salting for pairwise spatial shuffles (north-rule requirement).

A dense cell (coastal strip, river delta) can hold orders of magnitude
more rows than the median, turning a ``groupby(cell)`` pairwise kernel
into a straggler. The standard remedy is the triangle replication scheme:

  * a cheap pre-pass counts rows per cell (vectorized grouped_agg);
  * cells above ``hot_cell_row_limit`` get a salt factor
    S = ceil(n / limit) (capped at 32);
  * every row of a hot cell is assigned a deterministic sub-group
    g = identity % S and REPLICATED into the S tasks
    (cell, min(g, x), max(g, x)) for x in 0..S-1, so every pair of
    sub-groups (a, b) meets in exactly one task;
  * the pair kernel in task (a, b), a != b, only pairs rows from
    different sub-groups — each geometric pair is examined exactly once
    per cell, identical results to the unsalted run (pinned by tests at a
    tiny hot limit).

Cost: replication factor S per hot row, tasks bounded by S(S+1)/2 per hot
cell, each of size ≤ 2·limit. Cold cells pay nothing but the counting
pre-pass.

Task encoding: task = cell * 1024 + a * 32 + b  (a <= b < 32).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_SALT = 32
_ENC = MAX_SALT * MAX_SALT  # 1024


def task_salt_pair(tasks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    rem = tasks % _ENC
    return rem // MAX_SALT, rem % MAX_SALT


def compute_hot_cells(emitted_ds, cell_col: str, limit: int) -> dict[int, int]:
    """cell -> salt factor S for cells above the row limit (tiny result).

    One map pass of per-block partial counts (np.unique per block) combined
    on the driver — no shuffle. The collected partials are bounded by the
    number of distinct cells actually touched (spatial shuffles here use
    ≥0.1° cells, so ≤ a few hundred thousand rows even planet-wide)."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch.column(cell_col).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    pdf = emitted_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(pdf) == 0:  # empty Datasets lose their schema in to_pandas
        return {}
    totals = pdf.groupby("cell", sort=False)["n"].sum()
    hot = totals[totals > limit]
    out: dict[int, int] = {}
    for cell, n in hot.items():
        out[int(cell)] = min(MAX_SALT, int(-(-int(n) // limit)))
    return out


def apply_salt(emitted_ds, cell_col: str, identity_col: str, hot: dict[int, int]):
    """Add ``task`` (the new group key) and ``sgrp`` columns; replicate hot
    rows per the triangle scheme. With no hot cells this is a cheap
    column-append (task = cell * 1024, sgrp = 0)."""
    import ray

    hot_ref = ray.put(hot)

    def salt(batch: pa.Table) -> pa.Table:
        h = ray.get(hot_ref)
        cells = batch.column(cell_col).to_numpy(zero_copy_only=False)
        if not h:
            out = batch.append_column("task", pa.array(cells * _ENC, type=pa.int64()))
            return out.append_column(
                "sgrp", pa.array(np.zeros(len(cells), dtype=np.int8))
            )
        ident = batch.column(identity_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.ones(len(cells), dtype=np.int64)
        hk = np.fromiter(h.keys(), dtype=np.int64, count=len(h))
        hv = np.fromiter(h.values(), dtype=np.int64, count=len(h))
        order = np.argsort(hk)
        hk, hv = hk[order], hv[order]
        pos = np.clip(np.searchsorted(hk, cells), 0, len(hk) - 1)
        hit = hk[pos] == cells
        s = np.where(hit, hv[pos], 1)
        g = np.where(s > 1, np.abs(ident) % np.maximum(s, 1), 0)
        # replication count per row = s (a row meets every other sub-group
        # once, plus its own-group task)
        rep = np.repeat(np.arange(len(cells)), s)  # row index per output row
        x = np.concatenate([np.arange(k) for k in s.tolist()]) if len(s) else np.array([], dtype=np.int64)
        gg = g[rep]
        a = np.minimum(gg, x)
        b = np.maximum(gg, x)
        tasks = cells[rep] * _ENC + a * MAX_SALT + b
        out_cols = {}
        for name in batch.schema.names:
            col = batch.column(name).combine_chunks() if isinstance(batch.column(name), pa.ChunkedArray) else batch.column(name)
            out_cols[name] = col.take(pa.array(rep, type=pa.int64()))
        out_cols["task"] = pa.array(tasks, type=pa.int64())
        out_cols["sgrp"] = pa.array(gg.astype(np.int8))
        return pa.table(out_cols)

    return emitted_ds.map_batches(salt, batch_format="pyarrow")


def pair_mask_for_task(task: int, sgrp_i: np.ndarray, sgrp_j: np.ndarray) -> np.ndarray | None:
    """Extra pair predicate for a salted task: in a cross task (a != b)
    only pairs from different sub-groups count; None = no restriction."""
    rem = task % _ENC
    a, b = rem // MAX_SALT, rem % MAX_SALT
    if a == b:
        return None
    return sgrp_i != sgrp_j
