"""BSP (Pregel-style) min-label fixpoint over hash-sharded actors.

The Ray-Data fixpoint in ``pipelines/webgraph._min_label_fixpoint`` pays
~0.45 s of ``groupby`` shuffle + pin + sum fixed cost PER ITERATION even
on a 5 k-row label table (measured r5 — the cost is Ray Data's sort-based
shuffle launch, not data volume), and scc/bowtie run ~27 iterations.
This module is the same fixpoint expressed as what it really is: a
shared mutable label index — the one shape the Dataset API genuinely
can't express cheaply (per-iteration state, O(1) deltas). It is the
documented "raw actors as a last resort" escape hatch.

Design (and the partitioning assumption it relies on):

* ``W = num_parts`` shard actors. Edges are hash-partitioned by their
  ATTACH endpoint (the side whose label a propagation step reads),
  labels by ``page_id``, with the SAME hash ``uint64(x) % W`` — so every
  static edge finds its attach label locally, with no per-iteration
  shuffle. One Ray-Data cogroup-style shuffle writes both shards to
  parquet under /tmp (at cluster scale: a shared filesystem / object
  store prefix) before the actors start; each shard must fit one
  worker's heap (size W to edges/W ≈ RAM, exactly the union-find
  contract in ``state/unionfind.py``).
* Per iteration, TWO actor message rounds replace two Ray-Data shuffles
  + a materialize + a sum pass:
    phase1  each shard attaches labels to its static edges AND to the
            dynamic label-edges ``(v, lab(v))`` received last round
            (the pointer jump: the attached value is ``lab(lab(v))``),
            then min-combines per group endpoint and buckets the
            messages by the group endpoint's shard (num_returns=W —
            actor-to-actor object transfer, the driver only holds refs).
    phase2  each shard min-reduces the messages for its own pages
            (every local page receives >= 1 message — its own
            label-edge), installs the new labels, returns its exact
            local label sum and the next round's label-edges bucketed
            by ``hash(new_lab)``.
* Convergence: min-propagation only lowers labels, so equal global
  label sums <=> pointwise equality (the same O(1)-driver device the
  Dataset twin uses). The driver sums W ints per iteration — nothing
  O(nodes) ever reaches it.

The update rule is IDENTICAL to the Dataset twin's fused plan
(``new_lab(v) = min over E ∪ {(v, lab(v))} of lab(attach)``; self-loops
contribute ``lab(v)`` itself), so the label sequence, the iteration
count, and the converged output are byte-identical — pinned by
``tests/test_labelprop.py`` twin-equality and by the scc/bowtie brute
forces running under both ``WWX_SCC_FIXPOINT`` modes.

Determinism: the converged labels are the unique fixpoint (min
forward/backward-reachable id), independent of W, message arrival
order, and block structure; per-shard output tables are sorted by
``page_id``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

import ray

_E_FILE = "edges_{p:05d}.parquet"
_L_FILE = "labels_{p:05d}.parquet"


def _part_of(v: np.ndarray, num_parts: int) -> np.ndarray:
    """Shard of an int64 id — identical to fastagg._bucket_tbl's single
    integer-key case (uint64 identity hash mod P), so Ray-Data-side tags
    and actor-side message bucketing always agree."""
    return (v.astype(np.uint64) % np.uint64(num_parts)).astype(np.int64)


def _gmin(g: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Grouped min of v per g (exact int64; order-independent)."""
    if g.size == 0:
        return g, v
    order = np.argsort(g, kind="stable")
    gs, vs = g[order], v[order]
    starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
    return gs[starts], np.minimum.reduceat(vs, starts)


def _write_sharded(e_ds, lab_ds, attach_key: str, base: str, num_parts: int):
    """ONE cogroup-style shuffle shards both inputs: edges tagged by
    hash(attach endpoint), labels by hash(page_id), null-padded union,
    groupby(__part), one parquet pair per shard. The map_groups output
    (one tiny row per part) is consumed to force the writes."""
    group_key = "src_page" if attach_key == "dst_page" else "dst_page"

    def tag_e(t: pa.Table) -> pa.Table:
        att = t.column(attach_key).to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "g": t.column(group_key),
                "a": t.column(attach_key),
                "pid": pa.nulls(n, pa.int64()),
                "lab": pa.nulls(n, pa.int64()),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__part": pa.array(_part_of(att, num_parts)),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "g": pa.nulls(n, pa.int64()),
                "a": pa.nulls(n, pa.int64()),
                "pid": t.column("page_id"),
                "lab": t.column("lab"),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__part": pa.array(_part_of(pid, num_parts)),
            }
        )

    both = e_ds.map_batches(tag_e, batch_format="pyarrow").union(
        lab_ds.map_batches(tag_l, batch_format="pyarrow")
    )

    def dump(gt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        p = int(gt.column("__part")[0].as_py())
        side = gt.column("__side")
        e = gt.filter(pc.equal(side, pa.scalar(0, pa.int8())))
        l = gt.filter(pc.equal(side, pa.scalar(1, pa.int8())))
        pq.write_table(
            pa.table({"g": e["g"].combine_chunks(), "a": e["a"].combine_chunks()}),
            os.path.join(base, _E_FILE.format(p=p)),
        )
        pq.write_table(
            pa.table(
                {"pid": l["pid"].combine_chunks(), "lab": l["lab"].combine_chunks()}
            ),
            os.path.join(base, _L_FILE.format(p=p)),
        )
        return pa.table({"part": pa.array([p], type=pa.int64())})

    both.groupby("__part").map_groups(dump, batch_format="pyarrow").take_all()


@ray.remote(num_cpus=0)
class _LabelShard:
    """One hash shard of the label index + the static edges whose attach
    endpoint it owns. num_cpus=0: the per-round kernels are microsecond
    numpy reductions — reserving whole CPUs for W shards would deadlock
    small ray sessions (tests run at num_cpus=4) for no benefit; at
    cluster scale, raise it with the shard size."""

    def __init__(self, part: int, num_parts: int, base: str):
        import pyarrow.parquet as pq

        self.W = num_parts
        epath = os.path.join(base, _E_FILE.format(p=part))
        lpath = os.path.join(base, _L_FILE.format(p=part))
        if os.path.exists(epath):
            et = pq.read_table(epath)
            self.eg = et.column("g").to_numpy(zero_copy_only=False).astype(np.int64)
            self.ea = et.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            self.eg = np.empty(0, dtype=np.int64)
            self.ea = np.empty(0, dtype=np.int64)
        if os.path.exists(lpath):
            lt = pq.read_table(lpath)
            pid = lt.column("pid").to_numpy(zero_copy_only=False).astype(np.int64)
            lab = lt.column("lab").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            pid = np.empty(0, dtype=np.int64)
            lab = np.empty(0, dtype=np.int64)
        order = np.argsort(pid, kind="stable")
        self.pids = pid[order]
        self.labs = lab[order]
        if self.pids.size and not (np.diff(self.pids) > 0).all():
            raise ValueError("labelprop: duplicate page_id in a label shard")

    def _lookup(self, att: np.ndarray) -> np.ndarray:
        if att.size == 0:
            return att
        if self.pids.size == 0:
            raise ValueError("labelprop: attach endpoint on an unlabeled shard")
        idx = np.searchsorted(self.pids, att)
        bad = idx >= self.pids.size
        idx[bad] = 0
        if bad.any() or not np.array_equal(self.pids[idx], att):
            raise ValueError("labelprop: edge attach endpoint has no label")
        return self.labs[idx]

    def _bucket_edges(self, g: np.ndarray, a: np.ndarray):
        dest = _part_of(a, self.W)
        return tuple(
            (g[dest == d], a[dest == d]) for d in range(self.W)
        )

    def init_round(self):
        """(local label sum, initial label-edges (v, lab(v)) bucketed by
        hash(lab(v)))."""
        out = self._bucket_edges(self.pids, self.labs)
        return (int(self.labs.sum()), *out)

    def phase1(self, *dyn):
        """Attach labels to static edges + received label-edges, combine
        min per group endpoint, bucket by the group endpoint's shard."""
        allg = np.concatenate([self.eg] + [d[0] for d in dyn])
        alla = np.concatenate([self.ea] + [d[1] for d in dyn])
        vals = self._lookup(alla)
        dest = _part_of(allg, self.W)
        msgs = []
        for d in range(self.W):
            m = dest == d
            msgs.append(_gmin(allg[m], vals[m]))
        return tuple(msgs)

    def phase2(self, *msgs):
        """Install min over received messages as the new local labels;
        return (exact local sum, next round's label-edges by shard)."""
        gs, mins = _gmin(
            np.concatenate([m[0] for m in msgs]),
            np.concatenate([m[1] for m in msgs]),
        )
        if not np.array_equal(gs, self.pids):
            # gs always covers pids (each page's own label-edge reaches
            # it); extra keys mean an edge whose GROUP endpoint has no
            # label row — the caller fed endpoints outside the label set
            raise ValueError(
                "labelprop: edge group endpoint outside the label table"
            )
        self.labs = mins
        out = self._bucket_edges(self.pids, self.labs)
        return (int(self.labs.sum()), *out)

    def labels_table(self) -> pa.Table:
        return pa.table(
            {
                "page_id": pa.array(self.pids, type=pa.int64()),
                "lab": pa.array(self.labs, type=pa.int64()),
            }
        )


def _as_list(refs, n):
    return [refs] if n == 1 else list(refs)


def min_label_fixpoint_bsp(
    lab_ds,
    e_ds,
    along: str,
    name: str,
    num_parts: int = 8,
    max_iters: int = 32,
):
    """Drop-in twin of ``webgraph._min_label_fixpoint`` (same signature
    contract: returns a (page_id, lab) Dataset, raises on
    non-convergence). See the module docstring for the plan."""
    import ray.data as rd

    W = num_parts
    attach_key = "dst_page" if along == "out" else "src_page"
    base = tempfile.mkdtemp(prefix=f"wwx-bsp-{name[:40]}-", dir="/tmp")
    actors = []
    try:
        _write_sharded(e_ds, lab_ds, attach_key, base, W)
        actors = [_LabelShard.remote(p, W, base) for p in range(W)]
        init = [
            _as_list(a.init_round.options(num_returns=W + 1).remote(), W + 1)
            for a in actors
        ]
        s_prev = sum(ray.get([r[0] for r in init]))
        dyn = [[init[a][1 + d] for d in range(W)] for a in range(W)]
        for _ in range(max_iters):
            p1 = [
                _as_list(
                    actors[a]
                    .phase1.options(num_returns=W)
                    .remote(*(dyn[s][a] for s in range(W))),
                    W,
                )
                for a in range(W)
            ]
            p2 = [
                _as_list(
                    actors[a]
                    .phase2.options(num_returns=W + 1)
                    .remote(*(p1[s][a] for s in range(W))),
                    W + 1,
                )
                for a in range(W)
            ]
            s = sum(ray.get([p2[a][0] for a in range(W)]))
            dyn = [[p2[a][1 + d] for d in range(W)] for a in range(W)]
            if s == s_prev:
                # re-own the blocks (map over the refs) before the actors
                # that hold the primary copies are killed
                out = (
                    rd.from_arrow_refs([a.labels_table.remote() for a in actors])
                    .map_batches(lambda t: t, batch_format="pyarrow")
                    .materialize()
                )
                return out
            s_prev = s
        raise ValueError(
            f"{name}: BSP min-label propagation did not converge in "
            f"{max_iters} steps"
        )
    finally:
        for a in actors:
            ray.kill(a)
        shutil.rmtree(base, ignore_errors=True)
