"""Distributed connected components over an (a, b) edge Dataset.

The same partial-local-then-close shape as the snap clustering
(stages/cluster.py, which replicates the reference's coordinate
clustering — osm_waterway_extractor.py:337-387 keeps one driver-side
union-find; here nothing corpus-sized touches the driver):

  1. edges hash-partition by ``hash(a) % P`` — each partition runs a
     local union-find (state/unionfind.py) and emits
     ``(node, local_root)`` with the root being the partition-min
     MEMBER (deterministic regardless of union order);
  2. assignments hash-partition by node — a node that appears in
     several edge partitions carries several local roots; each bucket
     emits root-equivalence pairs for such nodes (one vectorized
     lexsort per bucket, no per-node Python);
  3. the equivalence edges — O(cross-partition boundary), NOT O(nodes)
     or O(edges) — are closed transitively on the driver with one more
     union-find and broadcast back as a remap;
  4. assignments map through the remap and dedup to one
     ``(node, component)`` row per node, component = global min member
     id of the node's component.

Partitioning assumption (documented per the custom-operator contract):
the driver-side closure is proportional to the number of DISTINCT
(local-root, local-root) equivalences, i.e. how many components straddle
edge partitions — for near-dup graphs (many small components) this is
tiny; a single giant component yields at most P-1 equivalences per
bucket wave, still O(P * components), never O(nodes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmwaterwayextractor_ray.state.unionfind import (
    UnionFind,
    connected_components_from_pairs,
)


def connected_components(
    edges,
    a_col: str,
    b_col: str,
    out_node: str = "node",
    out_comp: str = "component",
    num_parts: int = 32,
    batch_size: int = 65536,
):
    """(a, b) edge Dataset -> one (out_node, out_comp) row per node that
    appears in any edge; out_comp = min node id of the connected
    component. Nodes absent from every edge are absent from the output
    (callers left-join and default to the node's own id)."""
    import ray

    def tag(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False)
        part = (a.astype(np.uint64) * np.uint64(1099511628211)) % np.uint64(num_parts)
        return pa.table(
            {
                a_col: batch[a_col],
                b_col: batch[b_col],
                "__part": pa.array(part.astype(np.int64), type=pa.int64()),
            }
        )

    def local_uf(g: pa.Table) -> pa.Table:
        roots = connected_components_from_pairs(
            g.column(a_col).to_numpy(zero_copy_only=False),
            g.column(b_col).to_numpy(zero_copy_only=False),
        )
        nodes = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
        rr = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
        return pa.table(
            {
                out_node: pa.array(nodes, type=pa.int64()),
                out_comp: pa.array(rr, type=pa.int64()),
            }
        )

    assigns = (
        edges.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__part")
        .map_groups(local_uf, batch_format="pyarrow")
    )

    def tag_node(batch: pa.Table) -> pa.Table:
        n = batch.column(out_node).to_numpy(zero_copy_only=False)
        part = (n.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_parts)
        return batch.append_column("__npart", pa.array(part.astype(np.int64), type=pa.int64()))

    def equivalences(g: pa.Table) -> pa.Table:
        n = g.column(out_node).to_numpy(zero_copy_only=False)
        r = g.column(out_comp).to_numpy(zero_copy_only=False)
        order = np.lexsort((r, n))
        n, r = n[order], r[order]
        # within each node run, link every root to the node's first
        # (minimal) root — distinct (root_min, root) pairs only
        new_node = np.ones(len(n), dtype=bool)
        new_node[1:] = n[1:] != n[:-1]
        first_idx = np.maximum.accumulate(np.where(new_node, np.arange(len(n)), 0))
        rmin = r[first_idx]
        keep = r != rmin
        pairs = np.unique(np.stack([rmin[keep], r[keep]], axis=1), axis=0)
        return pa.table(
            {
                "ra": pa.array(pairs[:, 0], type=pa.int64()),
                "rb": pa.array(pairs[:, 1], type=pa.int64()),
            }
        )

    # pin: the assignment set feeds BOTH the equivalence pass and the
    # final remap — leaving it lazy re-runs the edge UF per consumer
    assigns = assigns.materialize()

    eq = (
        assigns.map_batches(tag_node, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__npart")
        .map_groups(equivalences, batch_format="pyarrow")
        .take_all()
    )
    # O(boundary) driver closure, same budget class as cluster.py's
    # boundary merge
    if eq:
        ra = np.fromiter((r["ra"] for r in eq), dtype=np.int64, count=len(eq))
        rb = np.fromiter((r["rb"] for r in eq), dtype=np.int64, count=len(eq))
        remap = connected_components_from_pairs(ra, rb)
    else:
        remap = {}
    remap_ref = ray.put(remap)

    def apply_remap(batch: pa.Table) -> pa.Table:
        rm = ray.get(remap_ref)
        r = batch.column(out_comp).to_numpy(zero_copy_only=False)
        if rm:
            r = pd.Series(r).map(rm).fillna(pd.Series(r)).to_numpy().astype(np.int64)
        return pa.table(
            {
                out_node: batch[out_node],
                out_comp: pa.array(r, type=pa.int64()),
            }
        )

    from osmwaterwayextractor_ray.stages.fastagg import distinct

    mapped = assigns.map_batches(apply_remap, batch_format="pyarrow", batch_size=batch_size)
    return distinct(mapped, [out_node, out_comp], num_parts=num_parts, batch_size=batch_size)
