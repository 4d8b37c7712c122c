"""Union-find over int64 keys (numpy-friendly).

The reference's ``UnionFind`` (osm_waterway_extractor.py:337-387) keys on
coordinate float-tuples and lives on the driver. This one keys on the packed
scaled-int coordinate keys (functions/cells.coord_key) and is used *per
partition* inside ``groupby(cell).map_groups`` — plus once more in the small
boundary-merge pass (stages/cluster.py) over root-equivalence edges only.
Path compression + union by rank, same asymptotics as the reference.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}
        self.rank: dict[int, int] = {}

    def add(self, x: int) -> None:
        if x not in self.parent:
            self.parent[x] = x
            self.rank[x] = 0

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def components_min_root(self) -> dict[int, int]:
        """Map every member -> min(member keys of its component).

        Using the minimum member key (not the internal UF root) makes the
        emitted root deterministic regardless of union order / partitioning
        — required for cross-partition mergeability (SURVEY §4.3)."""
        comp_min: dict[int, int] = {}
        for x in self.parent:
            r = self.find(x)
            m = comp_min.get(r)
            if m is None or x < m:
                comp_min[r] = x
        return {x: comp_min[self.find(x)] for x in self.parent}


def connected_components_from_pairs(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Union all (a[i], b[i]) pairs; return member -> min-member-root map."""
    uf = UnionFind()
    for x, y in zip(a.tolist(), b.tolist()):
        uf.add(x)
        uf.add(y)
        uf.union(x, y)
    return uf.components_min_root()
