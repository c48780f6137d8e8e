"""Union-find for transitive cluster merging.

The reference declares this (pcluster union_find.cpp:16-33) but its
``ProteinClustering`` driver is an empty stub (union_find.cpp:35-43) and the
structure is never instantiated; here it is implemented for real: hit edges
(query, subject) from the alignment stage — or LSH cluster-overlap edges —
are merged transitively into connected components.

Vectorized numpy implementation with path halving; a C++ fast path can be
swapped in behind the same API (see native/).
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]   # path halving
            x = p[x]
        return int(x)

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller root wins -> deterministic component labels
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo

    def union_edges(self, src: np.ndarray, dst: np.ndarray) -> None:
        for a, b in zip(np.asarray(src).tolist(), np.asarray(dst).tolist()):
            self.union(a, b)

    def components(self) -> np.ndarray:
        """(N,) root label per element (fully compressed)."""
        p = self.parent
        for i in range(len(p)):
            p[i] = self.find(i)
        return p.copy()

    def groups(self) -> list[np.ndarray]:
        roots = self.components()
        order = np.argsort(roots, kind="stable")
        sr = roots[order]
        cuts = np.nonzero(sr[1:] != sr[:-1])[0] + 1
        return np.split(order, cuts)


def connected_components(n: int, src: np.ndarray, dst: np.ndarray,
                         use_native: bool = True) -> np.ndarray:
    """Convenience: labels of the graph with the given edges.

    Routes through the C++ extension when built (hs_union_find)."""
    if use_native:
        from .. import native_ext
        if native_ext.available():
            return native_ext.union_find_labels(n, src, dst)
    uf = UnionFind(n)
    uf.union_edges(src, dst)
    return uf.components()
