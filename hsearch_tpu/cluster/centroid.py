"""Centroid-merging hierarchical clustering (hclust v1).

Reference semantics (hclust.cpp:186-310): clusters start as singletons; each
round hashes the *cluster centroids* with a fresh LSH table; within a
bucket, a cluster stays intact if (distance of its centroid to the bucket
centroid) + (its own radius) > R/2, otherwise all such "close" clusters are
merged into one, whose centroid and radius (max member distance to centroid)
are recomputed (ClustingBucket, hclust.cpp:186-235).

TPU mapping: centroids live as a (C, 8L) device matrix; per round one
hash GEMM + segment grouping; centroid/radius updates are segment-sums on
device; the bucket membership logic is a trivial per-cluster compare.  All
state (member lists) is host-side since cluster count shrinks every round.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import embedding
from ..lsh import pstable
from ..ops import distance


@dataclasses.dataclass(frozen=True)
class CentroidConfig:
    hash_k: int = 16
    hash_l: int = 32
    w: float = 50.0
    radius: float = 200.0


def cluster_centroid(kmers: np.ndarray, key: jax.Array,
                     config: CentroidConfig = CentroidConfig()):
    """Returns a list of member-id arrays (final clusters)."""
    n, l = kmers.shape
    points = embedding.embed_kmers(kmers, dtype=np.float32)
    members: list[np.ndarray] = [np.array([i], np.int64) for i in range(n)]
    cents, radii = points.copy(), np.zeros(n, np.float32)
    keys = jax.random.split(key, config.hash_l)
    half_r = config.radius / 2.0
    for rnd in range(config.hash_l):
        params = pstable.init(keys[rnd], l * embedding.AA_DIM,
                              config.hash_k, 1, config.w)
        codes = np.asarray(pstable.hash_codes(
            jnp.asarray(cents), params, is_kmers=False)[0])
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        cuts = np.nonzero(sc[1:] != sc[:-1])[0] + 1
        groups = np.split(order, cuts)
        new_members: list[np.ndarray] = []
        new_cents: list[np.ndarray] = []
        new_radii: list[float] = []
        for g in groups:
            if len(g) == 1:
                ci = g[0]
                new_members.append(members[ci])
                new_cents.append(cents[ci])
                new_radii.append(float(radii[ci]))
                continue
            # bucket centroid over all underlying points (hclust.cpp:190)
            sizes = np.array([len(members[c]) for c in g], np.float32)
            c = (cents[g] * sizes[:, None]).sum(0) / sizes.sum()
            d = np.sqrt(((cents[g] - c) ** 2).sum(-1))
            keep = d + radii[g] > half_r
            merge_ids = [members[ci] for ci, k in zip(g, keep) if not k]
            for ci, k in zip(g, keep):
                if k:
                    # untouched cluster: centroid/radius carry over — only
                    # merged clusters are recomputed (the full-cluster rescan
                    # dominated host time at scale)
                    new_members.append(members[ci])
                    new_cents.append(cents[ci])
                    new_radii.append(float(radii[ci]))
            if merge_ids:
                merged = np.concatenate(merge_ids)
                new_members.append(merged)
                mc = points[merged].mean(0)
                dd = points[merged] - mc
                new_cents.append(mc.astype(np.float32))
                new_radii.append(float(np.sqrt((dd * dd).sum(-1).max())))
        members = new_members
        cents = np.stack(new_cents).astype(np.float32)
        radii = np.asarray(new_radii, np.float32)
    return members
