"""LSH motif search: the HSEARCH entry point, TPU-native.

Pipeline (reference: Search(), motif_both_points.cpp:195-250):
  build:  hash every database k-mer into hash_L tables  -> sorted-code index
  probe:  hash each center, locate its bucket in every table
  verify: exact squared distance to every (deduplicated) bucket member,
          emit pairs with d <= R

TPU mapping:
  * hashing      = one fused gather-GEMM over the integer k-mer database
  * table build  = per-table argsort of packed int64 codes
  * probe        = vmapped searchsorted
  * verify       = per-center-position 20-way lookup tables ("P-tables"):
                   P[c, l, aa] = ||center_c[l] - coords[aa]||^2, so a
                   candidate's exact distance is sum_l P[c, l, cand_l] — one
                   (C, M, L) gather + reduce, exact for both integer-k-mer
                   centers and arbitrary real-point centers.

The verify pass is exact, so LSH parameters only trade recall for speed —
identical semantics to the reference's PairwiseDistance_square gate
(motif_both_points.cpp:236-242).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import embedding
from ..lsh import pstable
from ..ops import segment


@dataclasses.dataclass(frozen=True)
class MotifSearchConfig:
    """Operating point; defaults follow motif_both_points.cpp:286-295,380-381
    (the reference hard-codes hash_K=4, hash_L=4 and defaults W=50, R=200)."""

    hash_k: int = 4
    hash_l: int = 4
    w: float = 50.0
    radius: float = 200.0
    center_block: int = 128
    cand_max: int | None = None   # None -> max bucket size at build


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MotifIndex:
    """Device-resident LSH index over an integer k-mer database."""

    params: pstable.PStableParams
    tables: segment.SortedTables
    db_kmers: jax.Array           # (N+1, L) int32; row N is all-zero padding
    cand_max: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_points(self) -> int:
        return self.db_kmers.shape[0] - 1

    @property
    def kmer_len(self) -> int:
        return self.db_kmers.shape[1]


def build_index(db_kmers: np.ndarray, key: jax.Array,
                config: MotifSearchConfig = MotifSearchConfig(),
                cand_max: int | None = None) -> MotifIndex:
    """Hash + sort the database into a MotifIndex."""
    n, l = db_kmers.shape
    params = pstable.init(key, l * embedding.AA_DIM, config.hash_k,
                          config.hash_l, config.w)
    km = jnp.asarray(db_kmers, jnp.int32)
    codes = pstable.hash_codes(km, params, is_kmers=True)
    tables = segment.build_tables(codes)
    cm = cand_max if cand_max is not None else config.cand_max
    if cm is None:
        cm = segment.max_bucket_size(np.asarray(codes))
    padded = jnp.concatenate([km, jnp.zeros((1, l), jnp.int32)], axis=0)
    return MotifIndex(params=params, tables=tables, db_kmers=padded,
                      cand_max=int(cm))


def _center_ptables(centers: jax.Array, kmer_len: int) -> jax.Array:
    """(C, L) int or (C, 8L) float centers -> (C, L, 20) P-tables.

    P[c, l, aa] = squared distance between the center's l-th 8-dim slice and
    the coordinates of amino acid ``aa``; for integer centers this is exactly
    DISTANCE_SQUARE[center_l, aa].
    """
    if jnp.issubdtype(centers.dtype, jnp.integer):
        dsq = jnp.asarray(embedding.DISTANCE_SQUARE, jnp.float32)
        return jnp.take(dsq, centers.astype(jnp.int32), axis=0)  # (C, L, 20)
    coords = jnp.asarray(embedding.COORDINATES, jnp.float32)     # (20, 8)
    c = centers.shape[0]
    x = jnp.asarray(centers, jnp.float32).reshape(c, kmer_len,
                                                  embedding.AA_DIM)
    diff = x[:, :, None, :] - coords[None, None, :, :]           # (C, L, 20, 8)
    return jnp.sum(diff * diff, axis=-1)


@functools.partial(jax.jit, static_argnames=("cand_max",))
def _probe_verify(index: MotifIndex, centers: jax.Array,
                  qcodes: jax.Array, r2: jax.Array, cand_max: int):
    """One center block: probe all tables, dedup, exact-verify.

    Returns (ids (C, T*cand_max) int32 — deduplicated candidate ids with
    sentinel N for invalid, dist (C, T*cand_max) f32, hit mask).
    """
    n = index.num_points
    start, count = segment.probe(index.tables, qcodes)
    count = jnp.minimum(count, cand_max)
    ids = segment.gather_candidates(index.tables, start, count, cand_max)
    ids = segment.dedup_sorted(ids, sentinel=n)
    # exact distances via P-tables
    ptab = _center_ptables(centers, index.kmer_len)       # (C, L, 20)
    cand = jnp.take(index.db_kmers, ids, axis=0)          # (C, M, L)
    # d2[c, m] = sum_l ptab[c, l, cand[c, m, l]]
    d2 = jnp.take_along_axis(
        ptab[:, None, :, :],                              # (C, 1, L, 20)
        cand[:, :, :, None],                              # (C, M, L, 1)
        axis=3,
    )[..., 0].sum(axis=2)                                 # (C, M)
    valid = ids < n
    hits = valid & (d2 <= r2)
    return ids, d2, hits


def search(index: MotifIndex, centers: np.ndarray,
           config: MotifSearchConfig = MotifSearchConfig()):
    """LSH search: all (center, kmer) pairs found in probed buckets with
    exact distance <= radius.

    centers: (C, L) int k-mers or (C, 8L) real points.
    Returns (center_idx, kmer_idx, dist) host arrays.
    """
    is_kmers = np.issubdtype(np.asarray(centers).dtype, np.integer)
    r2 = jnp.float32(config.radius * config.radius)
    cb = config.center_block
    ci_all, ki_all, dd_all = [], [], []
    for s in range(0, centers.shape[0], cb):
        blk = np.asarray(centers[s:s + cb])
        pad = cb - blk.shape[0]
        if pad:
            blk = np.pad(blk, ((0, pad),) + ((0, 0),) * (blk.ndim - 1))
        cblk = jnp.asarray(blk, jnp.int32 if is_kmers else jnp.float32)
        if is_kmers:
            qcodes_tn = pstable.hash_codes(cblk, index.params, is_kmers=True)
        else:
            qcodes_tn = pstable.hash_codes(cblk, index.params, is_kmers=False)
        qcodes = qcodes_tn.T                              # (C, T)
        ids, d2, hits = _probe_verify(index, cblk, qcodes, r2,
                                      index.cand_max)
        hits = np.array(hits)
        if pad:
            hits[cb - pad:, :] = False
        hc, hm = np.nonzero(hits)
        ids = np.asarray(ids)
        d2 = np.asarray(d2)
        ci_all.append(hc + s)
        ki_all.append(ids[hc, hm].astype(np.int64))
        dd_all.append(np.sqrt(np.maximum(d2[hc, hm], 0.0)))
    if not ci_all:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32))
    return (np.concatenate(ci_all), np.concatenate(ki_all),
            np.concatenate(dd_all).astype(np.float32))
