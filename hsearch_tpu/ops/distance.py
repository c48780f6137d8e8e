"""Distance/score matrices as MXU matmuls.

The reference computes distances in scalar loops (PairwiseDistance_square,
motif_both_points.cpp:176-183).  On TPU every pairwise form here is a single
large matmul:

  * real points:   ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b      (one GEMM)
  * index k-mers:  d2(q, p) = sum_l DSQ[q_l, p_l]
                  = onehot(q) (C, 20L)  @  DSQ-gathered(20L, N)  (one GEMM)
  * BLOSUM score:  same contraction against BLOSUM62 instead of DSQ.

The one-hot/gather forms never materialize the (N, 8L) float embedding in
HBM: the database rides as (N, L) int8/int32, 20-40x smaller, and the MXU
does the expansion "for free" inside the GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import blosum, embedding

# Exact-verification GEMMs must not be quantized to bf16 by the MXU default;
# HIGHEST runs the 3-pass f32 algorithm (still on the MXU).
_EXACT = jax.lax.Precision.HIGHEST


def sq_distance_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(C, D), (N, D) -> (C, N) squared Euclidean distances."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)          # (C, 1)
    b2 = jnp.sum(b * b, axis=-1)                         # (N,)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                 precision=_EXACT)
    d2 = a2 + b2[None, :] - 2.0 * ab
    return jnp.maximum(d2, 0.0)


def _expand_table(kmers: jax.Array, table: jax.Array) -> jax.Array:
    """(N, L) indices -> (N, L*A) of table[:, kmers] laid out per position.

    out[n, l*A + a] = table[a, kmers[n, l]]
    """
    g = jnp.take(table.T, kmers, axis=0)     # (N, L, A): table[kmers, :]^T rows
    n, l, a = g.shape
    return g.reshape(n, l * a)


def _onehot_flat(kmers: jax.Array, num_classes: int = 20,
                 dtype=jnp.float32) -> jax.Array:
    n, l = kmers.shape
    oh = jax.nn.one_hot(kmers, num_classes, dtype=dtype)  # (N, L, A)
    return oh.reshape(n, l * num_classes)


def kmer_sq_distance_matrix(q: jax.Array, db: jax.Array,
                            dsq: jax.Array | None = None) -> jax.Array:
    """(C, L), (N, L) int k-mers -> (C, N) exact squared embedding distances.

    Pure-MXU form of sum_l DSQ[q_l, db_l]; exactly the metric verified by the
    reference's search (motif_both_points.cpp:236-242), without ever
    embedding to 8L floats.
    """
    if dsq is None:
        dsq = jnp.asarray(embedding.DISTANCE_SQUARE, jnp.float32)
    qoh = _onehot_flat(q)                                  # (C, 20L)
    dbt = _expand_table(db, dsq)                           # (N, 20L)
    return jnp.dot(qoh, dbt.T, preferred_element_type=jnp.float32,
                   precision=_EXACT)


def kmer_sq_distance_matrix_fast(q: jax.Array, db: jax.Array) -> jax.Array:
    """(C, L), (N, L) int k-mers -> (C, N) squared embedding distances via
    the norm identity on embedded points — an 8L-dim f32 GEMM at default
    MXU precision instead of the 20L-dim 3-pass one-hot contraction
    (~6x fewer MACs and ~6x cheaper per MAC; absolute error ~1e-3 on d2
    from f32 cancellation, fine for search, not for bit-exact oracles).
    """
    coords = jnp.asarray(embedding.COORDINATES, jnp.float32)
    c2 = jnp.sum(coords * coords, axis=-1)                     # (20,)
    n, l = db.shape
    d = coords.shape[1]
    qe = jnp.take(coords, q.astype(jnp.int32), axis=0).reshape(-1, l * d)
    de = jnp.take(coords, db.astype(jnp.int32), axis=0).reshape(n, l * d)
    cross = jnp.dot(qe, de.T, preferred_element_type=jnp.float32)
    q2 = jnp.sum(jnp.take(c2, q), axis=-1)                     # (C,)
    p2 = jnp.sum(jnp.take(c2, db), axis=-1)                    # (N,)
    return jnp.maximum(q2[:, None] + p2[None, :] - 2.0 * cross, 0.0)


def kmer_blosum_score_matrix(q: jax.Array, db: jax.Array) -> jax.Array:
    """(C, L), (N, L) -> (C, N) ungapped BLOSUM62 scores (one GEMM)."""
    b62 = jnp.asarray(blosum.BLOSUM62, jnp.float32)
    qoh = _onehot_flat(q)
    dbt = _expand_table(db, b62)
    return jnp.dot(qoh, dbt.T, preferred_element_type=jnp.float32,
                   precision=_EXACT)


def point_vs_kmer_sq_distance(points: jax.Array, db: jax.Array) -> jax.Array:
    """(C, 8L) real points vs (N, L) int k-mers -> (C, N) squared distances.

    d2(x, p) = ||x||^2 + sum_l ||c[p_l]||^2 - 2 sum_l x_l . c[p_l]
    The cross term is points (C, 8L) @ embedded-db^T, but the embedded db is
    expressed as onehot(db) @ blockdiag(coords) so the GEMM runs against the
    (N, 20L) one-hot — computed here via a per-position coordinate gather.
    """
    coords = jnp.asarray(embedding.COORDINATES, jnp.float32)   # (20, 8)
    c2 = jnp.sum(coords * coords, axis=-1)                     # (20,)
    n, l = db.shape
    d = coords.shape[1]
    x = jnp.asarray(points, jnp.float32).reshape(points.shape[0], l, d)
    # cross[c, n] = sum_l x[c, l] . coords[db[n, l]]
    # as GEMM: X (C, L*8)  @  G^T with G[n, l*8:(l+1)*8] = coords[db[n, l]]
    g = jnp.take(coords, db, axis=0).reshape(n, l * d)         # (N, 8L)
    cross = jnp.dot(x.reshape(x.shape[0], l * d), g.T,
                    preferred_element_type=jnp.float32, precision=_EXACT)
    x2 = jnp.sum(points * points, axis=-1)                     # (C,)
    p2 = jnp.sum(jnp.take(c2, db), axis=-1)                    # (N,)
    return jnp.maximum(x2[:, None] + p2[None, :] - 2.0 * cross, 0.0)


def ptable_distances(ptab: jax.Array, cand: jax.Array) -> jax.Array:
    """P-table candidate distances: (C, L, 20) tables x (C, M, L) k-mers.

    d2[c, m] = sum_l ptab[c, l, cand[c, m, l]], evaluated as L independent
    (C, M) gathers — never materializes a (C, M, L, 20) broadcast (which a
    single take_along_axis over a broadcast operand can, and did: ~1.7 GB
    at bench shapes).  The gathers are VPU/lane-bound; prefer
    ``ptable_distances_mxu`` on the hot path (measured 4.7x faster at
    bench shapes) — this form is the small-shape / oracle variant.
    """
    c, m, l = cand.shape
    d2 = jnp.zeros((c, m), jnp.float32)
    for pos in range(l):
        idx = cand[:, :, pos].astype(jnp.int32)   # candidates may be int8
        d2 = d2 + jnp.take_along_axis(ptab[:, pos, :], idx, axis=1)
    return d2


def ptable_distances_mxu(ptab: jax.Array, cand: jax.Array,
                         chunk: int = 512) -> jax.Array:
    """MXU form of ``ptable_distances``: one-hot the candidates and
    contract (C, chunk, 20L) x (C, 20L) on the systolic array.

    The gather form issues L serial lane-indexed gathers (measured 139 ms
    at bench shapes C=128, M=4096, L=25); a chunked f32 one-hot plus one
    batched dot runs the same sum in 30 ms.  precision=HIGHEST keeps the
    result bit-comparable to f32 summation (the one-hot operand is
    exactly representable, so the dot is an exact f32 sum of table rows
    up to addition order, like every other exact GEMM here).
    """
    c, m, l = cand.shape
    chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)))
    cc = cand.reshape(c, -1, chunk, l).transpose(1, 0, 2, 3)
    pt = ptab.reshape(c, l * 20)

    def body(_, ck):
        oh = jax.nn.one_hot(ck.astype(jnp.int32), 20,
                            dtype=jnp.float32).reshape(c, chunk, l * 20)
        return None, jnp.einsum("cma,ca->cm", oh, pt, precision=_EXACT)

    _, out = jax.lax.scan(body, None, cc)
    return out.transpose(1, 0, 2).reshape(c, -1)[:, :m]


@functools.partial(jax.jit, static_argnames=("block",))
def _scan_blocks_sq(q, db_blocks, block):
    def body(_, dbb):
        return None, kmer_sq_distance_matrix(q, dbb)
    _, out = jax.lax.scan(body, None, db_blocks)
    return out


def blocked_kmer_sq_distance(q: np.ndarray, db: np.ndarray,
                             block: int = 65536) -> np.ndarray:
    """Host-streaming exact (C, N) distance for large N.

    Pads N to a multiple of ``block`` and scans db blocks through the GEMM;
    returns a host (C, N) float32 array.
    """
    c, l = q.shape
    n = db.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    dbp = np.pad(db, ((0, pad), (0, 0)))
    blocks = dbp.reshape(nb, block, l)
    out = _scan_blocks_sq(jnp.asarray(q), jnp.asarray(blocks), block)
    out = np.asarray(out).transpose(1, 0, 2).reshape(c, nb * block)
    return out[:, :n]
