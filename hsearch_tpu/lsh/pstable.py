"""p-stable (Gaussian random projection) LSH over embedded k-mer points.

The scheme of hclust/src/hclust/lsh.hpp:8-69: per table, K Gaussian
projection vectors a_k ~ N(0, I) and offsets b_k ~ U[0, W); the bucket index
of point x along k is floor((a_k . x + b_k) / W); a point's bucket code is
the K-tuple.  The reference concatenates the indices as a *string*
(lsh.hpp:51-59) and seeds from random_device per instance (lsh.hpp:19-20);
here codes are packed int32 (ops/segment.py; TPU lanes are 32-bit) and parameters come from a jax
PRNG key, so runs are reproducible.

Projections of all N points are one (N, D) @ (D, T*K) GEMM.  For integer
k-mer databases the GEMM contracts the 20-way one-hot directly against a
pre-folded (L*20, T*K) table — the embedding never materializes (the
"fused embed+project" path).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core import embedding
from ..ops import segment


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PStableParams:
    a: jax.Array          # (T, D, K) f32 projection vectors
    b: jax.Array          # (T, K) f32 offsets in [0, W)
    w: float = dataclasses.field(metadata=dict(static=True))
    pack_bits: int = dataclasses.field(metadata=dict(static=True), default=7)

    @property
    def num_tables(self) -> int:
        return self.a.shape[0]

    @property
    def dim(self) -> int:
        return self.a.shape[1]

    @property
    def hash_k(self) -> int:
        return self.a.shape[2]


def init(key: jax.Array, dim: int, hash_k: int = 4, hash_l: int = 4,
         w: float = 50.0) -> PStableParams:
    """Draw LSH parameters (lsh.hpp:19-31) for hash_l tables."""
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (hash_l, dim, hash_k), dtype=jnp.float32)
    b = jax.random.uniform(kb, (hash_l, hash_k), dtype=jnp.float32,
                           minval=0.0, maxval=w)
    return PStableParams(a=a, b=b, w=float(w))


@jax.jit
def bucket_indices(points: jax.Array, params: PStableParams) -> jax.Array:
    """(N, D) points -> (T, N, K) int32 bucket indices.

    floor((a.x + b)/W), per lsh.hpp:44-49; all tables in one GEMM
    (shared with the fused and multiprobe paths via _projections).
    """
    proj = _projections(points, params, is_kmers=False)
    return jnp.floor(proj / params.w).astype(jnp.int32).transpose(1, 0, 2)


def _folded_kmer_table(params: PStableParams, kmer_len: int) -> jax.Array:
    """Fold AA coordinates into the projections: (L*20, T*K).

    F[l*20 + aa, tk] = coords[aa] . a[t, l*8:(l+1)*8, k] — so that
    projection(kmer) = sum_l F[l*20 + kmer_l]  (one gather-sum, no embed).
    """
    t, d, k = params.a.shape
    ad = embedding.AA_DIM
    assert d == kmer_len * ad, (d, kmer_len, ad)
    coords = jnp.asarray(embedding.COORDINATES, jnp.float32)  # (20, 8)
    a = params.a.reshape(t, kmer_len, ad, k)                  # (T, L, 8, K)
    f = jnp.einsum("ca,tlak->ltck", coords, a,
                   preferred_element_type=jnp.float32)        # (L,T,20,K)
    return f


@jax.jit
def bucket_indices_kmers(kmers: jax.Array,
                         params: PStableParams) -> jax.Array:
    """(N, L) int k-mers -> (T, N, K) int32 bucket indices, fused embed+project.

    Equals bucket_indices(embed_kmers(kmers), params) without the (N, 8L)
    intermediate: per position, gather the pre-folded projection row.
    Rows scan in 65536-row blocks: the unchunked per-position gather
    accumulation compiled to ~100 GB of HBM buffers at 2^20 rows with
    T*K=64 (XLA materializes the L gathered operands together); the
    per-row math — and therefore every code — is unchanged.
    """
    n, l = kmers.shape
    t, d, k = params.a.shape
    f = _folded_kmer_table(params, l)                     # (L, T, 20, K)
    fl = f.transpose(0, 2, 1, 3).reshape(l, 20, t * k)
    block = 65536
    pad = (-n) % block
    kmp = jnp.pad(kmers.astype(jnp.int32), ((0, pad), (0, 0)))
    blocks = kmp.reshape(-1, block, l)

    def body(_, blk):
        proj = jnp.zeros((block, t * k), jnp.float32)
        for pos in range(l):
            proj = proj + jnp.take(fl[pos], blk[:, pos], axis=0)
        proj = proj.reshape(block, t, k) + params.b[None, :, :]
        return None, jnp.floor(proj / params.w).astype(jnp.int32)

    _, idx = jax.lax.scan(body, None, blocks)
    return idx.reshape(-1, t, k)[:n].transpose(1, 0, 2)


def hash_codes(points_or_kmers: jax.Array, params: PStableParams,
               is_kmers: bool) -> jax.Array:
    """-> (T, N) packed int32 bucket codes."""
    if is_kmers:
        idx = bucket_indices_kmers(points_or_kmers, params)
    else:
        idx = bucket_indices(points_or_kmers, params)
    return segment.pack_codes(idx, params.pack_bits)


def _projections(points_or_kmers: jax.Array, params: PStableParams,
                 is_kmers: bool) -> jax.Array:
    """Raw (N, T, K) projection values (a.x + b), shared by single-probe
    and multiprobe hashing."""
    t, d, k = params.a.shape
    if is_kmers:
        n, l = points_or_kmers.shape
        f = _folded_kmer_table(params, l)                     # (L, T, 20, K)
        fl = f.transpose(0, 2, 1, 3).reshape(l, 20, t * k)
        km = points_or_kmers.astype(jnp.int32)
        proj = jnp.zeros((n, t * k), jnp.float32)
        for pos in range(l):
            proj = proj + jnp.take(fl[pos], km[:, pos], axis=0)
    else:
        aflat = params.a.transpose(1, 0, 2).reshape(d, t * k)
        proj = jnp.dot(jnp.asarray(points_or_kmers, jnp.float32), aflat,
                       preferred_element_type=jnp.float32)
    return proj.reshape(-1, t, k) + params.b[None, :, :]


@functools.partial(jax.jit, static_argnames=("is_kmers", "num_probes"))
def multiprobe_codes(queries: jax.Array, params: PStableParams,
                     is_kmers: bool, num_probes: int) -> jax.Array:
    """Query-directed multiprobe: (C, ...) queries -> (T, C, P) packed codes.

    Probe 0 is the home bucket; probes 1..P-1 flip, one at a time, the hash
    dimensions whose projection lies closest to a bucket boundary (toward
    that boundary) — the perturbation most likely to hold a near neighbor
    (Lv et al., multi-probe LSH).  Narrow-W tables keep buckets (and the
    verify bill) small; the extra probes recover the recall that W bought
    in the single-probe scheme.  No reference equivalent: the reference
    compensates with more tables (hash_L, motif_both_points.cpp:206-218).
    """
    k_dims = params.a.shape[2]
    if num_probes > (1 << k_dims):
        import warnings
        warnings.warn(
            f"multiprobe can generate at most 2^K={1 << k_dims} probes "
            f"for hash_k={k_dims}; requested {num_probes}, using "
            f"{1 << k_dims}")
    scaled = _projections(queries, params, is_kmers) / params.w  # (C, T, K)
    base = jnp.floor(scaled)
    frac = scaled - base                       # in [0, 1)
    base = base.astype(jnp.int32)
    # distance to nearest boundary and its direction per hash dim
    up = frac > 0.5
    delta = jnp.where(up, 1.0 - frac, frac)    # (C, T, K)
    step = jnp.where(up, 1, -1).astype(jnp.int32)
    k = base.shape[-1]
    # subset expansion: flip every subset of the J closest-to-boundary dims
    # (probe j's set bits select which of those dims flip); J chosen so the
    # 2^J subsets cover num_probes
    j_dims = 0
    while (1 << j_dims) < num_probes and j_dims < k:
        j_dims += 1
    order = jnp.argsort(delta, axis=-1)        # (C, T, K) ascending
    flips = []
    for j in range(j_dims):
        dim = order[..., j:j + 1]              # (C, T, 1)
        stepj = jnp.take_along_axis(step, dim, axis=-1)
        bump = jnp.zeros_like(base)
        bump = jnp.put_along_axis(bump, dim, stepj, axis=-1, inplace=False)
        flips.append(bump)
    codes = []
    for pid in range(min(num_probes, 1 << j_dims)):
        b = base
        for j in range(j_dims):
            if pid & (1 << j):
                b = b + flips[j]
        codes.append(segment.pack_codes(b, params.pack_bits))
    out = jnp.stack(codes, axis=-1)            # (C, T, P)
    return out.transpose(1, 0, 2)              # (T, C, P)
