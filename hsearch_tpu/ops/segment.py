"""Sort-based hash tables: the TPU replacement for pointer hash maps.

The reference keeps LSH tables as ``unordered_map<string, vector<id>>``
(motif_both_points.cpp:25, lsh.hpp:51-59).  On TPU a "hash table" is:

    codes   (T, N) int32   packed bucket code per point per table
    perm    (T, N) int32   argsort of each table's codes
    sorted  (T, N) int32   codes[perm]

Bucket membership queries become ``searchsorted`` pairs and contiguous
gathers from ``perm`` — fully vectorized, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# 32-bit odd mixing multiplier (golden-ratio; TPU lanes are 32-bit, and
# the default JAX config truncates explicit int64 to int32 — all packing
# is therefore honestly 32-bit).
_MIX_MULT = np.int32(-1640531527)   # 0x9E3779B9
_MIX_XOR = np.int32(0x45D9F3B)


def pack_codes_exact(buckets: jax.Array, bits: int = 7) -> jax.Array:
    """(..., K) int32 bucket indices -> (...,) int32, exact for K*bits <= 31.

    Replaces the reference's string-concatenation hash key (lsh.hpp:51-59)
    with a collision-free fixed-width packing.  Bucket indices are clipped
    to the signed ``bits`` range (with W=50 projections span ~±10 buckets;
    the clip is pure safety).
    """
    k = buckets.shape[-1]
    if k * bits > 31:
        raise ValueError(f"K={k} x {bits}-bit indices do not fit 31 bits; "
                         "use pack_codes_mixed")
    lim = 1 << (bits - 1)
    b = jnp.clip(buckets, -lim, lim - 1).astype(jnp.int32) + lim
    out = jnp.zeros(buckets.shape[:-1], jnp.int32)
    for i in range(k):
        out = (out << bits) | b[..., i]
    return out


def pack_codes_mixed(buckets: jax.Array) -> jax.Array:
    """(..., K) int32 -> (...,) int32 mixing hash (for K*bits > 31).

    Collisions merge buckets, which only adds verification candidates —
    never drops a true near neighbor (exactness comes from the verify
    pass, and multiprobe neighbors hash through the same function).
    """
    h = jnp.full(buckets.shape[:-1], jnp.int32(0x12345678))
    for i in range(buckets.shape[-1]):
        h = h * _MIX_MULT + buckets[..., i].astype(jnp.int32)
        h = h ^ ((h >> 15) & 0x1FFFF) ^ _MIX_XOR
    return h


def pack_codes(buckets: jax.Array, bits: int = 7) -> jax.Array:
    if buckets.shape[-1] * bits <= 31:
        return pack_codes_exact(buckets, bits)
    return pack_codes_mixed(buckets)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SortedTables:
    """Multi-table sorted-code index over N points."""

    sorted_codes: jax.Array   # (T, N) int32
    perm: jax.Array           # (T, N) int32

    @property
    def num_tables(self) -> int:
        return self.sorted_codes.shape[0]

    @property
    def num_points(self) -> int:
        return self.sorted_codes.shape[1]


@jax.jit
def build_tables(codes: jax.Array) -> SortedTables:
    """(T, N) packed codes -> SortedTables (one argsort per table)."""
    perm = jnp.argsort(codes, axis=1).astype(jnp.int32)
    sorted_codes = jnp.take_along_axis(codes, perm, axis=1)
    return SortedTables(sorted_codes=sorted_codes, perm=perm)


@jax.jit
def probe(tables: SortedTables, qcodes: jax.Array):
    """(C, T) or (C, T, P) query codes -> (start, count) of the same shape.

    start/count delimit each query's bucket in each table's perm row; a
    trailing P axis holds multiprobe variants of the same query.
    """
    def one(sc, qc):  # sc: (N,), qc: (C,) or (C, P)
        lo = jnp.searchsorted(sc, qc, side="left")
        hi = jnp.searchsorted(sc, qc, side="right")
        return lo.astype(jnp.int32), (hi - lo).astype(jnp.int32)

    lo, cnt = jax.vmap(one, in_axes=(0, 1), out_axes=1)(
        tables.sorted_codes, qcodes)
    return lo, cnt


@functools.partial(jax.jit, static_argnames=("cand_max",))
def gather_candidates(tables: SortedTables, start: jax.Array,
                      count: jax.Array, cand_max: int):
    """Gather up to cand_max point ids per (query, table[, probe]).

    start/count: (C, T) or (C, T, P).  Returns ids (C, T[*P]*cand_max)
    int32 with invalid slots set to N (a sentinel one past the last
    point), suitable for padded downstream gathers.
    """
    c, t = start.shape[0], start.shape[1]
    n = tables.num_points
    offs = jnp.arange(cand_max, dtype=jnp.int32)                  # (M,)
    pos = start[..., None] + offs                                 # (C, T[, P], M)
    valid = offs < count[..., None]
    pos = jnp.where(valid, pos, 0)
    # perm is (T, N); gather along N for each table.
    ids = jax.vmap(lambda p, idx: p[idx], in_axes=(0, 1), out_axes=1)(
        tables.perm, pos)                                         # (C, T[, P], M)
    ids = jnp.where(valid, ids, n)
    return ids.reshape(c, -1)


@functools.partial(jax.jit, static_argnames=("sentinel",))
def dedup_sorted(ids: jax.Array, sentinel: int) -> jax.Array:
    """Sort each row and sentinel-out duplicates (keeps first occurrence).

    Implements the reference's per-center ``label[]`` dedup
    (motif_both_points.cpp:225-238) as a sort + neighbor-equality mask.
    Invalid entries must already equal ``sentinel`` (which sorts last).
    """
    s = jnp.sort(ids, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((s.shape[0], 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
    return jnp.where(dup, sentinel, s)


@jax.jit
def max_bucket_size_device(sorted_codes: jax.Array) -> jax.Array:
    """Largest bucket (max equal-run length) of (T, N) SORTED codes.

    Device-side twin of ``max_bucket_size`` for sharded builds, where the
    per-shard tables are not host-addressable (multi-host runs own only
    their local shards).
    """
    t, n = sorted_codes.shape
    pos = jnp.arange(n, dtype=jnp.int32)
    newb = jnp.concatenate(
        [jnp.ones((t, 1), bool), sorted_codes[:, 1:] != sorted_codes[:, :-1]],
        axis=1)
    start = jnp.where(newb, pos[None, :], 0)
    start = jax.lax.cummax(start, axis=1)
    return jnp.max(pos[None, :] - start + 1).astype(jnp.int32)


def max_bucket_size(codes: np.ndarray) -> int:
    """Largest bucket across all tables (host-side, for static cand_max)."""
    best = 1
    if codes.size == 0:
        return best
    for t in range(codes.shape[0]):
        _, counts = np.unique(np.asarray(codes[t]), return_counts=True)
        best = max(best, int(counts.max()))
    return best
