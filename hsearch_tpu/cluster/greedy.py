"""Greedy center-based k-mer clustering (the practical HSEARCH clusterer).

Reference semantics (hclust2.cpp:86-152; hclust3.cpp is the same algorithm
with recompute-instead-of-cache, which is moot here because the database
stays in integer form):

  state per k-mer: 0 = unprocessed, 1 = center, 2 = absorbed
  for each of hash_L rounds: hash all non-absorbed k-mers with a fresh
  single-table LSH; within each bucket, walk members in order — an
  unprocessed point joins the FIRST candidate center within R (candidate
  list = already-centers in bucket order, then points promoted earlier in
  this bucket's walk); otherwise it is promoted to candidate itself.

Because each point lands in exactly one bucket per round, buckets are
independent within a round: the sequential walk is per-bucket only.  The
TPU mapping is therefore:

  hash     -> fused gather-GEMM + packed codes (lsh/pstable.py)
  bucketing-> host-side grouping of sorted codes (cheap, O(N log N))
  walk     -> "first-fit leader election": a lax.scan over bucket positions
              carrying an availability vector, vmapped over a chunk of
              padded buckets, with the (B, B) in-bucket distance matrix from
              one exact GEMM.

A pure-numpy sequential implementation (``_elect_reference``) encodes the
reference semantics directly and is the parity oracle for the device kernel.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import embedding
from ..lsh import pstable
from ..ops import distance


@dataclasses.dataclass(frozen=True)
class ClusterConfig:
    """Defaults follow hclust2.cpp:185-194."""

    hash_k: int = 16
    hash_l: int = 32
    w: float = 50.0
    radius: float = 200.0
    bucket_max: int = 256     # buckets larger than this are chunked
    bucket_chunk: int = 32    # buckets processed per device call


# ---------------------------------------------------------------------------
# leader election
# ---------------------------------------------------------------------------

def _elect_reference(d: np.ndarray, state: np.ndarray, valid: np.ndarray,
                     radius: float) -> np.ndarray:
    """Sequential in-bucket walk (hclust2.cpp:107-132). Parity oracle.

    d: (B, B) distances; state: (B,) 0/1; valid: (B,) padding mask.
    Returns parent_local: (B,) index of the absorbing member, or -1.
    """
    b = d.shape[0]
    pre = [j for j in range(b) if valid[j] and state[j] == 1]
    promoted: list[int] = []
    parent = np.full(b, -1, np.int64)
    for p in range(b):
        if not valid[p] or state[p] != 0:
            continue
        hit = -1
        for j in pre + promoted:
            if d[p, j] <= radius:
                hit = j
                break
        if hit >= 0:
            parent[p] = hit
        else:
            promoted.append(p)
    return parent


@functools.partial(jax.jit, static_argnames=())
def _elect_device(d: jax.Array, state: jax.Array, valid: jax.Array,
                  radius: jax.Array) -> jax.Array:
    """Batched first-fit leader election.

    d: (NB, B, B) distances, state: (NB, B) 0/1, valid: (NB, B).
    Matching priority = pre-existing centers in bucket order, then promoted
    points in promotion (= bucket) order: key_j = pos_j + B * promoted_j.
    """
    nb, b, _ = d.shape
    pos = jnp.arange(b, dtype=jnp.int32)
    pre = (state == 1) & valid                      # (NB, B)

    def step(avail, p):
        # avail: (NB, B) availability as candidate
        drow = d[:, p, :]                           # (NB, B)
        match = avail & (drow <= radius)
        key = jnp.where(pre, pos[None, :], pos[None, :] + b)
        key = jnp.where(match, key, 2 * b)
        best = jnp.argmin(key, axis=1).astype(jnp.int32)
        any_match = jnp.min(key, axis=1) < 2 * b
        unproc = (state[:, p] == 0) & valid[:, p]
        absorbed = unproc & any_match
        parent_p = jnp.where(absorbed, best, -1)
        promote = unproc & ~any_match
        avail = avail.at[:, p].set(avail[:, p] | promote)
        return avail, parent_p

    avail0 = pre
    _, parents = jax.lax.scan(step, avail0, pos)
    return parents.T                                # (NB, B)


@functools.partial(jax.jit, static_argnames=("kmer_len",))
def _bucket_distances(bucket_kmers: jax.Array, kmer_len: int) -> jax.Array:
    """(NB, B, L) int k-mers -> (NB, B, B) exact distances (not squared)."""
    nb, b, l = bucket_kmers.shape
    coords = jnp.asarray(embedding.COORDINATES, jnp.float32)
    emb = jnp.take(coords, bucket_kmers, axis=0).reshape(nb, b, l * 8)
    d2 = jax.vmap(distance.sq_distance_matrix)(emb, emb)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


# ---------------------------------------------------------------------------
# bucketing (host)
# ---------------------------------------------------------------------------

def _bucket_matrix(codes: np.ndarray, active_ids: np.ndarray,
                   bucket_max: int, n_sentinel: int):
    """Vectorized _make_buckets + _pad_buckets: one (NB, bucket_max)
    sentinel-padded id matrix, no per-group Python loop (which costs
    minutes at millions of points).  Ordering matches the loop version:
    buckets ascend by code, members ascend by id within a bucket."""
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    sid = active_ids[order]
    if len(sid) == 0:
        return (np.empty((0, bucket_max), np.int64),
                np.empty((0, bucket_max), bool))
    grp = np.concatenate([[0], np.cumsum(sc[1:] != sc[:-1])])
    counts = np.bincount(grp)
    keep = counts[grp] >= 2          # singletons cannot absorb anything
    sid, grp = sid[keep], grp[keep]
    if len(sid) == 0:
        return (np.empty((0, bucket_max), np.int64),
                np.empty((0, bucket_max), bool))
    _, grp = np.unique(grp, return_inverse=True)
    counts = np.bincount(grp)
    cap = -(-counts // bucket_max) * bucket_max
    pad_base = np.concatenate([[0], np.cumsum(cap)])
    gstart = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(len(sid)) - gstart[grp]
    flat = np.full(int(pad_base[-1]), n_sentinel, np.int64)
    flat[pad_base[grp] + rank] = sid
    ids = flat.reshape(-1, bucket_max)
    valid = ids < n_sentinel
    rows = valid.sum(axis=1) >= 2    # drop length-1 remainder chunks
    return ids[rows], valid[rows]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ClusterResult:
    parent: np.ndarray    # (N,) absorbing point id, or -1 for cluster heads
    merged: np.ndarray    # (N,) final state 0/1/2

    def clusters(self) -> list[np.ndarray]:
        """Cluster member lists, head first (hclust2.cpp:137-150 order)."""
        n = self.parent.shape[0]
        children: dict[int, list[int]] = {}
        for i, p in enumerate(self.parent):
            if p >= 0:
                children.setdefault(int(p), []).append(i)
        out = []
        for i in range(n):
            if self.merged[i] != 2:
                out.append(np.asarray([i] + children.get(i, []), np.int64))
        return out


def cluster_greedy(kmers: np.ndarray, key: jax.Array,
                   config: ClusterConfig = ClusterConfig(),
                   use_device: bool = True) -> ClusterResult:
    """Run hash_L greedy rounds over the k-mer set."""
    n, l = kmers.shape
    kmers = np.asarray(kmers)
    km_dev = jnp.asarray(kmers, jnp.int32)
    merged = np.zeros(n, np.uint8)
    parent = np.full(n, -1, np.int64)
    keys = jax.random.split(key, config.hash_l)
    for rnd in range(config.hash_l):
        params = pstable.init(keys[rnd], l * embedding.AA_DIM,
                              config.hash_k, 1, config.w)
        codes = np.asarray(pstable.hash_codes(km_dev, params,
                                              is_kmers=True)[0])
        active = merged != 2
        active_ids = np.nonzero(active)[0]
        ids, valid = _bucket_matrix(codes[active], active_ids,
                                    config.bucket_max, n)
        if ids.shape[0] == 0:
            continue
        # pad the chunk dimension too: fixed (chunk, bucket_max) shapes
        nb = ids.shape[0]
        ck = config.bucket_chunk
        npad = (-nb) % ck
        if npad:
            ids = np.concatenate(
                [ids, np.full((npad, config.bucket_max), n, np.int64)])
            valid = np.concatenate(
                [valid, np.zeros((npad, config.bucket_max), bool)])
        if use_device:
            # buckets within a round are disjoint (each point lands in
            # exactly one), so elections are independent: ONE device call
            # scans all bucket chunks and host state updates once per
            # round — no per-chunk round trips
            par = np.asarray(_elect_round(
                km_dev, jnp.asarray(ids, jnp.int32),
                jnp.asarray(valid), jnp.asarray(merged),
                jnp.float32(config.radius), ck))
            # map parent slots back to global ids row-wise
            rows, cols = np.nonzero(par >= 0)
            absorbed = ids[rows, cols]
            absorber = ids[rows, par[rows, cols]]
            parent[absorbed] = absorber
            merged[absorbed] = 2
            merged[absorber] = 1       # "to be the real center" (:122)
        else:
            kmers_pad = np.concatenate([kmers,
                                        np.zeros((1, l), kmers.dtype)])
            for s in range(0, ids.shape[0], ck):
                bids = ids[s:s + ck]
                bval = valid[s:s + ck]
                bk = kmers_pad[bids]
                state = np.where(bval, merged[np.minimum(bids, n - 1)], 2)
                d = np.sqrt(embedding.DISTANCE_SQUARE[
                    bk[:, :, None, :], bk[:, None, :, :]].sum(-1))
                par = np.stack([
                    _elect_reference(d[i], state[i], bval[i], config.radius)
                    for i in range(d.shape[0])])
                for i in range(bids.shape[0]):
                    ssel = par[i] >= 0
                    absorbed = bids[i][ssel]
                    absorber = bids[i][par[i][ssel]]
                    parent[absorbed] = absorber
                    merged[absorbed] = 2
                    merged[absorber] = 1
    return ClusterResult(parent=parent, merged=merged)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _elect_round(km_pad_free, ids, valid, merged, radius, chunk: int):
    """All of a round's bucket elections in one program.

    km_pad_free: (N, L) int32 k-mers (device-resident); ids: (NB, B)
    global ids with sentinel N; merged: (N,) uint8 state.  Scans chunks
    of buckets, gathering k-mers and state on device; returns (NB, B)
    parent slots (or -1).
    """
    n, l = km_pad_free.shape
    km_pad = jnp.concatenate(
        [km_pad_free, jnp.zeros((1, l), jnp.int32)], axis=0)
    state_pad = jnp.concatenate(
        [merged, jnp.full((1,), 2, merged.dtype)], axis=0)
    nb = ids.shape[0]
    ids_c = ids.reshape(nb // chunk, chunk, -1)
    valid_c = valid.reshape(nb // chunk, chunk, -1)

    def body(_, args):
        bids, bval = args
        bk = jnp.take(km_pad, bids, axis=0)              # (ck, B, L)
        state = jnp.where(bval, jnp.take(state_pad, bids, axis=0), 2)
        d = _bucket_distances(bk, l)
        return None, _elect_device(d, state, bval, radius)

    _, par = jax.lax.scan(body, None, (ids_c, valid_c))
    return par.reshape(nb, -1)
