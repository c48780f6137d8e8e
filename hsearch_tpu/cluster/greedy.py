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
    bucket_chunk: int = 32    # widest-class buckets per scan step
    slab_elems: int = 1 << 20  # id slots per device dispatch


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

def _class_sizes(bucket_max: int) -> tuple[int, ...]:
    """Pow-4 bucket-width ladder up to bucket_max, e.g. (4, 16, 64, 256)."""
    cs = []
    c = 4
    while c < bucket_max:
        cs.append(c)
        c *= 4
    cs.append(bucket_max)
    return tuple(cs)


def _bucket_class_matrices(codes: np.ndarray, active_ids: np.ndarray,
                           bucket_max: int, n_sentinel: int):
    """Group active ids into per-bucket rows, padded to the nearest size
    class instead of uniformly to bucket_max.

    Returns [(ids int32 (NB_c, C), valid bool)] per size class C.
    Uniform padding is catastrophic at scale: measured at 2^23 IGC
    k-mers, round 0 has 1.10M buckets totalling 5.6M members, half of
    size 2 — a uniform (NB, 256) matrix is 283M slots (2% occupancy,
    GBs on device, a 1.1GB parent readback that crashed the TPU
    worker).  Class padding bounds the overhead at <4x the member
    count.  Ordering matches the reference walk (hclust2.cpp:107-132):
    buckets ascend by code, members ascend by id within a bucket;
    buckets larger than bucket_max are chunked into full rows plus a
    remainder row (rows with <2 members are dropped — nothing to
    absorb)."""
    empty: list = []
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    sid = active_ids[order]
    if len(sid) == 0:
        return empty
    grp = np.concatenate([[0], np.cumsum(sc[1:] != sc[:-1])])
    counts = np.bincount(grp)
    keep = counts[grp] >= 2          # singletons cannot absorb anything
    sid, grp = sid[keep], grp[keep]
    if len(sid) == 0:
        return empty
    _, grp = np.unique(grp, return_inverse=True)
    counts = np.bincount(grp)
    gstart = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(len(sid)) - gstart[grp]
    classes = np.asarray(_class_sizes(bucket_max))
    full_rows = counts // bucket_max
    rem = counts - full_rows * bucket_max
    in_full = rank < full_rows[grp] * bucket_max
    has_rem = rem >= 2
    cls = np.zeros(len(counts), np.int64)
    cls[has_rem] = classes[np.searchsorted(classes, rem[has_rem])]
    out = []
    for c in classes:
        is_widest = c == bucket_max
        rbuck = np.nonzero(has_rem & (cls == c))[0]
        nfull = int(full_rows.sum()) if is_widest else 0
        nrows = nfull + len(rbuck)
        if nrows == 0:
            continue
        ids = np.full((nrows, c), n_sentinel, np.int32)
        if nfull:
            m = in_full
            row_base = np.concatenate([[0], np.cumsum(full_rows)])
            ids[row_base[grp[m]] + rank[m] // c, rank[m] % c] = sid[m]
        if len(rbuck):
            row_of = np.full(len(counts), -1)
            row_of[rbuck] = nfull + np.arange(len(rbuck))
            m = (~in_full) & (cls[grp] == c)
            ids[row_of[grp[m]],
                rank[m] - full_rows[grp[m]] * bucket_max] = sid[m]
        out.append((ids, ids < n_sentinel))
    return out


def _class_caps(n: int, bucket_max: int) -> tuple[int, ...]:
    """Static worst-case row capacity per size class for N active points.

    A class-c remainder row holds a bucket remainder in (c/4, c] (>= 2
    for c = 4), so at most n // (c//4 + 1) such buckets exist; the
    widest class additionally holds sum(size // bucket_max) <= n //
    bucket_max full rows.  These bounds make the device-resident class
    arenas' shapes static — the actual row counts are the ONLY scalars
    the per-round device bucketization sends to host."""
    caps = []
    for c in _class_sizes(bucket_max):
        lo = max(c // 4, 1)              # smallest remainder in class c
        rows = n // (lo + 1) + 1
        if c == bucket_max:
            rows += n // bucket_max + 1  # oversize-bucket full rows
        # next power of two: _slab_geometry's quantized slabs then always
        # fit inside the arena (s_rows <= 2^ceil(log2(nrows)) <= cap)
        caps.append(1 << max(rows - 1, 1).bit_length())
    return tuple(caps)


@functools.partial(jax.jit,
                   static_argnames=("bucket_max", "caps"))
def _bucketize_device(codes: jax.Array, active: jax.Array,
                      bucket_max: int, caps: tuple):
    """Device twin of `_bucket_class_matrices`: size-classed bucket
    arenas built entirely on device.

    codes: (N,) int32 round hashes; active: (N,) bool (merged != 2).
    Returns ([(CAP_c, c) int32 arenas with sentinel N], (n_classes,)
    int32 real row counts).  Layout is identical to the host builder:
    buckets ascend by code, members ascend by id, oversize buckets
    chunk into full bucket_max-wide rows (all classes' full rows first
    in the widest arena) plus a >= 2-member remainder row in its size
    class.  Nothing but the row-count vector needs to leave the device
    — the host version shipped the (N,) codes down and the padded id
    matrices back up every round (~0.5 GB/round at 2^23 over the
    remote link)."""
    n = codes.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    inact = jnp.where(active, 0, 1).astype(jnp.int32)
    _, _, sid = jax.lax.sort((inact, codes, iota), num_keys=2)
    sa = jnp.take(active, sid)
    sc = jnp.take(codes, sid)
    first = sa & jnp.concatenate(
        [jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    bucket_id = jnp.maximum(jnp.cumsum(first.astype(jnp.int32)) - 1, 0)
    sizes = jax.ops.segment_sum(sa.astype(jnp.int32), bucket_id,
                                num_segments=n)
    size_of = jnp.take(sizes, bucket_id)
    start = jax.lax.cummax(jnp.where(first, iota, 0))
    rank = iota - start
    member = sa & (size_of >= 2)
    full_rows_of = size_of // bucket_max
    in_full = member & (rank < full_rows_of * bucket_max)
    rem_of = size_of - full_rows_of * bucket_max
    rem_rank = rank - full_rows_of * bucket_max
    classes = _class_sizes(bucket_max)
    cls_arr = jnp.asarray(classes, jnp.int32)
    cls_of = jnp.take(cls_arr,
                      jnp.searchsorted(cls_arr, rem_of.astype(jnp.int32)))
    has_rem = rem_of >= 2
    # per-bucket exclusive cumsums, read at each member's bucket start
    fr_first = jnp.where(first, full_rows_of, 0)
    fr_base = jnp.take(jnp.cumsum(fr_first) - fr_first, start)
    nfull = jnp.sum(fr_first)
    arenas, rows = [], []
    for ci, c in enumerate(classes):
        is_rem_c = member & ~in_full & has_rem & (cls_of == c)
        rb_first = jnp.where(first & has_rem & (cls_of == c), 1, 0)
        rem_base = jnp.take(jnp.cumsum(rb_first) - rb_first, start)
        n_rem_rows = jnp.sum(rb_first)
        cap = caps[ci]
        if c == bucket_max:
            row = jnp.where(in_full, fr_base + rank // bucket_max,
                            nfull + rem_base)
            col = jnp.where(in_full, rank % bucket_max, rem_rank)
            sel = in_full | is_rem_c
            n_rows = nfull + n_rem_rows
        else:
            row, col, sel = rem_base, rem_rank, is_rem_c
            n_rows = n_rem_rows
        flat = jnp.where(sel, row * c + col, cap * c)
        arena = jnp.full((cap * c,), n, jnp.int32)
        arena = arena.at[flat].set(sid, mode="drop")
        arenas.append(arena.reshape(cap, c))
        rows.append(n_rows.astype(jnp.int32))
    return arenas, jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("chunk", "s_rows"))
def _elect_apply_slab(km_pad: jax.Array, arena: jax.Array, start,
                      state_pad: jax.Array, parent_pad: jax.Array,
                      merged_pad: jax.Array, radius,
                      chunk: int, s_rows: int):
    """One slab of a fully device-resident round: slice s_rows bucket
    rows out of the class arena (traced start — one program per shape,
    not per offset), run the leader election against the round-start
    state, and fold the result into the (N+1,)-padded parent /
    next-state vectors (slot N absorbs sentinel writes; buckets are
    disjoint within a round, so slab updates never collide).  Nothing
    crosses to host — slabs chain asynchronously on device.

    km_pad: (N+1, L) k-mers with a zero sentinel row; state_pad:
    (N+1,) round-start state snapshot with state_pad[N] == 2.  Both
    are built ONCE by the caller (km_pad per run, state_pad per
    round) — building them here re-materialized an O(N*L) HBM copy
    on every slab dispatch."""
    n, l = km_pad.shape[0] - 1, km_pad.shape[1]
    c = arena.shape[1]
    bids = jax.lax.dynamic_slice(arena, (start, 0), (s_rows, c))
    bval = bids < n
    ids_c = bids.reshape(s_rows // chunk, chunk, c)
    val_c = bval.reshape(s_rows // chunk, chunk, c)

    def body(_, args):
        cb, cv = args
        bk = jnp.take(km_pad, cb, axis=0)
        state = jnp.where(cv, jnp.take(state_pad, cb, axis=0), 2)
        d = _bucket_distances(bk, l)
        return None, _elect_device(d, state, cv, radius)

    _, par = jax.lax.scan(body, None, (ids_c, val_c))
    par = par.reshape(s_rows, c)
    valid = par >= 0
    absorber = jnp.take_along_axis(bids, jnp.maximum(par, 0), axis=1)
    absorbed = jnp.where(valid, bids, n).reshape(-1)
    absorber = jnp.where(valid, absorber, n).reshape(-1)
    parent_pad = parent_pad.at[absorbed].set(absorber)
    merged_pad = merged_pad.at[absorbed].set(2)
    merged_pad = merged_pad.at[absorber].set(1)
    return parent_pad, merged_pad


def _slab_geometry(c: int, nrows: int, config: ClusterConfig):
    """Scan chunk + slab row count for bucket width c: constant
    (chunk, c, c) distance-matrix memory across classes, chunk and slab
    quantized to powers of two so jit shapes stay bounded (~log^2 many)
    while a sparse class costs only ~2x its real rows, not a full
    slab of sentinel padding."""
    ck = config.bucket_chunk * (config.bucket_max // c) ** 2
    # round ck UP to a power of two: slab sizes are then always powers
    # of two (or ck-multiples below one), so they never exceed the
    # next-pow2 arena caps of _class_caps — a non-pow2 bucket_max
    # (e.g. 100) otherwise yields ck values whose slabs overshoot the
    # arena and fail the dynamic_slice at trace time
    ck = 1 << max(ck - 1, 1).bit_length()
    ck = min(ck, 1 << max(0, (max(nrows, 1) - 1).bit_length()))
    s_full = ck * max(1, config.slab_elems // (ck * c))
    units = -(-nrows // ck)
    s = ck * min(s_full // ck, 1 << max(0, (units - 1).bit_length()))
    return ck, max(s, ck)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ClusterResult:
    parent: np.ndarray    # (N,) absorbing point id, or -1 for cluster heads
    merged: np.ndarray    # (N,) final state 0/1/2

    def clusters(self) -> list[np.ndarray]:
        """Cluster member lists, head first (hclust2.cpp:137-150 order)."""
        heads = np.nonzero(self.merged != 2)[0]
        child = np.nonzero(self.parent >= 0)[0]
        par = self.parent[child]
        order = np.argsort(par, kind="stable")   # ids ascend within head
        child, par = child[order], par[order]
        pieces = np.split(child, np.searchsorted(par, heads[1:]))
        return [np.concatenate([[h], c]) if len(c) else
                np.asarray([h], np.int64)
                for h, c in zip(heads, pieces)]


def cluster_greedy(kmers: np.ndarray, key: jax.Array,
                   config: ClusterConfig = ClusterConfig(),
                   use_device: bool = True,
                   host_bucketize: bool | None = None) -> ClusterResult:
    """Run hash_L greedy rounds over the k-mer set.

    On an accelerator every round stays on device end-to-end (hash ->
    bucketize -> elect -> parent/state update); the only per-round
    host traffic is the per-class row-count vector (the host-grouping
    path shipped ~0.5 GB/round at 2^23 over the remote link).
    host_bucketize=None resolves by backend: the host grouping wins on
    the cpu backend, where there are no transfers to save and numpy's
    argsort beats lax.sort (measured 4.2 s vs 9.4 s at 2^18) — it is
    also the device path's parity oracle at scale.
    """
    if host_bucketize is None:
        host_bucketize = jax.default_backend() == "cpu"
    if use_device and not host_bucketize:
        return _cluster_greedy_device(kmers, key, config)
    n, l = kmers.shape
    kmers = np.asarray(kmers)
    km_dev = jnp.asarray(kmers, jnp.int32)
    km_pad_dev = jnp.concatenate([km_dev, jnp.zeros((1, l), jnp.int32)]) \
        if use_device else None
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
        mats = _bucket_class_matrices(codes[active], active_ids,
                                      config.bucket_max, n)
        if not mats:
            continue
        if use_device:
            # buckets within a round are disjoint (each point lands in
            # exactly one), so elections are independent and the round-
            # start state snapshot is exact for every bucket.  Dispatch
            # every slab of every size class first, then harvest — the
            # transfers overlap the remaining compute.
            state_pad_dev = jnp.concatenate(
                [jnp.asarray(merged), jnp.full((1,), 2, jnp.uint8)])
            pending = []
            for ids, valid in mats:
                c = ids.shape[1]
                ck, s_rows = _slab_geometry(c, ids.shape[0], config)
                for s in range(0, ids.shape[0], s_rows):
                    bids = ids[s:s + s_rows]
                    bval = valid[s:s + s_rows]
                    npad = s_rows - bids.shape[0]
                    if npad > 0:
                        bids = np.concatenate(
                            [bids, np.full((npad, c), n, np.int32)])
                        bval = np.concatenate(
                            [bval, np.zeros((npad, c), bool)])
                    par_dev = _elect_round(
                        km_pad_dev, jnp.asarray(bids), jnp.asarray(bval),
                        state_pad_dev, jnp.float32(config.radius), ck)
                    pending.append((bids, par_dev))
            for bids, par_dev in pending:
                par = np.asarray(par_dev)
                # map parent slots back to global ids row-wise
                rows, cols = np.nonzero(par >= 0)
                absorbed = bids[rows, cols]
                absorber = bids[rows, par[rows, cols]]
                parent[absorbed] = absorber
                merged[absorbed] = 2
                merged[absorber] = 1   # "to be the real center" (:122)
        else:
            kmers_pad = np.concatenate([kmers,
                                        np.zeros((1, l), kmers.dtype)])
            state0 = merged.copy()     # round-start snapshot
            for ids, valid in mats:
                for i in range(ids.shape[0]):
                    bids = ids[i]
                    bval = valid[i]
                    bk = kmers_pad[bids]
                    state = np.where(bval,
                                     state0[np.minimum(bids, n - 1)], 2)
                    d = np.sqrt(embedding.DISTANCE_SQUARE[
                        bk[:, None, :], bk[None, :, :]].sum(-1))
                    par = _elect_reference(d, state, bval, config.radius)
                    ssel = par >= 0
                    absorbed = bids[ssel]
                    absorber = bids[par[ssel]]
                    parent[absorbed] = absorber
                    merged[absorbed] = 2
                    merged[absorber] = 1
    return ClusterResult(parent=parent, merged=merged)


def _cluster_greedy_device(kmers: np.ndarray, key: jax.Array,
                           config: ClusterConfig) -> ClusterResult:
    """Fully device-resident greedy rounds.

    Per round: hash codes, size-classed bucket arenas, elections, and
    parent/state updates all run on device; host reads ONE
    (n_classes,) row-count vector to drive the slab dispatch loop.
    The round-2 host path shipped the (N,) codes down and the padded
    id matrices back up every round — ~0.5 GB/round at 2^23 over the
    ~10 MB/s remote link, which dominated the measured 130 s warm
    wall.  parent/merged leave the device once, at the end.
    """
    n, l = kmers.shape
    km_dev = jnp.asarray(np.asarray(kmers), jnp.int32)
    km_pad = jnp.concatenate([km_dev, jnp.zeros((1, l), jnp.int32)])
    caps = _class_caps(n, config.bucket_max)
    classes = _class_sizes(config.bucket_max)
    parent_pad = jnp.full((n + 1,), -1, jnp.int32)
    merged_pad = jnp.zeros((n + 1,), jnp.uint8)
    keys = jax.random.split(key, config.hash_l)
    radius = jnp.float32(config.radius)
    for rnd in range(config.hash_l):
        params = pstable.init(keys[rnd], l * embedding.AA_DIM,
                              config.hash_k, 1, config.w)
        codes = pstable.hash_codes(km_dev, params, is_kmers=True)[0]
        snapshot = merged_pad[:n]          # round-start state, immutable
        # slot N pinned to 2: sentinel gathers read "merged" (slab
        # writes may have left junk there)
        state_pad = merged_pad.at[n].set(2)
        arenas, rows_dev = _bucketize_device(codes, snapshot != 2,
                                             config.bucket_max, caps)
        rows = np.asarray(rows_dev)        # the round's only d2h
        for ci, c in enumerate(classes):
            nrows = int(rows[ci])
            if nrows == 0:
                continue
            ck, s_rows = _slab_geometry(c, nrows, config)
            for s in range(0, nrows, s_rows):
                # dynamic_slice clamps the final start into bounds; the
                # overlap re-elects earlier rows against the same
                # snapshot — identical parents, idempotent writes
                parent_pad, merged_pad = _elect_apply_slab(
                    km_pad, arenas[ci], jnp.int32(s), state_pad,
                    parent_pad, merged_pad, radius,
                    chunk=ck, s_rows=s_rows)
    parent = np.asarray(parent_pad[:n]).astype(np.int64)
    merged = np.asarray(merged_pad[:n])
    return ClusterResult(parent=parent, merged=merged)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _elect_round(km_pad, ids, valid, state_pad, radius, chunk: int):
    """All of a round's bucket elections in one program.

    km_pad: (N+1, L) int32 k-mers with a zero sentinel row (built once
    per run by the caller — building it here re-copied O(N*L) HBM per
    slab call); ids: (NB, B) global ids with sentinel N; state_pad:
    (N+1,) uint8 state with state_pad[N] == 2.  Scans chunks of
    buckets, gathering k-mers and state on device; returns (NB, B)
    parent slots (or -1).
    """
    l = km_pad.shape[1]
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
    # parent slots are < B, so the readback fits a small int (the d2h
    # link runs ~10MB/s; at IGC scale this is the per-round cost)
    dt = jnp.int8 if ids.shape[1] <= 127 else jnp.int16
    return par.reshape(nb, -1).astype(dt)
