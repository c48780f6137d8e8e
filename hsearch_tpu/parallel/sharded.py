"""Database-sharded LSH motif search over a (data, db) device mesh.

The scaling design the reference lacks (SURVEY §2.7, §5 "distributed
communication backend: none"): the (N, L) k-mer database and its LSH tables
are partitioned along N over the ``db`` mesh axis; each device owns an
independent sub-index (hash + argsort are shard-local, no communication at
build).  Query centers are data-parallel over the ``data`` axis.  A probe
touches only shard-local tables; the only collective is one
``all_gather`` of fixed-size verified-hit blocks along ``db`` — verified
hits are tiny (ids + distances), so the merge rides ICI cheaply, never raw
buckets (SURVEY §7 "multi-host LSH build").

Semantics match the single-device engine exactly: union over shards of
per-shard LSH-probe + exact-verify equals the single index's result when
per-shard tables use the same projections (hit sets are verified exact, so
sharding only re-partitions which candidates each table surfaces;
tests/test_parallel.py asserts shard-merged == single-host).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import embedding
from ..lsh import pstable
from ..ops import compact, distance, segment
from ..search import motif
from . import mesh as mesh_lib

DATA, DB = mesh_lib.DATA_AXIS, mesh_lib.DB_AXIS


@dataclasses.dataclass
class ShardedMotifIndex:
    """Per-shard LSH sub-indexes over a device mesh.

    ``perm`` holds *local* point ids (0..n_local-1 per shard); they are
    globalized inside the search step via the shard's ``db`` axis index.
    """

    mesh: jax.sharding.Mesh
    params: pstable.PStableParams     # replicated
    sorted_codes: jax.Array           # (T, N) int32, sharded P(None, db)
    perm: jax.Array                   # (T, N) int32 local ids, P(None, db)
    db_kmers: jax.Array               # (N, L) int32, sharded P(db, None)
    cand_max: int
    n_points: int                     # true (unpadded) database size
    max_hits: int = 256               # per-shard hit cap before the merge
    probes: int = 1                   # multiprobe fan-out (as single-host)
    _steps: dict = dataclasses.field(default_factory=dict, repr=False)

    @property
    def n_local(self) -> int:
        return self.db_kmers.shape[0] // self.mesh.shape[DB]

    @property
    def kmer_len(self) -> int:
        return self.db_kmers.shape[1]


def build_index(db_kmers: np.ndarray, key: jax.Array,
                mesh: jax.sharding.Mesh,
                config: motif.MotifSearchConfig = motif.MotifSearchConfig(),
                cand_max: int | None = None) -> ShardedMotifIndex:
    """Shard the database over ``db`` and build per-shard sorted tables."""
    n = db_kmers.shape[0]
    ndb = mesh.shape[DB]
    padded, _ = mesh_lib.pad_to_multiple(
        np.asarray(db_kmers, np.int32), ndb, axis=0, fill=0)
    km = jax.device_put(padded, NamedSharding(mesh, P(DB, None)))
    return build_index_from_global(km, n, key, mesh, config, cand_max)


def build_index_from_global(km: jax.Array, n_points: int, key: jax.Array,
                            mesh: jax.sharding.Mesh,
                            config: motif.MotifSearchConfig
                            = motif.MotifSearchConfig(),
                            cand_max: int | None = None,
                            reduce_max=None) -> ShardedMotifIndex:
    """Per-shard table build over an ALREADY-PLACED (N_pad, L) P(db)
    array — the entry point shared by the single-process path and the
    multi-host runtime (parallel/multihost.py), where ``km`` comes from
    per-process local rows and no host ever sees the whole database.

    reduce_max: optional callable(int) -> int folding a host-local
    maximum across processes (multi-host passes a process_allgather
    max; None = identity).
    """
    l = km.shape[1]
    params = pstable.init(key, l * embedding.AA_DIM, config.hash_k,
                          config.hash_l, config.w)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DB, None), P(), P()),
        out_specs=(P(None, DB), P(None, DB), P(DB)))
    def _build(local_km, a, b):
        p = dataclasses.replace(params, a=a, b=b)
        codes = pstable.hash_codes(local_km, p, is_kmers=True)   # (T, nloc)
        tabs = segment.build_tables(codes)
        # per-shard max bucket size, computed where the table lives (the
        # host may not address other processes' shards)
        maxb = segment.max_bucket_size_device(tabs.sorted_codes)
        return tabs.sorted_codes, tabs.perm, maxb[None]

    sorted_codes, perm, maxb = jax.jit(_build)(km, params.a, params.b)
    if cand_max is None:
        cand_max = config.cand_max
    if cand_max is None:
        local_max = max((int(s.data.max()) for s in maxb.addressable_shards),
                        default=1)
        cand_max = reduce_max(local_max) if reduce_max else local_max
        cand_max = min(max(1, cand_max), config.cand_limit)  # skew bound
    return ShardedMotifIndex(mesh=mesh, params=params,
                             sorted_codes=sorted_codes, perm=perm,
                             db_kmers=km, cand_max=int(cand_max),
                             n_points=n_points, max_hits=config.max_hits,
                             probes=max(1, config.probes))


def _search_step(index: ShardedMotifIndex, is_kmers: bool):
    """Build the jitted SPMD search step for this index's mesh/shapes.

    Per device: hash the local center block, probe the local tables,
    dedup, exact-verify against the local db shard, globalize ids, then
    all-gather hit blocks along ``db``.  Output is sharded over ``data``
    only — every data row holds the full merged candidate set.
    """
    msh = index.mesh
    cand_max = index.cand_max
    n_local = index.n_local
    n_total = index.db_kmers.shape[0]
    kmer_len = index.kmer_len

    max_hits = index.max_hits
    n_points = index.n_points
    probes = index.probes

    @functools.partial(
        jax.shard_map, mesh=msh,
        in_specs=(P(None, DB), P(None, DB), P(DB, None), P(DATA, None),
                  P(), P(), P()),
        out_specs=(P(DATA), P(DATA, None), P(DATA, None)),
        # outputs are replicated over ``db`` by the trailing all_gather/pmax,
        # which the static VMA checker cannot infer
        check_vma=False)
    def step(sorted_codes, perm, db_local, centers_local, a, b, r2):
        p = dataclasses.replace(index.params, a=a, b=b)
        if probes > 1:
            qcodes = pstable.multiprobe_codes(
                centers_local, p, is_kmers, probes).transpose(1, 0, 2)
        else:
            qcodes = pstable.hash_codes(centers_local, p,
                                        is_kmers=is_kmers).T
        tabs = segment.SortedTables(sorted_codes=sorted_codes, perm=perm)
        start, count = segment.probe(tabs, qcodes)
        count = jnp.minimum(count, cand_max)
        ids = segment.gather_candidates(tabs, start, count, cand_max)
        ids = segment.dedup_sorted(ids, sentinel=n_local)        # local ids
        ptab = motif._center_ptables(centers_local, kmer_len)
        db_pad = jnp.concatenate(
            [db_local, jnp.zeros((1, kmer_len), jnp.int32)], axis=0)
        cand = jnp.take(db_pad, ids, axis=0)                     # (C, M, L)
        d2 = distance.ptable_distances_mxu(ptab, cand)
        shard = jax.lax.axis_index(DB).astype(jnp.int32)
        # mask the zero-filled padding rows at the global tail: their
        # local ids are < n_local on the last shard, but their global ids
        # fall beyond the true database
        real = (ids < n_local) & (shard * n_local + ids < n_points)
        hits = real & (d2 <= r2)
        n_hits = jnp.sum(hits, axis=1).astype(jnp.int32)
        # compact on the shard BEFORE the collective: the all-gather moves
        # (C, max_hits) verified hits per shard, never raw candidate blocks
        d2m = jnp.where(hits, d2, jnp.inf)
        k = min(max_hits, d2m.shape[1])
        neg, sel = jax.lax.top_k(-d2m, k)
        gids = jnp.where(jnp.isfinite(neg),
                         jnp.take_along_axis(ids, sel, axis=1)
                         + shard * n_local, n_total)
        gids = jax.lax.all_gather(gids, DB, axis=1, tiled=True)
        d2g = jax.lax.all_gather(-neg, DB, axis=1, tiled=True)
        # overflow indicator: the WORST single shard vs the per-shard cap
        # (a sum across shards would false-positive when hits are spread)
        n_hits = jax.lax.pmax(n_hits, DB)
        # single-buffer pack per data shard (ops/compact); row ids are
        # globalized with the data-shard offset so the host harvest is
        # shard-agnostic
        c_loc = gids.shape[0]
        packed = compact.pack_hits(
            gids, d2g, n_points, meta_vecs=(n_hits,),
            cid_offset=jax.lax.axis_index(DATA).astype(jnp.int32) * c_loc,
            cid_bound=c_loc * msh.shape[DATA])
        return packed, gids, d2g

    return jax.jit(step)


def _default_placer(mesh: jax.sharding.Mesh):
    sh = NamedSharding(mesh, P(DATA, None))
    return lambda blk: jax.device_put(blk, sh)


def search(index: ShardedMotifIndex, centers: np.ndarray,
           radius: float = 200.0, placer=None):
    """All (center, kmer) pairs within ``radius``, merged across shards.

    Returns (center_idx, kmer_idx, dist) host arrays — same contract as
    search.motif.search, but SPMD over the index's mesh.

    placer: optional callable((cb, ...) np.ndarray) -> P(data) global
    array; multi-host runs pass a make_array_from_process_local_data
    placer (every process calls with the same centers).
    """
    is_kmers = np.issubdtype(np.asarray(centers).dtype, np.integer)
    ndata = index.mesh.shape[DATA]
    c = centers.shape[0]
    # fixed center blocks: one compiled program regardless of C (jit
    # caches by function identity, so the step itself is memoized on the
    # index too)
    cb = max(ndata, -(-min(c, 128 * ndata) // ndata) * ndata)
    step = index._steps.get(("lsh", is_kmers, cb))
    if step is None:
        step = _search_step(index, is_kmers)
        index._steps[("lsh", is_kmers, cb)] = step
    arr = np.asarray(centers, np.int32 if is_kmers else np.float32)
    put = placer if placer is not None else _default_placer(index.mesh)
    out_c, out_k, out_d = [], [], []
    truncated = 0
    # dispatch every center block before harvesting any (async dispatch
    # overlaps block i's device->host transfer with block i+1's compute)
    pending = []
    for s in range(0, c, cb):
        blk = arr[s:s + cb]
        pad = cb - blk.shape[0]
        if pad:
            blk = np.pad(blk, ((0, pad),) + ((0, 0),) * (blk.ndim - 1))
        cdev = put(blk)
        pending.append((s, pad, step(index.sorted_codes, index.perm,
                                     index.db_kmers, cdev, index.params.a,
                                     index.params.b,
                                     jnp.float32(radius * radius))))
    ndata_sh = index.mesh.shape[DATA]
    c_loc = cb // ndata_sh
    for s, pad, (packed, gids, d2) in pending:
        real = cb - pad
        out = np.asarray(packed).reshape(ndata_sh, -1)
        shard_hits = [compact.unpack_hits(out[sd], (c_loc,))
                      for sd in range(ndata_sh)]
        n_hits = np.concatenate([m[0] for _, m in shard_hits])
        truncated += int((n_hits[:real] > index.max_hits).sum())
        if all(h is not None for h, _ in shard_hits):
            hcs, hks, hds = [], [], []
            for h, _ in shard_hits:
                keep = h[0] < real
                hcs.append(h[0][keep].astype(np.int64))
                hks.append(h[1][keep].astype(np.int64))
                hds.append(h[2][keep])
            hc, hk, hd = (np.concatenate(hcs), np.concatenate(hks),
                          np.concatenate(hds))
        else:
            gidsh = np.asarray(gids)[:real]
            d2h = np.asarray(d2)[:real]
            hc, hm = np.nonzero(gidsh < index.n_points)
            hk = gidsh[hc, hm]
            hd = d2h[hc, hm]
        out_c.append(hc + s)
        out_k.append(hk)
        out_d.append(np.sqrt(np.maximum(hd, 0.0)))
    if truncated:
        import warnings
        warnings.warn(
            f"{truncated} centers filled a shard's max_hits="
            f"{index.max_hits} slots; nearest hits kept — raise max_hits "
            "for the full set")
    if not out_c:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32))
    return (np.concatenate(out_c).astype(np.int64),
            np.concatenate(out_k).astype(np.int64),
            np.concatenate(out_d).astype(np.float32))


@dataclasses.dataclass
class ShardedIVFIndex:
    """Per-shard IVF sub-indexes over the ``db`` mesh axis.

    Each shard owns an independent block-pruned index of its database
    rows (search/ivf.py); block counts are padded to the max across
    shards with never-alive dummy blocks (radius -inf).  Global point ids
    are recovered from per-shard local ids + the shard's row offset.
    """

    mesh: jax.sharding.Mesh
    db_sorted: jax.Array        # (S*B, bs, L) int32, P(db, None, None)
    order: jax.Array            # (S*B, bs) int32 local ids (sentinel n_loc)
    block_centroid: jax.Array   # (S*B, D) f32
    block_radius: jax.Array     # (S*B,) f32
    n_points: int
    n_local: int                # padded rows per shard
    max_hits: int = 256
    _steps: dict = dataclasses.field(default_factory=dict, repr=False)

    @property
    def blocks_per_shard(self) -> int:
        return self.db_sorted.shape[0] // self.mesh.shape[DB]

    @property
    def block_size(self) -> int:
        return self.db_sorted.shape[1]

    @property
    def kmer_len(self) -> int:
        return self.db_sorted.shape[2]


def build_ivf_index(db_kmers: np.ndarray, key: jax.Array,
                    mesh: jax.sharding.Mesh, block_size: int = 32,
                    max_hits: int = 256) -> ShardedIVFIndex:
    n = db_kmers.shape[0]
    ndb = mesh.shape[DB]
    padded, _ = mesh_lib.pad_to_multiple(
        np.asarray(db_kmers, np.int32), ndb, axis=0, fill=0)
    km = jax.device_put(padded, NamedSharding(mesh, P(DB, None)))
    return build_ivf_index_from_global(km, n, key, mesh, block_size,
                                       max_hits)


def build_ivf_index_from_global(km: jax.Array, n_points: int,
                                key: jax.Array, mesh: jax.sharding.Mesh,
                                block_size: int = 32, max_hits: int = 256,
                                reduce_max=None) -> ShardedIVFIndex:
    """Build per-shard IVF sub-indexes with shard-local device programs.

    Three shard_mapped programs, no cross-shard communication and no O(N)
    host transfers (a host-side cut would drag the (N,) cell ids down and
    the (N,) block order back up — minutes over a slow link at IGC scale):

      1. every shard sample-assigns cells over its rows with the lazy
         per-block embedding (cell ids stay device-resident);
      2. every shard cuts cell-aligned blocks on device into a fixed
         2x-capacity layout (each cell wastes < block_size slots, so
         n_local + n_cells*(bs-1) slots always suffice), then stably
         sorts real blocks ahead of all-padding dummies — only the (S,)
         per-shard real-block counts cross to host;
      3. every shard slices its first ``b_max`` blocks (the max real
         count, a static shape), gathers the block-sorted rows and
         bounds each block.

    ``km`` is an already-placed (N_pad, L) P(db) global array (possibly
    assembled from per-process rows — parallel/multihost.py);
    ``reduce_max`` folds the host-local max real-block count across
    processes (None = identity, single-process).
    """
    from ..search import ivf as ivf_lib

    n = n_points
    l = km.shape[1]
    ndb = mesh.shape[DB]
    n_local = km.shape[0] // ndb
    n_cells = max(1, n_local // block_size)
    keys = jax.random.split(key, ndb)
    b_cap = (n_local + n_cells * (block_size - 1)
             + block_size - 1) // block_size

    # stage 1 OUTSIDE shard_map, per addressable shard: the axon worker
    # kills device programs running >~40-60 s, and a 2^24-row shard's
    # assignment alone takes ~50 s — the host-looped superblock split
    # inside _assign_cells_kmers needs real host control flow, which a
    # shard_mapped body cannot have.  Each shard's rows are committed to
    # its device, so the per-shard calls run device-local; the (n_local,)
    # cell ids reassemble into a P(db) global array without ever
    # leaving their devices.
    cell_shards = []
    shard_devs = []
    for s in sorted(km.addressable_shards,
                    key=lambda s: s.index[0].start or 0):
        di = (s.index[0].start or 0) // n_local
        cell_shards.append(ivf_lib._assign_cells_kmers(
            s.data.reshape(n_local, l), keys[di], n_cells,
            block=min(8192, n_local),
            cell_chunk=16384 if n_cells > (1 << 18) else None))
        shard_devs.append(s.device)
    cells_global = jax.make_array_from_single_device_arrays(
        (km.shape[0],),
        jax.sharding.NamedSharding(mesh, P(DB)),
        [jax.device_put(c, d) for c, d in zip(cell_shards, shard_devs)])

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DB, None), P(DB)),
        out_specs=(P(DB, None, None), P(DB)))
    def _cut(local_km, cells):
        order = jnp.argsort(cells, stable=True).astype(jnp.int32)
        sc = jnp.take(cells, order)
        ones = jnp.ones((n_local,), jnp.int32)
        counts = jax.ops.segment_sum(ones, cells, num_segments=n_cells)
        cap = -(-counts // block_size) * block_size
        pad_base = jnp.cumsum(cap) - cap            # exclusive
        cell_base = jnp.cumsum(counts) - counts
        rank = jnp.arange(n_local, dtype=jnp.int32) - \
            jnp.take(cell_base, sc).astype(jnp.int32)
        flat = jnp.full((b_cap * block_size,), n_local, jnp.int32)
        flat = flat.at[jnp.take(pad_base, sc).astype(jnp.int32)
                       + rank].set(order, mode="drop")
        ob = flat.reshape(b_cap, block_size)
        dummy = (ob >= n_local).all(axis=1)
        perm = jnp.argsort(dummy.astype(jnp.int32), stable=True)
        return (jnp.take(ob, perm, axis=0)[None],
                jnp.sum(~dummy, keepdims=True).astype(jnp.int32))

    ob_full, n_real = jax.jit(_cut)(km, cells_global)
    # only the per-shard real-block counts cross to host — and only the
    # ADDRESSABLE ones (multi-host processes own just their shards)
    local_bmax = max((int(s.data.max())
                      for s in n_real.addressable_shards), default=1)
    b_max = reduce_max(local_bmax) if reduce_max else local_bmax
    b_max = max(1, b_max)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DB, None), P(DB, None, None)),
        out_specs=(P(DB, None, None), P(DB, None), P(DB), P(DB, None)))
    def _bounds(local_km, local_ob_full):
        # chunked like ivf.build_index's stage 2: the whole-shard gather
        # + (B, bs, D) embedding materialized ~16 GB at 2^24 (HBM OOM);
        # scanning bchunk blocks at a time peaks at the int8 output
        coords = jnp.asarray(embedding.COORDINATES, jnp.float32)
        bchunk = 4096
        bp = (-b_max) % bchunk
        obp = jnp.concatenate(
            [local_ob_full[0, :b_max],
             jnp.full((bp, block_size), n_local, jnp.int32)]) \
            .reshape(-1, bchunk, block_size)
        km_pad = jnp.concatenate(
            [local_km.astype(jnp.int8), jnp.zeros((1, l), jnp.int8)],
            axis=0)

        def body(_, ob_c):
            db_c = jnp.take(km_pad, ob_c, axis=0)
            emb = jnp.take(coords, db_c.astype(jnp.int32), axis=0)
            emb = emb.reshape(bchunk, block_size, l * coords.shape[1])
            valid = (ob_c < n_local)[:, :, None]
            cnt = jnp.maximum(valid.sum(axis=1), 1)
            cent = jnp.sum(emb * valid, axis=1) / cnt
            d2 = jnp.sum((emb - cent[:, None, :]) ** 2, axis=-1)
            d2 = jnp.where(valid[..., 0], d2, 0.0)
            rad = jnp.sqrt(jnp.max(d2, axis=1))
            # all-padding dummy blocks must never survive pruning
            rad = jnp.where(valid[..., 0].any(axis=1), rad, -jnp.inf)
            return None, (db_c, cent, rad)

        _, (db_s, cent, rad) = jax.lax.scan(body, None, obp)
        local_ob = local_ob_full[0, :b_max]
        return (db_s.reshape(-1, block_size, l)[:b_max],
                cent.reshape(-1, cent.shape[-1])[:b_max],
                rad.reshape(-1)[:b_max], local_ob)

    db_sorted, cent, rad, ob = jax.jit(_bounds)(km, ob_full)
    return ShardedIVFIndex(
        mesh=mesh, db_sorted=db_sorted, order=ob,
        block_centroid=cent, block_radius=rad,
        n_points=n_points, n_local=n_local, max_hits=max_hits)


def _ivf_step(index: ShardedIVFIndex, k_blocks: int):
    msh = index.mesh
    n_local = index.n_local
    n_total = index.n_local * msh.shape[DB]
    bs = index.block_size
    l = index.kmer_len
    max_hits = index.max_hits

    n_points = index.n_points

    @functools.partial(
        jax.shard_map, mesh=msh,
        in_specs=(P(DB, None, None), P(DB, None), P(DB, None), P(DB),
                  P(DATA, None), P(DATA, None), P()),
        out_specs=(P(DATA), P(DATA, None), P(DATA, None)),
        check_vma=False)
    def step(db_sorted, order, cent, rad, centers_local, cemb_local, r):
        dblk = jnp.sqrt(distance.sq_distance_matrix(cemb_local, cent))
        alive = dblk <= r + rad[None, :]
        n_alive = jnp.sum(alive, axis=1).astype(jnp.int32)
        keym = jnp.where(alive, dblk, jnp.inf)
        kb = min(k_blocks, keym.shape[1])
        neg, blk_ids = jax.lax.top_k(-keym, kb)
        blk_alive = jnp.isfinite(neg)
        safe = jnp.where(blk_alive, blk_ids, 0)
        cand = jnp.take(db_sorted, safe, axis=0).reshape(-1, kb * bs, l)
        ids = jnp.take(order, safe, axis=0).reshape(-1, kb * bs)
        ids = jnp.where(jnp.repeat(blk_alive, bs, axis=1), ids, n_local)
        ptab = motif._center_ptables(centers_local, l)
        d2 = distance.ptable_distances_mxu(ptab, cand)
        shard = jax.lax.axis_index(DB).astype(jnp.int32)
        # mask zero-filled padding rows at the global tail (see
        # _search_step): valid local id but out-of-range global id
        real = (ids < n_local) & (shard * n_local + ids < n_points)
        hits = real & (d2 <= r * r)
        n_hits = jnp.sum(hits, axis=1).astype(jnp.int32)
        d2m = jnp.where(hits, d2, jnp.inf)
        k = min(max_hits, d2m.shape[1])
        negd, sel = jax.lax.top_k(-d2m, k)
        gids = jnp.where(jnp.isfinite(negd),
                         jnp.take_along_axis(ids, sel, axis=1)
                         + shard * n_local, n_total)
        gids = jax.lax.all_gather(gids, DB, axis=1, tiled=True)
        d2g = jax.lax.all_gather(-negd, DB, axis=1, tiled=True)
        # per-shard worst cases, for host-side overflow warnings
        n_hits = jax.lax.pmax(n_hits, DB)
        n_alive = jax.lax.pmax(n_alive, DB)
        # single-buffer pack per data shard (ops/compact), center ids
        # globalized with the data-shard offset
        c_loc = gids.shape[0]
        packed = compact.pack_hits(
            gids, d2g, n_points, meta_vecs=(n_hits, n_alive),
            cid_offset=jax.lax.axis_index(DATA).astype(jnp.int32) * c_loc,
            cid_bound=c_loc * msh.shape[DATA])
        return packed, gids, d2g

    return jax.jit(step)


def search_ivf(index: ShardedIVFIndex, centers: np.ndarray, radius: float,
               k_blocks: int = 64, placer=None):
    """Sharded block-pruned exact search; same contract as search()."""
    from ..core import embedding as emb_lib

    import warnings

    is_kmers = np.issubdtype(np.asarray(centers).dtype, np.integer)
    ndata = index.mesh.shape[DATA]
    c = centers.shape[0]
    cb = max(ndata, -(-min(c, 128 * ndata) // ndata) * ndata)
    step = index._steps.get((k_blocks, cb))
    if step is None:
        step = _ivf_step(index, k_blocks)
        index._steps[(k_blocks, cb)] = step
    arr = np.asarray(centers, np.int32 if is_kmers else np.float32)
    put = placer if placer is not None else _default_placer(index.mesh)
    out_c, out_k, out_d = [], [], []
    over_hits = over_blocks = 0
    # two-pass dispatch/harvest, as in search.ivf.search
    pending = []
    for s in range(0, c, cb):
        blk = arr[s:s + cb]
        pad = cb - blk.shape[0]
        if pad:
            blk = np.pad(blk, ((0, pad),) + ((0, 0),) * (blk.ndim - 1))
        cemb = emb_lib.embed_kmers(blk) if is_kmers \
            else np.asarray(blk, np.float32)
        pending.append((s, pad, step(
            index.db_sorted, index.order, index.block_centroid,
            index.block_radius, put(blk),
            put(np.asarray(cemb, np.float32)),
            jnp.float32(radius))))
    ndata_sh = index.mesh.shape[DATA]
    c_loc = cb // ndata_sh
    for s, pad, (packed, gids, d2) in pending:
        real = cb - pad
        out = np.asarray(packed).reshape(ndata_sh, -1)
        shard_hits = [compact.unpack_hits(out[sd], (c_loc, c_loc))
                      for sd in range(ndata_sh)]
        n_hits = np.concatenate([m[0] for _, m in shard_hits])
        n_alive = np.concatenate([m[1] for _, m in shard_hits])
        over_hits += int((n_hits[:real] > index.max_hits).sum())
        over_blocks += int((n_alive[:real] > k_blocks).sum())
        if all(h is not None for h, _ in shard_hits):
            hcs, hks, hds = [], [], []
            for h, _ in shard_hits:
                keep = h[0] < real               # drop padding-center rows
                hcs.append(h[0][keep].astype(np.int64))
                hks.append(h[1][keep].astype(np.int64))
                hds.append(h[2][keep])
            hc = np.concatenate(hcs)
            hk = np.concatenate(hks)
            hd = np.concatenate(hds)
        else:
            # packed capacity overflowed on some shard: full buffers
            gidsh = np.asarray(gids)[:real]
            d2h = np.asarray(d2)[:real]
            hc, hm = np.nonzero(gidsh < index.n_points)
            hk = gidsh[hc, hm]
            hd = d2h[hc, hm]
        out_c.append(hc + s)
        out_k.append(hk)
        out_d.append(np.sqrt(np.maximum(hd, 0.0)))
    if over_blocks:
        warnings.warn(f"{over_blocks} centers had more than k_blocks="
                      f"{k_blocks} surviving blocks on some shard; raise "
                      "k_blocks for guaranteed-exact results")
    if over_hits:
        warnings.warn(f"{over_hits} centers filled a shard's max_hits="
                      f"{index.max_hits} slots; nearest hits kept")
    if not out_c:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32))
    return (np.concatenate(out_c).astype(np.int64),
            np.concatenate(out_k).astype(np.int64),
            np.concatenate(out_d).astype(np.float32))


def exact_topk(db_kmers: np.ndarray, centers: np.ndarray, k: int,
               mesh: jax.sharding.Mesh):
    """Sharded brute-force top-k: per-shard exact distances + local top-k,
    all-gather of the k-blocks along ``db``, then a global top-k merge.

    The collective-merge pattern of SURVEY §2.7 in its purest form; also the
    multi-device ground-truth oracle for recall tests.
    Returns (idx (C, k) int64, dist (C, k) f32) host arrays.
    """
    ndb, ndata = mesh.shape[DB], mesh.shape[DATA]
    n, l = db_kmers.shape
    k = min(k, n)
    dbp, _ = mesh_lib.pad_to_multiple(np.asarray(db_kmers, np.int32), ndb,
                                      axis=0)
    c = centers.shape[0]
    cp, _ = mesh_lib.pad_to_multiple(np.asarray(centers, np.int32), ndata,
                                     axis=0)
    n_local = dbp.shape[0] // ndb
    dsq = jnp.asarray(embedding.DISTANCE_SQUARE, jnp.float32)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(DB, None), P(DATA, None)),
        out_specs=(P(DATA, None), P(DATA, None)),
        check_vma=False)
    def step(db_local, c_local):
        ptab = jnp.take(dsq, c_local.astype(jnp.int32), axis=0)  # (C, L, 20)
        oh = jax.nn.one_hot(db_local, 20, dtype=jnp.float32)     # (n, L, 20)
        d2 = jnp.einsum("clk,nlk->cn", ptab, oh,
                        preferred_element_type=jnp.float32)
        shard = jax.lax.axis_index(DB).astype(jnp.int32)
        pad_invalid = (shard * n_local + jnp.arange(n_local)) >= n
        d2 = jnp.where(pad_invalid[None, :], jnp.inf, d2)
        # per-shard k is capped by the shard's row count (a global k up
        # to n is legal even when it exceeds n_local)
        k_local = min(k, n_local)
        neg, li = jax.lax.top_k(-d2, k_local)
        gi = li + shard * n_local
        # gather each shard's top-k, then merge to a global top-k
        negs = jax.lax.all_gather(neg, DB, axis=1, tiled=True)
        gis = jax.lax.all_gather(gi, DB, axis=1, tiled=True)
        neg2, sel = jax.lax.top_k(negs, k)       # ndb*k_local >= k
        return jnp.take_along_axis(gis, sel, axis=1), -neg2

    dbd = jax.device_put(dbp, NamedSharding(mesh, P(DB, None)))
    cd = jax.device_put(cp, NamedSharding(mesh, P(DATA, None)))
    idx, d2 = jax.jit(step)(dbd, cd)
    return (np.asarray(idx)[:c].astype(np.int64),
            np.sqrt(np.maximum(np.asarray(d2)[:c], 0.0)).astype(np.float32))
