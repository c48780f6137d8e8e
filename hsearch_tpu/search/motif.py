"""LSH motif search: the HSEARCH entry point, TPU-native.

Pipeline (reference: Search(), motif_both_points.cpp:195-250):
  build:  hash every database k-mer into hash_L tables  -> sorted-code index
  probe:  hash each center, locate its bucket in every table
  verify: exact squared distance to every (deduplicated) bucket member,
          emit pairs with d <= R

TPU mapping:
  * hashing      = one fused gather-GEMM over the integer k-mer database
  * table build  = per-table argsort of packed int32 codes
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
from ..ops import compact, distance, segment


@dataclasses.dataclass(frozen=True)
class MotifSearchConfig:
    """Operating point; defaults follow motif_both_points.cpp:286-295,380-381
    (the reference hard-codes hash_K=4, hash_L=4 and defaults W=50, R=200)."""

    hash_k: int = 4
    hash_l: int = 4
    w: float = 50.0
    radius: float = 200.0
    center_block: int = 128
    cand_max: int | None = None   # None -> max bucket size, capped below
    # Hard ceiling on cand_max when it defaults to the max bucket size.
    # Bucket-size skew is real (the reference keeps #ifdef BUCKETSIZE
    # histograms for exactly this, pcluster.cpp:38-66): one mega-bucket
    # would otherwise inflate the (C, T*cand_max) candidate gather for
    # EVERY probe of every center.  Centers that actually probe a
    # truncated bucket are counted on device and reported by search().
    cand_limit: int = 8192
    # Per-center hit cap for the on-device compaction (top-k by distance).
    # Only (center_block, max_hits) crosses to the host instead of the full
    # (center_block, T*cand_max) candidate arrays — the difference between
    # kilobytes and hundreds of megabytes per block on a remote TPU.
    max_hits: int = 256
    # Multiprobe: probe this many buckets per (center, table) — the home
    # bucket plus the nearest boundary-flips (lsh.pstable.multiprobe_codes).
    # probes>1 buys recall at fixed table count with narrow W.
    probes: int = 1


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
        cm = min(segment.max_bucket_size(np.asarray(codes)),
                 config.cand_limit)
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


@functools.partial(jax.jit, static_argnames=("cand_max", "max_hits"))
def _probe_verify(index: MotifIndex, centers: jax.Array,
                  qcodes: jax.Array, r2: jax.Array, cand_max: int,
                  max_hits: int = 256):
    """One center block: probe all tables, dedup, exact-verify, compact.

    Returns (packed flat int32 buffer — ops/compact layout with
    meta = [n_hits (C), n_dropped (C)]; plus the full ids (C, max_hits)
    sentinel-N and dist (C, max_hits) buffers, which transfer lazily and
    are touched only on packed-capacity overflow).  All filtering
    happens on device; the common-case harvest is ONE fused-word
    transfer (the per-transfer tunnel cost dominates the bytes —
    search/ivf.py carries the measurements).
    """
    n = index.num_points
    start, count = segment.probe(index.tables, qcodes)
    # per-center truncated-candidate count: observable bucket skew (the
    # reference's #ifdef BUCKETSIZE histograms, as a per-query counter)
    over = jnp.maximum(count - cand_max, 0)
    n_dropped = over.reshape(over.shape[0], -1).sum(axis=1).astype(jnp.int32)
    count = jnp.minimum(count, cand_max)
    ids = segment.gather_candidates(index.tables, start, count, cand_max)
    ids = segment.dedup_sorted(ids, sentinel=n)
    # exact distances via P-tables
    ptab = _center_ptables(centers, index.kmer_len)       # (C, L, 20)
    cand = jnp.take(index.db_kmers, ids, axis=0)          # (C, M, L)
    d2 = distance.ptable_distances_mxu(ptab, cand)        # (C, M)
    hits = (ids < n) & (d2 <= r2)
    n_hits = jnp.sum(hits, axis=1).astype(jnp.int32)
    # compact: top max_hits by (ascending) distance, misses pushed to +inf
    d2m = jnp.where(hits, d2, jnp.inf)
    k = min(max_hits, d2m.shape[1])
    neg, sel = jax.lax.top_k(-d2m, k)                     # (C, k)
    hit_ids = jnp.where(jnp.isfinite(neg),
                        jnp.take_along_axis(ids, sel, axis=1), n)
    hit_d2 = -neg
    # single-buffer packed transfer (ops/compact — the one implementation)
    packed = compact.pack_hits(hit_ids, hit_d2, n,
                               meta_vecs=(n_hits, n_dropped))
    return packed, hit_ids, hit_d2


def search_protein_db(db, centers: np.ndarray, key,
                      config: MotifSearchConfig = MotifSearchConfig(),
                      kmer_len: int | None = None):
    """Best (center, distance) per database position — the kmer_search
    semantic (kmer_search.cpp:85-127), with results actually returned
    (the reference builds its results map and never writes it, :89-126).

    db: core.io.ProteinDB.  Returns (best_center (P,) int32 with -1 for
    no hit, best_dist (P,) f32) over all valid k-mer positions, plus the
    (P,) flat position array.
    """
    from ..core import alphabet
    l = kmer_len or centers.shape[1]
    seq = np.asarray(db.seq)
    starts = np.asarray(db.starts)
    wins = alphabet.kmer_view(seq.astype(np.int64), l)
    pos = np.arange(len(wins))
    pid = np.searchsorted(starts, pos, side="right") - 1
    ok = (pos + l <= starts[pid + 1]) & (wins < 20).all(axis=1)
    km = wins[ok].astype(np.int32)
    positions = pos[ok]
    index = build_index(km, key, config)
    ci, ki, dd = search(index, centers, config)
    best_center = np.full(len(km), -1, np.int32)
    best_dist = np.full(len(km), np.inf, np.float32)
    if len(ki):
        # vectorized per-kmer argmin: sort hits by (kmer, distance) and
        # keep each kmer's first row
        order = np.lexsort((dd, ki))
        ks, ds, cs = ki[order], dd[order], ci[order]
        first = np.concatenate([[True], ks[1:] != ks[:-1]])
        best_dist[ks[first]] = ds[first]
        best_center[ks[first]] = cs[first]
    return best_center, best_dist, positions


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
    n = index.num_points
    ci_all, ki_all, dd_all = [], [], []
    truncated = skewed = 0
    # two-pass dispatch/harvest (as search.ivf.search): queue every
    # center block before pulling any result so transfers overlap compute
    pending = []
    for s in range(0, centers.shape[0], cb):
        blk = np.asarray(centers[s:s + cb])
        pad = cb - blk.shape[0]
        if pad:
            blk = np.pad(blk, ((0, pad),) + ((0, 0),) * (blk.ndim - 1))
        cblk = jnp.asarray(blk, jnp.int32 if is_kmers else jnp.float32)
        if config.probes > 1:
            qcodes = pstable.multiprobe_codes(
                cblk, index.params, is_kmers, config.probes)
            qcodes = qcodes.transpose(1, 0, 2)        # (C, T, P)
        else:
            qcodes = pstable.hash_codes(cblk, index.params,
                                        is_kmers=is_kmers).T
        pending.append((s, pad, _probe_verify(
            index, cblk, qcodes, r2, index.cand_max, config.max_hits)))
    for s, pad, (packed, hit_ids, d2) in pending:
        real = cb - pad
        hits, (n_hits, n_dropped) = compact.unpack_hits(
            np.asarray(packed), (cb, cb))
        truncated += int((n_hits[:real] > config.max_hits).sum())
        skewed += int((n_dropped[:real] > 0).sum())
        if hits is not None:
            hc0, hk0, hd0 = hits
            keep = hc0 < real                  # drop padding-center rows
            hc = hc0[keep].astype(np.int64)
            hk = hk0[keep].astype(np.int64)
            hd = hd0[keep]
        else:
            idsh = np.array(hit_ids)
            d2h = np.asarray(d2)
            if pad:
                idsh[real:, :] = n
            hc, hm = np.nonzero(idsh < n)
            hk = idsh[hc, hm].astype(np.int64)
            hd = d2h[hc, hm]
        ci_all.append(hc + s)
        ki_all.append(hk)
        dd_all.append(np.sqrt(np.maximum(hd, 0.0)))
    if truncated or skewed:
        import warnings
        if truncated:
            warnings.warn(
                f"{truncated} centers exceeded max_hits={config.max_hits}; "
                "nearest hits kept, raise config.max_hits for the full set")
        if skewed:
            warnings.warn(
                f"{skewed} centers probed buckets larger than cand_max="
                f"{index.cand_max} (bucket skew); their candidate lists "
                "were truncated — raise cand_max/cand_limit or dedup the "
                "database for the full set")
    if not ci_all:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32))
    return (np.concatenate(ci_all), np.concatenate(ki_all),
            np.concatenate(dd_all).astype(np.float32))
