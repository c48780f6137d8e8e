"""Brute-force exact search: the oracle every accelerated path is tested against.

TPU-native equivalent of motif_both_points_noLSH.cpp:36-56 (all centers x all
k-mers exact Euclidean distance, hits <= R) and of the BLOSUM-Metric exact
scorers.  On TPU "brute force" is itself fast — a (C, 20L) x (20L, N) GEMM —
so this doubles as a usable search engine for small/medium databases and as
the ground-truth generator for recall evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import compact, distance


def _center_blocks(centers: np.ndarray, block: int):
    c = centers.shape[0]
    for s in range(0, c, block):
        yield s, centers[s:s + block]


@functools.partial(jax.jit, static_argnames=("is_kmers", "fast"))
def _dist_block(centers, db, is_kmers: bool, fast: bool = False):
    if is_kmers:
        if fast:
            return distance.kmer_sq_distance_matrix_fast(centers, db)
        return distance.kmer_sq_distance_matrix(centers, db)
    return distance.point_vs_kmer_sq_distance(centers, db)


@functools.partial(jax.jit, static_argnames=("is_kmers", "max_hits",
                                             "fast"))
def _radius_block_compact(centers, db, r2, is_kmers: bool, max_hits: int,
                          fast: bool = False):
    """Distance block + on-device hit compaction (top max_hits by distance).

    Returns (ids (C, k) with sentinel N, d2 (C, k), n_hits (C,)); only the
    compacted result crosses to the host — essential when the device is a
    remote TPU and the dense (C, N) block would be transferred otherwise.
    """
    d2 = _dist_block(centers, db, is_kmers, fast)
    n = d2.shape[1]
    hits = d2 <= r2
    n_hits = jnp.sum(hits, axis=1).astype(jnp.int32)
    d2m = jnp.where(hits, d2, jnp.inf)
    k = min(max_hits, n)
    neg, sel = jax.lax.top_k(-d2m, k)
    ids = jnp.where(jnp.isfinite(neg), sel, n)
    packed = compact.pack_hits(ids, -neg, n, meta_vecs=(n_hits,))
    return packed, ids, -neg


@functools.partial(jax.jit, static_argnames=("is_kmers", "max_hits",
                                             "fast"))
def _radius_scan_compact(centers, db_blocks, n_true, r2, is_kmers: bool,
                        max_hits: int, fast: bool = False):
    """Streamed variant of _radius_block_compact for large databases.

    db_blocks: (NB, CHUNK, L) — the distance matrix exists only one chunk
    at a time; a running (C, max_hits) nearest-hit set merges per chunk
    (the same two-stage top-k idea as the sharded merge).
    """
    c = centers.shape[0]
    nb, chunk, l = db_blocks.shape
    n_pad = nb * chunk

    def body(carry, dbb):
        best_d2, best_ids, n_hits, base = carry
        d2 = _dist_block(centers, dbb, is_kmers, fast)        # (C, CHUNK)
        ids = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = ids < n_true
        hits = valid[None, :] & (d2 <= r2)
        n_hits = n_hits + jnp.sum(hits, axis=1).astype(jnp.int32)
        d2m = jnp.where(hits, d2, jnp.inf)
        cat_d = jnp.concatenate([best_d2, d2m], axis=1)
        cat_i = jnp.concatenate(
            [best_ids, jnp.broadcast_to(ids, (c, chunk))], axis=1)
        neg, sel = jax.lax.top_k(-cat_d, max_hits)
        return (( -neg, jnp.take_along_axis(cat_i, sel, axis=1),
                  n_hits, base + chunk), None)

    init = (jnp.full((c, max_hits), jnp.inf),
            jnp.full((c, max_hits), n_pad, jnp.int32),
            jnp.zeros(c, jnp.int32), jnp.int32(0))
    (best_d2, best_ids, n_hits, _), _ = jax.lax.scan(body, init, db_blocks)
    ids = jnp.where(jnp.isfinite(best_d2), best_ids, n_pad)
    # n_true is traced here; n_pad is the static bound on valid ids
    packed = compact.pack_hits(ids, best_d2, n_true, meta_vecs=(n_hits,),
                               id_bound=n_pad)
    return packed, ids, best_d2


def search_radius(db_kmers: np.ndarray, centers: np.ndarray, radius: float,
                  center_block: int = 256, max_hits: int | None = None,
                  fast: bool = False, db_chunk: int = 1 << 18):
    """All (center, kmer) pairs with embedding distance <= radius.

    db_kmers: (N, L) int; centers: (C, L) int k-mers or (C, 8L) real points.
    Returns (center_idx, kmer_idx, dist) int64/int64/float32 host arrays,
    sorted by (center, kmer) — the exact hit set the reference's noLSH tool
    writes as triples.

    With ``max_hits`` set, hits are compacted on device (nearest max_hits
    per center) and only that block is transferred — use on remote TPUs
    where moving the dense (C, N) distance matrix dominates wall-clock.
    A warning reports centers whose true hit count exceeded the cap.
    """
    db = jnp.asarray(db_kmers)
    n = db_kmers.shape[0]
    is_kmers = centers.ndim == 2 and centers.shape[1] == db_kmers.shape[1] \
        and np.issubdtype(centers.dtype, np.integer)
    r2 = radius * radius
    db_blocks = None
    if max_hits is not None and n > db_chunk:
        pad_n = (-n) % db_chunk
        db_blocks = jnp.pad(db, ((0, pad_n), (0, 0))).reshape(
            -1, db_chunk, db.shape[1])
    ci, ki, dd = [], [], []
    truncated = 0
    for s, blk in _center_blocks(centers, center_block):
        if max_hits is None:
            d2 = np.asarray(_dist_block(jnp.asarray(blk), db, is_kmers,
                                        fast))
            hit_c, hit_k = np.nonzero(d2 <= r2)
            ci.append(hit_c + s)
            ki.append(hit_k)
            dd.append(np.sqrt(d2[hit_c, hit_k]))
        else:
            if db_blocks is not None:
                # stream db chunks: the (C, N) distance matrix never
                # materializes (the one-shot path OOMs at N in the
                # millions)
                packed, ids, d2 = _radius_scan_compact(
                    jnp.asarray(blk), db_blocks, jnp.int32(n),
                    jnp.float32(r2), is_kmers, max_hits, fast)
            else:
                packed, ids, d2 = _radius_block_compact(
                    jnp.asarray(blk), db, jnp.float32(r2), is_kmers,
                    max_hits, fast)
            c_blk = blk.shape[0]
            hits, (n_hits,) = compact.unpack_hits(np.asarray(packed),
                                                  (c_blk,))
            truncated += int((n_hits > max_hits).sum())
            if hits is not None:
                hc, hk, hd = hits
                ci.append(hc.astype(np.int64) + s)
                ki.append(hk.astype(np.int64))
                dd.append(np.sqrt(np.maximum(hd, 0.0)))
            else:
                # packed capacity overflowed: full buffers transfer now
                ids = np.asarray(ids)
                d2 = np.asarray(d2)
                hit_c, hit_k = np.nonzero(ids < n)
                ci.append(hit_c + s)
                ki.append(ids[hit_c, hit_k].astype(np.int64))
                dd.append(np.sqrt(np.maximum(d2[hit_c, hit_k], 0.0)))
    if truncated:
        import warnings
        warnings.warn(f"{truncated} centers exceeded max_hits={max_hits}; "
                      "nearest hits kept")
    if not ci:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32))
    return (np.concatenate(ci), np.concatenate(ki),
            np.concatenate(dd).astype(np.float32))


@functools.partial(jax.jit, static_argnames=("k", "is_kmers", "largest"))
def _topk_block(centers, db, k: int, is_kmers: bool, largest: bool):
    if is_kmers:
        d = distance.kmer_sq_distance_matrix(centers, db)
    else:
        d = distance.point_vs_kmer_sq_distance(centers, db)
    vals, idx = jax.lax.top_k(-d if not largest else d, k)
    return (jnp.abs(vals), idx)


def search_topk(db_kmers: np.ndarray, centers: np.ndarray, k: int,
                center_block: int = 256):
    """k nearest database k-mers per center by exact embedding distance.

    Returns (dists (C, k) f32, ids (C, k) int32).
    """
    db = jnp.asarray(db_kmers)
    k = min(k, db_kmers.shape[0])
    is_kmers = np.issubdtype(centers.dtype, np.integer)
    out_d, out_i = [], []
    for _, blk in _center_blocks(centers, center_block):
        d2, idx = _topk_block(jnp.asarray(blk), db, k, is_kmers, False)
        out_d.append(np.sqrt(np.asarray(d2)))
        out_i.append(np.asarray(idx))
    return np.concatenate(out_d), np.concatenate(out_i)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_blosum_block(q, db, k: int):
    s = distance.kmer_blosum_score_matrix(q, db)
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx


def search_topk_blosum(db_kmers: np.ndarray, queries: np.ndarray, k: int,
                       center_block: int = 256):
    """k best database k-mers per query by ungapped BLOSUM62 score.

    The similarity-side oracle of BLOSUM-Metric (k_nearest_neighbor_
    similarity.cpp enumerates top-k peptides by score; here scored exactly
    against a concrete database).  Returns (scores (C,k) f32, ids (C,k)).
    """
    db = jnp.asarray(db_kmers)
    k = min(k, db_kmers.shape[0])
    out_s, out_i = [], []
    for _, blk in _center_blocks(queries, center_block):
        s, idx = _topk_blosum_block(jnp.asarray(blk), db, k)
        out_s.append(np.asarray(s))
        out_i.append(np.asarray(idx))
    return np.concatenate(out_s), np.concatenate(out_i)
