"""Distributed whole-protein clustering over a jax.distributed cluster.

The back half of the system the multi-host runtime didn't cover
(VERDICT r2 next #1): ``cluster_proteins`` — KLSH pre-grouping +
group-partitioned alignment + union-find (pcluster.cpp:11-81,150-170)
— run across N processes.

Design (SPMD over hosts, no shared state):

  * **codes**: every process computes the SAME KLSH codes (same key,
    same chunked GEMM shapes — ``klsh_codes_all``), so the per-table
    group lists are formed identically everywhere without any
    communication.
  * **work partition, two modes picked deterministically per table**:
    when the pre-groups are balanceable (largest group weight <=
    total/(2*nproc), the greedy-bound condition), whole GROUPS shard
    across processes and each process indexes + aligns only its own —
    no duplicated index builds (per-group hit sets are partition-
    invariant: group-local probes, per-group statistics, window-
    bounded extension).  In the giant-group KLSH regimes (sigma <=
    0.1) group sharding degenerates to one process doing everything —
    measured: it desynchronized the processes past the 30 s gloo
    collective-init window at 1e6 — so every process then builds the
    SAME searcher and aligns a serpentine weight-balanced slice of
    the QUERIES instead (a query's hits depend only on its own seeds
    and its group's index, so the hit set partitions exactly by
    query).  Both modes are asserted bit-identical to the
    single-process pipeline.
  * **merge**: after each table, processes exchange one compact int32
    edge array — (query, subject, union_flag) per hit — via a padded
    allgather (the only cross-host traffic; kilobytes per table).  The
    gathered pairs feed the next table's cross-table dedup
    (``exclude_pairs``) and the final union-find, which every process
    runs identically: labels come out bit-equal on all processes.

Alignment hits themselves stay process-local (each process holds the
hits of its own groups — the CLI writes per-process m8 shards); only
the (query, subject) edge structure crosses hosts.
"""

from __future__ import annotations

import numpy as np

import jax

from ..align import pipeline as align_pipeline
from ..utils import profiling
from . import pcluster, union_find


def partition_queries(weights: np.ndarray, nproc: int) -> np.ndarray:
    """(R,) process id per query row: deterministic serpentine balance.

    Rows sort by descending weight (stable index tie-break) and deal
    out serpentine-wise (0..P-1, P-1..0, ...), so every process's total
    weight matches to within one row's weight — vectorized (a greedy
    least-loaded loop is O(R) Python at millions of rows).  Every
    process computes the identical assignment with no communication.
    """
    r = len(weights)
    assign = np.zeros(r, np.int32)
    if nproc <= 1 or r == 0:
        return assign
    order = np.argsort(-np.asarray(weights, np.float64), kind="stable")
    pos = np.arange(r)
    lane = pos % nproc
    snake = np.where((pos // nproc) % 2 == 0, lane, nproc - 1 - lane)
    assign[order] = snake.astype(np.int32)
    return assign


def _allgather_rows(rows: np.ndarray, width: int) -> np.ndarray:
    """Cross-host row merge — see parallel.multihost.allgather_rows
    (kept as a module name because the spawned checks call it here)."""
    from ..parallel import multihost
    return multihost.allgather_rows(rows, width)


def cluster_proteins_distributed(
        db, key: jax.Array,
        params: align_pipeline.SearchParams = align_pipeline.SearchParams(),
        cluster_evalue: float = 1e-3,
        bits: int = pcluster.DEFAULT_BITS,
        sigma: float = pcluster.DEFAULT_SIGMA,
        tables: int = 1,
        gapped: bool = False,
        hit_sink=None,
        render: bool = True) -> pcluster.ProteinClusters:
    """``cluster_proteins`` across ``jax.process_count()`` processes.

    Every process calls with identical arguments (the standard SPMD
    contract; ``db`` is each host's copy/view of the same ProteinDB).
    Returns labels and pre_groups identical on every process and to the
    single-process ``cluster_proteins`` under the same key; ``hits``
    holds THIS process's aligned groups' hits only.

    hit_sink/render: as in ``cluster_proteins`` — local hits stream to
    the sink per search slice (union edges are built from compact
    per-slice arrays as they pass, 12 B/hit instead of resident Hit
    objects) and ``hits`` comes back empty.  Labels stay identical:
    the edge exchange and union-find see the same (query, subject,
    flag) rows either way.
    """
    if hit_sink is not None and gapped:
        raise ValueError("hit_sink requires gapped=False")
    nproc = jax.process_count()
    pid = jax.process_index()
    profiling.heartbeat(
        f"cluster_proteins_dist p{pid}/{nproc}: codes over "
        f"{db.num_proteins} proteins x {tables} tables")
    uf = union_find.UnionFind(db.num_proteins)
    local_hits = []
    aligned_groups = []
    seen_groups: set[bytes] = set()
    hit_pairs = np.empty(0, np.uint64)
    keys = jax.random.split(key, tables)
    all_params = [pcluster.klsh_init(keys[t], pcluster.FEATURE_SIZE,
                                     bits, sigma) for t in range(tables)]
    with profiling.phase("pcluster/klsh_codes"):
        all_codes = pcluster.klsh_codes_all(db, all_params)
    dstarts = np.asarray(db.starts)
    # establish the gloo/collective context while every process is
    # still in lock-step (context init has a hard 30 s window; the
    # first real exchange happens only after minutes of alignment)
    _allgather_rows(np.zeros((0, 3), np.int32), 3)
    for t in range(tables):
        new_groups = pcluster.table_groups(all_codes[t], seen_groups)
        if not new_groups:
            continue
        aligned_groups.extend(new_groups)
        subset = np.concatenate(new_groups)
        group_of = np.repeat(np.arange(len(new_groups)),
                             [len(g) for g in new_groups])
        # per-query work ~ its group's total residue count (probes are
        # group-local; every group subject is a potential extension)
        glen = (dstarts[subset + 1] - dstarts[subset]).astype(np.float64)
        gaa = np.bincount(group_of, weights=glen)
        gw = gaa * gaa        # within-group alignment ~ all-vs-all
        group_mode = nproc > 1 and len(new_groups) >= nproc and \
            gw.max() <= gw.sum() / (2 * nproc)
        if group_mode:
            # balanceable groups: shard whole groups, index only ours
            gassign = partition_queries(gw, nproc)
            mine = [g for g, a in zip(new_groups, gassign) if a == pid]
            subset_l = np.concatenate(mine) if mine \
                else np.zeros(0, np.int64)
            group_l = np.repeat(np.arange(len(mine)),
                                [len(g) for g in mine]) if mine \
                else np.zeros(0, np.int64)
            my_rows = np.arange(len(subset_l))
        else:
            subset_l, group_l = subset, group_of
            assign = partition_queries(gaa[group_of], nproc) \
                if nproc > 1 else np.zeros(len(subset), np.int32)
            my_rows = np.nonzero(assign == pid)[0]
        profiling.heartbeat(
            f"cluster_proteins_dist p{pid}: table {t + 1}/{tables} — "
            f"{'group' if group_mode else 'query'} mode, "
            f"{len(my_rows)}/{len(subset)} query rows local, "
            f"{len(new_groups)} groups")
        hits = []
        edge_parts: list[np.ndarray] = []
        if len(my_rows):
            searcher = align_pipeline.ProteinSearcher(
                db, params, subset=subset_l, groups=group_l)
            if hit_sink is not None:
                def _sink(chunk_hits, _parts=edge_parts):
                    _parts.append(np.array(
                        [[h.query, h.subject,
                          1 if (h.query != h.subject
                                and h.evalue <= cluster_evalue) else 0]
                         for h in chunk_hits], np.int32)
                        if chunk_hits else np.zeros((0, 3), np.int32))
                    hit_sink(chunk_hits)

                searcher.search_all(
                    exclude_pairs=hit_pairs if t else None,
                    query_rows=None if group_mode else my_rows,
                    hit_sink=_sink, render=render)
            else:
                hits = searcher.search_all(
                    exclude_pairs=hit_pairs if t else None,
                    query_rows=None if group_mode else my_rows,
                    render=render)
            if gapped and hits:
                by_query: dict[int, list] = {}
                for h in hits:
                    by_query.setdefault(h.query, []).append(h)
                hits = []
                for q, qhits in by_query.items():
                    qseq = np.asarray(db.protein(q))
                    hits.extend(align_pipeline.refine_gapped(
                        searcher, qseq, qhits))
        local_hits.extend(hits)
        # one compact edge exchange: (query, subject, union_flag).
        # gapped refinement replaces hits 1:1 on the same (q, s) pairs,
        # so the post-refinement pair set serves both the cross-table
        # dedup and the union edges.
        if hit_sink is not None:
            edges = np.concatenate(edge_parts) if edge_parts \
                else np.zeros((0, 3), np.int32)
        else:
            edges = np.array(
                [[h.query, h.subject,
                  1 if (h.query != h.subject
                        and h.evalue <= cluster_evalue) else 0]
                 for h in hits],
                np.int32) if hits else np.zeros((0, 3), np.int32)
        edges = _allgather_rows(edges, 3)
        profiling.heartbeat(
            f"cluster_proteins_dist p{pid}: table {t + 1}/{tables} — "
            f"{len(edges)} merged hits ({len(hits)} local)")
        if tables > 1 and len(edges):
            new_keys = (edges[:, 0].astype(np.uint64) << np.uint64(32)) \
                | edges[:, 1].astype(np.uint64)
            hit_pairs = np.sort(np.concatenate([hit_pairs, new_keys]))
        ue = edges[edges[:, 2] == 1]
        uf.union_edges(ue[:, 0], ue[:, 1])
    return pcluster.ProteinClusters(labels=uf.components(),
                                    pre_groups=aligned_groups,
                                    hits=local_hits)
