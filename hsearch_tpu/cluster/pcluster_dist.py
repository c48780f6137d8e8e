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
  * **group partition**: pre-cluster groups are independent units of
    alignment work (the reference aligns each bucket in isolation,
    pcluster.cpp:157-167), so they shard embarrassingly: a
    deterministic greedy bin-pack (descending work estimate, lowest-
    loaded process wins, index tie-break) assigns every group to one
    process; each process indexes + aligns ONLY its groups.  Per-group
    hit sets are partition-invariant: probes are group-local
    (seed_index composite (group << 32) | code keys), e-values use each
    group's own statistics, and extension depends only on sequence
    windows — asserted by tests against the single-process pipeline.
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


def partition_groups(new_groups: list[np.ndarray], starts: np.ndarray,
                     nproc: int) -> np.ndarray:
    """(G,) process id per group: deterministic greedy bin-pack.

    Work estimate per group = (total AA)^2 — extension work scales with
    the within-group pair count times sequence length, and family
    pre-groups align nearly all-vs-all.  Groups are walked in
    descending-estimate order (stable index tie-break) and each goes to
    the least-loaded process (lowest id on ties) — every process
    computes the identical assignment with no communication.
    """
    starts = np.asarray(starts)
    g = len(new_groups)
    assign = np.zeros(g, np.int32)
    if nproc <= 1 or g == 0:
        return assign
    aa = np.array([float((starts[gr + 1] - starts[gr]).sum())
                   for gr in new_groups])
    w = aa * aa
    order = np.argsort(-w, kind="stable")
    load = np.zeros(nproc)
    for gi in order:
        p = int(np.argmin(load))        # ties -> lowest process id
        assign[gi] = p
        load[p] += w[gi]
    return assign


def _allgather_rows(rows: np.ndarray, width: int) -> np.ndarray:
    """Concatenate each process's (n_p, width) int32 rows across the
    cluster (padded allgather: one tiny max-reduce for the row count,
    then one fixed-shape collective)."""
    rows = np.asarray(rows, np.int32).reshape(-1, width)
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils
    n = rows.shape[0]
    nmax = int(np.max(multihost_utils.process_allgather(
        np.asarray([n], np.int32))))
    buf = np.zeros((nmax + 1, width), np.int32)
    buf[0, 0] = n
    buf[1:n + 1] = rows
    gathered = multihost_utils.process_allgather(buf)   # (nproc, nmax+1, w)
    return np.concatenate([gathered[p, 1:int(gathered[p, 0, 0]) + 1]
                           for p in range(gathered.shape[0])])


def cluster_proteins_distributed(
        db, key: jax.Array,
        params: align_pipeline.SearchParams = align_pipeline.SearchParams(),
        cluster_evalue: float = 1e-3,
        bits: int = pcluster.DEFAULT_BITS,
        sigma: float = pcluster.DEFAULT_SIGMA,
        tables: int = 1,
        gapped: bool = False) -> pcluster.ProteinClusters:
    """``cluster_proteins`` across ``jax.process_count()`` processes.

    Every process calls with identical arguments (the standard SPMD
    contract; ``db`` is each host's copy/view of the same ProteinDB).
    Returns labels and pre_groups identical on every process and to the
    single-process ``cluster_proteins`` under the same key; ``hits``
    holds THIS process's aligned groups' hits only.
    """
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
    for t in range(tables):
        new_groups = pcluster.table_groups(all_codes[t], seen_groups)
        if not new_groups:
            continue
        aligned_groups.extend(new_groups)
        assign = partition_groups(new_groups, dstarts, nproc)
        mine = [g for g, a in zip(new_groups, assign) if a == pid]
        profiling.heartbeat(
            f"cluster_proteins_dist p{pid}: table {t + 1}/{tables} — "
            f"{len(mine)}/{len(new_groups)} groups local")
        hits = []
        if mine:
            subset = np.concatenate(mine)
            group_of = np.repeat(np.arange(len(mine)),
                                 [len(g) for g in mine])
            searcher = align_pipeline.ProteinSearcher(
                db, params, subset=subset, groups=group_of)
            hits = searcher.search_all(
                exclude_pairs=hit_pairs if t else None)
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
        edges = np.array(
            [[h.query, h.subject,
              1 if (h.query != h.subject and h.evalue <= cluster_evalue)
              else 0] for h in hits],
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
