"""Distributed protein clustering (cluster/pcluster_dist.py).

Single-process unit coverage of the group partitioner and the
distributed driver's 1-process degenerate case, plus the real thing: a
spawned 2-process jax.distributed CPU cluster asserting labels,
pre-groups, and the merged hit set are bit-identical to the
single-process pipeline (SURVEY §4's multi-host test strategy; VERDICT
r2 next #1).
"""

import jax
import numpy as np

from hsearch_tpu.cluster import _mp_pcluster_check, pcluster, pcluster_dist
from hsearch_tpu.parallel import _mp_check


def test_partition_queries_deterministic_and_balanced(rng):
    w = rng.random(1000)
    a1 = pcluster_dist.partition_queries(w, 3)
    a2 = pcluster_dist.partition_queries(w, 3)
    np.testing.assert_array_equal(a1, a2)
    counts = np.bincount(a1, minlength=3)
    assert counts.max() - counts.min() <= 1
    # per-process total weight balanced to within one max-weight row
    loads = np.array([w[a1 == p].sum() for p in range(3)])
    assert loads.max() - loads.min() <= w.max() + 1e-9
    # single process: everything to 0
    assert (pcluster_dist.partition_queries(w, 1) == 0).all()


def test_partition_queries_balances_giant_group_regime():
    """One giant group (sigma<=0.1 KLSH regime): its query rows must
    spread across processes, not land on one."""
    w = np.full(1000, 5000.0)        # every query in one huge group
    assign = pcluster_dist.partition_queries(w, 2)
    counts = np.bincount(assign, minlength=2)
    assert counts.max() - counts.min() <= 1


def test_search_all_query_rows_partitions_exactly():
    """Hits of query slices union to the full run, per query identical
    (the property the distributed query partition rests on)."""
    from hsearch_tpu.align import pipeline as apipe
    db = _mp_pcluster_check._workload()
    key = jax.random.PRNGKey(11)
    codes = pcluster.klsh_codes_all(
        db, [pcluster.klsh_init(jax.random.split(key, 1)[0])])
    groups = pcluster.table_groups(codes[0], set())
    subset = np.concatenate(groups)
    group_of = np.repeat(np.arange(len(groups)),
                         [len(g) for g in groups])
    s = apipe.ProteinSearcher(db, subset=subset, groups=group_of)
    full = s.search_all()
    rows = np.arange(len(subset))
    parts = []
    for sl in (rows[0::3], rows[1::3], rows[2::3]):
        parts.extend(s.search_all(query_rows=sl))
    key_fn = _mp_pcluster_check._hit_rows
    a = key_fn(full)
    b = key_fn(parts)
    assert sorted(map(tuple, a.tolist())) == sorted(map(tuple, b.tolist()))


def test_single_process_degenerate_equals_cluster_proteins():
    db = _mp_pcluster_check._workload()
    key = jax.random.PRNGKey(11)
    dist = pcluster_dist.cluster_proteins_distributed(db, key, tables=2)
    ref = pcluster.cluster_proteins(db, key, tables=2)
    np.testing.assert_array_equal(dist.labels, ref.labels)
    assert _mp_pcluster_check._hit_rows(dist.hits).tolist() == \
        _mp_pcluster_check._hit_rows(ref.hits).tolist()


def test_two_process_cluster_proteins_matches_single():
    """Spawn a REAL 2-process jax.distributed CPU cluster; every process
    asserts distributed labels/groups/hits == single-process
    (balanceable groups -> the GROUP-partition mode)."""
    _mp_check.run_local_cluster(
        nproc=2, ndev_per_proc=2,
        module="hsearch_tpu.cluster._mp_pcluster_check")


def test_two_process_giant_group_query_mode(monkeypatch):
    """Same real cluster with sigma=0.1: a handful of giant pre-groups
    forces the QUERY-partition mode; results must still be
    bit-identical to single-process."""
    monkeypatch.setenv("PCLUSTER_CHECK_SIGMA", "0.1")
    _mp_check.run_local_cluster(
        nproc=2, ndev_per_proc=2,
        module="hsearch_tpu.cluster._mp_pcluster_check")


def test_three_process_odd_nproc_both_modes(monkeypatch):
    """nproc=3 (VERDICT r3 weak #4): the serpentine query partition,
    the group-mode threshold, and the padded allgather all see an odd
    process count.  Both partition modes, smaller corpus to bound
    runtime; results must be bit-identical to single-process."""
    monkeypatch.setenv("PCLUSTER_CHECK_N", "144")
    monkeypatch.setenv("PCLUSTER_CHECK_TABLES", "2")
    _mp_check.run_local_cluster(
        nproc=3, ndev_per_proc=1,
        module="hsearch_tpu.cluster._mp_pcluster_check")
    monkeypatch.setenv("PCLUSTER_CHECK_SIGMA", "0.1")
    _mp_check.run_local_cluster(
        nproc=3, ndev_per_proc=1,
        module="hsearch_tpu.cluster._mp_pcluster_check")


def test_hit_sink_streaming_identical_labels_and_edges():
    """hit_sink mode (multi-table): labels bit-identical to the
    resident-hits path, streamed hits reproduce the resident hit rows,
    and nothing accumulates in res.hits — in both the single-process
    and the distributed (1-process degenerate) drivers."""
    db = _mp_pcluster_check._workload()
    key = jax.random.PRNGKey(11)
    ref = pcluster.cluster_proteins(db, key, tables=2)
    streamed: list = []
    res = pcluster.cluster_proteins(db, key, tables=2,
                                    hit_sink=streamed.extend,
                                    render=False)
    np.testing.assert_array_equal(res.labels, ref.labels)
    assert res.hits == []
    assert _mp_pcluster_check._hit_rows(streamed).tolist() == \
        _mp_pcluster_check._hit_rows(ref.hits).tolist()

    streamed_d: list = []
    dist = pcluster_dist.cluster_proteins_distributed(
        db, key, tables=2, hit_sink=streamed_d.extend, render=False)
    np.testing.assert_array_equal(dist.labels, ref.labels)
    assert dist.hits == []
    assert _mp_pcluster_check._hit_rows(streamed_d).tolist() == \
        _mp_pcluster_check._hit_rows(ref.hits).tolist()
