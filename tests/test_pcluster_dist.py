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


def test_partition_groups_deterministic_and_balanced():
    starts = np.arange(0, 101 * 10, 10)     # 100 proteins, 10 aa each
    groups = [np.arange(i, i + 4) for i in range(0, 80, 4)]
    a1 = pcluster_dist.partition_groups(groups, starts, 3)
    a2 = pcluster_dist.partition_groups(groups, starts, 3)
    np.testing.assert_array_equal(a1, a2)
    # equal-work groups spread evenly
    counts = np.bincount(a1, minlength=3)
    assert counts.max() - counts.min() <= 1
    # single process: everything to 0
    a0 = pcluster_dist.partition_groups(groups, starts, 1)
    assert (a0 == 0).all()


def test_partition_groups_weights_big_groups_apart():
    starts = np.arange(0, 101 * 50, 50)
    big = np.arange(40)          # one huge group
    smalls = [np.arange(40 + i, 42 + i) for i in range(0, 20, 2)]
    assign = pcluster_dist.partition_groups([big] + smalls, starts, 2)
    # the big group must sit alone-ish: all smalls on the other process
    assert all(a != assign[0] for a in assign[1:])


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
    asserts distributed labels/groups/hits == single-process."""
    _mp_check.run_local_cluster(
        nproc=2, ndev_per_proc=2,
        module="hsearch_tpu.cluster._mp_pcluster_check")
