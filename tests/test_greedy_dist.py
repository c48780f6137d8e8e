"""Distributed greedy k-mer clustering (cluster/greedy_dist.py).

Single-process degenerate case (1-process cluster == plain
cluster_greedy) plus the real thing: a spawned 2-process
jax.distributed CPU cluster asserting parent/merged bit-identical to
the single-process walk (SURVEY §4's multi-host test strategy;
VERDICT r2 missing #1's hclust2 leg).
"""

import jax
import numpy as np

from hsearch_tpu.cluster import greedy, greedy_dist
from hsearch_tpu.parallel import _mp_check


def _km(rng, n=512, l=8, fams=12):
    fam = rng.integers(0, 20, (fams, l), dtype=np.int32)
    which = rng.integers(0, fams, n)
    km = fam[which].copy()
    flip = rng.integers(0, l, n)
    km[np.arange(n), flip] = rng.integers(0, 20, n)
    return km


def test_single_process_degenerate_matches(rng):
    km = _km(rng)
    key = jax.random.PRNGKey(3)
    cfg = greedy.ClusterConfig(hash_l=4)
    dist = greedy_dist.cluster_greedy_distributed(km, key, cfg)
    ref = greedy.cluster_greedy(km, key, cfg)
    np.testing.assert_array_equal(dist.parent, ref.parent)
    np.testing.assert_array_equal(dist.merged, ref.merged)


def test_two_process_cluster_bit_identical():
    _mp_check.run_local_cluster(
        nproc=2, module="hsearch_tpu.cluster._mp_greedy_check")


def test_three_process_odd_nproc_bit_identical(monkeypatch):
    """nproc=3: strided bucket-row ownership with an odd process count
    (VERDICT r3 weak #4); parent/merged still bit-identical."""
    monkeypatch.setenv("GREEDY_CHECK_N", "2048")
    monkeypatch.setenv("GREEDY_CHECK_L", "4")
    _mp_check.run_local_cluster(
        nproc=3, ndev_per_proc=1,
        module="hsearch_tpu.cluster._mp_greedy_check")
