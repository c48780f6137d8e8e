"""Multi-host runtime (parallel/multihost.py).

Single-process unit coverage of the ingest/mesh helpers, plus the real
thing: a spawned 2-process jax.distributed CPU cluster asserting the
shard-merged results equal single-host results (SURVEY §4's multi-host
test strategy).
"""

import jax
import numpy as np

from hsearch_tpu.parallel import _mp_check, mesh as mesh_lib, multihost
from hsearch_tpu.search import exact, motif


def test_host_mesh_single_process():
    mesh = multihost.host_mesh()
    # 8 virtual devices, 1 process -> data axis = 8, db axis = 1
    assert mesh.shape[mesh_lib.DATA_AXIS] * mesh.shape[mesh_lib.DB_AXIS] \
        == 8
    mesh2 = multihost.host_mesh(db_per_host=4)
    assert mesh2.shape[mesh_lib.DB_AXIS] == 4
    assert mesh2.shape[mesh_lib.DATA_AXIS] == 2


def test_collect_local_rows_covers_all(rng):
    mesh = multihost.host_mesh(db_per_host=4)
    n = 103
    rows = rng.integers(0, 20, (n, 6)).astype(np.int32)
    chunks = [rows[s:s + 17] for s in range(0, n, 17)]
    local = multihost.collect_local_rows(iter(chunks), n, mesh)
    lo, hi, n_local = multihost.shard_range(n, mesh)
    np.testing.assert_array_equal(local, rows[lo:hi])
    # single process owns every row
    assert lo == 0 and hi == n


def test_build_and_search_from_local_rows(rng):
    """Single-process multihost wrappers == direct sharded build."""
    mesh = multihost.host_mesh(db_per_host=4)
    n = 1024
    db = rng.integers(0, 20, (n, 8)).astype(np.int32)
    centers = db[::111][:8]
    cfg = motif.MotifSearchConfig(hash_k=4, hash_l=3, w=50.0, radius=22.0)
    key = jax.random.PRNGKey(0)
    idx = multihost.build_lsh_index(db, n, key, mesh, cfg)
    ci, ki, dd = multihost.search(idx, centers, 22.0)
    ref = motif.build_index(db, key, cfg)
    rc, rk, rd = motif.search(ref, centers, cfg)
    assert set(zip(ci.tolist(), ki.tolist())) == \
        set(zip(rc.tolist(), rk.tolist()))

    ividx = multihost.build_ivf_index(db, n, jax.random.PRNGKey(1), mesh,
                                      block_size=16)
    ic, ik, _ = multihost.search_ivf(ividx, centers, 22.0, k_blocks=64)
    gc, gk, _ = exact.search_radius(db, centers, 22.0)
    assert set(zip(ic.tolist(), ik.tolist())) == \
        set(zip(gc.tolist(), gk.tolist()))


def test_two_process_cluster_matches_single_host():
    """Spawn a REAL 2-process jax.distributed CPU cluster; every process
    asserts shard-merged == single-host for LSH and IVF."""
    _mp_check.run_local_cluster(nproc=2, ndev_per_proc=2)


def test_two_process_cluster_uneven_shards(monkeypatch):
    """Same real 2-process cluster with an N that does not divide the
    4 db shards: ragged padding rows ride the whole ingest -> build ->
    search -> merge path on every process."""
    monkeypatch.setenv("MP_CHECK_N", "1531")
    _mp_check.run_local_cluster(nproc=2, ndev_per_proc=2)


def test_streamed_ingest_equals_staged(rng):
    """put_rows_streamed (per-shard device buffers, no full host matrix)
    builds the identical index/array as the staged path."""
    mesh = multihost.host_mesh(db_per_host=4)
    n, l = 1000, 8
    db = rng.integers(0, 20, (n, l)).astype(np.int32)
    centers = db[::131][:6]
    cfg = motif.MotifSearchConfig(hash_k=4, hash_l=3, w=50.0, radius=22.0)
    key = jax.random.PRNGKey(0)
    chunks = (db[s:s + 97] for s in range(0, n, 97))
    km_s = multihost.put_rows_streamed(chunks, n, mesh, l)
    km_d = multihost.put_local_rows(db, n, mesh)
    np.testing.assert_array_equal(np.asarray(km_s), np.asarray(km_d))

    chunks = (db[s:s + 97] for s in range(0, n, 97))
    idx = multihost.build_lsh_index_streamed(chunks, n, key, mesh, l, cfg)
    ci, ki, _ = multihost.search(idx, centers, 22.0)
    ref = motif.build_index(db, key, cfg)
    rc, rk, _ = motif.search(ref, centers, cfg)
    assert set(zip(ci.tolist(), ki.tolist())) == \
        set(zip(rc.tolist(), rk.tolist()))

    chunks = (db[s:s + 97] for s in range(0, n, 97))
    iv = multihost.build_ivf_index_streamed(chunks, n,
                                            jax.random.PRNGKey(1), mesh, l,
                                            block_size=16)
    ic, ik, _ = multihost.search_ivf(iv, centers, 22.0, k_blocks=64)
    gc, gk, _ = exact.search_radius(db, centers, 22.0)
    assert set(zip(ic.tolist(), ik.tolist())) == \
        set(zip(gc.tolist(), gk.tolist()))


def test_three_process_cluster_uneven_shards(monkeypatch):
    """nproc=3 x 2 devices = 6 db shards over an N that does not divide
    them: shard_range's uneven tails at an odd process count (VERDICT
    r3 weak #4)."""
    monkeypatch.setenv("MP_CHECK_N", "1531")
    _mp_check.run_local_cluster(nproc=3, ndev_per_proc=2)
