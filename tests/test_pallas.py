"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np

from hsearch_tpu.ops import distance as D
from hsearch_tpu.ops import pallas_kernels as pk


def test_prune_kernel_matches_reference(rng):
    q = rng.normal(0, 10, (200, 80)).astype(np.float32)
    c = rng.normal(0, 10, (300, 80)).astype(np.float32)
    rad = np.abs(rng.normal(0, 5, 300)).astype(np.float32)
    r = 30.0
    out = np.asarray(pk.sq_distance_prune(q, c, rad, r))
    d = np.sqrt(np.maximum(np.asarray(D.sq_distance_matrix(q, c)), 0))
    want = np.where(d <= r + rad[None, :], d, np.inf)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)


def test_prune_kernel_in_ivf(rng, monkeypatch):
    import jax
    from hsearch_tpu.search import exact, ivf
    # the flag is read at trace time inside the jitted search step; clear
    # the jit cache so this test traces (and later tests re-trace) with
    # the right branch instead of reusing an identically-shaped executable
    jax.clear_caches()
    monkeypatch.setenv("HSEARCH_PALLAS", "1")
    db = rng.integers(0, 20, (512, 10), dtype=np.int32)
    centers = db[:8].copy()
    idx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    ci, ki, d = ivf.search(idx, centers, 25.0, k_blocks=idx.num_blocks)
    gci, gki, _ = exact.search_radius(db, centers, 25.0)
    assert set(zip(ci, ki)) == set(zip(gci, gki))
    jax.clear_caches()


def test_ptable_verify_matches_oracle(rng):
    import jax.numpy as jnp
    c, m, l = 6, 1000, 25
    ptab = rng.random((c, l, 20)).astype(np.float32)
    cand = rng.integers(0, 20, (c, m, l)).astype(np.int8)
    got = np.asarray(pk.ptable_verify(jnp.asarray(ptab), jnp.asarray(cand)))
    want = np.asarray(D.ptable_distances(jnp.asarray(ptab),
                                         jnp.asarray(cand)))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-4)
    # and against the MXU fast path (the production default)
    mxu = np.asarray(D.ptable_distances_mxu(jnp.asarray(ptab),
                                            jnp.asarray(cand)))
    np.testing.assert_allclose(got, mxu, rtol=2e-6, atol=1e-4)
