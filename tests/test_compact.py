"""ops/compact pack/unpack + the IVF lossless overflow retry."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsearch_tpu.ops import compact
from hsearch_tpu.search import exact, ivf


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    c, k, n = 7, 32, 100
    ids = rng.integers(0, n + 1, (c, k)).astype(np.int32)
    # sentinel-out a random suffix per row (pack requires no order)
    d2 = rng.random((c, k)).astype(np.float32)
    n_hits = rng.integers(0, k, c).astype(np.int32)
    packed = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                               meta_vecs=(jnp.asarray(n_hits),),
                               cap_frac=1)     # cap = c*k: never overflows
    hits, (mh,) = compact.unpack_hits(np.asarray(packed), (c,))
    assert hits is not None
    hc, hk, hd = hits
    exp_c, exp_k = np.nonzero(ids < n)
    np.testing.assert_array_equal(np.sort(hc), np.sort(exp_c))
    # per-center sets agree
    for cc in range(c):
        got = set(zip(hk[hc == cc].tolist(),
                      hd[hc == cc].round(6).tolist()))
        want = set(zip(ids[cc][ids[cc] < n].tolist(),
                       d2[cc][ids[cc] < n].round(6).tolist()))
        assert got == want
    np.testing.assert_array_equal(mh, n_hits)


def test_pack_fused_sign_bit_boundary():
    # cid_bits + kid_bits == 32 exactly: the fused word runs into the
    # int32 sign bit and must decode through the host uint32 view
    # (the 2^23-point / 512-center bench shape)
    n = 1 << 23
    c, k = 512, 4
    ids = np.full((c, k), n, np.int32)         # all sentinel...
    ids[0, 0] = n - 1                          # ...except the extremes
    ids[c - 1, 1] = 0
    d2 = np.full((c, k), 7.25, np.float32)
    packed = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                               cap_frac=1)
    assert int(np.asarray(packed)[0]) == 23    # fused, kid_bits=23
    hits, _ = compact.unpack_hits(np.asarray(packed), ())
    hc, hk, hd = hits
    assert sorted(zip(hc.tolist(), hk.tolist())) == [(0, n - 1),
                                                     (c - 1, 0)]
    assert hd.tolist() == [7.25, 7.25]


def test_pack_wide_ids_fall_back_to_split():
    # ids too wide to fuse (cid_bits + kid_bits > 32) -> split layout
    n = 1 << 30
    ids = np.array([[5, n]], np.int32)
    d2 = np.array([[2.0, 0.0]], np.float32)
    packed = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                               cid_bound=1 << 8, cap_frac=1)
    assert int(np.asarray(packed)[0]) == 0     # split marker
    hits, _ = compact.unpack_hits(np.asarray(packed), ())
    hc, hk, hd = hits
    assert hc.tolist() == [0] and hk.tolist() == [5]
    assert hd.tolist() == [2.0]


def test_pack_overflow_returns_none():
    c, k, n = 4, 16, 50
    ids = np.zeros((c, k), np.int32)           # every slot valid
    d2 = np.ones((c, k), np.float32)
    packed = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                               cap_frac=4)
    hits, metas = compact.unpack_hits(np.asarray(packed), ())
    assert hits is None and metas == []


def test_pack_cid_offset():
    ids = np.array([[3, 60]], np.int32)        # one valid, one sentinel
    d2 = np.array([[1.5, 0.0]], np.float32)
    packed = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), 50,
                               cid_offset=jnp.int32(10), cap_frac=1)
    hits, _ = compact.unpack_hits(np.asarray(packed), ())
    hc, hk, hd = hits
    assert hc.tolist() == [10] and hk.tolist() == [3]
    assert hd.tolist() == [1.5]


def _workload(n=4096, c=24, l=10, seed=3):
    rng = np.random.default_rng(seed)
    fam = rng.integers(0, 20, (c, l), dtype=np.int32)
    which = rng.integers(0, c, n)
    db = fam[which].copy()
    flip = rng.integers(0, l, n)
    db[np.arange(n), flip] = rng.integers(0, 20, n)
    return db, fam


def test_ivf_retry_overflow_restores_exactness():
    db, centers = _workload()
    radius = 26.0
    index = ivf.build_index(db, jax.random.PRNGKey(0), block_size=16)
    gci, gki, gd = exact.search_radius(db, centers, radius)
    # k_blocks=1 guarantees overflow; the retry must recover every hit
    with warnings.catch_warnings():
        warnings.simplefilter("error")         # no overflow warning either
        ci, ki, dd = ivf.search(index, centers, radius, k_blocks=1,
                                max_hits=8, retry_overflow=True)
    got = set(zip(ci.tolist(), ki.tolist()))
    want = set(zip(gci.tolist(), gki.tolist()))
    assert got == want
    # distances match the oracle
    od = {(c_, k_): d_ for c_, k_, d_ in zip(gci, gki, gd)}
    for c_, k_, d_ in zip(ci, ki, dd):
        assert abs(od[(c_, k_)] - d_) < 1e-4


def test_ivf_no_retry_warns_and_misses():
    db, centers = _workload()
    radius = 26.0
    index = ivf.build_index(db, jax.random.PRNGKey(0), block_size=16)
    with pytest.warns(UserWarning, match="surviving blocks"):
        ci, ki, _ = ivf.search(index, centers, radius, k_blocks=1,
                               max_hits=8, retry_overflow=False)
    gci, gki, _ = exact.search_radius(db, centers, radius)
    assert len(ci) < len(gci)                  # the cap actually binds


def test_pack_without_d2_one_word_layout():
    # with_d2=False (fused layout): buffer omits the d2 row, header word
    # [0] is the NEGATED kid_bits, and unpack returns d2=None
    rng = np.random.default_rng(3)
    c, k, n = 8, 16, 100
    ids = rng.integers(0, n + 1, (c, k)).astype(np.int32)
    d2 = rng.random((c, k)).astype(np.float32)
    full = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                             cap_frac=1)
    lean = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                             cap_frac=1, with_d2=False)
    cap = c * k
    assert lean.shape[0] == full.shape[0] - cap       # one row dropped
    assert int(np.asarray(lean)[0]) == -int(np.asarray(full)[0])
    (fc, fk, fd), _ = compact.unpack_hits(np.asarray(full), ())
    got, _ = compact.unpack_hits(np.asarray(lean), ())
    lc, lk, ld = got
    assert ld is None
    np.testing.assert_array_equal(lc, fc)
    np.testing.assert_array_equal(lk, fk)


def test_pack_without_d2_split_layout_keeps_d2():
    # split layout (ids too wide to fuse) ignores with_d2
    n = 1 << 30
    c, k = 1 << 8, 4
    ids = np.full((c, k), n, np.int32)
    ids[3, 2] = 12345
    d2 = np.full((c, k), 2.5, np.float32)
    packed = compact.pack_hits(jnp.asarray(ids), jnp.asarray(d2), n,
                               cap_frac=1, with_d2=False,
                               cid_bound=1 << 8, id_bound=1 << 30)
    assert int(np.asarray(packed)[0]) == 0            # split
    (hc, hk, hd), _ = compact.unpack_hits(np.asarray(packed), ())
    assert hd is not None and hd.tolist() == [2.5]
    assert (hc.tolist(), hk.tolist()) == ([3], [12345])
