"""Out-of-HBM segmented search (search/stream.py).

The global radius hit set must equal the single-index engine's (radius
search decomposes exactly over a partition of the database), streamed
or resident, array or iterator input, with the overflow/retry
contracts composing per segment (VERDICT r3 next #2).
"""

import jax
import numpy as np

from hsearch_tpu.search import exact, ivf, stream


def _family_db(rng, n, c, l, family_size=32):
    nfam = max(1, n // family_size)
    fam = rng.integers(0, 20, (nfam, l), dtype=np.int32)
    db = fam[rng.integers(0, nfam, n)].copy()
    flips = rng.poisson(2.0, n).clip(0, l)
    for i in range(n):
        if flips[i]:
            pos = rng.integers(0, l, flips[i])
            db[i, pos] = rng.integers(0, 20, flips[i])
    q = fam[rng.choice(nfam, c, replace=False)]
    return db, q


def test_segmented_equals_exact_lossless(rng):
    """Fully streamed (budget 0), retry on: union of per-segment
    lossless searches == the exact oracle."""
    n, c, l = 8192, 16, 25
    db, centers = _family_db(rng, n, c, l)
    sidx = stream.build_segmented(db, jax.random.PRNGKey(0),
                                  segment_points=2048, block_size=16)
    assert sidx.num_segments == 4
    assert sidx.resident_fraction() == 0.0
    ci, ki, dd = stream.search_segmented(sidx, centers, 35.0,
                                         k_blocks=8, max_hits=1024)
    gci, gki, gd = exact.search_radius(db, centers, 35.0)
    assert set(zip(ci, ki)) == set(zip(gci, gki))
    gt = {(a, b): v for a, b, v in zip(gci, gki, gd)}
    for a, b, v in zip(ci, ki, dd):
        np.testing.assert_allclose(v, gt[(a, b)], atol=1e-2)


def test_segmented_uneven_tail_and_iterator_input(rng):
    """Iterator-of-chunks input (chunk sizes not aligned to segments)
    builds the identical segmentation as the array input, including an
    uneven final segment."""
    n, c, l = 5000, 8, 10
    db, centers = _family_db(rng, n, c, l)
    a = stream.build_segmented(db, jax.random.PRNGKey(1),
                               segment_points=2048, block_size=16)
    chunks = (db[s:s + 700] for s in range(0, n, 700))
    b = stream.build_segmented(chunks, jax.random.PRNGKey(1),
                               segment_points=2048, block_size=16)
    assert a.num_segments == b.num_segments == 3
    assert [s.n_points for s in a.segments] == \
        [s.n_points for s in b.segments] == [2048, 2048, 904]
    for sa, sb in zip(a.segments, b.segments):
        np.testing.assert_array_equal(sa.db_sorted, sb.db_sorted)
        np.testing.assert_array_equal(sa.order, sb.order)
    ra = stream.search_segmented(a, centers, 30.0, k_blocks=64,
                                 max_hits=512)
    rb = stream.search_segmented(b, centers, 30.0, k_blocks=64,
                                 max_hits=512)
    assert set(zip(ra[0], ra[1])) == set(zip(rb[0], rb[1]))
    gci, gki, _ = exact.search_radius(db, centers, 30.0)
    assert set(zip(ra[0], ra[1])) == set(zip(gci, gki))


def test_device_budget_keeps_prefix_resident(rng):
    n, c, l = 4096, 8, 10
    db, centers = _family_db(rng, n, c, l)
    # budget for exactly the first 2 of 4 segments (per-segment bytes
    # vary with cell padding, so size the budget from a dry build)
    dry = stream.build_segmented(db, jax.random.PRNGKey(0),
                                 segment_points=1024, block_size=16)
    budget = stream.segment_device_bytes(dry.segments[0]) \
        + stream.segment_device_bytes(dry.segments[1])
    sidx = stream.build_segmented(db, jax.random.PRNGKey(0),
                                  segment_points=1024, block_size=16,
                                  device_budget_bytes=budget)
    assert [r is not None for r in sidx.resident] == \
        [True, True, False, False]
    assert 0.4 < sidx.resident_fraction() < 0.6
    stats: dict = {}
    ci, ki, _ = stream.search_segmented(sidx, centers, 30.0,
                                        k_blocks=64, max_hits=512,
                                        stats_out=stats)
    assert stats["segments"] == 4
    gci, gki, _ = exact.search_radius(db, centers, 30.0)
    assert set(zip(ci, ki)) == set(zip(gci, gki))


def test_recomputed_bounds_match_build(rng):
    """upload_segment's recomputed block bounds equal the original
    build's (same data, same formulas)."""
    n, l = 8192, 25
    db, _ = _family_db(rng, n, 4, l)
    idx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=8)
    seg = stream._to_host_segment(idx, 0)
    up = stream.upload_segment(seg)
    np.testing.assert_allclose(np.asarray(up.block_centroid),
                               np.asarray(idx.block_centroid),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(up.block_radius),
                               np.asarray(idx.block_radius), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(up.db_sorted),
                                  np.asarray(idx.db_sorted))


def test_checkpoint_roundtrip_identical_hits(rng, tmp_path):
    """save_index/load_index on a SegmentedIVF: the reloaded index
    returns the identical hit set (the host byte set IS the checkpoint;
    host_kmers and device bounds are derived on load/upload — VERDICT
    r4 next #4: build-once/search-many)."""
    from hsearch_tpu.utils import checkpoint

    n, c, l = 5000, 8, 10
    db, centers = _family_db(rng, n, c, l)
    a = stream.build_segmented(db, jax.random.PRNGKey(2),
                               segment_points=2048, block_size=16)
    path = str(tmp_path / "seg.npz")
    checkpoint.save_index(path, a)
    b = checkpoint.load_index(path)
    assert b.num_segments == a.num_segments
    assert b.n_points == a.n_points and b.block_size == a.block_size
    for sa, sb in zip(a.segments, b.segments):
        np.testing.assert_array_equal(sa.db_sorted, sb.db_sorted)
        np.testing.assert_array_equal(sa.order, sb.order)
        np.testing.assert_array_equal(sa.host_kmers, sb.host_kmers)
    ca, ka, da = stream.search_segmented(a, centers, 30.0,
                                         k_blocks=32, max_hits=512)
    cb, kb, db_ = stream.search_segmented(b, centers, 30.0,
                                          k_blocks=32, max_hits=512)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(ka, kb)
    np.testing.assert_allclose(da, db_, atol=1e-5)


def test_set_residency_after_load(rng, tmp_path):
    """A checkpoint-loaded index gets its resident prefix back under
    set_residency, and searches identically at any residency."""
    from hsearch_tpu.utils import checkpoint

    n, c, l = 4096, 8, 10
    db, centers = _family_db(rng, n, c, l)
    a = stream.build_segmented(db, jax.random.PRNGKey(3),
                               segment_points=1024, block_size=16)
    path = str(tmp_path / "seg.npz")
    checkpoint.save_index(path, a)
    budget = stream.segment_device_bytes(a.segments[0]) * 2
    b = checkpoint.load_index(path, device_budget_bytes=budget)
    # CPU backend exposes no memory stats -> budget passes unclamped
    assert sum(r is not None for r in b.resident) >= 1
    c0, k0, _ = stream.search_segmented(a, centers, 30.0, k_blocks=32,
                                        max_hits=512)
    c1, k1, _ = stream.search_segmented(b, centers, 30.0, k_blocks=32,
                                        max_hits=512)
    assert set(zip(c0, k0)) == set(zip(c1, k1))


def test_clamp_device_budget_math():
    """The clamp reserves two double-buffer slots + slack against the
    reported free HBM (unit math on a fake device)."""
    seg = stream.HostSegment(
        offset=0, n_points=1024, kmer_len=10,
        db_sorted=np.zeros((64, 160), np.int8),
        order=np.zeros((64, 16), np.int32),
        host_kmers=np.zeros((1024, 10), np.int8))

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30, "bytes_in_use": 4 << 30}

    free = (16 << 30) - (4 << 30)
    reserve = 2 * stream.segment_device_bytes(seg) + (512 << 20)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        got = stream.clamp_device_budget(1 << 62, [seg], device=FakeDev())
    assert got == free - reserve
    # small budgets pass through untouched
    assert stream.clamp_device_budget(1 << 20, [seg],
                                      device=FakeDev()) == 1 << 20
