"""Exact oracle + LSH search: distances, hit sets, recall."""

import jax
import numpy as np
import pytest

from hsearch_tpu.core import embedding
from hsearch_tpu.lsh import pstable
from hsearch_tpu.ops import distance, segment
from hsearch_tpu.search import evaluate, exact, motif


def _random_kmers(rng, n, l):
    return rng.integers(0, 20, size=(n, l), dtype=np.int32)


def _mutate(rng, kmer, n_mut):
    out = kmer.copy()
    pos = rng.choice(len(kmer), size=n_mut, replace=False)
    out[pos] = rng.integers(0, 20, size=n_mut)
    return out


def _planted_db(rng, centers, n_background, muts=(1, 2)):
    """DB = mutated copies of centers (near) + random background (far)."""
    near = []
    for c in centers:
        for m in muts:
            near.append(_mutate(rng, c, m))
    bg = _random_kmers(rng, n_background, centers.shape[1])
    return np.concatenate([np.stack(near), bg])


# ---------------------------------------------------------------------------
# distance ops
# ---------------------------------------------------------------------------

def test_kmer_distance_matrix_matches_dense(rng):
    q = _random_kmers(rng, 7, 10)
    db = _random_kmers(rng, 23, 10)
    got = np.asarray(distance.kmer_sq_distance_matrix(q, db))
    pq = embedding.embed_kmers(q, dtype=np.float64)
    pd = embedding.embed_kmers(db, dtype=np.float64)
    want = ((pq[:, None, :] - pd[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_point_vs_kmer_distance(rng):
    db = _random_kmers(rng, 23, 10)
    pts = embedding.embed_kmers(_random_kmers(rng, 5, 10), dtype=np.float32)
    pts = pts + rng.normal(0, 0.1, pts.shape).astype(np.float32)
    got = np.asarray(distance.point_vs_kmer_sq_distance(pts, db))
    pd = embedding.embed_kmers(db, dtype=np.float64)
    want = ((pts[:, None, :].astype(np.float64) - pd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.05)


def test_blosum_score_matrix(rng):
    from hsearch_tpu.core import blosum
    q = _random_kmers(rng, 5, 8)
    db = _random_kmers(rng, 11, 8)
    got = np.asarray(distance.kmer_blosum_score_matrix(q, db))
    want = blosum.BLOSUM62[q[:, None, :], db[None, :, :]].sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_blocked_distance(rng):
    q = _random_kmers(rng, 3, 10)
    db = _random_kmers(rng, 130, 10)
    got = distance.blocked_kmer_sq_distance(q, db, block=32)
    want = np.asarray(distance.kmer_sq_distance_matrix(q, db))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# segment / packing ops
# ---------------------------------------------------------------------------

def test_pack_codes_exact_is_injective(rng):
    # within the 7-bit clip range of the int32 exact packing
    b = rng.integers(-60, 60, size=(1000, 4)).astype(np.int32)
    codes = np.asarray(segment.pack_codes_exact(b))
    uniq_tuples = len({tuple(r) for r in b.tolist()})
    assert len(np.unique(codes)) == uniq_tuples


def test_build_probe_roundtrip(rng):
    codes = rng.integers(0, 5, size=(2, 50)).astype(np.int64)
    tables = segment.build_tables(codes)
    q = np.array([[0, 3], [4, 4], [9, 9]], dtype=np.int64)
    start, count = segment.probe(tables, q)
    for ti in range(2):
        for qi in range(3):
            want = int((codes[ti] == q[qi, ti]).sum())
            assert int(count[qi, ti]) == want
    ids = segment.gather_candidates(tables, start, count, cand_max=60)
    ids = np.asarray(ids)
    # every gathered valid id must actually have the queried code
    for qi in range(3):
        row = ids[qi].reshape(2, 60)
        for ti in range(2):
            valid = row[ti][row[ti] < 50]
            assert (codes[ti][valid] == q[qi, ti]).all()


def test_dedup_sorted():
    ids = np.array([[3, 1, 3, 99, 1, 2]], dtype=np.int32)
    out = np.asarray(segment.dedup_sorted(ids, sentinel=99))
    kept = out[out < 99]
    assert sorted(kept.tolist()) == [1, 2, 3]


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------

def test_fused_hash_matches_embedded_hash(rng):
    km = _random_kmers(rng, 64, 10)
    params = pstable.init(jax.random.key(0), 80, hash_k=4, hash_l=3, w=50.0)
    idx_fused = np.asarray(pstable.bucket_indices_kmers(km, params))
    pts = embedding.embed_kmers(km, dtype=np.float32)
    idx_dense = np.asarray(pstable.bucket_indices(pts, params))
    # f32 rounding can flip a floor at bucket boundaries; require near-total
    # agreement and no off-by-more-than-one
    agree = (idx_fused == idx_dense).mean()
    assert agree > 0.999
    assert np.abs(idx_fused - idx_dense).max() <= 1


def test_collision_probability_monotone(rng):
    """Closer pairs must collide more often — the LSH property."""
    params = pstable.init(jax.random.key(1), 80, hash_k=1, hash_l=64, w=50.0)
    c = _random_kmers(rng, 20, 10)
    near = np.stack([_mutate(rng, k, 1) for k in c])
    far = _random_kmers(rng, 20, 10)
    def rate(a, b):
        ca = np.asarray(pstable.bucket_indices_kmers(a, params))
        cb = np.asarray(pstable.bucket_indices_kmers(b, params))
        return (ca == cb).mean()
    assert rate(c, near) > rate(c, far) + 0.1


# ---------------------------------------------------------------------------
# search engines
# ---------------------------------------------------------------------------

def test_exact_search_radius_matches_numpy(rng):
    db = _random_kmers(rng, 200, 10)
    centers = _random_kmers(rng, 6, 10)
    r = 46.0
    ci, ki, dd = exact.search_radius(db, centers, r, center_block=4)
    d2 = embedding.DISTANCE_SQUARE[
        centers[:, None, :], db[None, :, :]].sum(-1)
    want_c, want_k = np.nonzero(d2 <= r * r)
    got = set(zip(ci.tolist(), ki.tolist()))
    assert got == set(zip(want_c.tolist(), want_k.tolist()))
    np.testing.assert_allclose(
        np.sort(dd), np.sort(np.sqrt(d2[want_c, want_k])), rtol=1e-4)


def test_exact_topk(rng):
    db = _random_kmers(rng, 100, 10)
    centers = _random_kmers(rng, 4, 10)
    dd, ii = exact.search_topk(db, centers, k=5)
    d2 = embedding.DISTANCE_SQUARE[
        centers[:, None, :], db[None, :, :]].sum(-1)
    for c in range(4):
        want = np.sort(d2[c])[:5]
        np.testing.assert_allclose(np.sort(dd[c]) ** 2, want, rtol=1e-3)


def test_lsh_search_subset_of_exact_and_high_recall(rng):
    centers = _random_kmers(rng, 10, 10)
    # 1-mutation neighbors: distances <= 26, squarely in the LSH sweet spot
    db = _planted_db(rng, centers, n_background=500, muts=(1, 1, 1))
    r = 30.0
    cfg = motif.MotifSearchConfig(hash_k=4, hash_l=16, w=50.0, radius=r,
                                  center_block=8)
    index = motif.build_index(db, jax.random.key(2), cfg)
    ci, ki, dd = motif.search(index, centers, cfg)
    tci, tki, tdd = exact.search_radius(db, centers, r)
    truth = set(zip(tci.tolist(), tki.tolist()))
    found = set(zip(ci.tolist(), ki.tolist()))
    # verification is exact -> no false positives
    assert found <= truth
    rep = evaluate.recall_from_indices(tci, tki, tdd, ci, ki, r)
    assert rep.recall > 0.85, rep
    # distances reported must be exact
    lut = {(c, k): d for c, k, d in zip(tci.tolist(), tki.tolist(), tdd)}
    for c, k, d in zip(ci.tolist(), ki.tolist(), dd):
        np.testing.assert_allclose(d, lut[(c, k)], rtol=1e-3, atol=1e-2)


def test_lsh_search_with_real_point_centers(rng):
    centers_k = _random_kmers(rng, 5, 10)
    db = _planted_db(rng, centers_k, n_background=200, muts=(1, 1))
    centers = embedding.embed_kmers(centers_k, dtype=np.float32)
    r = 30.0
    cfg = motif.MotifSearchConfig(hash_k=4, hash_l=8, w=50.0, radius=r,
                                  center_block=8)
    index = motif.build_index(db, jax.random.key(3), cfg)
    ci, ki, dd = motif.search(index, centers, cfg)
    tci, tki, tdd = exact.search_radius(db, centers, r)
    truth = set(zip(tci.tolist(), tki.tolist()))
    found = set(zip(ci.tolist(), ki.tolist()))
    assert found <= truth
    assert len(found) >= 0.8 * len(truth)


def test_weight_function():
    assert evaluate.weight(0.0, 200) == 1.0
    assert evaluate.weight(23.9, 200) == 1.0
    assert evaluate.weight(26.0, 200) == 0.5
    assert abs(evaluate.weight(124.0, 200) - 0.01) < 1e-12
    # out-of-range distances weigh by the same formula (the reference
    # hard-exits there, a debugging trap we do not reproduce)
    assert evaluate.weight(201.0, 200) == 1.0 / (201.0 - 24.0)


def test_fast_distance_matches_exact(rng):
    import jax.numpy as jnp
    from hsearch_tpu.ops import distance as D
    q = rng.integers(0, 20, (16, 25)).astype(np.int32)
    db = rng.integers(0, 20, (200, 25)).astype(np.int32)
    a = np.asarray(D.kmer_sq_distance_matrix(jnp.asarray(q),
                                             jnp.asarray(db)))
    b = np.asarray(D.kmer_sq_distance_matrix_fast(jnp.asarray(q),
                                                  jnp.asarray(db)))
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_search_protein_db_best_center(rng):
    import jax
    from hsearch_tpu.core import io as hio
    centers = _random_kmers(rng, 4, 10)
    seqs = []
    for i in range(4):
        s = np.concatenate([_random_kmers(rng, 1, 15)[0], centers[i],
                            _random_kmers(rng, 1, 15)[0]])
        seqs.append(s)
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(4)],
                       seq=np.concatenate(seqs), starts=starts)
    cfg = motif.MotifSearchConfig(hash_k=4, hash_l=8, w=50.0, radius=25.0)
    bc, bd, pos = motif.search_protein_db(db, centers,
                                          jax.random.PRNGKey(0), cfg)
    # each planted center found at its exact position with distance 0
    for i in range(4):
        planted_pos = starts[i] + 15
        j = np.nonzero(pos == planted_pos)[0][0]
        assert bc[j] == i and bd[j] < 1e-3


def test_weight2_pivot():
    assert evaluate.weight2(0.0) == pytest.approx(1.0)
    assert evaluate.weight2(49.38) == pytest.approx(0.5)
    assert evaluate.weight2(60.0) == pytest.approx(60.0 / (2 * 49.38))
    assert evaluate.weight2(200.0) == 1.0


def test_streamed_radius_matches_oneshot(rng):
    db = _random_kmers(rng, 700, 10)
    centers = _random_kmers(rng, 9, 10)
    r = 40.0
    a = exact.search_radius(db, centers, r, max_hits=256)
    b = exact.search_radius(db, centers, r, max_hits=256, db_chunk=128)
    assert set(zip(a[0], a[1])) == set(zip(b[0], b[1]))
    da = {(c, k): d for c, k, d in zip(*a)}
    for c, k, d in zip(*b):
        np.testing.assert_allclose(d, da[(c, k)], atol=1e-3)


def test_ptable_distances_mxu_matches_gather(rng):
    """The MXU one-hot contraction equals the per-position gather form
    (and both equal the direct sum) for int8 candidates and ragged M."""
    from hsearch_tpu.search.motif import _center_ptables
    c, m, l = 5, 77, 12          # m deliberately not a chunk multiple
    centers = rng.integers(0, 20, (c, l), dtype=np.int32)
    cand = rng.integers(0, 20, (c, m, l)).astype(np.int8)
    ptab = _center_ptables(jax.numpy.asarray(centers), l)
    a = np.asarray(distance.ptable_distances(ptab, jax.numpy.asarray(cand)))
    b = np.asarray(distance.ptable_distances_mxu(
        ptab, jax.numpy.asarray(cand), chunk=32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)
    pt = np.asarray(ptab)
    direct = np.zeros((c, m), np.float32)
    for ci in range(c):
        for mi in range(m):
            direct[ci, mi] = pt[ci, np.arange(l), cand[ci, mi]].sum()
    np.testing.assert_allclose(b, direct, rtol=1e-5, atol=1e-3)


def test_lsh_packed_overflow_fallback(rng):
    """All-hit radius overflows the packed capacity; fallback is lossless."""
    import warnings
    n, c, l = 256, 8, 10
    db = rng.integers(0, 20, (n, l), dtype=np.int32)
    centers = db[:c].copy()
    cfg = motif.MotifSearchConfig(hash_k=2, hash_l=4, w=500.0,
                                  radius=1e3, max_hits=n)
    idx = motif.build_index(db, jax.random.PRNGKey(0), cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ci, ki, d = motif.search(idx, centers, cfg)
    gci, gki, _ = exact.search_radius(db, centers, 1e3, max_hits=n)
    got, gt = set(zip(ci, ki)), set(zip(gci, gki))
    assert got <= gt and len(got) > c * n // 2   # wide hash => most hits
