"""Core layer: alphabets, BLOSUM transform, embedding tables, MDS."""

import numpy as np
import pytest

from hsearch_tpu.core import alphabet, blosum, embedding, mds


# The reference's DISTANCE_SQUARE table (hclust/src/hclust/util.hpp:43-64),
# first three rows, to pin down both the coordinates table and row order.
_REF_DSQ_ROW0 = [
    0.000000, 131.470960, 179.985160, 179.395157, 177.850435, 128.434308,
    132.072530, 115.360078, 251.297575, 115.515906, 115.537752, 115.036696,
    114.999607, 207.300276, 177.623697, 38.736326, 115.931022, 456.623739,
    220.666880, 91.067499,
]


def test_encode_decode_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYV"
    idx = alphabet.encode(s)
    assert idx.tolist() == list(range(20))
    assert alphabet.decode(idx) == s
    # lowercase and invalid letters
    idx2 = alphabet.encode("arBJoxz")
    assert idx2[0] == 0 and idx2[1] == 1
    assert (idx2[2:] == alphabet.INVALID).all()
    assert alphabet.decode(idx2) == "ARXXXXX"


def test_randomize_unknown_deterministic():
    idx = alphabet.encode("AXBA")
    r1 = alphabet.randomize_unknown(idx, np.random.default_rng(7))
    r2 = alphabet.randomize_unknown(idx, np.random.default_rng(7))
    assert (r1 == r2).all()
    assert (r1 < 20).all()
    assert r1[0] == 0 and r1[3] == 0


def test_kmer_view():
    idx = alphabet.encode("ARNDC")
    wins = alphabet.kmer_view(idx, 3)
    assert wins.shape == (3, 3)
    assert alphabet.decode(wins[1]) == "RND"


def test_blosum_distance_transform():
    D = blosum.BLOSUM_DISTANCE
    # d(A,R) = 4 + 5 - 2*(-1) = 11, matching BLOSUM.m:3 row 1 col 2.
    assert D[0, 1] == 11
    assert (np.diag(D) == 0).all()
    assert (D == D.T).all()
    # Full first row of the hard-coded matrix in BLOSUM.m:3.
    ref_row0 = [0, 11, 14, 14, 13, 11, 11, 10, 16, 10,
                10, 11, 11, 14, 13, 6, 9, 21, 15, 8]
    assert D[0].tolist() == ref_row0


def test_triangle_inequality_holds():
    assert blosum.triangle_inequality_violations(blosum.BLOSUM_DISTANCE) == 0


def test_distance_square_matches_reference_table():
    np.testing.assert_allclose(
        embedding.DISTANCE_SQUARE[0], _REF_DSQ_ROW0, atol=2e-4)
    # embedding distances approximate the BLOSUM metric (not its square)
    d_embed = np.sqrt(embedding.DISTANCE_SQUARE)
    err = np.abs(d_embed - blosum.BLOSUM_DISTANCE)
    assert err.mean() < 1.0  # d=8 MDS reconstruction quality


def test_embed_and_kmer_sq_distance_agree():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 20, size=(16, 10))
    b = rng.integers(0, 20, size=(16, 10))
    pa = embedding.embed_kmers(a, dtype=np.float64)
    pb = embedding.embed_kmers(b, dtype=np.float64)
    dense = ((pa - pb) ** 2).sum(-1)
    table = embedding.kmer_sq_distance(a, b)
    np.testing.assert_allclose(dense, table, rtol=1e-12)


def test_mds_regenerates_embedding_quality():
    D = blosum.BLOSUM_DISTANCE.astype(float)
    X = mds.smacof(D, 8)
    # Reference table reconstruction error as the bar to meet.
    ref_l2 = mds.l2_error(D, embedding.COORDINATES)
    our_l2 = mds.l2_error(D, X)
    assert our_l2 <= ref_l2 * 1.05
    # And sanity: higher dim should not be (much) worse.
    X4 = mds.smacof(D, 4)
    assert mds.l2_error(D, X4) >= our_l2


def test_reduced_kmer_ids():
    # "ARN" -> groups [0,1,2] -> 0*1 + 1*8 + 2*64 = 136 (Kmer2Integer order)
    ids = alphabet.reduced_kmer_ids(alphabet.encode("ARN"))
    assert ids.tolist() == [136]
    ids = alphabet.reduced_kmer_ids(alphabet.encode("ARND"))
    assert len(ids) == 2
    assert (ids < 512).all()
