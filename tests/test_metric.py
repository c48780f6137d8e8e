"""BLOSUM-Metric k-best enumeration and agreement tests."""

import itertools

import jax.numpy as jnp
import numpy as np

from hsearch_tpu import metric
from hsearch_tpu.core import blosum, embedding


def test_k_best_similarity_matches_bruteforce(rng):
    l, k = 3, 25
    q = rng.integers(0, 20, l).astype(np.int32)
    scores, seqs = metric.k_best_peptides(jnp.asarray(q), k, "similarity")
    scores = np.asarray(scores)
    seqs = np.asarray(seqs)
    # brute force over all 20^3 peptides
    all_pep = np.array(list(itertools.product(range(20), repeat=l)))
    all_s = blosum.BLOSUM62[q, all_pep].sum(axis=1)
    want = np.sort(all_s)[::-1][:k]
    np.testing.assert_allclose(np.sort(scores)[::-1], want)
    # returned peptides actually have the claimed scores
    np.testing.assert_allclose(blosum.BLOSUM62[q, seqs].sum(axis=1), scores)
    # best peptide of a self-similar query is the query itself
    assert tuple(seqs[0]) == tuple(np.asarray(
        metric.k_best_peptides(jnp.asarray(q), 1, "similarity")[1][0]))


def test_k_best_distance_matches_bruteforce(rng):
    l, k = 3, 25
    q = rng.integers(0, 20, l).astype(np.int32)
    scores, seqs = metric.k_best_peptides(jnp.asarray(q), k, "distance")
    all_pep = np.array(list(itertools.product(range(20), repeat=l)))
    all_d = embedding.DISTANCE_SQUARE[q, all_pep].sum(axis=1)
    want = np.sort(all_d)[:k]
    # mode='distance' returns actual (positive) squared distances
    np.testing.assert_allclose(np.sort(np.asarray(scores))[:k], want,
                               rtol=1e-5)
    # the nearest peptide is the query itself (distance 0)
    assert tuple(np.asarray(seqs)[np.argmin(np.asarray(scores))]) \
        == tuple(q)


def test_similarity_distance_agreement(rng):
    # the core claim of BLOSUM-Metric: similarity ranking and metric
    # ranking agree substantially (evaluate.cpp's experiment)
    frac = metric.topk_agreement(rng, length=5, k=20, n_queries=10)
    assert frac > 0.5


def test_correlation_negative(rng):
    sim, dis = metric.correlation_samples(rng, length=10, n_pairs=2000)
    r = np.corrcoef(sim, dis)[0, 1]
    assert r < -0.7        # higher similarity <-> smaller distance
