"""BLOSUM-Metric validation: k-best peptide enumeration and agreement.

The reference's BLOSUM-Metric subproject builds a layered DAG (source, 20
nodes per position, sink) and lazily enumerates k-longest (similarity) or
k-shortest (transformed distance) paths with per-node priority queues
(k_nearest_neighbor_similarity.cpp:5-128, k_nearest_neighbor_distance.cpp)
to check that similarity ranking and metric-distance ranking agree
(evaluate.cpp:60-121), plus a similarity-vs-distance correlation dump
(evaluate_correlation.cpp:43-69 — whose ``s2[i]-'B'`` indexing bug,
:29,38, is not reproduced).

TPU-native form: the objective is separable across positions, so an exact
top-k beam works — keep the k best partial peptides, extend each by all
20 residues, re-top-k; one ``lax.scan`` over positions, each step a
(k*20,) ``top_k``.  (Exactness: scores are sums of independent
per-position terms, so a full-length top-k member's every prefix is a
top-k prefix.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import blosum, embedding


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def k_best_peptides(query: jax.Array, k: int, mode: str = "similarity"):
    """The k peptides of len(query) ranking best against ``query``.

    mode='similarity': maximize sum BLOSUM62[q_l, x_l]
    mode='distance':   minimize sum metric-squared-distance (embedding
                       DISTANCE_SQUARE — the Euclidean side of the check)

    Returns (scores (k,), peptides (k, L) int32), best first.
    """
    if mode == "similarity":
        table = jnp.asarray(blosum.BLOSUM62, jnp.float32)
        sign = 1.0
    elif mode == "distance":
        table = jnp.asarray(embedding.DISTANCE_SQUARE, jnp.float32)
        sign = -1.0
    elif mode == "metric":
        table = jnp.asarray(blosum.BLOSUM_DISTANCE, jnp.float32)
        sign = -1.0
    else:
        raise ValueError(mode)
    q = jnp.asarray(query, jnp.int32)
    l = q.shape[0]
    per_pos = sign * jnp.take(table, q, axis=0)          # (L, 20)

    neg_inf = jnp.float32(-3e38)

    # scan over positions, threading (scores, seqs, pos_idx)
    def body(carry, per):
        scores, seqs, pos = carry
        cand = scores[:, None] + per[None, :]            # (k, 20)
        flat = cand.reshape(-1)
        top, idx = jax.lax.top_k(flat, k)
        parent = idx // 20
        letter = (idx % 20).astype(jnp.int32)
        seqs = jnp.take(seqs, parent, axis=0)
        seqs = seqs.at[:, pos].set(letter)
        return (top, seqs, pos + 1), None

    scores0 = jnp.concatenate(
        [jnp.zeros(1, jnp.float32), jnp.full((k - 1,), neg_inf)])
    seqs0 = jnp.zeros((k, l), jnp.int32)
    (scores, seqs, _), _ = jax.lax.scan(
        body, (scores0, seqs0, jnp.int32(0)), per_pos)
    return sign * scores, seqs


def topk_agreement(rng: np.random.Generator, length: int, k: int,
                   n_queries: int = 100) -> float:
    """Mean overlap fraction between similarity-top-k and distance-top-k
    candidate sets over random queries (evaluate.cpp:60-95)."""
    total = 0.0
    for _ in range(n_queries):
        q = rng.integers(0, 20, length).astype(np.int32)
        _, sim = k_best_peptides(jnp.asarray(q), k, "similarity")
        _, dis = k_best_peptides(jnp.asarray(q), k, "distance")
        a = {tuple(r) for r in np.asarray(sim).tolist()}
        b = {tuple(r) for r in np.asarray(dis).tolist()}
        total += len(a & b) / k
    return total / n_queries


def correlation_samples(rng: np.random.Generator, length: int,
                        n_pairs: int = 10000):
    """(similarity scores, metric distances) for random peptide pairs
    (evaluate_correlation.cpp:43-69, indexing bug fixed)."""
    a = rng.integers(0, 20, (n_pairs, length))
    b = rng.integers(0, 20, (n_pairs, length))
    sim = blosum.BLOSUM62[a, b].sum(axis=1)
    dis = np.sqrt(embedding.DISTANCE_SQUARE[a, b].sum(axis=1))
    return sim.astype(np.float64), dis.astype(np.float64)
