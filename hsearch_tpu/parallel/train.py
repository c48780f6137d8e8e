"""Data-parallel training of the metric embedding on device.

The reference generated its 20x8 coordinate table once, offline, in MATLAB
(IGC/distance2coordinate/BLOSUM.m:25-33 ``mdscale``).  Here the embedding is
a trainable on-device artifact: stress (squared-distance reconstruction
error against the BLOSUM62 metric, blosum.py) is minimized by gradient
descent over batches of k-mer pairs, data-parallel over the whole mesh —
the framework's training step.  Gradients are averaged across devices by
XLA-inserted collectives (batch sharded over both mesh axes, parameters
replicated).

This both regenerates the shipped table from first principles (matching
core/mds.py's SMACOF solution) and lets users fit embeddings for other
substitution matrices or dimensions (e.g. d=4, util.hpp:66-88's commented
variant) at TPU speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import blosum
from . import mesh as mesh_lib

DATA, DB = mesh_lib.DATA_AXIS, mesh_lib.DB_AXIS


def stress_loss(coords: jax.Array, xa: jax.Array, xb: jax.Array,
                target_d2: jax.Array) -> jax.Array:
    """Kruskal stress: squared error between embedded and target *distances*.

    coords (20, d); xa, xb (B, L) int32 k-mer pairs; target_d2 (B,) f32 =
    sum_l metric_d2(xa_l, xb_l).  Matches mdscale's metric-stress objective
    (BLOSUM.m:25-33); optimizing squared-distance MSE instead overweights
    far pairs and reconstructs the metric visibly worse.
    """
    ea = jnp.take(coords, xa, axis=0)          # (B, L, d)
    eb = jnp.take(coords, xb, axis=0)
    d2 = jnp.sum((ea - eb) ** 2, axis=(1, 2))  # (B,)
    d = jnp.sqrt(d2 + 1e-12)
    return jnp.mean((d - jnp.sqrt(target_d2)) ** 2)


def make_train_step(optimizer: optax.GradientTransformation,
                    mesh: jax.sharding.Mesh | None = None):
    """Jitted (coords, opt_state, batch) -> (coords, opt_state, loss).

    With a mesh, the batch is sharded over (data, db) flattened and coords
    are replicated; XLA inserts the gradient all-reduce.
    """

    def step(coords, opt_state, xa, xb, target_d2):
        loss, grads = jax.value_and_grad(stress_loss)(coords, xa, xb,
                                                      target_d2)
        updates, opt_state = optimizer.update(grads, opt_state, coords)
        return optax.apply_updates(coords, updates), opt_state, loss

    if mesh is None:
        return jax.jit(step)
    batch_sharding = NamedSharding(mesh, P((DATA, DB), None))
    scalar = NamedSharding(mesh, P((DATA, DB)))
    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(repl, repl, batch_sharding,
                                       batch_sharding, scalar),
                   out_shardings=(repl, repl, repl))


def sample_pair_batch(rng: np.random.Generator, batch: int, kmer_len: int):
    """Random k-mer pairs + their BLOSUM-metric squared distances."""
    xa = rng.integers(0, 20, (batch, kmer_len), dtype=np.int32)
    xb = rng.integers(0, 20, (batch, kmer_len), dtype=np.int32)
    d2 = blosum.BLOSUM_DISTANCE[xa, xb].astype(np.float32) ** 2
    return xa, xb, d2.sum(axis=1)


def fit_embedding(dim: int = 8, steps: int = 2000, batch: int = 4096,
                  kmer_len: int = 1, lr: float = 3e-2, seed: int = 0,
                  mesh: jax.sharding.Mesh | None = None) -> np.ndarray:
    """Train a (20, dim) embedding of the BLOSUM62 metric from scratch."""
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.normal(0, 1.0, (20, dim)), jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(coords)
    step = make_train_step(opt, mesh)
    for _ in range(steps):
        xa, xb, d2 = sample_pair_batch(rng, batch, kmer_len)
        coords, opt_state, _ = step(coords, opt_state, jnp.asarray(xa),
                                    jnp.asarray(xb), jnp.asarray(d2))
    return np.asarray(coords)
