"""Pallas TPU kernels for the hot search ops.

The compute path is mostly XLA-fused GEMMs; these kernels cover the spots
where explicit fusion/placement wins over XLA's defaults:

  * ``sq_distance_prune``: tiled q @ centroids^T on the MXU with the
    distance epilogue (||q||^2 + ||c||^2 - 2 q.c), the sqrt, and the
    triangle-inequality liveness test (d <= r + radius) fused into the
    same VMEM tile — the (C, B) distance matrix never round-trips HBM in
    f32; only the masked key matrix used for top-k selection is written.

  * ``ptable_verify``: the P-table candidate verify
    d2[c, m] = sum_l ptab[c, l, cand[c, m, l]] as a select-accumulate
    over the 20 amino acids, entirely in VMEM.  The XLA fast path
    (``ops/distance.ptable_distances_mxu``) one-hots the candidates to
    (C, chunk, 20L) f32 — 20x the candidate bytes of HBM traffic per
    chunk; this kernel reads each int8 candidate byte once and writes
    only the (C, M) result.  Work per element is exactly L selects+adds
    on the VPU (no 20x MAC inflation), laid out (L sublanes, M lanes)
    so the reduction is lane-preserving.  MEASURED SLOWER end-to-end
    than the MXU path at 2^20/cb=1024 (7.5k vs 9.1k q/s, identical hit
    sets — BENCH_NOTES round-2 A/B): the verify stage was already ~1 ms
    on-chip, and 20 VPU select passes cost more compute than the one-hot
    MAC inflation costs bandwidth.  Kept opt-in (HSEARCH_PALLAS=1).

Kernels follow the pallas_guide patterns: 128-aligned tiles, explicit
VMEM block specs, ``preferred_element_type`` on every dot.  On CPU (unit
tests, virtual meshes) they run in interpreter mode automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_TC = 128   # query tile (sublane-aligned)
_TB = 256   # centroid tile (lane-aligned)


def _prune_kernel(q_ref, c_ref, q2_ref, c2_ref, rad_ref, r_ref, out_ref):
    # q tile (TC, D), c tile (TB, D) -> keys (TC, TB); all operands 2-D
    # (TPU tiles are (sublane, lane); 1-D refs do not legalize)
    cross = jnp.dot(q_ref[:], c_ref[:].T,
                    preferred_element_type=jnp.float32)      # MXU
    d2 = q2_ref[:] + c2_ref[:] - 2.0 * cross                 # (TC,1)+(1,TB)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    alive = d <= r_ref[0, 0] + rad_ref[:]
    out_ref[:] = jnp.where(alive, d, jnp.inf)


def _pad_to(x, m, axis, fill=0.0):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sq_distance_prune(q_emb: jax.Array, centroids: jax.Array,
                      radii: jax.Array, r: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """(C, D) queries vs (B, D) block centroids -> (C, B) pruned keys.

    key[c, b] = distance(q_c, centroid_b) where the block can contain a
    hit (d <= r + radius_b), else +inf — exactly the liveness test of
    search/ivf.py's ``_search_block``, fused behind one pallas_call.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    c, d = q_emb.shape
    b = centroids.shape[0]
    qp = _pad_to(jnp.asarray(q_emb, jnp.float32), _TC, 0)
    cp = _pad_to(jnp.asarray(centroids, jnp.float32), _TB, 0)
    radp = _pad_to(jnp.asarray(radii, jnp.float32), _TB, 0,
                   fill=-np.inf)                 # padding never survives
    q2 = jnp.sum(qp * qp, axis=1).reshape(-1, 1)        # (Cp, 1)
    c2 = jnp.sum(cp * cp, axis=1).reshape(1, -1)        # (1, Bp)
    radp = radp.reshape(1, -1)                          # (1, Bp)
    grid = (qp.shape[0] // _TC, cp.shape[0] // _TB)
    out = pl.pallas_call(
        _prune_kernel,
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], cp.shape[0]),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            # literal 0 in an index map traces as i64 on this JAX build
            # and fails Mosaic legalization; 0*i stays i32
            pl.BlockSpec((_TC, d), lambda i, j: (i, 0 * j)),
            pl.BlockSpec((_TB, d), lambda i, j: (j, 0 * i)),
            pl.BlockSpec((_TC, 1), lambda i, j: (i, 0 * j)),
            pl.BlockSpec((1, _TB), lambda i, j: (0 * i, j)),
            pl.BlockSpec((1, _TB), lambda i, j: (0 * i, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0 * i, 0 * j)),
        ],
        out_specs=pl.BlockSpec((_TC, _TB), lambda i, j: (i, j)),
        interpret=interpret,
    )(qp, cp, q2, c2, radp, jnp.asarray(r, jnp.float32).reshape(1, 1))
    return out[:c, :b]


_TM = 512   # candidate tile (lane-aligned; M is padded to a multiple)
_TQ = 8     # query tile (Mosaic requires the output sublane block to be
            # a multiple of 8 — a (1, TM) block fails lowering on real
            # TPU; interpret mode never enforced it)


def _ptable_verify_kernel(ptab_ref, cand_ref, out_ref):
    # ptab tile (TQ, L, 20) f32; cand tile (TQ, L, TM) int8 -> out (TQ, TM)
    ct = cand_ref[:].astype(jnp.int32)               # (TQ, L, TM)
    val = jnp.zeros(ct.shape, jnp.float32)
    for a in range(20):
        pa = ptab_ref[:, :, a:a + 1]                 # (TQ, L, 1) f32
        val = val + jnp.where(ct == a, pa, 0.0)
    # each val element is exactly ONE table entry (the zero adds are
    # exact in f32), so the lane-preserving sum below is an f32 sum of
    # the same L entries the oracle adds — equal up to addition order
    out_ref[:] = jnp.sum(val, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ptable_verify(ptab: jax.Array, cand: jax.Array,
                  interpret: bool | None = None) -> jax.Array:
    """(C, L, 20) P-tables x (C, M, L) int8 candidates -> (C, M) d2.

    Drop-in replacement for ``ops/distance.ptable_distances_mxu`` (same
    contract as ``ptable_distances``): per (query, candidate) the
    squared distance is the sum of L table entries.  The candidates are
    transposed once to (C, L, M) so the kernel tiles are (L sublane,
    M lane) and the per-tile reduction never crosses lanes.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    c, m, l = cand.shape
    candt = jnp.transpose(cand.astype(jnp.int8), (0, 2, 1))   # (C, L, M)
    candt = _pad_to(candt, _TM, 2)
    candt = _pad_to(candt, _TQ, 0)
    ptabp = _pad_to(jnp.asarray(ptab, jnp.float32), _TQ, 0)
    cp, _, mp = candt.shape
    out = pl.pallas_call(
        _ptable_verify_kernel,
        out_shape=jax.ShapeDtypeStruct((cp, mp), jnp.float32),
        grid=(cp // _TQ, mp // _TM),
        in_specs=[
            pl.BlockSpec((_TQ, l, 20), lambda i, j: (i, 0 * j, 0 * j)),
            pl.BlockSpec((_TQ, l, _TM), lambda i, j: (i, 0 * j, j)),
        ],
        out_specs=pl.BlockSpec((_TQ, _TM), lambda i, j: (i, j)),
        interpret=interpret,
    )(ptabp, candt)
    return out[:c, :m]
