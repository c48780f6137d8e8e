"""Batched banded affine-gap alignment scores on device.

The score-only companion of the native traceback aligner
(native/hsearch_native.cpp hs_align_gapped, itself the working version of
the reference's declared-but-dead AlignGapped, hash_search.cpp:718-948):
one ``lax.scan`` over query rows, each row a vectorized update of the
2*band+1 diagonal lanes across ALL pairs at once.

The row recurrence has an intra-row dependency (E, the gap-in-query
chain).  With affine penalties and gap_open >= gap_ext, a gap opened
from an E-derived cell never beats extending the original gap (the
classic "lazy-F" argument), so E resolves in one vectorized pass with
the rescaling trick:

    E[jj] = max_{k<jj} (A[k] - go - (jj-1-k) ge)
          = cummax(A[k] - go + k*ge)[jj-1] - (jj-1) ge

where A = max(diagonal, F) is the E-independent part.  The x-drop row
abandonment uses the end-of-row best, which is provably identical to the
reference's running-best check (any lane that raises the best is itself
within drop of it).

Intended use: score every gap-triggered hit in one device batch, then run
the native traceback only on hits whose gapped score actually improves —
the per-hit host aligner stops being the --gapped bottleneck
(align.pipeline.refine_gapped wires this in).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -(1 << 28)


@functools.partial(jax.jit, static_argnames=("band",))
def banded_scores(q: jax.Array, qlen: jax.Array, d: jax.Array,
                  dlen: jax.Array, sub21: jax.Array, gap_open: jax.Array,
                  gap_ext: jax.Array, drop: jax.Array, band: int):
    """(P, Lq), (P,), (P, Ld), (P,) -> (score, q_ext, d_ext) per pair.

    Matches hs_align_gapped's score/extents exactly (requires
    gap_open >= gap_ext >= 0, true of the BLAST 11/1 defaults): global
    alignment from (0, 0) within diagonal band |j - i| <= band, gap of
    length g costs open + (g-1)*ext, best-cell score floored at 0,
    first-best tie-breaking in row-major order, x-drop row abandonment
    for rows i > 1.  Sequences hold AA indices 0..20 (20 = unknown);
    rows/columns beyond qlen/dlen are inactive.
    """
    p, lq = q.shape
    w = 2 * band + 1
    lanes = jnp.arange(w, dtype=jnp.int32)
    go = jnp.int32(gap_open)
    ge = jnp.int32(gap_ext)
    dead_lim = NEG // 2

    # row 0: d-gaps from the origin on lanes jj >= band (j = jj - band)
    j0 = jnp.broadcast_to(lanes[None, :] - band, (p, w))
    h0 = jnp.where(j0 == 0, 0, -(go + (j0 - 1) * ge)).astype(jnp.int32)
    h0 = jnp.where((j0 >= 0) & (j0 <= dlen[:, None]), h0, NEG)
    f0 = jnp.full((p, w), NEG, jnp.int32)

    d_pad = jnp.concatenate(
        [d, jnp.full((p, 1), 20, d.dtype)], axis=1).astype(jnp.int32)
    d_max = d_pad.shape[1] - 1
    rescale = lanes * ge                                      # (w,)
    # (jj-1)*ge for the de-rescaling; lane 0 is masked anyway
    descale = jnp.maximum(rescale - ge, 0)

    def row(carry, i):
        h_prev, f_prev, best, bi, bj, dead = carry
        j = jnp.broadcast_to((i - band) + lanes[None, :], (p, w))
        in_band = (j >= 0) & (j <= dlen[:, None])
        # F: gap in d, from (i-1, jj+1)
        h_up = jnp.concatenate(
            [h_prev[:, 1:], jnp.full((p, 1), NEG, jnp.int32)], axis=1)
        f_up = jnp.concatenate(
            [f_prev[:, 1:], jnp.full((p, 1), NEG, jnp.int32)], axis=1)
        f = jnp.maximum(jnp.maximum(h_up - go, f_up - ge), NEG)
        # diagonal from (i-1, jj): needs j > 0 and a live predecessor
        qc = jax.lax.dynamic_index_in_dim(q, i - 1, axis=1,
                                          keepdims=True)     # (p, 1)
        dc = jnp.take_along_axis(d_pad, jnp.clip(j - 1, 0, d_max),
                                 axis=1)                      # (p, w)
        s = sub21[qc, dc]                                     # (p, w)
        diag = jnp.where((j > 0) & (h_prev > dead_lim), h_prev + s, NEG)
        a = jnp.where(in_band, jnp.maximum(diag, f), NEG)
        # E: gap in q, intra-row chain via rescaled exclusive cummax
        m = jnp.maximum(a - go, NEG) + rescale[None, :]
        pm = jax.lax.cummax(m, axis=1)
        e = jnp.concatenate(
            [jnp.full((p, 1), NEG, jnp.int32), pm[:, :-1]], axis=1) \
            - descale[None, :]
        e = jnp.maximum(jnp.where((lanes[None, :] > 0) & (j > 0), e, NEG),
                        NEG)
        h = jnp.maximum(a, e)
        h = jnp.where(in_band & (i <= qlen)[:, None], h, NEG)
        # best update: strictly greater, row-major first occurrence
        rmax = jnp.max(h, axis=1)
        rarg = jnp.argmax(h, axis=1).astype(jnp.int32)
        upd = (~dead) & (rmax > best)
        best2 = jnp.where(upd, rmax, best)
        bi2 = jnp.where(upd, i, bi)
        bj2 = jnp.where(upd, (i - band) + rarg, bj)
        alive = jnp.any(h >= best2[:, None] - drop, axis=1)
        dead2 = dead | ((~alive) & (i > 1))
        return (h, f, best2, bi2, bj2, dead2), None

    init = (h0, f0, jnp.zeros(p, jnp.int32), jnp.zeros(p, jnp.int32),
            jnp.full(p, -band, jnp.int32), jnp.zeros(p, bool))
    carry, _ = jax.lax.scan(row, init,
                            jnp.arange(1, lq + 1, dtype=jnp.int32))
    _, _, best, bi, bj, _ = carry
    return best, bi, bj
