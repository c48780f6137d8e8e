"""Batched seed-extend kernels: seed scoring, greedy exact extension,
x-drop ungapped extension.

The reference extends one candidate at a time in scalar loops
(hash_search.cpp:528-588 seed+greedy, AlignFwd/AlignBwd :661-716).  Here a
whole batch of (query-pos, subject-pos) seed pairs extends in lock-step:
each phase is a chunked ``lax.while_loop`` whose body gathers a fixed
window of residues per lane, evaluates it with cumulative sums/maxima
(branch-free), and retires lanes as they terminate.  Work is
O(sum of true extension lengths) like the reference, but 10^3-10^4 lanes
deep on the VPU.

Semantics notes (parity with the reference):
  * seed score adds full BLOSUM62 over the 10-residue local seed
    (hash_search.cpp:551-558); match counts exact residue equality.
  * greedy extension continues while the murphy10 *group* ids match
    (m_aCode2Ten comparison, :564-586) but scores with full BLOSUM62.
  * x-drop: s < MINSCORE(-20) or s < max - UngapExtDrop stops the scan;
    the stopping element is still accumulated, best prefix wins (:661-716).
  * unknown residues score NEGSCORE=-5 (paras.hpp:8) and never "match";
    (the reference maps all unknown letters to one code so two unknowns
    compare equal, :34 — a quirk, not reproduced).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import blosum
from . import reduced

CHUNK = 64
MINSCORE = -20        # paras.hpp:13
NEGSCORE = -5         # paras.hpp:8

# 21x21 substitution matrix: row/col 20 = unknown residue, scored -5.
_SUB = np.full((21, 21), NEGSCORE, np.int32)
_SUB[:20, :20] = blosum.BLOSUM62
# murphy10 group per AA index; unknown -> 10, padded "never equal" -> 11..
_GROUP = np.concatenate([reduced.MURPHY10.astype(np.int32), [10]])


def _codes(seq: jax.Array) -> tuple[jax.Array, jax.Array]:
    """seq (S,) AA indices (>=20 unknown) -> (aa21, group) arrays."""
    aa = jnp.minimum(seq.astype(jnp.int32), 20)
    grp = jnp.take(jnp.asarray(_GROUP), aa)
    return aa, grp


def _window(arr: jax.Array, base: jax.Array, sign: int) -> jax.Array:
    """Gather a CHUNK window per lane: arr[base + sign*i], i in [0, CHUNK)."""
    offs = jnp.arange(CHUNK, dtype=jnp.int32)
    idx = base[:, None] + sign * offs[None, :]
    return jnp.take(arr, jnp.clip(idx, 0, arr.shape[0] - 1), axis=0), idx


@functools.partial(jax.jit, static_argnames=("seed_len",))
def seed_scores(qaa, daa, qpos, dpos, seed_len: int):
    """Initial seed score/match over ``seed_len`` residues
    (hash_search.cpp:551-558).  Positions must be in range."""
    sub = jnp.asarray(_SUB)
    offs = jnp.arange(seed_len, dtype=jnp.int32)
    qi = jnp.take(qaa, qpos[:, None] + offs[None, :], axis=0)
    di = jnp.take(daa, dpos[:, None] + offs[None, :], axis=0)
    score = jnp.sum(sub[qi, di], axis=1)
    match = jnp.sum((qi == di) & (qi < 20), axis=1)
    return score.astype(jnp.int32), match.astype(jnp.int32)


def _greedy_phase(qaa, qgrp, daa, dgrp, qstart, dstart, limit, sign):
    """Greedy extension while murphy10 groups are equal.

    qstart/dstart: first position to test (already offset by caller);
    limit: max residues available in this direction (>=0).
    Returns (ext, score_delta, match_delta).
    """
    sub = jnp.asarray(_SUB)
    b = qstart.shape[0]

    def cond(state):
        ext, score, match, done = state
        return jnp.logical_not(jnp.all(done))

    def body(state):
        ext, score, match, done = state
        qw, _ = _window(qaa, qstart + sign * ext, sign)
        dw, _ = _window(daa, dstart + sign * ext, sign)
        qg, _ = _window(qgrp, qstart + sign * ext, sign)
        dg, _ = _window(dgrp, dstart + sign * ext, sign)
        offs = jnp.arange(CHUNK, dtype=jnp.int32)
        in_range = (ext[:, None] + offs[None, :]) < limit[:, None]
        eq = in_range & (qg == dg) & (qg < 10)
        all_eq = jnp.all(eq, axis=1)
        run = jnp.where(all_eq, CHUNK,
                        jnp.argmin(eq, axis=1)).astype(jnp.int32)
        run = jnp.where(done, 0, run)
        sel = offs[None, :] < run[:, None]
        score = score + jnp.sum(jnp.where(sel, sub[qw, dw], 0),
                                axis=1).astype(jnp.int32)
        match = match + jnp.sum(sel & (qw == dw) & (qw < 20),
                                axis=1).astype(jnp.int32)
        ext = ext + run
        done = done | (run < CHUNK)
        return ext, score.astype(jnp.int32), match.astype(jnp.int32), done

    z = jnp.zeros(b, jnp.int32)
    ext, score, match, _ = jax.lax.while_loop(
        cond, body, (z, z, z, jnp.zeros(b, bool)))
    return ext, score, match


def _xdrop_phase(qaa, daa, qstart, dstart, limit, score0, drop, sign):
    """X-drop ungapped extension (AlignFwd/AlignBwd, hash_search.cpp:661-716).

    Returns (score_delta = maxs - score0, best_ext, best_match).
    """
    sub = jnp.asarray(_SUB)
    b = qstart.shape[0]
    neg_inf = jnp.int32(-(10 ** 6))

    def cond(state):
        return jnp.logical_not(jnp.all(state[-1]))

    def body(state):
        l_tot, s, maxs, best_ext, best_match, match_tot, done = state
        qw, _ = _window(qaa, qstart + sign * l_tot, sign)
        dw, _ = _window(daa, dstart + sign * l_tot, sign)
        offs = jnp.arange(CHUNK, dtype=jnp.int32)
        in_range = (l_tot[:, None] + offs[None, :]) < limit[:, None]
        subs = jnp.where(in_range, sub[qw, dw], neg_inf)
        s_i = s[:, None] + jnp.cumsum(subs, axis=1,
                                      dtype=jnp.int32)         # (B, CHUNK)
        rm_i = jnp.maximum(maxs[:, None],
                           jax.lax.cummax(s_i, axis=1))
        viol = (s_i < MINSCORE) | (s_i < rm_i - drop)
        any_viol = jnp.any(viol, axis=1)
        t = jnp.where(any_viol, jnp.argmax(viol, axis=1),
                      CHUNK - 1).astype(jnp.int32)
        processed = jnp.where(done, 0, t + 1)                  # elems added
        sel = offs[None, :] < processed[:, None]
        s_sel = jnp.where(sel, s_i, neg_inf)
        chunk_max = jnp.max(s_sel, axis=1)
        improved = chunk_max > maxs
        arg = jnp.argmax(s_sel, axis=1).astype(jnp.int32)      # first max
        match_i = jnp.cumsum((qw == dw) & (qw < 20) & in_range,
                             axis=1).astype(jnp.int32)
        new_best_ext = l_tot + arg + 1
        new_best_match = match_tot + jnp.take_along_axis(
            match_i, arg[:, None], axis=1)[:, 0]
        best_ext = jnp.where(improved, new_best_ext, best_ext)
        best_match = jnp.where(improved, new_best_match, best_match)
        maxs = jnp.maximum(maxs, chunk_max)
        last = jnp.take_along_axis(
            s_i, jnp.maximum(processed - 1, 0)[:, None], axis=1)[:, 0]
        s = jnp.where(processed > 0, last, s)
        match_last = jnp.take_along_axis(
            match_i, jnp.maximum(processed - 1, 0)[:, None], axis=1)[:, 0]
        match_tot = match_tot + jnp.where(processed > 0, match_last, 0)
        l_tot = l_tot + processed
        done = done | any_viol | (processed == 0)
        return (l_tot, s.astype(jnp.int32), maxs.astype(jnp.int32),
                best_ext.astype(jnp.int32), best_match.astype(jnp.int32),
                match_tot.astype(jnp.int32), done)

    z = jnp.zeros(b, jnp.int32)
    state = (z, score0, score0, z, z, z, score0 < MINSCORE)
    out = jax.lax.while_loop(cond, body, state)
    _, _, maxs, best_ext, best_match, _, _ = out
    return maxs - score0, best_ext, best_match


@functools.partial(jax.jit, static_argnames=("seed_len",))
def extend_pairs(qseq, dseq, qpos, dpos, qlo, qhi, dlo, dhi,
                 drop, seed_len: int = 10):
    """Full extension of a batch of seed pairs.

    qseq/dseq: (Sq,), (Sd,) AA-index arrays (>=20 unknown).
    qpos/dpos: (B,) seed start positions; qlo/qhi, dlo/dhi: (B,) sequence
    bounds [lo, hi).  drop: x-drop threshold (UngapExtDrop, raw score).

    Returns dict of (B,) arrays: score, match, q_beg, q_end, d_beg, d_end
    (alignment bounds, end exclusive) — the STAlnmnt fields of
    hash_search.cpp:593-659 for the ungapped path.
    """
    qaa, qgrp = _codes(qseq)
    daa, dgrp = _codes(dseq)

    score, match = seed_scores(qaa, daa, qpos, dpos, seed_len)

    # greedy forward from seed end (hash_search.cpp:559-573)
    fwd_limit = jnp.minimum(qhi - (qpos + seed_len), dhi - (dpos + seed_len))
    gf_ext, gf_s, gf_m = _greedy_phase(
        qaa, qgrp, daa, dgrp, qpos + seed_len, dpos + seed_len,
        jnp.maximum(fwd_limit, 0), +1)
    # greedy backward from seed start - 1 (:574-588)
    bwd_limit = jnp.minimum(qpos - qlo, dpos - dlo)
    gb_ext, gb_s, gb_m = _greedy_phase(
        qaa, qgrp, daa, dgrp, qpos - 1, dpos - 1,
        jnp.maximum(bwd_limit, 0), -1)

    score = score + gf_s + gb_s
    match = match + gf_m + gb_m
    local = seed_len + gf_ext + gb_ext          # unLocalCopy after greedy
    q_seed = qpos - gb_ext                      # moved seed begin
    d_seed = dpos - gb_ext

    # x-drop forward from the greedy-extended region end (AlignSeqs :609-635)
    xf_limit = jnp.minimum(qhi - (q_seed + local), dhi - (d_seed + local))
    xf_s, xf_ext, xf_m = _xdrop_phase(
        qaa, daa, q_seed + local, d_seed + local,
        jnp.maximum(xf_limit, 0), score, drop, +1)
    # x-drop backward from the region start - 1 (:637-650)
    xb_limit = jnp.minimum(q_seed - qlo, d_seed - dlo)
    xb_s, xb_ext, xb_m = _xdrop_phase(
        qaa, daa, q_seed - 1, d_seed - 1,
        jnp.maximum(xb_limit, 0), score, drop, -1)

    gate_score = score          # post-greedy, pre-x-drop: the reference
    gate_match = match          # gates on these (hash_search.cpp:593)
    score = score + xf_s + xb_s
    match = match + xf_m + xb_m
    return dict(
        score=score, match=match,
        gate_score=gate_score, gate_match=gate_match,
        q_beg=q_seed - xb_ext, q_end=q_seed + local + xf_ext,
        d_beg=d_seed - xb_ext, d_end=d_seed + local + xf_ext,
        seed_q=q_seed, seed_d=d_seed, seed_span=local,
    )


# the result fields the batched pipeline consumes, in pack order
PACK_KEYS = ("score", "match", "gate_score", "gate_match",
             "q_beg", "q_end", "d_beg", "d_end")

# plain int (a module-level jnp constant would initialize the XLA
# backend at import time, breaking jax.distributed children)
_BIG = 10 ** 6


def _lead_run(ok: jax.Array):
    """Per lane: length of the leading all-True run along axis 1, plus
    the masked-prefix sums helper (cumprod mask)."""
    lead = jnp.cumprod(ok.astype(jnp.int32), axis=1)
    return jnp.sum(lead, axis=1).astype(jnp.int32), lead


def _xdrop_dense(subs, match, score0, origin, drop):
    """Dense x-drop from per-lane ``origin`` columns (first candidate
    column) over precomputed ``subs``/``match`` rows.

    Mirrors ``_xdrop_phase`` exactly: elements accumulate until the
    first violating column (inclusive), the best (first-maximum) prefix
    wins, ties keep the earliest.  Returns (score_delta, ext, match_ct).
    """
    b, w = subs.shape
    col = jnp.arange(w, dtype=jnp.int32)[None, :]
    on = col >= origin[:, None]
    s = score0[:, None] + jnp.cumsum(jnp.where(on, subs, 0), axis=1,
                                     dtype=jnp.int32)
    # the chunked kernel's running max is seeded with score0 (maxs
    # starts at score0 before any element) — must mirror it exactly,
    # or a deep dip below score0-drop would fail to stop the scan
    m = jnp.maximum(jax.lax.cummax(jnp.where(on, s, -_BIG), axis=1),
                    score0[:, None])
    viol = on & ((s < MINSCORE) | (s < m - drop))
    any_viol = jnp.any(viol, axis=1)
    t = jnp.where(any_viol, jnp.argmax(viol, axis=1), w - 1) \
        .astype(jnp.int32)
    cand = on & (col <= t[:, None])
    s_cand = jnp.where(cand, s, -_BIG)
    best = jnp.max(s_cand, axis=1)
    arg = jnp.argmax(s_cand, axis=1).astype(jnp.int32)   # first max
    improved = (best > score0) & (score0 >= MINSCORE)
    pm = jnp.cumsum(jnp.where(on, match, 0), axis=1, dtype=jnp.int32)
    ext = jnp.where(improved, arg - origin + 1, 0)
    mct = jnp.where(improved,
                    jnp.take_along_axis(pm, arg[:, None], axis=1)[:, 0], 0)
    delta = jnp.where(improved, best - score0, 0)
    return delta.astype(jnp.int32), ext.astype(jnp.int32), \
        mct.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("seed_len", "win_pre", "win_post"))
def extend_pairs_windowed(qseq, dseq, inputs, drop, seed_len: int = 10,
                          win_pre: int = 128,
                          win_post: int = 144) -> jax.Array:
    """Window-dense twin of ``extend_pairs_packed`` for bounded-length
    sequences: every lane's residues are gathered ONCE into a
    seed-centered (B, win_pre+win_post) window, and all five phases
    (seed score, greedy fwd/bwd, x-drop fwd/bwd) run as dense prefix
    scans over the window — no ``while_loop``, no per-iteration
    gathers.

    The chunked ``extend_pairs`` re-gathers a 64-residue slab from HBM
    per lock-step iteration, which measured gather-bound on TPU
    (~147 ms per 8192-lane call even with overlapped transfers); this
    kernel's only gathers are the two initial window extractions.
    Ungapped extension advances query and subject in lock-step, so one
    column axis serves both sequences (column j = seed offset
    j - win_pre on each).

    Valid ONLY when every lane's extension is window-contained:
    qpos-qlo <= win_pre, dpos-dlo <= win_pre, qhi-qpos and dhi-dpos
    <= win_post (the caller routes longer-protein lanes to the chunked
    kernel).  Bitwise-identical to ``extend_pairs`` — asserted by
    tests/test_align.py over random and high-identity workloads.
    """
    qpos, dpos, qlo, qhi, dlo, dhi = (inputs[i] for i in range(6))
    sub = jnp.asarray(_SUB)
    grp_t = jnp.asarray(_GROUP)
    w = win_pre + win_post
    col = jnp.arange(w, dtype=jnp.int32)[None, :]
    qidx = qpos[:, None] + (col - win_pre)
    didx = dpos[:, None] + (col - win_pre)
    valid = (qidx >= qlo[:, None]) & (qidx < qhi[:, None]) \
        & (didx >= dlo[:, None]) & (didx < dhi[:, None])
    qaa = jnp.minimum(jnp.take(qseq, jnp.clip(qidx, 0, qseq.shape[0] - 1),
                               axis=0).astype(jnp.int32), 20)
    daa = jnp.minimum(jnp.take(dseq, jnp.clip(didx, 0, dseq.shape[0] - 1),
                               axis=0).astype(jnp.int32), 20)
    subs = jnp.where(valid, sub[qaa, daa], -_BIG)
    match = (valid & (qaa == daa) & (qaa < 20)).astype(jnp.int32)
    qg = jnp.take(grp_t, qaa)
    dg = jnp.take(grp_t, daa)
    ge = valid & (qg == dg) & (qg < 10)

    p = win_pre
    # seed score over columns [p, p + seed_len)
    seed_cols = slice(p, p + seed_len)
    score = jnp.sum(jnp.where(valid[:, seed_cols],
                              sub[qaa[:, seed_cols], daa[:, seed_cols]],
                              NEGSCORE), axis=1).astype(jnp.int32)
    match0 = jnp.sum(match[:, seed_cols], axis=1).astype(jnp.int32)

    # greedy forward over columns >= p + seed_len
    gf, leadf = _lead_run(ge[:, p + seed_len:])
    score = score + jnp.sum(subs[:, p + seed_len:] * leadf,
                            axis=1).astype(jnp.int32)
    match0 = match0 + jnp.sum(match[:, p + seed_len:] * leadf,
                              axis=1).astype(jnp.int32)
    # greedy backward over columns < p, scanned right-to-left
    gb, leadb = _lead_run(ge[:, :p][:, ::-1])
    score = score + jnp.sum(subs[:, :p][:, ::-1] * leadb,
                            axis=1).astype(jnp.int32)
    match0 = match0 + jnp.sum(match[:, :p][:, ::-1] * leadb,
                              axis=1).astype(jnp.int32)

    gate_score, gate_match = score, match0
    e_f = p + seed_len + gf          # first un-consumed forward column
    e_b = p - gb                     # first consumed column

    xf_s, xf_ext, xf_m = _xdrop_dense(subs, match, score, e_f, drop)
    xb_s, xb_ext, xb_m = _xdrop_dense(subs[:, ::-1], match[:, ::-1],
                                      score, w - e_b, drop)

    score = score + xf_s + xb_s
    match0 = match0 + xf_m + xb_m
    qbase = qpos - win_pre
    dbase = dpos - win_pre
    r = dict(score=score, match=match0,
             gate_score=gate_score, gate_match=gate_match,
             q_beg=qbase + e_b - xb_ext, q_end=qbase + e_f + xf_ext,
             d_beg=dbase + e_b - xb_ext, d_end=dbase + e_f + xf_ext)
    return jnp.stack([r[k] for k in PACK_KEYS])


@functools.partial(jax.jit, static_argnames=("seed_len",))
def extend_pairs_packed(qseq, dseq, inputs, drop,
                        seed_len: int = 10) -> jax.Array:
    """``extend_pairs`` with packed transfers both ways: ``inputs`` is
    ONE (6, B) int32 buffer of rows (qpos, dpos, qlo, qhi, dlo, dhi)
    and the result is ONE (8, B) int32 stack of PACK_KEYS.  A
    remote-TPU link charges per transfer as much as per byte (the
    round-2 packed-hit lesson); the unpacked form moved 6 host->device
    and 8 device->host arrays per batch."""
    qpos, dpos, qlo, qhi, dlo, dhi = (inputs[i] for i in range(6))
    r = extend_pairs(qseq, dseq, qpos, dpos, qlo, qhi, dlo, dhi,
                     drop, seed_len)
    return jnp.stack([r[k] for k in PACK_KEYS])
