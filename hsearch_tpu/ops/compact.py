"""Single-buffer packed hit transfer: the one implementation.

Every search engine compacts its per-center hit slots on device and
ships them to the host as ONE flat int32 buffer — the remote-TPU
link charges per TRANSFER as much as per byte (measured: harvesting
four output arrays cost 140 ms/block where one stacked buffer costs
47 ms; search/ivf.py carries the history).  Round 1 inlined this pack
in four places; this module is the consolidation (ROADMAP item 7).

Buffer layout (1-D int32, self-describing):

    [0]                 kid_bits if (cid, kid) are fused into one word,
                        else 0 (split layout); NEGATED when the d2 row
                        is omitted (``with_d2=False``, fused only)
    [1]                 cap  (hit capacity of this buffer)
    [2]                 total valid hits (may exceed cap -> overflow)
    [3 : 3+n_meta]      caller meta vectors (e.g. per-center hit counts)
    then, fused layout (when cid_bits + kid_bits <= 32):
        [.. : ..+cap]   (cid << kid_bits) | kid   per hit
        [.. : ..+cap]   float32 squared distance, bitcast to int32
                        (absent when [0] < 0)
    or split layout:
        three cap-rows: cid, kid, d2-bits.

The fused form ships 2 words/hit instead of the round-1 stack's 4
(whose meta row was ~99% zero padding) — measured 1 MB -> 0.5 MB per
512-center block at bench shapes, on a link where bytes are ~17 ms/MB
on top of a ~30 ms per-transfer floor.  ``with_d2=False`` halves it
again to 1 word/hit for callers that can recompute the distance on
host from the (center, point) id pair (search/ivf.py does, from its
host-resident k-mers — the d2 is a 25-entry table sum, cheaper to
recompute than to ship across the tunnel).  The pack is a validity-keyed
``lax.sort`` (~1 ms; a cumsum+scatter variant measured slower).  When
``total > cap`` the packed buffer cannot hold every hit; callers
either re-dispatch with a larger cap (search/ivf.py escalates 4x per
step — a recompute is tens of ms on chip where the full-array pull is
MBs over the link; cap_frac=1 always fits since top-k bounds hits to
k/center) or fall back to the full (C, k) buffers, which jax
transfers lazily only in that case.

No reference counterpart — the reference writes hits to text files from
host RAM (motif_both_points.cpp:239-242); this layer exists because the
TPU result lives across a narrow link.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HDR = 3


def pack_hits(ids: jax.Array, d2: jax.Array, sentinel,
              meta_vecs: tuple = (), cid_offset=None,
              cap_frac: int = 4, cid_bound: int | None = None,
              id_bound: int | None = None,
              with_d2: bool = True) -> jax.Array:
    """Device-side pack of (C, k) hit slots into one flat int32 buffer.

    ids: (C, k) int32, invalid slots >= ``sentinel``; d2: (C, k) float32.
    meta_vecs: int32 vectors stored after the header (e.g. per-center
    hit counts).  cid_offset: optional scalar added to every center id
    (used by data-sharded steps to globalize row ids on device).
    cid_bound / id_bound: static upper bounds (exclusive) on the center
    id after offset and on valid point ids; they decide whether the
    fused 1-word (cid, kid) layout fits in 32 bits.  Defaults: C from
    the shape, and ``sentinel`` when it is a python int (valid ids are
    < sentinel by contract).  cap = max(C*k // cap_frac, 1); the meta
    vectors live in the header, outside the cap rows.
    with_d2=False omits the d2 row (fused layout only — the split
    layout keeps it): the caller recomputes distances on host from the
    (cid, kid) pairs; unpack_hits then returns d2=None.
    """
    c, k = ids.shape
    flat = ids.reshape(-1)
    valid = flat < sentinel
    pos = jnp.arange(c * k, dtype=jnp.int32)
    skey = jnp.where(valid, pos, c * k)
    cid = (pos // k).astype(jnp.int32)
    if cid_offset is not None:
        cid = cid + cid_offset
    if cid_bound is None:
        cid_bound = c if cid_offset is None else 0   # 0 -> force split
    if id_bound is None:
        id_bound = int(sentinel) if isinstance(sentinel, (int,
                                                          np.integer)) else 0
    kid_bits = max(int(id_bound - 1).bit_length(), 1)
    cid_bits = max(int(cid_bound - 1).bit_length(), 1)
    fused = 0 < cid_bound and 0 < id_bound and cid_bits + kid_bits <= 32
    total = jnp.sum(valid).astype(jnp.int32)
    n_meta = sum(int(m.shape[0]) for m in meta_vecs)
    cap = max((c * k) // cap_frac, 1)
    drop_d2 = fused and not with_d2
    head = [jnp.full((1,), (-kid_bits if drop_d2 else kid_bits)
                     if fused else 0, jnp.int32),
            jnp.full((1,), cap, jnp.int32), total[None], *meta_vecs]
    if fused:
        # shifts may run into the sign bit (cid_bits + kid_bits == 32)
        # or wrap for invalid slots past ``total`` — the host decodes
        # through a uint32 view and never reads past ``total``.
        word = (cid << kid_bits) | (flat & ((1 << kid_bits) - 1))
        if drop_d2:
            _, s_word = jax.lax.sort((skey, word), num_keys=1)
            return jnp.concatenate(head + [s_word[:cap]])
        _, s_word, s_d2 = jax.lax.sort((skey, word, d2.reshape(-1)),
                                       num_keys=1)
        rows = [s_word[:cap]]
    else:
        _, s_ids, s_cid, s_d2 = jax.lax.sort(
            (skey, flat, cid, d2.reshape(-1)), num_keys=1)
        rows = [s_cid[:cap], s_ids[:cap]]
    rows.append(jax.lax.bitcast_convert_type(
        s_d2.astype(jnp.float32)[:cap], jnp.int32))
    return jnp.concatenate(head + rows)


def unpack_hits(packed: np.ndarray, meta_lens: tuple = ()):
    """Host-side unpack of one pack_hits buffer.

    packed: the flat buffer already on host (np.ndarray; 1-D).
    Returns (hits, metas): ``metas`` is a list of int32 vectors matching
    ``meta_lens``; ``hits`` is (cid, kid, d2) arrays of length ``total``
    (d2 is None for a ``with_d2=False`` buffer — the caller recomputes),
    or None when the packed capacity overflowed (caller falls back to
    the full buffers).
    """
    out = np.asarray(packed).reshape(-1)
    kid_bits, cap, tot = int(out[0]), int(out[1]), int(out[2])
    metas, off = [], _HDR
    for ln in meta_lens:
        metas.append(out[off:off + ln])
        off += ln
    if tot > cap:
        return None, metas
    if kid_bits:
        w = out[off:off + tot].view(np.uint32)
        cid = (w >> abs(kid_bits)).astype(np.int32)
        kid = (w & np.uint32((1 << abs(kid_bits)) - 1)).astype(np.int32)
        d2 = out[off + cap:off + cap + tot].view(np.float32) \
            if kid_bits > 0 else None
    else:
        cid = out[off:off + tot]
        kid = out[off + cap:off + cap + tot]
        d2 = out[off + 2 * cap:off + 2 * cap + tot].view(np.float32)
    return (cid, kid, d2), metas
