"""Single-buffer packed hit transfer: the one implementation.

Every search engine compacts its per-center hit slots on device and
ships them to the host as ONE (4, cap) int32 buffer — the remote-TPU
link charges per TRANSFER as much as per byte (measured: harvesting
four output arrays cost 140 ms/block where one stacked buffer costs
47 ms; search/ivf.py carries the history).  Round 1 inlined this pack
in four places; this module is the consolidation (ROADMAP item 7).

Layout of the packed buffer (rows of a (4, cap) int32 array):

    row 0  center id of the i-th valid hit (offset applied on device)
    row 1  point/kmer id of the i-th valid hit
    row 2  float32 squared distance, bitcast to int32
    row 3  meta = [total_hits, *meta_vecs..., 0 padding]

The pack is a validity-keyed ``lax.sort`` (~1 ms; a cumsum+scatter
variant measured slower).  When ``total > cap`` the packed buffer
cannot hold every hit; the host falls back to the full (C, k) buffers,
which jax transfers lazily only in that case.

No reference counterpart — the reference writes hits to text files from
host RAM (motif_both_points.cpp:239-242); this layer exists because the
TPU result lives across a narrow link.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_hits(ids: jax.Array, d2: jax.Array, sentinel,
              meta_vecs: tuple = (), cid_offset=None,
              cap_frac: int = 4) -> jax.Array:
    """Device-side pack of (C, k) hit slots into one (4, cap) int32 buffer.

    ids: (C, k) int32, invalid slots >= ``sentinel``; d2: (C, k) float32.
    meta_vecs: int32 vectors appended after ``total`` in the meta row
    (e.g. per-center hit counts); their combined length bounds ``cap``
    from below.  cid_offset: optional scalar added to every center id
    (used by data-sharded steps to globalize row ids on device).
    cap = max(C*k // cap_frac, meta length) — a quarter of the slot count
    holds the common case with a 4x transfer saving.
    """
    c, k = ids.shape
    flat = ids.reshape(-1)
    valid = flat < sentinel
    pos = jnp.arange(c * k, dtype=jnp.int32)
    skey = jnp.where(valid, pos, c * k)
    cid = (pos // k).astype(jnp.int32)
    if cid_offset is not None:
        cid = cid + cid_offset
    _, s_ids, s_cid, s_d2 = jax.lax.sort(
        (skey, flat, cid, d2.reshape(-1)), num_keys=1)
    total = jnp.sum(valid).astype(jnp.int32)
    n_meta = 1 + sum(int(m.shape[0]) for m in meta_vecs)
    cap = max((c * k) // cap_frac, n_meta)
    meta = jnp.concatenate(
        [total[None], *meta_vecs,
         jnp.zeros((cap - n_meta,), jnp.int32)])
    return jnp.stack([s_cid[:cap], s_ids[:cap],
                      jax.lax.bitcast_convert_type(
                          s_d2.astype(jnp.float32)[:cap], jnp.int32),
                      meta])


def unpack_hits(packed: np.ndarray, meta_lens: tuple = ()):
    """Host-side unpack of one pack_hits buffer.

    packed: the (4, cap) buffer already on host (np.ndarray).
    Returns (hits, metas): ``metas`` is a list of int32 vectors matching
    ``meta_lens``; ``hits`` is (cid, kid, d2) arrays of length ``total``,
    or None when the packed capacity overflowed (caller falls back to
    the full buffers).
    """
    out = np.asarray(packed)
    cap = out.shape[1]
    tot = int(out[3, 0])
    metas, off = [], 1
    for ln in meta_lens:
        metas.append(out[3, off:off + ln])
        off += ln
    if tot > cap:
        return None, metas
    return (out[0, :tot], out[1, :tot],
            out[2, :tot].view(np.float32)), metas
