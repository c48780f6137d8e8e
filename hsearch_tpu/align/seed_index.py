"""Murphy10 6-mer seed index over a protein database, as sorted codes.

The reference keeps a 10^6-entry bucket table over base-10 6-mer keys
plus, per bucket, a sorted ushort of the 4 following residues for range
narrowing (vDHash/vDComp, hash_search.cpp:200-248, CompShortLow/Up
:361-446).  Here both levels collapse into ONE sorted uint32 code per
indexed position:

    code = key6 * 16^3 + 3 suffix nibbles   (digits 0..9, unknown 10,
                                             past-sequence-end 15)

uint32 holds this exactly (max 999999*4096+4095 < 2^32); TPU lanes are
32-bit, so sorting and searchsorted stay native-width.  The 4th suffix
residue of the reference's narrowing is checked as a post-filter on the
gathered candidates (``probe``'s tenth-group test) — together the two
stages admit exactly the reference's candidate set: a 10-residue reduced
match, truncated at the subject's sequence end.

A query seed always has a full 4-digit suffix (the reference skips seeds
without 10 valid residues, hash_search.cpp:331-343); db entries may be
shorter — the truncated 15-padded probe variants cover those.

Positions are stored as flat offsets into the concatenated residue
array; the (seq_idx << 11 | offset) packing of the reference (:207,
GetSeq hash_search.hpp:330-336) capped sequences at 2047 residues — flat
offsets have no such limit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import reduced

MER = 6           # m_unMer (hash_search.cpp:31)
SUFFIX = 4        # narrowing residues after the 6-mer (:212-248)
NARROW = 3        # suffix residues packed into the sorted code
SEED_LEN = MER + SUFFIX   # unLocalSeed = 10 (:330)
_PAD = 15         # past-end nibble (ONEBYTE padding, :466-468)

_GROUP21 = np.concatenate([reduced.MURPHY10.astype(np.int32), [10]])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SeedIndex:
    """Sorted seed codes over every valid position of a protein DB.

    With ``group_starts`` set (group-partitioned index), positions are
    sorted by (protein group, code) and each group's codes occupy the
    contiguous slice [group_starts[g], group_starts[g+1]) — probes are
    then bounded to the querying protein's own group, which makes ONE
    index serve many independent pre-cluster groups at once (the
    batched replacement for the reference's per-bucket
    BuildProteinsIndex, pcluster.cpp:157-167).
    """

    sorted_codes: jax.Array    # (P,) uint32
    positions: jax.Array       # (P,) int32 flat offsets, sorted like codes
    seq: jax.Array             # (S,) int32 AA indices of the concatenated DB
    starts: jax.Array          # (N+1,) int32 per-protein offsets
    group_starts: jax.Array | None = None   # (G+1,) int32 or None
    g10_at: jax.Array | None = None          # (S,) int8 4th-suffix groups

    @property
    def num_positions(self) -> int:
        return self.sorted_codes.shape[0]


def _groups(seq: jax.Array) -> jax.Array:
    return jnp.take(jnp.asarray(_GROUP21),
                    jnp.minimum(seq.astype(jnp.int32), 20))


def _seq_end(starts: jax.Array, s: int) -> jax.Array:
    pid = jnp.searchsorted(starts, jnp.arange(s), side="right") - 1
    return jnp.take(starts, pid + 1)


@jax.jit
def _codes_for(seq: jax.Array, starts: jax.Array):
    """Per-position seed code (uint32) + validity of the 6-mer part."""
    s = seq.shape[0]
    grp = _groups(seq)
    seq_end = _seq_end(starts, s)

    def shifted(i):
        return jnp.concatenate(
            [grp[i:], jnp.full((i,), 10, grp.dtype)]) if i else grp

    key = jnp.zeros(s, jnp.int32)
    valid = jnp.ones(s, bool)
    for i in range(MER):
        g = shifted(i)
        key = key * 10 + g
        valid &= (g < 10) & (jnp.arange(s) + i < seq_end)
    code = key.astype(jnp.uint32) * jnp.uint32(16 ** NARROW)
    for i in range(NARROW):
        g = shifted(MER + i)
        in_seq = jnp.arange(s) + MER + i < seq_end
        nib = jnp.where(in_seq, g, _PAD).astype(jnp.uint32)
        code = code + nib * jnp.uint32(16 ** (NARROW - 1 - i))
    return code, valid


_G10_PASS = 15    # "subject has no 4th suffix residue" — matches anything


def g10_table(seq: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """(S,) int8: murphy10 group of the 4th suffix residue at each
    position, or _G10_PASS where that residue falls past the owning
    sequence.  Precomputed once at index build: probe previously
    re-derived it per call with a searchsorted over every gathered
    candidate — the dominant cost of the batched probe at 1e4+
    proteins."""
    seq = np.asarray(seq)
    starts = np.asarray(starts)
    s = len(seq)
    pid = np.searchsorted(starts, np.arange(s), side="right") - 1
    seq_end = starts[pid + 1]
    idx9 = np.arange(s) + MER + NARROW
    g = _GROUP21[np.minimum(seq, 20)]
    out = np.full(s, _G10_PASS, np.int8)
    m = idx9 < seq_end
    out[m] = g[idx9[m]]
    return out


def build_index(seq: np.ndarray, starts: np.ndarray,
                protein_groups: np.ndarray | None = None) -> SeedIndex:
    """Index every valid seed position of the concatenated DB.

    protein_groups: optional (N,) int group id per protein; when given,
    positions sort by (group, code) and the index records each group's
    code slice so probes stay group-local (see SeedIndex docstring).
    Group ids must be dense 0..G-1.
    """
    seqd = jnp.asarray(seq, jnp.int32)
    startsd = jnp.asarray(starts, jnp.int32)
    codes, valid = _codes_for(seqd, startsd)
    codes = np.asarray(codes)
    pos = np.nonzero(np.asarray(valid))[0].astype(np.int32)
    c = codes[pos]
    group_starts = None
    if protein_groups is None:
        order = np.argsort(c, kind="stable")
    else:
        pg = np.asarray(protein_groups)
        n_groups = int(pg.max()) + 1 if pg.size else 0
        pid = np.searchsorted(np.asarray(starts), pos, side="right") - 1
        g = pg[pid]
        order = np.lexsort((c, g))
        counts = np.bincount(g, minlength=n_groups)
        group_starts = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    return SeedIndex(sorted_codes=jnp.asarray(c[order]),
                     positions=jnp.asarray(pos[order].astype(np.int32)),
                     seq=seqd, starts=startsd, group_starts=group_starts,
                     g10_at=jnp.asarray(g10_table(seq, starts)))


@jax.jit
def query_probe_codes(qseq: jax.Array, qstarts: jax.Array):
    """Per query position: the NARROW+1 probe codes + validity.

    valid requires all 10 residues in-sequence with valid murphy10 groups
    (the reference skips seeds whose 10-residue window hits an invalid
    residue, hash_search.cpp:331-343).
    """
    base, valid6 = _codes_for(qseq, qstarts)
    s = qseq.shape[0]
    grp = _groups(qseq)
    seq_end = _seq_end(qstarts, s)
    valid = valid6
    for i in range(SUFFIX):
        g = jnp.concatenate(
            [grp[MER + i:], jnp.full((MER + i,), 10, grp.dtype)])
        valid &= (g < 10) & (jnp.arange(s) + MER + i < seq_end)
    # truncated variants: replace the last j suffix nibbles with PAD
    # (PAD * (16^j - 1)/15 = j PAD-nibbles, e.g. 0xFF for j=2)
    probes = [base]
    for j in range(1, NARROW + 1):
        scale = np.uint32(16 ** j)
        probes.append((base // scale) * scale
                      + jnp.uint32(_PAD * ((int(scale) - 1) // 15)))
    return jnp.stack(probes, axis=1), valid


def _bounded_searchsorted(sc: jax.Array, qc: jax.Array, lo0: jax.Array,
                          hi0: jax.Array, left: bool) -> jax.Array:
    """searchsorted of ``qc`` within per-row slices [lo0, hi0) of ``sc``.

    A branchless fixed-iteration binary search: ``sc`` is sorted within
    every slice (here: per protein group), not globally, so the stock
    jnp.searchsorted cannot be used.  lo0/hi0 broadcast against qc.
    """
    lo = jnp.broadcast_to(lo0, qc.shape).astype(jnp.int32)
    hi = jnp.broadcast_to(hi0, qc.shape).astype(jnp.int32)
    n = sc.shape[0]
    for _ in range(max(1, int(np.ceil(np.log2(n + 1))))):
        cont = lo < hi
        mid = (lo + hi) >> 1
        v = jnp.take(sc, jnp.clip(mid, 0, n - 1))
        pred = (v < qc) if left else (v <= qc)
        lo = jnp.where(cont & pred, mid + 1, lo)
        hi = jnp.where(cont & ~pred, mid, hi)
    return lo


@functools.partial(jax.jit, static_argnames=("cand_max",))
def probe(index: SeedIndex, qcodes: jax.Array, qgrp10: jax.Array,
          cand_max: int, bounds: tuple | None = None):
    """(Q, P) probe codes -> (candidates (Q, P*cand_max) int32, n_over).

    qgrp10: (Q,) the query's murphy10 group at seed position + 9 (the 4th
    suffix residue) — candidates that still have that residue must agree
    on it (the reference's 4-deep narrowing); shorter candidates pass.
    Invalid slots hold -1.  ``n_over`` counts buckets whose true size
    exceeded cand_max (truncated — the caller should warn).

    bounds: optional ((Q,) lo, (Q,) hi) index-slice per query row for a
    group-partitioned index (each query probes only its own group's
    contiguous code slice).
    """
    sc = index.sorted_codes
    if bounds is None:
        lo = jnp.searchsorted(sc, qcodes, side="left")
        hi = jnp.searchsorted(sc, qcodes, side="right")
    else:
        blo, bhi = bounds
        lo = _bounded_searchsorted(sc, qcodes, blo[:, None], bhi[:, None],
                                   left=True)
        hi = _bounded_searchsorted(sc, qcodes, blo[:, None], bhi[:, None],
                                   left=False)
    n_over = jnp.sum(hi - lo > cand_max)
    count = jnp.minimum(hi - lo, cand_max)
    offs = jnp.arange(cand_max, dtype=jnp.int32)
    pos = lo[..., None] + offs                       # (Q, P, M)
    sel = offs < count[..., None]
    pos = jnp.where(sel, pos, 0)
    ids = jnp.take(index.positions, pos, axis=0)
    # 4th-suffix-residue filter
    s = index.seq.shape[0]
    if index.g10_at is not None:
        # one int8 gather against the precomputed table
        g10 = jnp.take(index.g10_at, jnp.clip(ids, 0, s - 1),
                       axis=0).astype(jnp.int32)
        ok = (g10 == _G10_PASS) | (g10 == qgrp10[:, None, None])
    else:
        # derive on the fly (indexes loaded from old checkpoints)
        g10_idx = jnp.clip(ids + MER + NARROW, 0, s - 1)
        g10 = jnp.take(_groups(index.seq), g10_idx, axis=0)
        seq_end = jnp.take(index.starts,
                           jnp.searchsorted(index.starts,
                                            ids.reshape(-1),
                                            side="right")).reshape(ids.shape)
        has10 = (ids + MER + NARROW) < seq_end
        ok = jnp.logical_not(has10) | (g10 == qgrp10[:, None, None])
    ids = jnp.where(sel & ok, ids, -1)
    q = qcodes.shape[0]
    return ids.reshape(q, -1), n_over
