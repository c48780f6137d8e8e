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
from .. import native_ext

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
    positions: jax.Array       # (P,) int64 flat offsets, sorted like codes
                               # (shared with HostSeedView — one array)
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

#: group count below which the grouped index build sorts each group's
#: segment separately (temporaries bounded by the largest group) instead
#: of one full-size composite radix (~56 B/position of temporaries —
#: the 9.9M-protein giant-group OOM).  Above it, per-group selection
#: passes over g would cost n_groups full scans.
_SEGMENTED_SORT_MAX_GROUPS = 1024


def host_codes(seq: np.ndarray, starts: np.ndarray):
    """Host seed tables: (code uint32, valid6, valid10, qgrp10).

    valid6 is the db-side rule (a valid 6-mer; shorter suffixes
    PAD-match), valid10 the query-side rule (all 10 seed residues valid
    and in-sequence).  The host probe path (`probe_host`) needs only the
    base (untruncated) probe code per position, so the truncated PAD
    variants are not materialized.

    Dispatches to the native fused pass (``native_ext.seed_codes``, one
    parallel sweep over sequences) when the C++ library is built; the
    numpy twin below is the fallback and the parity oracle
    (tests/test_native.py asserts bit-equality, tests/test_align.py ties
    both to the device functions).
    """
    return _seed_tables(seq, starts)[:4]


def _seed_tables(seq: np.ndarray, starts: np.ndarray):
    """(code, valid6, valid10, qgrp10, g10) in one pass.

    Native: one fused parallel sweep (``hs_seed_codes``).  Fallback:
    the numpy twins composed (``_host_codes_np`` + ``g10_table``)."""
    nat = native_ext.seed_codes(np.ascontiguousarray(seq, np.int32),
                                np.ascontiguousarray(starts, np.int64),
                                _GROUP21)
    if nat is not None:
        return nat
    code, v6, v10, qg = _host_codes_np(seq, starts)
    return code, v6, v10, qg, g10_table(seq, starts)


def _host_codes_np(seq: np.ndarray, starts: np.ndarray):
    """numpy twin of `_codes_for` + the full-seed validity of
    `query_probe_codes` (see ``host_codes``)."""
    seq = np.asarray(seq)
    starts = np.asarray(starts)
    s = len(seq)
    g = _GROUP21[np.minimum(seq, 20)]
    idx = np.arange(s)
    pid = np.searchsorted(starts, idx, side="right") - 1
    seq_end = starts[pid + 1] if s else np.zeros(0, np.int64)

    def shifted(i):
        # length-s always, even when the whole sequence is shorter than
        # the shift (unpadded queries may be shorter than one seed)
        return np.concatenate(
            [g[i:], np.full(min(i, s), 10, g.dtype)]) if i else g

    key = np.zeros(s, np.int64)
    valid6 = np.ones(s, bool)
    for i in range(MER):
        gg = shifted(i)
        key = key * 10 + gg
        valid6 &= (gg < 10) & (idx + i < seq_end)
    code = key.astype(np.uint32) * np.uint32(16 ** NARROW)
    for i in range(NARROW):
        gg = shifted(MER + i)
        in_seq = idx + MER + i < seq_end
        nib = np.where(in_seq, gg, _PAD).astype(np.uint32)
        code = code + nib * np.uint32(16 ** (NARROW - 1 - i))
    valid10 = valid6.copy()
    for i in range(MER, SEED_LEN):           # query needs all 10 residues
        gg = shifted(i)
        valid10 &= (gg < 10) & (idx + i < seq_end)
    off = MER + NARROW
    qgrp10 = np.concatenate(
        [g[off:], np.full(min(off, s), 10, g.dtype)]).astype(np.int32)
    return code, valid6, valid10, qgrp10


@dataclasses.dataclass
class HostSeedView:
    """Host-resident view of a SeedIndex for the ragged numpy probe.

    keys: the sorted probe keys — the uint32 codes directly, or, for a
    group-partitioned index, the composite uint64 ``(group << 32) | code``
    (positions are sorted by (group, code), so the composite is globally
    sorted and one np.searchsorted replaces the per-row bounded binary
    search of the device path).
    """

    keys: np.ndarray        # (P,) uint32 or uint64
    positions: np.ndarray   # (P,) int64
    g10_at: np.ndarray      # (S,) int8
    grouped: bool
    _keys64: np.ndarray | None = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def keys64(self) -> np.ndarray:
        """``keys`` widened to uint64 for the native probe — cached so
        an ungrouped (uint32-keyed) view pays the copy once, not per
        probe chunk; grouped views are already uint64 (no copy)."""
        if self._keys64 is None:
            self._keys64 = np.ascontiguousarray(self.keys, np.uint64)
        return self._keys64


def _view_keys(sc: np.ndarray, group_starts: np.ndarray | None):
    """The host probe keys: raw uint32 codes, or the composite
    ``(group << 32) | code`` uint64 for a group-partitioned index."""
    sc = sc.astype(np.uint32)
    if group_starts is None:
        return sc
    gid = (np.searchsorted(group_starts, np.arange(len(sc)),
                           side="right") - 1).astype(np.uint64)
    return (gid << np.uint64(32)) | sc.astype(np.uint64)


def host_view(index: SeedIndex) -> HostSeedView:
    """Host projection of an existing (device) SeedIndex.

    Prefer ``build_index_and_view`` when building fresh: it assembles
    the view from the build's own host arrays, whereas this reads the
    device arrays back (a no-copy view on the CPU backend, but a real
    O(index) device->host transfer on TPU)."""
    sc = np.asarray(index.sorted_codes)
    pos = np.asarray(index.positions).astype(np.int64)
    if index.g10_at is not None:
        g10 = np.asarray(index.g10_at)
    else:
        g10 = g10_table(np.asarray(index.seq), np.asarray(index.starts))
    gs = None if index.group_starts is None \
        else np.asarray(index.group_starts)
    return HostSeedView(keys=_view_keys(sc, gs), positions=pos,
                        g10_at=g10, grouped=gs is not None)


def probe_host(view: HostSeedView, qcodes: np.ndarray, qgrp10: np.ndarray,
               cand_max: int, qgroups: np.ndarray | None = None):
    """Ragged host probe: (rows, dpos, n_over).

    qcodes: (Q,) uint32 base probe codes; qgrp10: (Q,) the query group at
    seed position + 9; qgroups: (Q,) group ids (required iff the view is
    group-partitioned).  Returns candidate pairs as (row-into-qcodes,
    db position) int64 arrays — O(total candidates) work and memory, no
    dense (Q, cand_max) slab.  Pairs come out sorted by (row, dpos):
    positions within one bucket ascend (the index sort is stable on
    position), and each row probes exactly one bucket, so the pair list
    is duplicate-free by construction.  ``n_over`` counts buckets larger
    than cand_max (truncated to their first cand_max positions, matching
    the device probe).
    """
    if view.grouped != (qgroups is not None):
        raise ValueError("qgroups must be given exactly when the index "
                         "is group-partitioned")
    q = np.asarray(qcodes).astype(np.uint32)
    if view.grouped:
        qk = (np.asarray(qgroups).astype(np.uint64) << np.uint64(32)) \
            | q.astype(np.uint64)
    else:
        qk = q
    if native_ext.available():      # don't widen keys64 for the fallback
        nat = native_ext.probe_sorted(view.keys64, view.positions,
                                      qk.astype(np.uint64), view.g10_at,
                                      np.asarray(qgrp10, np.int32),
                                      cand_max)
        if nat is not None:
            return nat
    lo = np.searchsorted(view.keys, qk, side="left")
    hi = np.searchsorted(view.keys, qk, side="right")
    cnt = hi - lo
    n_over = int(np.sum(cnt > cand_max))
    cnt = np.minimum(cnt, cand_max)
    total = int(cnt.sum())
    if total == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), n_over)
    rows = np.repeat(np.arange(len(qk), dtype=np.int64), cnt)
    first = np.cumsum(cnt) - cnt
    offs = np.arange(total, dtype=np.int64) - np.repeat(first, cnt)
    ids = view.positions[np.repeat(lo, cnt) + offs]
    g10 = view.g10_at[ids]
    ok = (g10 == _G10_PASS) | (g10 == np.asarray(qgrp10)[rows])
    return rows[ok], ids[ok], n_over


def bucket_counts(view: HostSeedView, qcodes: np.ndarray,
                  cand_max: int,
                  qgroups: np.ndarray | None = None) -> np.ndarray:
    """Capped (pre-g10-filter) bucket size per probe position.

    Two parallel binary searches per position — the cheap estimate the
    pipeline uses to cut probe slices on a cumulative CANDIDATE budget
    instead of a position count (a position-count chunk bounds nothing
    when buckets run hot; ADVICE r4 #4).  An upper bound on what
    ``probe_host`` returns for the same positions (the g10 filter only
    removes candidates).
    """
    if view.grouped != (qgroups is not None):
        raise ValueError("qgroups must be given exactly when the index "
                         "is group-partitioned")
    q = np.asarray(qcodes).astype(np.uint32)
    if view.grouped:
        qk = (np.asarray(qgroups).astype(np.uint64) << np.uint64(32)) \
            | q.astype(np.uint64)
    else:
        qk = q.astype(np.uint64)
    # int64 bit patterns order like the uint64 keys: codes < 2^32 and
    # composite keys carry group < 2^31, so the sign bit is never set;
    # qk - 1 turns side="left" into the native side="right" search
    # (integer keys), with qk=0 wrapping to -1 < every key
    keys = view.keys64.view(np.int64)
    hi = native_ext.searchsorted_right(keys, qk.view(np.int64))
    lo = native_ext.searchsorted_right(keys, (qk - np.uint64(1))
                                       .view(np.int64))
    return np.minimum(hi - lo, cand_max)


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
    return build_index_and_view(seq, starts, protein_groups)[0]


def build_index_and_view(seq: np.ndarray, starts: np.ndarray,
                         protein_groups: np.ndarray | None = None
                         ) -> tuple[SeedIndex, HostSeedView]:
    """``build_index`` plus the HostSeedView for ``probe_host``.

    The view is assembled from the build's own host-side intermediates
    — ``host_view(build_index(...))`` read the freshly-uploaded arrays
    straight back off the device, seconds of pure transfer per searcher
    on a remote-TPU link for data that was on host one line earlier.
    """
    # codes on host (one native/numpy pass — no device compile per index
    # size); db entries need only the valid 6-mer: shorter suffixes
    # PAD-match.  The fused pass also yields the g10 filter table.
    codes, valid6, _, _, g10 = _seed_tables(seq, starts)
    pos = np.nonzero(valid6)[0].astype(np.int32)
    c = codes[pos]
    del codes, valid6
    gs = None
    if protein_groups is None:
        # parallel LSD radix when native (uniform high bytes skipped),
        # np stable argsort otherwise — identical permutations
        order = native_ext.argsort_u64(c.astype(np.uint64))
        view_keys = None          # raw uint32 codes
        c_sorted = c[order]
        pos_sorted = pos[order].astype(np.int32)
        del order
    else:
        pg = np.asarray(protein_groups)
        n_groups = int(pg.max()) + 1 if pg.size else 0
        sorted_pg = not pg.size or bool((np.diff(pg) >= 0).all())
        if sorted_pg:
            # proteins arrive grouped (the pipeline concatenates its
            # group lists), so valid positions are already
            # (group, position)-contiguous: per-group slices follow from
            # per-protein valid-seed counts — no per-position group id
            # array (4.7 + 4.4 GB at 9.9M proteins) is ever built
            pcnt = np.diff(np.searchsorted(pos, starts.astype(pos.dtype)))
            counts = np.bincount(pg, weights=pcnt.astype(np.float64),
                                 minlength=n_groups).astype(np.int64)
            del pcnt
            g = None
        else:
            # per-position group id via repeat (no int64 searchsorted
            # temporaries: at 1.19B positions the searchsorted path
            # allocated 3 full-size int64 arrays)
            g_at = np.repeat(pg.astype(np.int32), np.diff(starts))
            g = g_at[pos]
            del g_at
            counts = np.bincount(g, minlength=n_groups)
        gs64 = np.concatenate([[0], np.cumsum(counts)])
        gs = gs64.astype(np.int32)
        if sorted_pg and n_groups <= _SEGMENTED_SORT_MAX_GROUPS:
            # contiguous-slice segmented sort: same stable (group, code)
            # order as the selection path below, with the u32/i32 radix
            # (16 B/element of temporaries vs 32, and no widened key
            # copy) and in-place composite-key assembly — the variant
            # that lets one process build the 9.9M-protein giant-group
            # index inside the 125 GB box
            view_keys = np.empty(len(c), np.uint64)
            c_sorted = np.empty(len(c), np.uint32)
            pos_sorted = np.empty(len(c), np.int32)
            for gi in range(n_groups):
                lo, hi = int(gs64[gi]), int(gs64[gi + 1])
                if hi == lo:
                    continue
                cg = c[lo:hi]
                if hi - lo < (1 << 31):
                    og = native_ext.argsort_u32(cg)
                else:
                    og = native_ext.argsort_u64(cg.astype(np.uint64))
                c_sorted[lo:hi] = cg[og]
                # buffered-cast assignment + in-place or: no full-width
                # uint64 temporary of the segment
                view_keys[lo:hi] = c_sorted[lo:hi]
                view_keys[lo:hi] |= np.uint64(gi) << np.uint64(32)
                pos_sorted[lo:hi] = pos[lo:hi][og]
                del cg, og
            del c, pos
        elif n_groups <= _SEGMENTED_SORT_MAX_GROUPS:
            # segmented per-group sort: the one-shot composite radix
            # peaks at ~56 B/position of temporaries (key + order +
            # the native radix's 4 full-size buffers) — 65 GB at 1.19B
            # positions, the measured 9.9M-protein OOM.  Sorting each
            # group segment separately is the same stable
            # (group, code) order with temporaries bounded by the
            # largest group.
            view_keys = np.empty(len(c), np.uint64)
            c_sorted = np.empty(len(c), np.uint32)
            pos_sorted = np.empty(len(c), np.int32)
            for gi in range(n_groups):
                sel = np.nonzero(g == gi)[0]
                if not len(sel):
                    continue
                cg = c[sel]
                og = native_ext.argsort_u64(cg.astype(np.uint64))
                lo, hi = int(gs64[gi]), int(gs64[gi + 1])
                cs = cg[og]
                c_sorted[lo:hi] = cs
                view_keys[lo:hi] = (np.uint64(gi) << np.uint64(32)) \
                    | cs.astype(np.uint64)
                pos_sorted[lo:hi] = pos[sel][og]
                del sel, cg, og, cs
            del g, c, pos
        else:
            # one stable argsort on the fused (group << 32) | code key
            # orders identically to np.lexsort((c, g)) (both stable,
            # same effective key) and measures 2.4x faster at 40M
            # positions — this sort dominates per-table index build at
            # 1e6 proteins.  (Many-small-groups regime: a per-group
            # loop would pay n_groups full passes over g.)
            if g is None:      # sorted_pg with many groups: counts
                g = np.repeat(np.arange(n_groups, dtype=np.int32),
                              counts)     # give the slice boundaries
            key = (g.astype(np.uint64) << np.uint64(32)) \
                | c.astype(np.uint64)
            del g
            order = native_ext.argsort_u64(key)
            # the sorted composite IS the host-view key — recomputing
            # it via _view_keys re-ran the per-position group
            # searchsorted (measured 12 s of a 1e5/tables=4 run)
            view_keys = key[order]
            del key
            c_sorted = c[order]
            del c
            pos_sorted = pos[order].astype(np.int32)
            del pos, order
    # host-resident index: the pipeline probes through the HostSeedView
    # and extends against its own padded device sequence, so nothing
    # here is read on device in the batched path — eager jnp.asarray
    # uploads cost ~50 s/table at 1e5 through a remote-TPU link for
    # arrays only the device probe() oracle reads.  jit converts the
    # numpy leaves on first use, so probe() still works unchanged.
    # ONE positions array, int64, shared by index and view: keeping the
    # int32 twin alongside the view's int64 copy held 14.2 GB at 1.19B
    # positions where 9.5 suffices (jit converts the index leaf on the
    # oracle probe path's first use)
    pos64 = pos_sorted.astype(np.int64)
    del pos_sorted
    index = SeedIndex(
        sorted_codes=c_sorted,
        positions=pos64,
        seq=np.asarray(seq, np.int32),
        starts=np.asarray(starts, np.int32),
        group_starts=gs,
        g10_at=g10)
    view = HostSeedView(
        keys=c_sorted if view_keys is None else view_keys,
        positions=pos64,
        g10_at=g10, grouped=gs is not None)
    return index, view


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


@functools.partial(jax.jit, static_argnames=("cand_max",))
def probe(index: SeedIndex, qcodes: jax.Array, qgrp10: jax.Array,
          cand_max: int):
    """(Q, P) probe codes -> (candidates (Q, P*cand_max) int32, n_over).

    The device probe variant — kept as the on-device oracle twin of
    ``probe_host`` (which the pipeline uses: the ragged host pass avoids
    materializing this mostly-empty candidate slab).  Group-partitioned
    probing lives only in ``probe_host`` via composite keys.

    qgrp10: (Q,) the query's murphy10 group at seed position + 9 (the 4th
    suffix residue) — candidates that still have that residue must agree
    on it (the reference's 4-deep narrowing); shorter candidates pass.
    Invalid slots hold -1.  ``n_over`` counts buckets whose true size
    exceeded cand_max (truncated — the caller should warn).
    """
    if index.group_starts is not None:
        # grouped codes sort by (group, code): a flat searchsorted over
        # them returns meaningless ranges — fail loudly, not wrongly
        raise ValueError("probe() does not support a group-partitioned "
                         "index; use probe_host with qgroups")
    sc = index.sorted_codes
    lo = jnp.searchsorted(sc, qcodes, side="left")
    hi = jnp.searchsorted(sc, qcodes, side="right")
    n_over = jnp.sum(hi - lo > cand_max)
    count = jnp.minimum(hi - lo, cand_max)
    offs = jnp.arange(cand_max, dtype=jnp.int32)
    pos = lo[..., None] + offs                       # (Q, P, M)
    sel = offs < count[..., None]
    pos = jnp.where(sel, pos, 0)
    # positions is int64 (shared with the host view, which needs the range
    # at 2.47B-AA scale); this oracle documents int32 candidates and its
    # device callers never index past 2^31, so cast the gather — without
    # this, x64 mode silently doubles the (Q, P*cand_max) slab
    ids = jnp.take(index.positions, pos, axis=0).astype(jnp.int32)
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
