"""Alignment engine tests: scalar oracle vs batched device kernels.

The oracle below re-implements the reference's scalar extension semantics
(hash_search.cpp:528-716) directly in Python; the device kernels must
agree exactly on random data — the paired-oracle test pattern of
SURVEY §4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsearch_tpu.align import blast_stat, extend, pipeline, reduced, seed_index
from hsearch_tpu.core import blosum

MIN_SCORE = -20


def _sub(a, b):
    if a >= 20 or b >= 20:
        return -5
    return int(blosum.BLOSUM62[a, b])


def _grp(a):
    return int(reduced.MURPHY10[a]) if a < 20 else 10


def oracle_extend_full(q, d, qpos, dpos, qlo, qhi, dlo, dhi, drop,
                       seed_len=10):
    score = match = 0
    for i in range(seed_len):
        score += _sub(q[qpos + i], d[dpos + i])
        if q[qpos + i] == d[dpos + i] and q[qpos + i] < 20:
            match += 1
    local = seed_len
    i = seed_len
    while (qpos + i < qhi and dpos + i < dhi
           and _grp(q[qpos + i]) == _grp(d[dpos + i])
           and _grp(q[qpos + i]) < 10):
        score += _sub(q[qpos + i], d[dpos + i])
        if q[qpos + i] == d[dpos + i] and q[qpos + i] < 20:
            match += 1
        local += 1
        i += 1
    qs, ds = qpos, dpos
    i = -1
    while (qs + i >= qlo and ds + i >= dlo
           and _grp(q[qs + i]) == _grp(d[ds + i]) and _grp(q[qs + i]) < 10):
        score += _sub(q[qs + i], d[ds + i])
        if q[qs + i] == d[ds + i] and q[qs + i] < 20:
            match += 1
        qs -= 1
        ds -= 1
        local += 1

    def xdrop(qstart, dstart, limit, score0, sign):
        s = maxs = score0
        best_ext = best_match = ma = li = 0
        while li < limit and s >= MIN_SCORE and s >= maxs - drop:
            qi, di = qstart + sign * li, dstart + sign * li
            s += _sub(q[qi], d[di])
            if q[qi] == d[di] and q[qi] < 20:
                ma += 1
            li += 1
            if s > maxs:
                maxs, best_ext, best_match = s, li, ma
        return maxs - score0, best_ext, best_match

    f_lim = max(0, min(qhi - (qs + local), dhi - (ds + local)))
    fs, fe, fm = xdrop(qs + local, ds + local, f_lim, score, +1)
    b_lim = max(0, min(qs - qlo, ds - dlo))
    bs_, be, bm = xdrop(qs - 1, ds - 1, b_lim, score, -1)
    return dict(score=score + fs + bs_, match=match + fm + bm,
                q_beg=qs - be, q_end=qs + local + fe,
                d_beg=ds - be, d_end=ds + local + fe)


def test_extend_pairs_matches_oracle(rng):
    sq, sd = 400, 600
    q = rng.integers(0, 20, sq).astype(np.int32)
    d = rng.integers(0, 20, sd).astype(np.int32)
    # plant homologous region so extensions actually run
    d[100:180] = q[50:130]
    d[140] = (d[140] + 1) % 20
    drop = 9
    pairs = []
    for _ in range(64):
        qp = int(rng.integers(0, sq - 12))
        dp = int(rng.integers(0, sd - 12))
        pairs.append((qp, dp))
    pairs += [(55, 105), (60, 110), (100, 150)]   # homologous seeds
    qpos = np.array([p[0] for p in pairs], np.int32)
    dpos = np.array([p[1] for p in pairs], np.int32)
    b = len(pairs)
    res = extend.extend_pairs(
        jnp.asarray(q), jnp.asarray(d), jnp.asarray(qpos), jnp.asarray(dpos),
        jnp.zeros(b, jnp.int32), jnp.full(b, sq, jnp.int32),
        jnp.zeros(b, jnp.int32), jnp.full(b, sd, jnp.int32),
        jnp.int32(drop), 10)
    for i, (qp, dp) in enumerate(pairs):
        want = oracle_extend_full(q, d, qp, dp, 0, sq, 0, sd, drop)
        for k in ("score", "match", "q_beg", "q_end", "d_beg", "d_end"):
            assert int(np.asarray(res[k])[i]) == want[k], \
                (k, qp, dp, int(np.asarray(res[k])[i]), want[k])


def test_extend_pairs_windowed_equals_chunked(rng):
    """The window-dense kernel is bitwise-equal to the chunked
    while_loop kernel on random seeds, planted high-identity homolog
    runs (long greedy + x-drop extensions), deep-dip sequences (the
    score0-seeded running-max subtlety), and boundary-hugging pairs."""
    n_prot, plen = 24, 96
    prots = []
    base = rng.integers(0, 20, plen).astype(np.int32)
    for i in range(n_prot // 2):        # one family: near-identical
        p = base.copy()
        p[rng.integers(0, plen, 3)] = rng.integers(0, 20, 3)
        prots.append(p)
    for i in range(n_prot // 2):        # noise
        prots.append(rng.integers(0, 20, plen).astype(np.int32))
    seq = np.concatenate(prots)
    starts = np.arange(n_prot + 1) * plen
    b = 512
    pid_q = rng.integers(0, n_prot, b)
    pid_d = rng.integers(0, n_prot, b)
    off_q = rng.integers(0, plen - 12, b)
    off_d = rng.integers(0, plen - 12, b)
    qpos = (starts[pid_q] + off_q).astype(np.int32)
    dpos = (starts[pid_d] + off_d).astype(np.int32)
    # force many same-offset family pairs (true long extensions)
    qpos[:128] = starts[rng.integers(0, n_prot // 2, 128)] + 7
    dpos[:128] = starts[rng.integers(0, n_prot // 2, 128)] + 7
    qlo = starts[np.searchsorted(starts, qpos, "right") - 1].astype(np.int32)
    qhi = (qlo + plen).astype(np.int32)
    dlo = starts[np.searchsorted(starts, dpos, "right") - 1].astype(np.int32)
    dhi = (dlo + plen).astype(np.int32)
    sdev = jnp.asarray(seq)
    packed = jnp.asarray(np.stack([qpos, dpos, qlo, qhi, dlo, dhi]))
    for drop in (5, 9, 30):
        want = extend.extend_pairs_packed(sdev, sdev, packed,
                                          jnp.int32(drop), 10)
        got = extend.extend_pairs_windowed(sdev, sdev, packed,
                                           jnp.int32(drop), 10,
                                           win_pre=plen, win_post=plen + 10)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"drop={drop}")


def test_seed_index_probe_matches_bruteforce(rng):
    # db of several proteins; probes must return exactly the positions
    # whose murphy10 6-mer matches and whose available suffix agrees
    lens = [30, 17, 45, 9]
    seqs = [rng.integers(0, 20, n).astype(np.int32) for n in lens]
    seq = np.concatenate(seqs)
    starts = np.concatenate([[0], np.cumsum(lens)])
    idx = seed_index.build_index(seq, starts)

    qseq = rng.integers(0, 20, 40).astype(np.int32)
    qseq[5:15] = seq[0:10]          # guarantee at least one match
    codes, valid = seed_index.query_probe_codes(
        jnp.asarray(qseq), jnp.asarray([0, 40], jnp.int32))
    g = np.asarray(seed_index._GROUP21)[np.minimum(qseq, 20)]
    off = seed_index.MER + seed_index.NARROW
    qgrp10 = np.concatenate([g[off:], np.full(off, 10, g.dtype)])
    cand, n_over = seed_index.probe(
        idx, codes, jnp.asarray(qgrp10, jnp.int32), cand_max=64)
    cand = np.asarray(cand)
    assert int(n_over) == 0
    valid = np.asarray(valid)

    red = reduced.reduce_seq(seq)
    qred = reduced.reduce_seq(qseq)
    for qp in range(40):
        got = set(cand[qp][cand[qp] >= 0]) if valid[qp] else set()
        want = set()
        if qp + 10 <= 40 and (qred[qp:qp + 10] < 10).all():
            for pid in range(len(lens)):
                lo, hi = starts[pid], starts[pid + 1]
                for dp in range(lo, hi - 5):
                    if (red[dp:dp + 6] == qred[qp:qp + 6]).all():
                        m = min(4, hi - (dp + 6))
                        if (red[dp + 6:dp + 6 + m]
                                == qred[qp + 6:qp + 6 + m]).all():
                            want.add(dp)
        assert got == want, (qp, got, want)


def test_blast_stat_basics():
    st = blast_stat.BlastStat(1e6, 1000, gapped=True)
    st.set_query(300)
    assert st.raw_to_bits(100) == pytest.approx(
        (0.267 * 100 - np.log(0.041)) / np.log(2))
    e1 = st.raw_to_expect(50)
    e2 = st.raw_to_expect(100)
    assert e2 < e1                      # higher score -> lower e-value
    # effective lengths shrink with the adjustment
    assert st.e_query_len < 300
    assert st.e_db_len < 1e6
    # sum statistics of two strong HSPs beats either alone
    ev, ev_sum = st.raw_to_expect(60), st.sum_score_to_expect([60, 60], 500)
    assert ev_sum < ev


def test_pipeline_finds_homologs(rng):
    from hsearch_tpu.core import io as hio
    # family of 3 related proteins + 3 unrelated
    base = rng.integers(0, 20, 120).astype(np.int32)
    seqs = []
    for i in range(3):
        s = base.copy()
        pos = rng.integers(0, 120, 8)
        s[pos] = rng.integers(0, 20, 8)
        seqs.append(s)
    for i in range(3):
        seqs.append(rng.integers(0, 20, 100).astype(np.int32))
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(6)],
                       seq=np.concatenate(seqs), starts=starts)
    searcher = pipeline.ProteinSearcher(db)
    hits = searcher.search_sequence(seqs[0], query_idx=0)
    subjects = {h.subject for h in hits}
    assert {0, 1, 2} <= subjects        # self + the two homologs
    self_hit = [h for h in hits if h.subject == 0][0]
    assert self_hit.identity == pytest.approx(100.0)
    assert self_hit.aln_len == 120
    hom = [h for h in hits if h.subject == 1][0]
    assert hom.evalue < 1e-10
    assert hom.aln_len > 60
    # m8 output writes one line per hit
    import io as pyio
    buf = pyio.StringIO()
    pipeline.write_m8(buf, hits, db.names, db.names)
    assert len(buf.getvalue().splitlines()) == len(hits)


def test_pipeline_subset_group(rng):
    from hsearch_tpu.core import io as hio
    seqs = [rng.integers(0, 20, 80).astype(np.int32) for _ in range(5)]
    seqs[3] = seqs[1].copy()            # 3 duplicates 1
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(5)],
                       seq=np.concatenate(seqs), starts=starts)
    searcher = pipeline.ProteinSearcher(db, subset=np.array([1, 3]))
    hits = searcher.search_all()
    # both group members hit each other with global ids preserved
    pairs = {(h.query, h.subject) for h in hits}
    assert (1, 3) in pairs and (3, 1) in pairs


def test_search_all_batched_equals_per_query(rng):
    from hsearch_tpu.core import io as hio
    base = rng.integers(0, 20, 90).astype(np.int32)
    seqs = []
    for i in range(4):
        s = base.copy()
        pos = rng.integers(0, 90, 6)
        s[pos] = rng.integers(0, 20, 6)
        seqs.append(s)
    seqs.append(rng.integers(0, 20, 70).astype(np.int32))
    seqs.append(rng.integers(0, 20, 8).astype(np.int32))   # too short
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(len(seqs))],
                       seq=np.concatenate(seqs), starts=starts)
    searcher = pipeline.ProteinSearcher(db)
    a = searcher.search_all(batched=True)
    b = searcher.search_all(batched=False)
    key = lambda h: (h.query, h.subject, h.q_beg, h.q_end, h.d_beg,
                     h.d_end, h.score, h.q_aln, h.d_aln, h.info)
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert len(a) > 4        # self-hits plus homologs found


def test_render_strings_multichunk_equals_single(rng, monkeypatch):
    """A tiny _RENDER_CHUNK forces the bulk string render through many
    chunks; rendered strings must equal the one-pass result."""
    from hsearch_tpu.core import io as hio
    base = rng.integers(0, 20, 90).astype(np.int32)
    seqs = []
    for i in range(6):
        s = base.copy()
        pos = rng.integers(0, 90, 5)
        s[pos] = rng.integers(0, 20, 5)
        seqs.append(s)
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(len(seqs))],
                       seq=np.concatenate(seqs), starts=starts)
    searcher = pipeline.ProteinSearcher(db)
    key = lambda h: (h.query, h.subject, h.q_beg, h.d_beg,
                     h.q_aln, h.d_aln, h.info)
    one = sorted(map(key, searcher.search_all(batched=True)))
    # smaller than any single alignment -> every hit gets its own chunk
    monkeypatch.setattr(pipeline, "_RENDER_CHUNK", 7)
    many = sorted(map(key, searcher.search_all(batched=True)))
    assert one == many and len(one) > 6


def test_g10_table_matches_searchsorted_path(rng):
    """Precomputed 4th-suffix-group table == per-candidate derivation."""
    import numpy as np
    from hsearch_tpu.align import seed_index
    lens = rng.integers(3, 30, 20)
    seq = rng.integers(0, 21, int(lens.sum())).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    tab = seed_index.g10_table(seq, starts)
    g = seed_index._GROUP21[np.minimum(seq, 20)]
    off = seed_index.MER + seed_index.NARROW
    for i in range(len(seq)):
        pid = np.searchsorted(starts, i, side="right") - 1
        if i + off < starts[pid + 1]:
            assert tab[i] == g[i + off], i
        else:
            assert tab[i] == seed_index._G10_PASS, i


def test_host_codes_match_device(rng):
    """numpy host_codes == jitted _codes_for/query_probe_codes."""
    lens = rng.integers(3, 40, 30)
    seq = rng.integers(0, 22, int(lens.sum())).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    code, valid6, valid10, qgrp10 = seed_index.host_codes(seq, starts)
    dcode, dvalid6 = seed_index._codes_for(
        jnp.asarray(seq), jnp.asarray(starts, jnp.int32))
    qcodes, dvalid10 = seed_index.query_probe_codes(
        jnp.asarray(seq), jnp.asarray(starts, jnp.int32))
    assert (code == np.asarray(dcode)).all()
    assert (valid6 == np.asarray(dvalid6)).all()
    assert (valid10 == np.asarray(dvalid10)).all()
    assert (code == np.asarray(qcodes)[:, 0]).all()
    g = seed_index._GROUP21[np.minimum(seq, 20)]
    off = seed_index.MER + seed_index.NARROW
    want_g10 = np.concatenate([g[off:], np.full(off, 10, g.dtype)])
    assert (qgrp10 == want_g10).all()


def test_probe_host_matches_device(rng):
    """Ragged host probe == dense device probe, pair for pair."""
    lens = rng.integers(3, 50, 40)
    seq = rng.integers(0, 8, int(lens.sum())).astype(np.int32)  # collisions
    starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    idx = seed_index.build_index(seq, starts)
    hv = seed_index.host_view(idx)
    qseq = rng.integers(0, 8, 256).astype(np.int32)
    qseq[10:110] = seq[:100]
    code, _, valid10, qgrp10 = seed_index.host_codes(
        qseq, np.array([0, len(qseq)]))
    qidx = np.nonzero(valid10)[0]
    rows, dpos, n_over = seed_index.probe_host(
        hv, code[qidx], qgrp10[qidx], cand_max=512)
    cand, dn_over = seed_index.probe(
        idx, jnp.asarray(code[:, None].astype(np.uint32)),
        jnp.asarray(qgrp10, jnp.int32), cand_max=512)
    cand = np.asarray(cand)
    qp, slot = np.nonzero((cand >= 0) & valid10[:, None])
    want = set(zip(qp.tolist(), cand[qp, slot].tolist()))
    got = set(zip(qidx[rows].tolist(), dpos.tolist()))
    assert got == want and len(got) > 50
    assert n_over == int(dn_over)
    # pairs come out (row, dpos)-sorted and duplicate-free
    k = rows * (int(starts[-1]) + 1) + dpos
    assert (np.diff(k) > 0).all()


def test_probe_host_grouped_stays_in_group(rng):
    """Composite-key grouped probe returns only same-group candidates,
    and equals a per-group ungrouped probe."""
    n, L = 12, 60
    base = rng.integers(0, 6, L).astype(np.int32)
    seqs = [base.copy() for _ in range(n)]
    for s in seqs:
        p = rng.integers(0, L, 3)
        s[p] = rng.integers(0, 6, 3)
    seq = np.concatenate(seqs)
    starts = np.concatenate([[0], np.cumsum([L] * n)]).astype(np.int64)
    groups = np.arange(n) % 3
    order = np.argsort(groups, kind="stable")
    # build over proteins sorted by group (pipeline's subset layout)
    seq2 = np.concatenate([seqs[i] for i in order])
    groups2 = groups[order]
    idx = seed_index.build_index(seq2, starts, protein_groups=groups2)
    hv = seed_index.host_view(idx)
    code, _, valid10, qgrp10 = seed_index.host_codes(seq2, starts)
    qidx = np.nonzero(valid10)[0]
    ppid = np.searchsorted(starts, qidx, side="right") - 1
    qg = groups2[ppid]
    rows, dpos, _ = seed_index.probe_host(
        hv, code[qidx], qgrp10[qidx], cand_max=512, qgroups=qg)
    dgrp = groups2[np.searchsorted(starts, dpos, side="right") - 1]
    assert (qg[rows] == dgrp).all() and len(rows) > n * 10
    # equals the union of per-group ungrouped probes
    want = set()
    for gsel in range(3):
        mask = groups2 == gsel
        gseq = np.concatenate([seq2[starts[i]:starts[i + 1]]
                               for i in range(n) if mask[i]])
        loc = np.nonzero(mask)[0]
        gstarts = np.concatenate([[0], np.cumsum([L] * len(loc))])
        gi = seed_index.build_index(gseq, gstarts)
        ghv = seed_index.host_view(gi)
        c, _, v, qg10 = seed_index.host_codes(gseq, gstarts)
        qi = np.nonzero(v)[0]
        r2, d2, _ = seed_index.probe_host(ghv, c[qi], qg10[qi], 512)
        # map local offsets back to the grouped layout
        l2g = np.concatenate([np.arange(starts[i], starts[i + 1])
                              for i in range(n) if mask[i]])
        want |= set(zip(l2g[qi[r2]].tolist(), l2g[d2].tolist()))
    got = set(zip(qidx[rows].tolist(), dpos.tolist()))
    assert got == want


def test_collapse_diag_runs():
    import numpy as np
    from hsearch_tpu.align.pipeline import _collapse_diag_runs
    # same (qpid, dpid, diag): run 10,13,16 collapses to 10; 30 is a new
    # run; a different diagonal and a different subject both survive
    qpos = np.array([10, 13, 16, 30, 12, 10])
    dpos = np.array([110, 113, 116, 130, 152, 310])
    qpid = np.zeros(6, np.int64)
    dpid = np.array([1, 1, 1, 1, 1, 2])
    keep = _collapse_diag_runs(qpos, dpos, qpid, dpid, tol=6)
    kept = set(zip(qpos[keep].tolist(), dpos[keep].tolist()))
    assert kept == {(10, 110), (30, 130), (12, 152), (10, 310)}


def test_info_from_ints_matches_char_loop(rng):
    import numpy as np
    from hsearch_tpu.align.pipeline import _info_from_ints, _pos_score
    from hsearch_tpu.core import alphabet
    qi = rng.integers(0, 21, 200).astype(np.int64)
    di = qi.copy()
    flip = rng.random(200) < 0.4
    di[flip] = rng.integers(0, 21, int(flip.sum()))
    got = _info_from_ints(qi, di)
    qs, ds = alphabet.decode(qi), alphabet.decode(di)
    want = "".join(a if a == b else ("+" if _pos_score(a, b) > 0 else " ")
                   for a, b in zip(qs, ds))
    assert got == want


def test_search_all_probe_chunking_identical(rng):
    """Tiny probe_chunk (forcing many protein-aligned slices) returns
    exactly the unchunked hit set — the chunked probe exists to bound
    the raw candidate arrays at IGC scale, not to change answers."""
    import numpy as np
    from hsearch_tpu.align import pipeline as ap

    n, plen, n_fam = 60, 64, 15
    seqs = []
    for i in range(n):
        base = np.random.default_rng(900 + i % n_fam).integers(
            0, 20, plen)
        s = base.copy()
        pos = rng.choice(plen, 3, replace=False)
        s[pos] = rng.integers(0, 20, 3)
        seqs.append(s)

    class DB:
        names = [f"p{i}" for i in range(n)]
        seq = np.concatenate(seqs).astype(np.int32)
        starts = np.arange(n + 1, dtype=np.int64) * plen
        num_proteins = n

    groups = (np.arange(n) % 3).astype(np.int64)
    order = np.argsort(groups, kind="stable")
    key = lambda hs: sorted(
        (h.query, h.subject, h.score, h.q_beg, h.d_beg) for h in hs)
    big = ap.ProteinSearcher(DB(), ap.SearchParams(), subset=order,
                             groups=groups[order]).search_all()
    small = ap.ProteinSearcher(DB(), ap.SearchParams(probe_chunk=61),
                               subset=order,
                               groups=groups[order]).search_all()
    assert key(big) == key(small)
    assert len(big) > 0


def test_search_all_pair_budget_slicing_identical(rng):
    """Tiny pair_budget (forcing many candidate-budget sub-slices per
    chunk, cut at protein boundaries) + tiny probe_chunk reproduces the
    unbounded pipeline exactly, in BOTH the returned list and the sink
    stream, with and without query_rows — the corpus-scale streaming
    path at toy size."""
    import numpy as np
    from hsearch_tpu.align import pipeline as ap

    n, plen, n_fam = 48, 60, 8
    seqs = []
    for i in range(n):
        base = np.random.default_rng(1200 + i % n_fam).integers(
            0, 20, plen)
        s = base.copy()
        pos = rng.choice(plen, 2, replace=False)
        s[pos] = rng.integers(0, 20, 2)
        seqs.append(s)

    class DB:
        names = [f"p{i}" for i in range(n)]
        seq = np.concatenate(seqs).astype(np.int32)
        starts = np.arange(n + 1, dtype=np.int64) * plen
        num_proteins = n

    groups = (np.arange(n) % 2).astype(np.int64)
    order = np.argsort(groups, kind="stable")

    def key(hs):
        return [(h.query, h.subject, h.score, h.evalue, h.q_beg,
                 h.d_beg, h.q_aln) for h in hs]

    big = ap.ProteinSearcher(DB(), ap.SearchParams(), subset=order,
                             groups=groups[order]).search_all()
    tiny = ap.SearchParams(probe_chunk=130, pair_budget=64)
    s2 = ap.ProteinSearcher(DB(), tiny, subset=order,
                            groups=groups[order])
    small = s2.search_all()
    assert key(big) == key(small) and len(big) > 0
    # sink stream concatenates to the same list, in order
    streamed: list = []
    s2.search_all(hit_sink=streamed.extend)
    assert key(streamed) == key(big)
    # query_rows partition under tiny budgets: union over parts == full
    rows_a = np.arange(0, n, 2)
    rows_b = np.arange(1, n, 2)
    got = s2.search_all(query_rows=rows_a) \
        + s2.search_all(query_rows=rows_b)
    assert sorted(key(got)) == sorted(key(big))
