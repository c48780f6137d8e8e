"""Native C++ extension tests: native path vs Python fallback parity."""

import numpy as np
import pytest

from hsearch_tpu import native_ext
from hsearch_tpu.core import alphabet, blosum, dataprep


needs_native = pytest.mark.skipif(not native_ext.available(),
                                  reason="native library not built")


@needs_native
def test_parse_fasta_native(rng):
    data = b">seq1 desc here\nARNDC\nQEGHI\n>seq2\nwwyyv\n>seq3\nAXB-1A\n"
    names, seq, starts = native_ext.parse_fasta_bytes(data)
    assert names == ["seq1", "seq2", "seq3"]
    assert starts.tolist() == [0, 10, 15, 19]
    np.testing.assert_array_equal(seq[:10], alphabet.encode("ARNDCQEGHI"))
    np.testing.assert_array_equal(seq[10:15], alphabet.encode("WWYYV"))
    # X and B are unknown (20), '-' and '1' dropped
    assert seq[15] == 0 and seq[16] == 20 and seq[17] == 20 and seq[18] == 0


@needs_native
def test_suffix_array_native_matches_numpy(rng):
    seq = rng.integers(0, 20, 500).astype(np.int32)
    want = dataprep.suffix_array(seq)
    got = native_ext.suffix_array(seq)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_union_find_native_matches_python(rng):
    n = 100
    src = rng.integers(0, n, 60)
    dst = rng.integers(0, n, 60)
    got = native_ext.union_find_labels(n, src, dst)
    from hsearch_tpu.cluster.union_find import connected_components
    want = connected_components(n, src, dst)
    np.testing.assert_array_equal(got, want)


def _sub21():
    sub = np.full((21, 21), -5, np.int32)
    sub[:20, :20] = blosum.BLOSUM62
    return sub


def test_align_gapped_identical():
    q = alphabet.encode("ARNDCQEGHIKLMNP").astype(np.int32)
    q = q[q < 20]      # N appears twice; drop any unknown just in case
    res = native_ext.align_gapped(q, q, _sub21())
    assert res is not None
    score, ops, e1, e2 = res
    assert (ops == 0).all() and len(ops) == len(q)
    assert score == int(blosum.BLOSUM62[q, q].sum())
    assert e1 == len(q) and e2 == len(q)


def test_align_gapped_with_gap():
    base = alphabet.encode("ARNDCQEGHIKMFPSTWYVA").astype(np.int32)
    q = base
    d = np.concatenate([base[:10], alphabet.encode("A"), base[10:]])
    d = d.astype(np.int32)
    res = native_ext.align_gapped(q, d, _sub21(), gap_open=11, gap_ext=1)
    assert res is not None
    score, ops, e1, e2 = res
    assert (ops == 2).sum() == 1            # one insertion in d
    assert (ops == 0).sum() == len(q)
    # score = perfect matches - gap_open for the 1-residue gap
    perfect = int(blosum.BLOSUM62[q, q].sum())
    assert score == perfect - 11


def test_align_gapped_python_fallback_matches_native(rng):
    if not native_ext.available():
        pytest.skip("native library not built")
    for _ in range(5):
        q = rng.integers(0, 20, 30).astype(np.int32)
        d = q.copy()
        # a few mutations and a small indel
        pos = rng.integers(0, 30, 3)
        d[pos] = rng.integers(0, 20, 3)
        d = np.delete(d, int(rng.integers(5, 25)))
        nat = native_ext.align_gapped(q, d, _sub21())
        py = native_ext._align_gapped_py(q, d, _sub21(), 11, 1, 27, 32)
        assert nat[0] == py[0], (nat, py)
        np.testing.assert_array_equal(nat[1], py[1])
        assert nat[2:] == py[2:]


def test_refine_gapped_improves_indel_hit(rng):
    from hsearch_tpu.align import pipeline
    from hsearch_tpu.core import io as hio
    base = rng.integers(0, 20, 120).astype(np.int32)
    # subject = query with a 2-residue deletion in the middle
    subj = np.concatenate([base[:60], base[62:]])
    seqs = [base, subj]
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=["q", "s"],
                       seq=np.concatenate(seqs), starts=starts)
    searcher = pipeline.ProteinSearcher(db)
    hits = [h for h in searcher.search_sequence(base, 0) if h.subject == 1]
    assert hits
    best_ungapped = max(h.score for h in hits)
    refined = pipeline.refine_gapped(searcher, base, hits)
    best = max(refined, key=lambda h: h.score)
    # the gapped alignment bridges the indel: higher score, gaps recorded,
    # longer than either ungapped HSP's window half
    assert best.score > best_ungapped
    assert best.gap_open >= 1
    assert best.aln_len > max(h.aln_len for h in hits)


def _random_db(rng, n=150, lmin=3, lmax=90):
    lens = rng.integers(lmin, lmax, n)
    starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    seq = rng.integers(0, 21, starts[-1]).astype(np.int32)
    return seq, starts


@needs_native
def test_seed_codes_native_matches_numpy(rng):
    from hsearch_tpu.align import seed_index
    seq, starts = _random_db(rng)
    nat = native_ext.seed_codes(seq, starts, seed_index._GROUP21)
    code, v6, v10, qg = seed_index._host_codes_np(seq, starts)
    g10 = seed_index.g10_table(seq, starts)
    np.testing.assert_array_equal(nat[0], code)
    np.testing.assert_array_equal(nat[1], v6)
    np.testing.assert_array_equal(nat[2], v10)
    np.testing.assert_array_equal(nat[3], qg.astype(np.int32))
    np.testing.assert_array_equal(nat[4], g10)


@needs_native
def test_argsort_u64_native_matches_numpy_stable(rng):
    keys = rng.integers(0, 2**48, 50000, dtype=np.uint64)
    keys[::5] = keys[7]        # heavy duplicates: stability must hold
    keys[1000:1200] = 0
    got = native_ext.argsort_u64(keys)
    np.testing.assert_array_equal(got, np.argsort(keys, kind="stable"))
    # empty input
    e = np.zeros(0, np.uint64)
    assert native_ext.argsort_u64(e).shape == (0,)


@needs_native
def test_probe_sorted_native_matches_numpy(rng, monkeypatch):
    from hsearch_tpu.align import seed_index
    seq, starts = _random_db(rng)
    code, v6, v10, qg = seed_index._host_codes_np(seq, starts)
    qcodes = code[v10]
    qgrp10 = qg[v10].astype(np.int32)
    for grouped in (False, True):
        pg = rng.integers(0, 6, len(starts) - 1) if grouped else None
        _, view = seed_index.build_index_and_view(seq, starts, pg)
        qgroups = None
        if grouped:
            pid = np.searchsorted(starts, np.nonzero(v10)[0],
                                  side="right") - 1
            qgroups = pg[pid]
        for cand_max in (4, 64):     # small cap forces truncation/n_over
            got = seed_index.probe_host(view, qcodes, qgrp10, cand_max,
                                        qgroups)
            monkeypatch.setattr(native_ext, "available", lambda: False)
            want = seed_index.probe_host(view, qcodes, qgrp10, cand_max,
                                         qgroups)
            monkeypatch.undo()
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
            assert got[2] == want[2]


@needs_native
def test_probe_sorted_empty_queries():
    from hsearch_tpu.align import seed_index
    rng = np.random.default_rng(0)
    seq, starts = _random_db(rng, n=10)
    _, view = seed_index.build_index_and_view(seq, starts)
    rows, dpos, n_over = seed_index.probe_host(
        view, np.zeros(0, np.uint32), np.zeros(0, np.int32), 8)
    assert rows.shape == (0,) and dpos.shape == (0,) and n_over == 0


@needs_native
def test_pair_prep_native_matches_numpy_chain(rng, monkeypatch):
    """search_all's fused native pair prep vs the numpy filter chain:
    identical hits with exclude keys and the diag-run collapse active."""
    from hsearch_tpu.align import pipeline
    from hsearch_tpu.core import io as hio
    base = rng.integers(0, 20, 100).astype(np.int32)
    seqs = []
    for i in range(12):
        s = base.copy()
        pos = rng.choice(100, 5, replace=False)
        s[pos] = rng.integers(0, 20, 5)
        seqs.append(s)
    seqs.append(base[:12].copy())           # short subject: SEED_LEN edge
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(len(seqs))],
                       seq=np.concatenate(seqs), starts=starts)
    searcher = pipeline.ProteinSearcher(db)
    excl = np.sort(np.array([(0 << 32) | 1, (2 << 32) | 3], np.uint64))

    def key(h):
        return (h.query, h.subject, h.score, h.q_beg, h.q_end, h.d_beg,
                h.d_end, round(h.evalue, 12), h.q_aln, h.d_aln, h.info)

    for ex in (None, excl):
        got = searcher.search_all(batched=True, exclude_pairs=ex)
        monkeypatch.setattr(native_ext, "pair_prep",
                            lambda *a, **k: None)
        want = searcher.search_all(batched=True, exclude_pairs=ex)
        monkeypatch.undo()
        assert [key(h) for h in got] == [key(h) for h in want]
        assert got, "workload produced no hits"
        if ex is not None:
            assert not any(h.query == 0 and h.subject == 1 for h in got)
