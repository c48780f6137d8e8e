"""Whole-protein clustering (cluster/pcluster.py) tests."""

import jax
import numpy as np

from hsearch_tpu.cluster import pcluster
from hsearch_tpu.core import io as hio


def _family_proteins(rng, n_fam=3, per_fam=3, length=150, n_noise=4,
                      flips=2):
    seqs, truth = [], []
    for f in range(n_fam):
        base = rng.integers(0, 20, length).astype(np.int32)
        for _ in range(per_fam):
            s = base.copy()
            pos = rng.integers(0, length, flips)
            s[pos] = rng.integers(0, 20, flips)
            seqs.append(s)
            truth.append(f)
    for i in range(n_noise):
        seqs.append(rng.integers(0, 20, 120).astype(np.int32))
        truth.append(n_fam + i)
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=[f"p{i}" for i in range(len(seqs))],
                       seq=np.concatenate(seqs), starts=starts)
    return db, np.array(truth)


def test_klsh_codes_group_identical_histograms(rng):
    key = jax.random.PRNGKey(0)
    kp = pcluster.klsh_init(key)
    db, truth = _family_proteins(rng, flips=0)   # exact duplicates
    feats = pcluster.protein_histograms(db)
    codes = np.asarray(pcluster.klsh_codes(jax.numpy.asarray(feats), kp))
    # identical histograms must share codes (the reference's dedup regime)
    for f in range(3):
        members = np.nonzero(truth == f)[0]
        assert len(set(codes[members].tolist())) == 1, codes[members]


def test_cluster_proteins_recovers_families(rng):
    db, truth = _family_proteins(rng, flips=2)
    # one KLSH table splits perturbed families (the reference behavior);
    # OR-amplification over several tables recovers them
    res = pcluster.cluster_proteins(db, jax.random.PRNGKey(1), tables=6)
    labels = res.labels
    # same family -> same cluster; different families -> different clusters
    for f in range(3):
        members = np.nonzero(truth == f)[0]
        assert len(set(labels[members].tolist())) == 1
    reps = [labels[np.nonzero(truth == f)[0][0]] for f in range(3)]
    assert len(set(map(int, reps))) == 3
    # noise proteins stay singletons
    for i in np.nonzero(truth >= 3)[0]:
        assert (labels == labels[i]).sum() == 1


def test_cluster_proteins_no_duplicate_pairs(rng):
    """tables>1 must not re-align/re-report a pair an earlier table
    already hit: every (query, subject) appears at most once, and the
    clustering matches a run without the exclusion (same unions)."""
    db, truth = _family_proteins(rng, flips=2)
    res = pcluster.cluster_proteins(db, jax.random.PRNGKey(1), tables=6)
    pairs = [(h.query, h.subject) for h in res.hits]
    assert len(pairs) == len(set(pairs))
    # same-family pairs still union (exclusion loses no connectivity)
    for f in range(3):
        members = np.nonzero(truth == f)[0]
        assert len(set(res.labels[members].tolist())) == 1


def test_histogram_matches_reference_formula(rng):
    from hsearch_tpu.core import alphabet
    seq = rng.integers(0, 20, 50).astype(np.int32)
    starts = np.array([0, 50])
    db = hio.ProteinDB(names=["x"], seq=seq, starts=starts)
    h = pcluster.protein_histograms(db)[0]
    assert h.sum() == 50 - alphabet.HASHLEN + 1
    # manual Kmer2Integer check on the first 3-mer
    g = alphabet.HIST8[seq[:3]]
    fid = int(g[0]) + int(g[1]) * 8 + int(g[2]) * 64
    assert h[fid] >= 1


def test_grouped_searcher_matches_per_group(rng):
    """One group-partitioned ProteinSearcher == separate per-group
    searchers: identical hit sets AND e-values (group-local statistics)."""
    from hsearch_tpu.align import pipeline as apipe

    db, truth = _family_proteins(rng, n_fam=3, per_fam=3, n_noise=0,
                                 flips=2)
    groups = [np.nonzero(truth == f)[0] for f in range(3)]
    subset = np.concatenate(groups)
    group_of = np.repeat(np.arange(3), [len(g) for g in groups])
    batched = apipe.ProteinSearcher(db, subset=subset, groups=group_of)
    got = batched.search_all()

    want = []
    for g in groups:
        s = apipe.ProteinSearcher(db, subset=g)
        want.extend(s.search_all())

    def key(h):
        return (h.query, h.subject, h.q_beg, h.q_end, h.d_beg, h.d_end)

    gm = {key(h): h for h in got}
    wm = {key(h): h for h in want}
    assert set(gm) == set(wm)
    for k in gm:
        assert gm[k].score == wm[k].score
        np.testing.assert_allclose(gm[k].evalue, wm[k].evalue, rtol=1e-9)
        np.testing.assert_allclose(gm[k].bits, wm[k].bits, rtol=1e-9)


def test_grouped_searcher_no_cross_group_hits(rng):
    """Probes are bounded to the querying protein's own group."""
    from hsearch_tpu.align import pipeline as apipe

    # two groups that are exact COPIES: an unbounded index would pair
    # proteins across the groups
    base = rng.integers(0, 20, 150).astype(np.int32)
    seqs = [base.copy(), base.copy(), base.copy(), base.copy()]
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    from hsearch_tpu.core import io as hio2
    db = hio2.ProteinDB(names=[f"p{i}" for i in range(4)],
                        seq=np.concatenate(seqs), starts=starts)
    s = apipe.ProteinSearcher(db, subset=np.arange(4),
                              groups=np.array([0, 0, 1, 1]))
    hits = s.search_all()
    assert hits
    for h in hits:
        assert (h.query < 2) == (h.subject < 2), (h.query, h.subject)


def test_grouped_search_unbatched_agrees(rng):
    from hsearch_tpu.align import pipeline as apipe

    db, truth = _family_proteins(rng, n_fam=2, per_fam=3, n_noise=0,
                                 flips=2)
    subset = np.arange(6)
    group_of = truth[:6]
    s = apipe.ProteinSearcher(db, subset=subset, groups=group_of)
    a = s.search_all(batched=True)
    b = s.search_all(batched=False)

    def key(h):
        return (h.query, h.subject, h.q_beg, h.q_end, h.d_beg, h.d_end,
                h.score, round(float(h.evalue), 12))

    assert sorted(map(key, a)) == sorted(map(key, b))


def test_unsorted_subset_batched_equals_per_query(rng):
    """Caller-ordered (unsorted) subsets: batched assembly must order
    equal-e-value ties by GLOBAL subject id like the per-query path
    (a local-row sort diverged at the truncation boundary)."""
    import numpy as np
    from hsearch_tpu.align import pipeline as apipe
    from hsearch_tpu.core import io as hio
    fam = rng.integers(0, 20, 90).astype(np.int32)
    seqs, names = [], []
    for i in range(8):                 # identical copies -> exact ties
        seqs.append(fam.copy())
        names.append(f"p{i}")
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=names, seq=np.concatenate(seqs),
                       starts=starts)
    subset = np.array([5, 2, 7, 0, 3])     # unsorted, with gaps
    params = apipe.SearchParams(max_m8_per_query=3, max_aln_per_query=3)
    s = apipe.ProteinSearcher(db, params, subset=subset)
    a = s.search_all(batched=True)
    b = s.search_all(batched=False)
    ka = [(h.query, h.subject, h.evalue, h.q_beg, h.d_beg) for h in a]
    kb = [(h.query, h.subject, h.evalue, h.q_beg, h.d_beg) for h in b]
    assert ka == kb
