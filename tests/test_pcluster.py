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
