"""Edge-case robustness: tiny/degenerate inputs must not crash."""

import io as pyio

import jax
import numpy as np

from hsearch_tpu.align import pipeline
from hsearch_tpu.core import alphabet, dataprep, io as hio, orf
from hsearch_tpu.search import exact, ivf, motif


def _db(seqs):
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    return hio.ProteinDB(names=[f"p{i}" for i in range(len(seqs))],
                         seq=(np.concatenate(seqs) if seqs else
                              np.zeros(0, np.uint8)),
                         starts=starts)


def test_short_proteins_in_aligner(rng):
    # proteins shorter than the 10-residue local seed
    seqs = [rng.integers(0, 20, n).astype(np.int32) for n in (3, 7, 9, 40)]
    db = _db(seqs)
    searcher = pipeline.ProteinSearcher(db)
    assert searcher.search_sequence(seqs[0], 0) == []
    hits = searcher.search_sequence(seqs[3], 3)
    assert all(h.subject == 3 for h in hits)   # only the long one self-hits


def test_unknown_residues_never_seed(rng):
    seq = np.full(50, 20, np.int32)            # all unknown
    db = _db([seq, rng.integers(0, 20, 50).astype(np.int32)])
    searcher = pipeline.ProteinSearcher(db)
    assert searcher.search_sequence(seq, 0) == []


def test_single_point_database(rng):
    db = rng.integers(0, 20, (1, 10), dtype=np.int32)
    centers = db.copy()
    ci, ki, dd = exact.search_radius(db, centers, 10.0)
    assert list(zip(ci, ki)) == [(0, 0)] and dd[0] < 1e-6
    idx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    ci2, ki2, _ = ivf.search(idx, centers, 10.0, k_blocks=idx.num_blocks)
    assert list(zip(ci2, ki2)) == [(0, 0)]
    midx = motif.build_index(db, jax.random.PRNGKey(0))
    ci3, ki3, _ = motif.search(midx, centers,
                               motif.MotifSearchConfig(radius=10.0))
    assert list(zip(ci3, ki3)) == [(0, 0)]


def test_no_hits_empty_result(rng):
    db = np.zeros((8, 10), np.int32)           # all-A database
    centers = np.full((2, 10), 17, np.int32)   # all-W centers (far)
    ci, ki, dd = exact.search_radius(db, centers, 5.0)
    assert len(ci) == 0
    idx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=4)
    ci2, ki2, dd2 = ivf.search(idx, centers, 5.0, k_blocks=idx.num_blocks)
    assert len(ci2) == 0


def test_empty_fasta_and_formats():
    db = hio.read_fasta(pyio.StringIO(""))
    assert db.num_proteins == 0
    assert dataprep.corpus_stats(db).total_aa == 0
    kmers, counts = dataprep.unique_kmers(db, 5)
    assert len(kmers) == 0


def test_orf_edge_cases():
    assert orf.orf6("") == []
    assert orf.orf6("AT") == []
    # no start/stop handling required: translation is frame-based
    peps = orf.orf6("ATGATGATGATGATGATGATG", min_len=6)
    assert any("MMMMMM" in p for p in peps)


def test_alphabet_roundtrip_unknowns():
    idx = alphabet.encode("ARNDXBZ")
    assert (idx[:4] < 20).all() if len(idx) >= 4 else True
    assert (idx[4:] >= 20).all()
    s = alphabet.decode(np.array([0, 1, 2, 3]))
    assert s == "ARND"
