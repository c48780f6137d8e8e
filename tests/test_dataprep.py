"""Corpus-prep (core/dataprep.py) tests."""

import numpy as np

from hsearch_tpu.core import alphabet, dataprep, io as hio


def _db(seqs):
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    return hio.ProteinDB(names=[f"p{i}" for i in range(len(seqs))],
                         seq=np.concatenate(seqs).astype(np.uint8),
                         starts=starts)


def test_suffix_array_matches_sorted_suffixes(rng):
    seq = rng.integers(0, 20, 200).astype(np.int64)
    sa = dataprep.suffix_array(seq)
    suffixes = sorted(range(len(seq)), key=lambda i: tuple(seq[i:]))
    np.testing.assert_array_equal(sa, suffixes)


def test_unique_kmers_counts(rng):
    # 'ARNDC' x3 within one protein; windows crossing proteins excluded
    s1 = alphabet.encode("ARNDCARNDCARNDC")
    s2 = alphabet.encode("ARNDC")
    db = _db([s1, s2])
    kmers, counts = dataprep.unique_kmers(db, 5)
    as_str = {alphabet.decode(k): int(c) for k, c in zip(kmers, counts)}
    assert as_str["ARNDC"] == 4            # 3 in s1 (pos 0,5,10) + 1 in s2
    assert sum(counts) == (15 - 4) + 1     # all windows of s1 + one of s2
    # sorted lexicographically
    packed = [tuple(k) for k in kmers]
    assert packed == sorted(packed)


def test_sample_kmer_datapoints_dedup(rng):
    seq = alphabet.encode("ARNDCQEGHI" * 30)
    db = _db([seq])
    headers, kmers = dataprep.sample_kmer_datapoints(db, 10, rng)
    # dedup: identical k-mers never sampled twice
    keys = {k.tobytes() for k in kmers}
    assert len(keys) == len(kmers)
    meta = hio.parse_datapoint_header(headers[0])
    assert meta is not None and meta["kmer"] == "ARNDCQEGHI"


def test_corpus_and_annotation_stats(tmp_path, rng):
    db = _db([rng.integers(0, 20, n) for n in (50, 70, 30)])
    st = dataprep.corpus_stats(db)
    assert (st.num_proteins, st.total_aa, st.max_len) == (3, 150, 70)

    ann = tmp_path / "ann.tsv"
    ann.write_text(
        "g1 name 300 complete origin phylA genB kegg1 nog1\n"
        "g2 name 200 complete origin unknown unknown unknown unknown\n")
    a = dataprep.annotation_stats(str(ann))
    assert (a.total, a.unknown) == (2, 1)
    assert (a.total_length, a.unknown_length) == (500, 200)


def _random_fasta(tmp_path, rng, n=40, lmin=5, lmax=120, unknowns=True):
    aa = "ARNDCQEGHILKMFPSTWYV"
    path = tmp_path / "db.fasta"
    with open(path, "w") as f:
        for i in range(n):
            ln = int(rng.integers(lmin, lmax))
            s = "".join(
                ("X" if unknowns and rng.random() < 0.02
                 else aa[rng.integers(0, 20)]) for _ in range(ln))
            f.write(f">p{i} desc{i}\n")
            for j in range(0, ln, 17):       # multi-line records
                f.write(s[j:j + 17] + "\n")
    return str(path)


def test_stream_fasta_equals_read_fasta(tmp_path, rng):
    path = _random_fasta(tmp_path, rng)
    whole = hio.read_fasta(path, seed=7)
    chunks = list(hio.stream_fasta(path, seed=7, chunk_aa=200))
    assert len(chunks) > 3                   # actually chunked
    names = [n for c in chunks for n in c.names]
    seq = np.concatenate([c.seq for c in chunks])
    lens = np.concatenate([np.diff(c.starts) for c in chunks])
    assert names == whole.names
    np.testing.assert_array_equal(seq, whole.seq)
    np.testing.assert_array_equal(lens, np.diff(whole.starts))


def test_stream_kmer_datapoints_equals_whole(tmp_path, rng):
    path = _random_fasta(tmp_path, rng)
    whole = hio.read_fasta(path, seed=3)
    h1, k1 = dataprep.sample_kmer_datapoints(
        whole, 10, np.random.default_rng(11))
    outs = list(dataprep.stream_kmer_datapoints(
        hio.stream_fasta(path, seed=3, chunk_aa=200), 10,
        np.random.default_rng(11)))
    h2 = [h for hs, _ in outs for h in hs]
    k2 = np.concatenate([k for _, k in outs])
    assert h1 == h2
    np.testing.assert_array_equal(k1, k2)


def test_stream_unique_kmers_equals_whole(tmp_path, rng):
    path = _random_fasta(tmp_path, rng)
    whole = hio.read_fasta(path, seed=None)
    k1, c1 = dataprep.unique_kmers(whole, 8)
    k2, c2 = dataprep.stream_unique_kmers(
        hio.stream_fasta(path, seed=None, chunk_aa=150), 8)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(c1, c2)
