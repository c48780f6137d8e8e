"""IGC-style pipeline integration: DNA -> ORFs -> k-mers -> index ->
search -> clusters, chained through the CLI (BASELINE.json config 5,
single-host slice)."""

import numpy as np

from hsearch_tpu import cli
from hsearch_tpu.core import io as hio

CODONS = {
    "A": "GCT", "R": "CGT", "N": "AAT", "D": "GAT", "C": "TGT",
    "Q": "CAA", "E": "GAA", "G": "GGT", "H": "CAT", "I": "ATT",
    "L": "CTT", "K": "AAA", "M": "ATG", "F": "TTT", "P": "CCT",
    "S": "TCT", "T": "ACT", "W": "TGG", "Y": "TAT", "V": "GTT",
}
AA = "ARNDCQEGHILKMFPSTWYV"


def _encode_dna(peptide: str) -> str:
    return "".join(CODONS[a] for a in peptide) + "TAA"


def test_full_pipeline_dna_to_clusters(tmp_path, rng):
    motif = "WWCHHKKRRF"
    # genes whose frame-0 translation embeds the motif
    dna = tmp_path / "genes.fasta"
    with open(dna, "w") as f:
        for i in range(12):
            pep = "".join(AA[j] for j in rng.integers(0, 20, 30))
            if i % 2 == 0:
                pep = motif + pep[10:]
            f.write(f">g{i}\n{_encode_dna(pep)}\n")

    # 1. six-frame translation
    aa = str(tmp_path / "aa.fasta")
    cli.main(["orf", "-q", str(dna), "-o", aa])
    db = hio.read_fasta(aa)
    assert db.num_proteins >= 12

    # 2. unique k-mers with counts
    uk = str(tmp_path / "kmers.tsv")
    cli.main(["gen-kmers", "-d", aa, "-o", uk, "-l", "10"])
    lines = open(uk).read().splitlines()
    assert any(line.split("\t")[0] == motif for line in lines)

    # 3. k-mer datapoints + exact ground truth + LSH search
    dp = str(tmp_path / "points.txt")
    cli.main(["protein2datapoints", "-d", aa, "-o", dp, "-l", "10"])
    centers = str(tmp_path / "centers.fasta")
    with open(centers, "w") as f:
        f.write(f">c0\n{motif}\n")
    gt = str(tmp_path / "gt.txt")
    hits = str(tmp_path / "hits.txt")
    cli.main(["motif-search-exact", "-d", dp, "-c", centers, "-l", "10",
              "-T", "25", "-o", gt])
    cli.main(["motif-search", "-d", dp, "-c", centers, "-l", "10",
              "-T", "25", "-o", hits, "--probes", "8", "-L", "8"])
    assert len(hio.read_triples(gt)) >= 1
    assert set((a, b) for a, b, _ in hio.read_triples(hits)) <= \
        set((a, b) for a, b, _ in hio.read_triples(gt))

    # 4. greedy clustering of the translated k-mers
    clusters = str(tmp_path / "clusters.txt")
    cli.main(["hclust2", "-d", aa, "-o", clusters, "-l", "10", "-T", "25",
              "-k", "4", "-L", "8"])
    got = hio.read_clusters(clusters)
    long_enough = sum(1 for i in range(db.num_proteins)
                      if len(db.protein(i)) >= 10)
    assert got and sum(len(c) for c in got) == long_enough
    # the motif-bearing frames cluster together
    motif_cluster = [c for c in got if motif in c]
    assert motif_cluster and len(motif_cluster[0]) >= 2
