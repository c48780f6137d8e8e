"""hsearch_tpu — a TPU-native protein motif search-and-clustering framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of acgtun/hsearch
(reference: /root/reference): BLOSUM62-derived metric embedding of protein
k-mers, p-stable LSH near-neighbor motif search with exact-distance
verification, greedy/centroid k-mer clustering, KLSH + seed-extend whole
protein clustering with BLAST statistics, plus the surrounding corpus
preparation (ORF translation, Pfam STOCKHOLM centers, suffix-array k-mer
dedup) and evaluation tooling.

Layer map (TPU-first):
  core/      alphabets, BLOSUM62, metric transform, MDS embedding, IO
  ops/       device kernels: distances, segment/bucket ops, pallas kernels
  lsh/       p-stable LSH (k-mers) and cosine KLSH (proteins)
  search/    exact oracle + LSH motif search
  cluster/   greedy (hclust2/3), centroid-merge (hclust), post-processing
  align/     murphy10 seed index, x-drop extension, banded gapped DP,
             Karlin-Altschul statistics, m8/aln output
  parallel/  jax.sharding meshes, DB-sharded search, collective merges
  cli/       command-line tools mirroring the reference binaries
"""

import jax as _jax

# 64-bit types are required for exact packed LSH bucket codes (int64) and
# optional f64 distance parity with the reference's doubles.  All hot-path
# arrays are explicitly f32/bf16/int32 — enabling x64 only widens what is
# deliberately widened.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
