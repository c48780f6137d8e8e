"""hsearch_tpu — a TPU-native protein motif search-and-clustering framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of acgtun/hsearch
(reference: /root/reference): BLOSUM62-derived metric embedding of protein
k-mers, p-stable LSH near-neighbor motif search with exact-distance
verification, greedy/centroid k-mer clustering, KLSH + seed-extend whole
protein clustering with BLAST statistics, plus the surrounding corpus
preparation (ORF translation, Pfam STOCKHOLM centers, suffix-array k-mer
dedup) and evaluation tooling.

Layer map (TPU-first):
  core/        alphabets, BLOSUM62, metric transform, MDS embedding, IO,
               corpus prep (ORF, STOCKHOLM, suffix array, sampling)
  ops/         device kernels: distances, segment/bucket ops, Pallas
  lsh/         p-stable LSH with query-directed multiprobe
  search/      exact oracle, LSH motif search, block-pruned IVF engine
  cluster/     greedy (hclust2/3), centroid-merge (hclust), KLSH protein
               clustering (pcluster), union-find, post-processing
  align/       murphy10 seed index, batched x-drop extension, banded
               gapped DP, Karlin-Altschul statistics, m8/aln output
  parallel/    jax.sharding meshes, DB-sharded search, collective merges,
               data-parallel embedding training
  metric       BLOSUM-Metric k-best enumeration + agreement evaluation
  utils/       profiling, index checkpointing, bucket statistics
  native_ext   ctypes bindings for native/ C++ host kernels
  cli          command-line tools mirroring the reference binaries
"""

# The framework is deliberately 32-bit native (TPU lanes are 32-bit):
# LSH codes pack into int32, seed codes into uint32, distances are f32
# with f64 host-side statistics.  jax's x64 mode is left at its default
# (off) — nothing here requires 64-bit device types.

__version__ = "0.2.0"    # keep in sync with pyproject.toml
