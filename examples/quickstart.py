"""Worked example: the full hsearch_tpu flow on a small synthetic corpus.

Run:  python examples/quickstart.py     (CPU or TPU)

Covers: FASTA -> ProteinDB -> k-mers -> three search engines (exact
oracle, multiprobe LSH, block-pruned IVF) -> recall evaluation -> motif
clustering -> MEME output -> protein clustering with alignments.
"""

import os
import tempfile

import numpy as np

# HSEARCH_PLATFORM=cpu forces CPU (same knob as the CLI --platform flag)
if os.environ.get("HSEARCH_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["HSEARCH_PLATFORM"])
import jax

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))       # runnable without PYTHONPATH
from hsearch_tpu.core import alphabet, io as hio
from hsearch_tpu.cluster import greedy, pcluster, postprocess
from hsearch_tpu.search import evaluate, exact, ivf, motif

AA = "ARNDCQEGHILKMFPSTWYV"
rng = np.random.default_rng(0)

# --- 1. a corpus with a planted motif ------------------------------------
motif_seq = "WWCHHKKRRF"
records = []
for i in range(60):
    s = "".join(AA[j] for j in rng.integers(0, 20, 80))
    if i % 3 == 0:
        s = motif_seq + s[10:]
    records.append((f"protein{i}", s))
fasta = os.path.join(tempfile.mkdtemp(), "db.fasta")
hio.write_fasta(fasta, [n for n, _ in records], [s for _, s in records])

db = hio.read_fasta(fasta)
kmers = np.concatenate([
    alphabet.kmer_view(db.protein(i).astype(np.int64), 10)
    for i in range(db.num_proteins)]).astype(np.int32)
print(f"{db.num_proteins} proteins -> {len(kmers)} 10-mers")

center = alphabet.encode(motif_seq).astype(np.int32)[None, :]
radius = 25.0

# --- 2. exact oracle ------------------------------------------------------
gci, gki, gd = exact.search_radius(kmers, center, radius)
print(f"exact: {len(gki)} hits within R={radius}")

# --- 3. multiprobe LSH ----------------------------------------------------
cfg = motif.MotifSearchConfig(hash_k=8, hash_l=8, w=50.0, radius=radius,
                              probes=8)
index = motif.build_index(kmers, jax.random.PRNGKey(0), cfg)
ci, ki, dd = motif.search(index, center, cfg)
rep = evaluate.recall_from_indices(gci, gki, gd, ci, ki, radius)
print(f"LSH:   {len(ki)} hits, weighted recall {rep.recall:.3f}")

# --- 4. block-pruned IVF (exact when k_blocks covers survivors) ----------
ivf_index = ivf.build_index(kmers, jax.random.PRNGKey(0), block_size=32)
ci2, ki2, dd2 = ivf.search(ivf_index, center, radius,
                           k_blocks=ivf_index.num_blocks)
assert set(zip(ci2, ki2)) == set(zip(gci, gki))
print(f"IVF:   {len(ki2)} hits == exact hit set")

# --- 5. motif clustering + MEME output -----------------------------------
res = greedy.cluster_greedy(kmers, jax.random.PRNGKey(1),
                            greedy.ClusterConfig(hash_k=8, hash_l=8,
                                                 radius=radius))
clusters = [[alphabet.decode(kmers[int(i)]) for i in grp]
            for grp in res.clusters() if len(grp) >= 5]
print(f"clustering: {len(clusters)} clusters with >= 5 members")
meme_path = fasta + ".meme.txt"
postprocess.write_meme(meme_path,
                       [(f"motif{i}", c) for i, c in enumerate(clusters)])
print(f"MEME motifs -> {meme_path}")

# --- 6. whole-protein clustering with alignments --------------------------
pres = pcluster.cluster_proteins(db, jax.random.PRNGKey(2), tables=4)
n_groups = len({int(x) for x in pres.labels})
print(f"pcluster: {n_groups} protein clusters, "
      f"{len(pres.hits)} alignments")
