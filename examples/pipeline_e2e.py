"""End-to-end IGC-shaped pipeline, CLI-driven, with per-stage timing.

BASELINE config 5: DNA corpus -> 6-frame ORF translation -> unique
k-mers -> embedded search database -> IVF motif search -> greedy
clustering -> MEME/centers post-processing.  Every stage is one
``python -m hsearch_tpu`` subcommand (the reference's pipeline is
likewise file-coupled CLI binaries); this driver only synthesizes the
corpus, converts gen-kmers TSV to k-mer FASTA, samples centers, and
times the stages.

    python examples/pipeline_e2e.py [n_genes] [outdir] [--tpu]

``--tpu`` runs the search and clustering stages on the ambient (TPU)
platform and widens the clustering subset to 2^23; host-shaped stages
(orf, gen-kmers, postprocess) always run on CPU.  Writes a JSON timing
summary to <outdir>/pipeline_times.json; measured numbers are recorded
in docs/PIPELINE.md.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

KMER_LEN = 10
RADIUS = 25.0
N_CENTERS = 256


def synth_dna(path, n_genes, rng, gene_len=900, n_motifs=64):
    """Protein-coding-ish DNA with shared motif-encoding segments, so the
    translated corpus has real k-mer families (the IGC shape)."""
    bases = np.array(list("ACGT"))
    codons = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"
              if a + b + c not in ("TAA", "TAG", "TGA")]
    motif_dna = [list(rng.choice(codons, KMER_LEN + 2))
                 for _ in range(n_motifs)]
    with open(path, "w") as f:
        for g in range(n_genes):
            seq = "ATG" + "".join(rng.choice(codons, gene_len // 3))
            # a MUTATED family member per gene (exact copies would dedup
            # away in gen-kmers; variants survive and cluster)
            mvar = list(motif_dna[rng.integers(0, n_motifs)])
            mvar[rng.integers(0, len(mvar))] = str(
                rng.choice(codons))
            m = "".join(mvar)
            pos = 3 * rng.integers(1, (len(seq) - len(m)) // 3 - 1)
            seq = seq[:pos] + m + seq[pos + len(m):]
            f.write(f">gene{g}\n")
            for s in range(0, len(seq), 70):
                f.write(seq[s:s + 70] + "\n")


def run(stage, cmd, times, env=None):
    print(f"[stage {stage}] {' '.join(cmd)}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, env=e)
    dt = time.perf_counter() - t0
    times[stage] = round(dt, 2)
    if r.returncode:
        raise SystemExit(f"stage {stage} failed rc={r.returncode}")
    print(f"[stage {stage}] {dt:.1f}s", file=sys.stderr, flush=True)


def main():
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    unknown = [f for f in flags if f != "--tpu"]
    if unknown:
        raise SystemExit(f"unknown flag(s) {unknown}; only --tpu is "
                         "supported (see module docstring)")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_tpu = "--tpu" in flags
    n_genes = int(args[0]) if args else 20000
    outdir = args[1] if len(args) > 1 else "/tmp/hsearch_pipeline"
    cpu = {"HSEARCH_PLATFORM": "cpu"}
    dev = {} if use_tpu else cpu
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(0)
    times = {}
    py = [sys.executable, "-m", "hsearch_tpu"]

    dna = os.path.join(outdir, "dna.fasta")
    t0 = time.perf_counter()
    synth_dna(dna, n_genes, rng)
    times["synth_dna"] = round(time.perf_counter() - t0, 2)

    # 1. 6-frame ORF translation (orf.cc:39-74 semantics)
    run("orf", py + ["orf", "-q", dna], times, env=cpu)
    aa = dna + "_translatedAA.fasta"     # <query>_translatedAA.fasta

    # 2. unique k-mers via the streaming suffix path (gen-kmers)
    ktsv = os.path.join(outdir, "kmers.tsv")
    run("gen_kmers", py + ["gen-kmers", "-d", aa, "-o", ktsv,
                           "-l", str(KMER_LEN), "--stream-aa",
                           str(1 << 22)], times, env=cpu)

    # 3. TSV -> k-mer FASTA database + sampled centers (host glue)
    t0 = time.perf_counter()
    kfa = os.path.join(outdir, "kmers.fasta")
    cfa = os.path.join(outdir, "centers.fasta")
    kms = []
    with open(ktsv) as f, open(kfa, "w") as out:
        for i, line in enumerate(f):
            km = line.split("\t")[0]
            out.write(f">k{i}\n{km}\n")
            kms.append(km)
    sel = np.random.default_rng(1).choice(len(kms),
                                          min(N_CENTERS, len(kms)),
                                          replace=False)
    with open(cfa, "w") as out:
        for j, i in enumerate(sel):
            out.write(f">c{j}\n{kms[int(i)]}\n")
    times["to_fasta"] = round(time.perf_counter() - t0, 2)
    n_kmers = len(kms)
    del kms

    # 4. IVF motif search (the headline engine) over the full database
    hits = os.path.join(outdir, "hits.txt")
    run("ivf_search", py + ["motif-search", "--engine", "ivf", "-d", kfa,
                            "-c", cfa, "-l", str(KMER_LEN), "-T",
                            str(RADIUS), "-o", hits], times, env=dev)

    # 5. greedy clustering (hclust2) over a bounded subset
    nsub = min(n_kmers, 1 << (23 if use_tpu else 20))
    sfa = os.path.join(outdir, "kmers_sub.fasta")
    with open(kfa) as f, open(sfa, "w") as out:
        for i, line in enumerate(f):
            if i >= 2 * nsub:
                break
            out.write(line)
    clus = os.path.join(outdir, "clusters.txt")
    run("hclust2", py + ["hclust2", "-d", sfa, "-o", clus, "-l",
                         str(KMER_LEN), "-T", str(RADIUS), "-k", "16",
                         "-L", "8"], times, env=dev)

    # 6. post-processing: centers + MEME motif format.  The reference's
    # default floor is 50 members (centerDistanceSmapling.cpp:12), but
    # gen-kmers dedups exact family copies, so post-dedup cluster sizes
    # depend on corpus mutation density — fall down a ladder instead of
    # failing the whole run.
    post = os.path.join(outdir, "post")
    for min_size in ("50", "10", "2"):
        try:
            run(f"postprocess(min={min_size})",
                py + ["postprocess", "-c", clus, "-o", post,
                      "--min-size", min_size], times, env=cpu)
            break
        except SystemExit:
            print(f"[postprocess] no clusters >= {min_size}, lowering",
                  file=sys.stderr, flush=True)

    summary = dict(n_genes=n_genes, n_kmers=n_kmers,
                   n_clustered=nsub, times_s=times,
                   total_s=round(sum(times.values()), 2))
    with open(os.path.join(outdir, "pipeline_times.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
