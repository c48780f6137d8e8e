"""Gapped-refinement A/B: cluster_proteins with gapped=True vs False.

    python examples/bench_gapped.py [n_proteins] [--tables=1]
        [--bits=12] [--sigma=0.1]

VERDICT r3 next #5: the reference ships AlignGapped dead
(hash_search.cpp:718-948); our working version (align/pipeline.py
refine_gapped) was tested but never measured at scale.  This driver
runs the full pcluster pipeline twice on the SAME corpus (bench_align's
family corpus: n//4 families x 4 members, 120 aa, 4 substitutions) and
reports:

  * wall/proteins-per-s for both runs (the gapped overhead),
  * how many (query, subject) pairs the gapped pass actually improved
    (score strictly above the ungapped one),
  * e-value / identity / alignment-length deltas over improved pairs,
  * family-pair recall for both runs (does refinement change clustering?).

One JSON line to stdout for BENCH_NOTES.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_pcluster_mp import make_corpus, _DB, family_recall  # noqa: E402


def add_indels(seqs: np.ndarray, n_fam: int, p: float = 0.5,
               seed: int = 11) -> np.ndarray:
    """Shift a suffix of ~half the family members by 1-3 positions
    (fixed-length frameshift = an indel vs the family base), so the
    gapped pass has real gaps to recover.  The substitution-only corpus
    never rewards a gap (measured: 8 of 7936 pairs improved, none with
    gap_open > 0)."""
    rng = np.random.default_rng(seed)
    out = seqs.copy()
    n, plen = seqs.shape
    n_mem = n_fam * 4
    for i in range(n_mem):
        if rng.random() >= p:
            continue
        pos = int(rng.integers(15, plen - 15))
        g = int(rng.integers(1, 4))
        if rng.random() < 0.5:      # deletion: suffix slides left
            out[i, pos:plen - g] = seqs[i, pos + g:]
            out[i, plen - g:] = rng.integers(0, 20, g)
        else:                       # insertion: suffix slides right
            out[i, pos + g:] = seqs[i, pos:plen - g]
            out[i, pos:pos + g] = rng.integers(0, 20, g)
    return out


def best_by_pair(hits):
    out = {}
    for h in hits:
        k = (int(h.query), int(h.subject))
        if k not in out or h.score > out[k].score:
            out[k] = h
    return out


def main():
    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("HSEARCH_PLATFORM", "cpu"))
    from hsearch_tpu import native_ext
    from hsearch_tpu.cluster import pcluster

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(float(args[0])) if args else 100000
    tables, bits, sigma = 1, 12, 0.1
    indels = "--indels" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = int(a.split("=")[1])
        if a.startswith("--bits="):
            bits = int(a.split("=")[1])
        if a.startswith("--sigma="):
            sigma = float(a.split("=")[1])
    native_ext.set_threads(int(os.environ.get(
        "HSEARCH_THREADS", native_ext.default_process_threads(1))))

    seqs, n_fam = make_corpus(n)
    if indels:
        seqs = add_indels(seqs, n_fam)
    db = _DB(seqs)
    rows = {}
    res = {}
    for gapped in (False, True):
        t0 = time.perf_counter()
        r = pcluster.cluster_proteins(
            db, jax.random.PRNGKey(0), tables=tables, bits=bits,
            sigma=sigma, gapped=gapped)
        wall = time.perf_counter() - t0
        res[gapped] = r
        rows[gapped] = {
            "wall_s": round(wall, 2),
            "proteins_per_s": round(n / wall, 1),
            "hits": len(r.hits),
            "clusters": len(set(r.labels.tolist())),
            "family_pair_recall": round(
                family_recall(r.labels, n_fam), 4)}

    base = best_by_pair(res[False].hits)
    ref = best_by_pair(res[True].hits)
    improved = [(base[k], ref[k]) for k in base
                if k in ref and ref[k].score > base[k].score]
    d_ident = [r.identity - b.identity for b, r in improved]
    d_len = [r.aln_len - b.aln_len for b, r in improved]
    d_score = [r.score - b.score for b, r in improved]
    d_bits = [r.bits - b.bits for b, r in improved]
    # e-values underflow to 0.0 on this corpus (scores are huge); the
    # log10 ratio is only meaningful where both sides are nonzero
    d_log10e = [np.log10(r.evalue) - np.log10(b.evalue)
                for b, r in improved if r.evalue > 0 and b.evalue > 0]
    n_under = sum(1 for b, r in improved
                  if r.evalue == 0 or b.evalue == 0)
    gap_hits = [r for _, r in improved if r.gap_open > 0]
    print(json.dumps({
        "bench": "gapped_ab", "proteins": n, "tables": tables,
        "bits": bits, "sigma": sigma, "indels": indels,
        "ungapped": rows[False], "gapped": rows[True],
        "wall_overhead_pct": round(
            100.0 * (rows[True]["wall_s"] / rows[False]["wall_s"] - 1),
            1),
        "pairs": len(base),
        "pairs_improved": len(improved),
        "pairs_with_gaps": len(gap_hits),
        "mean_identity_delta": round(float(np.mean(d_ident)), 2)
        if improved else 0.0,
        "mean_aln_len_delta": round(float(np.mean(d_len)), 2)
        if improved else 0.0,
        "mean_score_delta": round(float(np.mean(d_score)), 1)
        if improved else 0.0,
        "mean_bits_delta": round(float(np.mean(d_bits)), 1)
        if improved else 0.0,
        "mean_log10_evalue_delta": round(float(np.mean(d_log10e)), 2)
        if d_log10e else None,
        "pairs_evalue_underflow": n_under,
        "recall_delta": round(
            rows[True]["family_pair_recall"]
            - rows[False]["family_pair_recall"], 4)}), flush=True)


if __name__ == "__main__":
    main()
