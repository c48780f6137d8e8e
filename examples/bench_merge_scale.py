"""Center-distance merge at scale: quality/cost frontier past 2^20.

    python examples/bench_merge_scale.py [log2_n] [--kbs=64,128]
        [--hash-l=8]

VERDICT r4 weak #4: `merge_by_center_distance` (hclust v1's centroid
merge composed onto hclust2's greedy labels, cluster/postprocess.py)
was measured at exactly one point — 2^20, kb=128, recall
0.0412 -> 0.9671 at +280 s with 2.05x over-fragmentation.  This driver
measures, at a chosen scale on the bench family corpus:

  * greedy baseline (k-mers/s, clusters, family-pair recall),
  * the merge pass per k_blocks cap (merge seconds, resulting
    clusters, recall, clusters/true-families ratio) — union-find needs
    only one surviving edge per cluster pair, so lower caps may buy
    most of the recall at a fraction of the search bill.

One JSON line per row for BENCH_NOTES.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get("HSEARCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HSEARCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/hsearch_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from bench import protein_like_db
    from hsearch_tpu.cluster import greedy, postprocess

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    log2n = int(args[0]) if args else 20
    kbs = [64, 128]
    hash_l = 8
    for a in sys.argv[1:]:
        if a.startswith("--kbs="):
            kbs = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--hash-l="):
            hash_l = int(a.split("=")[1])
    n, l, radius = 1 << log2n, 25, 35.0
    rng = np.random.default_rng(0)
    db, _, fam_of = protein_like_db(rng, n, l, return_families=True)
    n_fam = int(fam_of.max()) + 1

    def pair_recall(labels):
        # sampled same-family pairs: adjacent rows of each family
        order = np.argsort(fam_of, kind="stable")
        f = fam_of[order]
        a = np.arange(n - 1)
        b = a + 1
        m = f[a] == f[b]
        ra, rb = order[a[m]], order[b[m]]
        return float((labels[ra] == labels[rb]).mean())

    t0 = time.perf_counter()
    cfg = greedy.ClusterConfig(hash_k=16, hash_l=hash_l, w=50.0,
                               radius=radius)
    res = greedy.cluster_greedy(db, jax.random.PRNGKey(1), cfg)
    g_s = time.perf_counter() - t0
    lab = np.where(res.parent >= 0, res.parent, np.arange(n))
    print(json.dumps({
        "bench": "merge_scale", "engine": f"greedy_L{hash_l}", "n": n,
        "true_families": n_fam, "greedy_s": round(g_s, 1),
        "kmers_per_s": round(n / g_s, 1),
        "clusters": int(len(np.unique(lab))),
        "family_pair_recall": round(pair_recall(lab), 4)}), flush=True)

    for kb in kbs:
        t0 = time.perf_counter()
        mlab = postprocess.merge_by_center_distance(
            db, lab, radius, jax.random.PRNGKey(3), k_blocks=kb)
        m_s = time.perf_counter() - t0
        n_clusters = int(len(np.unique(mlab)))
        print(json.dumps({
            "bench": "merge_scale", "engine": f"greedy_L{hash_l}+merge",
            "n": n, "kb": kb, "merge_s": round(m_s, 1),
            "effective_kmers_per_s": round(n / (g_s + m_s), 1),
            "clusters": n_clusters,
            "over_fragmentation": round(n_clusters / n_fam, 3),
            "family_pair_recall": round(pair_recall(mlab), 4)}),
            flush=True)


if __name__ == "__main__":
    main()
