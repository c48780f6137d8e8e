"""Secondary benchmark: every engine on the bench workload, one process.

Measures, on the same family-structured corpus as bench.py:
  * LSH motif search q/s (the reference's namesake algorithm) + its
    weighted recall vs the exact oracle,
  * IVF q/s (the headline engine, for the side-by-side),
  * hclust2 greedy clustering k-mers/s,
  * hclust (centroid, device-scanned) k-mers/s.

Run:  python examples/bench_engines.py [log2_n]
(HSEARCH_PLATFORM=cpu for a smoke run; real numbers need the TPU.)
Writes one JSON line per row so BENCH_NOTES can quote them.
"""

import json
import sys
import time

import numpy as np


def main():
    import os
    import jax

    if os.environ.get("HSEARCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HSEARCH_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hsearch_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import protein_like_db
    from hsearch_tpu.search import evaluate, exact, ivf, motif
    from hsearch_tpu.cluster import centroid, greedy

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        return
    log2n = int(args[0]) if args else 18
    n, c, l, radius = 1 << log2n, 256, 25, 35.0
    rng = np.random.default_rng(0)
    db, centers, fam = protein_like_db(rng, n, l, query_n=c,
                                       return_families=True)
    c = centers.shape[0]
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"# workload n=2^{log2n} c={c} l={l} R={radius}")

    # oracle for recall (shared by both engines)
    gci, gki, gd = exact.search_radius(db, centers, radius,
                                       center_block=256, max_hits=2048)

    # ---- LSH rows: the reference's fixed point (K=L=4, W=50,
    # motif_both_points.cpp:375-382) AND the point the tuning harness
    # picks for this workload geometry (lsh/tuning.py sweep at 2^16:
    # K=8 L=8 W=105 P=8 -> recall 0.9995; the reference point
    # truncates against the cand_max skew ceiling on family data) ----
    iters = 3
    for tag, cfg in (
            ("lsh_ref", motif.MotifSearchConfig(
                hash_k=4, hash_l=4, w=50.0, radius=radius,
                center_block=256, max_hits=512)),
            ("lsh_tuned", motif.MotifSearchConfig(
                hash_k=8, hash_l=8, w=105.0, radius=radius, probes=8,
                center_block=32, max_hits=512))):
        t0 = time.perf_counter()
        # the tuned point's verify bill is L*P*cand_max slots/query; at
        # the 8192 skew ceiling that gather OOMs 16 GB HBM at cb=256,
        # so the tuned row runs cand_max=2048 / cb=32 (bounded memory,
        # more dispatches — the measured cost of LSH on skewed data)
        kw = dict(cand_max=2048) if tag == "lsh_tuned" else {}
        index = motif.build_index(db, jax.random.PRNGKey(0), cfg, **kw)
        jax.block_until_ready(index.tables.sorted_codes)
        log(f"# {tag} build {time.perf_counter()-t0:.1f}s cand_max="
            f"{index.cand_max}")
        motif.search(index, centers, cfg)          # warmup/compile
        t0 = time.perf_counter()
        for _ in range(iters):
            ci, ki, dd = motif.search(index, centers, cfg)
        lsh_qps = c / ((time.perf_counter() - t0) / iters)
        rep = evaluate.recall_from_indices(gci, gki, gd, ci, ki, radius)
        print(json.dumps({"engine": tag, "n": n, "qps": round(lsh_qps, 1),
                          "weighted_recall": round(rep.recall, 4),
                          "cand_max": index.cand_max}), flush=True)

    # ---- IVF side-by-side (the bench operating point: recall-measured
    # kb, lossless retry off — see BENCH_NOTES round-2 delta) ----
    t0 = time.perf_counter()
    iidx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    jax.block_until_ready(iidx.block_centroid)
    log(f"# ivf build {time.perf_counter()-t0:.1f}s")
    ivf.search(iidx, centers, radius, k_blocks=128, max_hits=512,
               center_block=512, retry_overflow=False, stats_out={})
    t0 = time.perf_counter()
    for _ in range(iters):
        ci2, ki2, _ = ivf.search(iidx, centers, radius, k_blocks=128,
                                 max_hits=512, center_block=512,
                                 retry_overflow=False, stats_out={})
    ivf_qps = c / ((time.perf_counter() - t0) / iters)
    rep2 = evaluate.recall_from_indices(gci, gki, gd, ci2, ki2, radius)
    print(json.dumps({"engine": "ivf", "n": n, "qps": round(ivf_qps, 1),
                      "weighted_recall": round(rep2.recall, 4)}),
          flush=True)

    # ---- clustering throughput + quality gate (VERDICT r2 next #6:
    # family-pair recall at bench scale, TPU L=8 point and, with
    # --ref-point, the reference's K=16 L=32 point hclust2.cpp:185) ----
    def pair_recall(labels, fam_sub, n_pairs=200_000):
        """Fraction of sampled same-family row pairs sharing a label."""
        prng = np.random.default_rng(1)
        order = np.argsort(fam_sub, kind="stable")
        f = fam_sub[order]
        starts = np.searchsorted(f, np.arange(f.max() + 2))
        sizes = np.diff(starts)
        ok_fam = np.nonzero(sizes >= 2)[0]
        fs = prng.choice(ok_fam, n_pairs)
        a = starts[fs] + (prng.random(n_pairs) * sizes[fs]).astype(int)
        b = starts[fs] + (prng.random(n_pairs) * sizes[fs]).astype(int)
        m = a != b
        ra, rb = order[a[m]], order[b[m]]
        return float((labels[ra] == labels[rb]).mean())

    nc = min(n, 1 << min(log2n, 23))
    fam_sub = fam[:nc]
    points = [("L8", 8)]
    if "--ref-point" in sys.argv:
        points.append(("L32", 32))
    do_merge = "--merge" in sys.argv
    for tag, hl in points:
        t0 = time.perf_counter()
        cfg2 = greedy.ClusterConfig(hash_k=16, hash_l=hl, w=50.0,
                                    radius=radius)
        res = greedy.cluster_greedy(db[:nc], jax.random.PRNGKey(1), cfg2)
        g_kps = nc / (time.perf_counter() - t0)
        n_heads = int((res.merged != 2).sum())
        lab = np.where(res.parent >= 0, res.parent, np.arange(nc))
        print(json.dumps({"engine": f"hclust2_greedy_{tag}", "n": nc,
                          "kmers_per_s": round(g_kps, 1),
                          "clusters": n_heads,
                          "family_pair_recall":
                              round(pair_recall(lab, fam_sub), 4)}),
              flush=True)
        if do_merge:
            # hclust v1's centroid-merge applied post-hoc: the
            # quality/throughput frontier of greedy + center merge
            from hsearch_tpu.cluster import postprocess
            t0 = time.perf_counter()
            mlab = postprocess.merge_by_center_distance(
                db[:nc], lab, radius, jax.random.PRNGKey(3))
            m_s = time.perf_counter() - t0
            print(json.dumps({
                "engine": f"hclust2_greedy_{tag}+merge", "n": nc,
                "merge_s": round(m_s, 1),
                "kmers_per_s": round(nc / (nc / g_kps + m_s), 1),
                "clusters": int(len(np.unique(mlab))),
                "family_pair_recall":
                    round(pair_recall(mlab, fam_sub), 4)}),
                flush=True)

        t0 = time.perf_counter()
        ccfg = centroid.CentroidConfig(hash_k=16, hash_l=hl, w=50.0,
                                       radius=radius)
        members = centroid.cluster_centroid(db[:nc], jax.random.PRNGKey(2),
                                            ccfg)
        c_kps = nc / (time.perf_counter() - t0)
        clab = np.empty(nc, np.int64)
        for ci_, grp in enumerate(members):
            clab[grp] = ci_
        print(json.dumps({"engine": f"hclust_centroid_{tag}", "n": nc,
                          "kmers_per_s": round(c_kps, 1),
                          "clusters": len(members),
                          "family_pair_recall":
                              round(pair_recall(clab, fam_sub), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
