"""Compute-bound probe: stream a LARGE query batch through ivf.search.

    python examples/bench_stream.py [log2_n] [--c=4096] [--cb=1024]

VERDICT r2 weak #2: the headline 1024-query runs are floor-bound (the
~30 ms tunnel dispatch + transfer tail per block dominates the ~11 ms
of on-chip work), so single-chip utilization was never measured in a
compute-bound regime.  This driver streams C>=4096 queries (the floors
amortize across C/cb blocks whose transfers overlap compute), reports
q/s, per-query wall ms, and the effective exact-distance FLOP/s of the
prune + verify GEMMs:

    prune:  2 * D * B        flop/query   (D = 8L dims, B = blocks)
    verify: 2 * 20L * kb*bs  flop/query   (one-hot MXU contraction)
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
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsearch_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from hsearch_tpu.search import evaluate, exact, ivf

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    log2n = int(args[0]) if args else 20
    c, cb, kb = 4096, 1024, 128
    for a in sys.argv[1:]:
        if a.startswith("--c="):
            c = int(a.split("=")[1])
        if a.startswith("--cb="):
            cb = int(a.split("=")[1])
        if a.startswith("--kb="):
            kb = int(a.split("=")[1])
    n, l, radius = 1 << log2n, 25, 35.0
    rng = np.random.default_rng(0)
    db, centers = bench.protein_like_db(rng, n, l, query_n=c)
    c = centers.shape[0]
    index = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    jax.block_until_ready(index.block_centroid)
    print(f"# built n=2^{log2n} B={index.num_blocks} c={c} cb={cb} kb={kb}",
          file=sys.stderr, flush=True)

    ivf.search(index, centers[:cb], radius, k_blocks=kb, max_hits=512,
               center_block=cb, retry_overflow=False, stats_out={})  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ci, ki, dd = ivf.search(index, centers, radius, k_blocks=kb,
                                max_hits=512, center_block=cb,
                                retry_overflow=False, stats_out={})
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    qps = c / best
    # recall on a 256-query sample against the exact oracle
    sample = centers[:256]
    gci, gki, gd = exact.search_radius(db, sample, radius, max_hits=2048)
    m = ci < 256
    rep = evaluate.recall_from_indices(gci, gki, gd, ci[m], ki[m], radius)
    d = 8 * l
    flops_per_q = 2.0 * d * index.num_blocks + 2.0 * (20 * l) * kb * 32
    print(json.dumps({
        "bench": "stream", "n_log2": log2n, "c": c, "cb": cb, "kb": kb,
        "qps": round(qps, 1), "ms_per_query": round(1000 * best / c, 3),
        "gemm_gflops": round(qps * flops_per_q / 1e9, 1),
        "sample_recall": round(rep.recall, 4),
        "hits": int(len(ci))}), flush=True)


if __name__ == "__main__":
    main()
