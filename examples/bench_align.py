"""Aligner throughput: ProteinSearcher.search_all on a family corpus.

    python examples/bench_align.py [n_proteins] [--cluster-only]

Measures proteins/s for the batched all-vs-all group search (the
pcluster inner loop) and for the full cluster_proteins pipeline.
``--cluster-only`` skips search_all: all-vs-all over one undivided
group is quadratic in N on a family corpus (every query extends into
every family's seed buckets), which is exactly the blowup the KLSH
pre-grouping exists to avoid — at N >= 1e5 measure cluster_proteins.
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
    if jax.default_backend() != "cpu":
        # persistent compile cache: remote-TPU compiles dominate cold runs
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hsearch_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hsearch_tpu.align import pipeline as apipe
    from hsearch_tpu.cluster import pcluster
    from hsearch_tpu.core import io as hio
    from hsearch_tpu.utils import profiling

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cluster_only = "--cluster-only" in sys.argv
    n = int(args[0]) if args else 1000
    rng = np.random.default_rng(0)
    n_fam = max(1, n // 4)
    seqs, names = [], []
    for i in range(n):
        if i < n_fam * 4:
            fam = i % n_fam
            base_rng = np.random.default_rng(1000 + fam)
            s = base_rng.integers(0, 20, 120).astype(np.int32)
            pos = rng.choice(120, 4, replace=False)
            s[pos] = rng.integers(0, 20, 4)
        else:
            s = rng.integers(0, 20, 120).astype(np.int32)
        seqs.append(s)
        names.append(f"p{i}")
    starts = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
    db = hio.ProteinDB(names=names, seq=np.concatenate(seqs),
                       starts=starts)

    if not cluster_only:
        _bench_search_all(apipe, db, n)

    tables = 4
    pair_batch = 8192
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = int(a.split("=")[1])
        if a.startswith("--pair-batch="):
            pair_batch = int(a.split("=")[1])
    params = apipe.SearchParams(pair_batch=pair_batch)
    t0 = time.perf_counter()
    res = pcluster.cluster_proteins(db, jax.random.PRNGKey(0), params,
                                    tables=tables)
    t_pc = time.perf_counter() - t0
    # planted-family recall: fraction of within-family pairs that land
    # in one cluster (families are proteins i with the same i % n_fam)
    members = np.arange(n_fam * 4).reshape(4, n_fam).T   # (n_fam, 4)
    lab = res.labels[members]                            # (n_fam, 4)
    pairs = recovered = 0
    for a_col in range(4):
        for b_col in range(a_col + 1, 4):
            pairs += n_fam
            recovered += int((lab[:, a_col] == lab[:, b_col]).sum())
    print(json.dumps({
        "bench": "cluster_proteins", "proteins": n, "tables": tables,
        "backend": jax.default_backend(),
        "clusters": len(set(res.labels.tolist())),
        "hits": len(res.hits), "total_s": round(t_pc, 2),
        "proteins_per_s": round(n / t_pc, 1),
        "family_pair_recall": round(recovered / max(pairs, 1), 4)},
    ), flush=True)
    if "--stages" in sys.argv:
        profiling.print_report()


def _bench_search_all(apipe, db, n):
    t0 = time.perf_counter()
    searcher = apipe.ProteinSearcher(db)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    hits = searcher.search_all()
    t_search = time.perf_counter() - t0
    print(json.dumps({
        "bench": "search_all", "proteins": n, "hits": len(hits),
        "build_s": round(t_build, 2), "search_s": round(t_search, 2),
        "proteins_per_s": round(n / t_search, 1)}), flush=True)


if __name__ == "__main__":
    main()
