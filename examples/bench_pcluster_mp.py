"""Distributed protein-clustering throughput: cluster_proteins_distributed
over an N-process jax.distributed CPU cluster on one box.

    python examples/bench_pcluster_mp.py [n_proteins] [--nproc=2]
        [--tables=4] [--single]

Each process generates the SAME family corpus (deterministic, vectorized
— 4-member families of 120 aa with 4 substitutions, the bench_align
workload), joins the cluster, and runs the distributed pipeline: KLSH
codes everywhere, groups bin-packed across processes, per-process
group alignment, one (query, subject, union_flag) edge allgather per
table, union-find everywhere.  Process 0 reports wall time, proteins/s,
cluster count, and planted family-pair recall.  ``--single`` runs the
single-process pipeline on the same corpus for a direct A/B.
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_corpus(n: int):
    """Vectorized twin of bench_align's corpus (families differ in rng
    detail; same structure: n//4 families x 4 members, 120 aa, 4 subs)."""
    rng = np.random.default_rng(7)
    n_fam = max(1, n // 4)
    plen = 120
    bases = rng.integers(0, 20, (n_fam, plen), dtype=np.int32)
    fam_of = np.arange(n) % n_fam
    seqs = bases[fam_of].copy()
    sub_pos = rng.integers(0, plen, (n, 4))
    sub_aa = rng.integers(0, 20, (n, 4), dtype=np.int32)
    seqs[np.arange(n)[:, None], sub_pos] = sub_aa
    tail = n - n_fam * 4
    if tail > 0:
        seqs[n_fam * 4:] = rng.integers(0, 20, (tail, plen), dtype=np.int32)
    return seqs, n_fam


class _DB:
    def __init__(self, seqs):
        n, plen = seqs.shape
        self.names = [f"p{i}" for i in range(n)]
        # view, not astype copy: at 9.9M proteins the copy is 4.7 GB
        self.seq = np.ascontiguousarray(seqs, np.int32).reshape(-1)
        self.starts = (np.arange(n + 1, dtype=np.int64) * plen)
        self.num_proteins = n

    def protein(self, i):
        return self.seq[self.starts[i]:self.starts[i + 1]]


def family_recall(labels: np.ndarray, n_fam: int) -> float:
    members = np.arange(n_fam * 4).reshape(4, n_fam).T
    lab = labels[members]
    pairs = recovered = 0
    for a in range(4):
        for b in range(a + 1, 4):
            pairs += n_fam
            recovered += int((lab[:, a] == lab[:, b]).sum())
    return recovered / max(pairs, 1)


def child_main(pid, nproc, port, n, tables):
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from hsearch_tpu import native_ext
    from hsearch_tpu.cluster import pcluster, pcluster_dist
    # pin the native OpenMP pool to an even core split: unpinned pools
    # from N processes fight and the numbers swing 3-5x run-to-run
    native_ext.set_threads(int(os.environ.get(
        "HSEARCH_THREADS", native_ext.default_process_threads(nproc))))
    bits = int(os.environ.get("HSEARCH_KLSH_BITS",
                              pcluster.DEFAULT_BITS))
    sigma = float(os.environ.get("HSEARCH_KLSH_SIGMA",
                                 pcluster.DEFAULT_SIGMA))
    stream = bool(int(os.environ.get("HSEARCH_STREAM", "0")))
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
    seqs, n_fam = make_corpus(n)
    db = _DB(seqs)
    del seqs
    t0 = time.perf_counter()
    n_stream_hits = 0

    # corpus-scale operating point (HSEARCH_STREAM=1): hits stream
    # through a counting sink (union edges taken as they pass), strings
    # unrendered — the per-child working set stays O(slice + index)
    def _count(chunk_hits):
        nonlocal n_stream_hits
        n_stream_hits += len(chunk_hits)

    sink_kw = {"hit_sink": _count, "render": False} if stream else {}
    if nproc > 1:
        res = pcluster_dist.cluster_proteins_distributed(
            db, jax.random.PRNGKey(0), tables=tables, bits=bits,
            sigma=sigma, **sink_kw)
    else:
        res = pcluster.cluster_proteins(db, jax.random.PRNGKey(0),
                                        tables=tables, bits=bits,
                                        sigma=sigma, **sink_kw)
    wall = time.perf_counter() - t0
    try:
        import resource
        peak_gb = round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    except Exception:
        peak_gb = None
    out = {"bench": "cluster_proteins_mp", "proteins": n,
           "nproc": nproc, "pid": pid, "tables": tables,
           "bits": bits, "sigma": sigma, "stream": stream,
           "peak_rss_gb": peak_gb,
           "local_hits": n_stream_hits if stream else len(res.hits),
           "total_s": round(wall, 2),
           "proteins_per_s": round(n / wall, 1)}
    if pid == 0:
        out["clusters"] = len(set(res.labels.tolist()))
        out["family_pair_recall"] = round(
            family_recall(res.labels, n_fam), 4)
    print("CHILD " + json.dumps(out), flush=True)


def main():
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child_main(*map(int, sys.argv[i + 1:i + 6]))
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(float(args[0])) if args else 10000
    nproc, tables, logdir = 2, 4, None
    for a in sys.argv[1:]:
        if a.startswith("--nproc="):
            nproc = int(a.split("=")[1])
        if a.startswith("--tables="):
            tables = int(a.split("=")[1])
        if a.startswith("--logdir="):
            # stream each child's output to a file (multi-hour runs are
            # otherwise silent until the end; pair with
            # HSEARCH_PROGRESS=1 for heartbeats)
            logdir = a.split("=")[1]
            os.makedirs(logdir, exist_ok=True)
    if "--single" in sys.argv:
        nproc = 1
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    logs = [open(os.path.join(logdir, f"child{p}.log"), "w")
            if logdir else None for p in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(p), str(nproc), str(port), str(n), str(tables)],
        env=env, stdout=logs[p] or subprocess.PIPE,
        stderr=logs[p] or subprocess.STDOUT,
        text=True) for p in range(nproc)]
    if logdir:
        outs = []
        for p, f in zip(procs, logs):
            p.wait()
            f.close()
        for p_ in range(nproc):
            with open(os.path.join(logdir, f"child{p_}.log")) as f:
                outs.append(f.read())
    else:
        outs = [p.communicate()[0] for p in procs]
    wall = time.perf_counter() - t0
    bad = [i for i, p in enumerate(procs) if p.returncode != 0]
    if bad:
        print("\n---\n".join(outs))
        raise SystemExit(f"children failed: {bad}")
    rows = []
    for o in outs:
        for line in o.splitlines():
            if line.startswith("CHILD "):
                rows.append(json.loads(line[6:]))
            else:
                print(line, file=sys.stderr)
    head = next(r for r in rows if r["pid"] == 0)
    print(json.dumps({
        "bench": "cluster_proteins_mp", "proteins": n, "nproc": nproc,
        "tables": tables, "wall_s": round(wall, 2),
        "proteins_per_s": round(n / wall, 1),
        "slowest_child_s": max(r["total_s"] for r in rows),
        "total_hits": sum(r["local_hits"] for r in rows),
        "clusters": head.get("clusters"),
        "family_pair_recall": head.get("family_pair_recall")}),
        flush=True)


if __name__ == "__main__":
    main()
