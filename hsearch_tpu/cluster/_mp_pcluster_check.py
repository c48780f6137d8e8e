"""Self-check of DISTRIBUTED protein clustering on a local cluster.

Run as a module it is one PROCESS of a jax.distributed CPU cluster:

    python -m hsearch_tpu.cluster._mp_pcluster_check <pid> <nproc> <port>

Each process runs ``cluster_proteins_distributed`` (KLSH group
sharding + per-process group alignment + one edge allgather + union
find) over the SAME synthetic family corpus, then computes the
single-process ``cluster_proteins`` reference in-process and asserts:

  * cluster labels are bit-identical to single-process (and therefore
    identical across processes);
  * the pre-group lists match exactly;
  * the union of every process's local hits equals the single-process
    hit set — same (query, subject, score, extents) tuples and
    e-values (gathered via one extra allgather inside the check).

Exit code 0 = every assertion held on this process.  Spawned by
tests/test_pcluster_dist.py through parallel._mp_check.run_local_cluster.
"""

from __future__ import annotations

import os
import sys

import numpy as np

N_PROTEINS = int(os.environ.get("PCLUSTER_CHECK_N", "240"))
N_FAMILIES = max(N_PROTEINS // 4, 1)
PROT_LEN = 100
TABLES = int(os.environ.get("PCLUSTER_CHECK_TABLES", "3"))
# sigma=0.1 produces a handful of giant pre-groups -> exercises the
# query-partition mode; the default exercises group mode
SIGMA = float(os.environ.get("PCLUSTER_CHECK_SIGMA", "0.2"))


class _DB:
    """Minimal ProteinDB-shaped corpus (names/seq/starts/protein)."""

    def __init__(self, prots):
        self.names = [f"p{i}" for i in range(len(prots))]
        self.seq = np.concatenate(prots).astype(np.int32)
        self.starts = np.concatenate(
            [[0], np.cumsum([len(p) for p in prots])]).astype(np.int64)
        self.num_proteins = len(prots)

    def protein(self, i):
        return self.seq[self.starts[i]:self.starts[i + 1]]


def _workload() -> _DB:
    rng = np.random.default_rng(20260819)
    prots = []
    for f in range(N_FAMILIES):
        base = rng.integers(0, 20, PROT_LEN, dtype=np.int32)
        for _ in range(N_PROTEINS // N_FAMILIES):
            p = base.copy()
            sub = rng.integers(0, PROT_LEN, 3)
            p[sub] = rng.integers(0, 20, 3)
            prots.append(p)
    return _DB(prots[:N_PROTEINS])


def _hit_rows(hits) -> np.ndarray:
    """Hits as sortable int32 rows (evalue as f32 bits for exactness)."""
    if not hits:
        return np.zeros((0, 8), np.int32)
    return np.array(
        [[h.query, h.subject, h.score, h.q_beg, h.q_end, h.d_beg, h.d_end,
          np.float32(h.evalue).view(np.int32)] for h in hits], np.int32)


def child_main(pid: int, nproc: int, port: int) -> None:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from hsearch_tpu.cluster import pcluster, pcluster_dist

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    db = _workload()
    key = jax.random.PRNGKey(11)

    dist = pcluster_dist.cluster_proteins_distributed(
        db, key, tables=TABLES, sigma=SIGMA)
    # single-process reference, computed in-process on the same corpus
    ref = pcluster.cluster_proteins(db, key, tables=TABLES, sigma=SIGMA)

    np.testing.assert_array_equal(dist.labels, ref.labels)
    assert len(dist.pre_groups) == len(ref.pre_groups), \
        (len(dist.pre_groups), len(ref.pre_groups))
    for a, b in zip(dist.pre_groups, ref.pre_groups):
        np.testing.assert_array_equal(a, b)

    # union of every process's local hits == single-process hit set
    mine = _hit_rows(dist.hits)
    merged = pcluster_dist._allgather_rows(mine, 8)
    want = _hit_rows(ref.hits)

    def canon(rows):
        return rows[np.lexsort(rows.T[::-1])] if len(rows) else rows

    np.testing.assert_array_equal(canon(merged), canon(want))
    # real distribution: with >1 process and >1 group someone else
    # must own work too
    if nproc > 1 and len(ref.pre_groups) > 1:
        assert len(mine) < len(want), "one process did all the work"
    print(f"MP_CHECK_OK p{pid}/{nproc} labels={len(set(dist.labels.tolist()))}"
          f" hits_local={len(mine)}/{len(want)}", flush=True)


if __name__ == "__main__":
    child_main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
