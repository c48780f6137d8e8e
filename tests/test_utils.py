"""Aux subsystem tests: profiling, checkpointing, stats."""

import numpy as np
import jax

from hsearch_tpu.search import ivf, motif
from hsearch_tpu.align import seed_index
from hsearch_tpu.utils import checkpoint, profiling, stats


def test_phase_timing():
    profiling.reset()
    with profiling.phase("x"):
        sum(range(1000))
    with profiling.phase("x"):
        pass
    rep = profiling.report()
    assert rep["x"]["count"] == 2
    assert rep["x"]["total_s"] >= 0


def test_motif_index_roundtrip(tmp_path, rng):
    db = rng.integers(0, 20, (256, 10), dtype=np.int32)
    centers = rng.integers(0, 20, (8, 10), dtype=np.int32)
    cfg = motif.MotifSearchConfig(radius=25.0)
    idx = motif.build_index(db, jax.random.PRNGKey(0), cfg)
    p = str(tmp_path / "m.npz")
    checkpoint.save_index(p, idx)
    idx2 = checkpoint.load_index(p)
    a = motif.search(idx, centers, cfg)
    b = motif.search(idx2, centers, cfg)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_ivf_index_roundtrip(tmp_path, rng):
    db = rng.integers(0, 20, (512, 10), dtype=np.int32)
    centers = rng.integers(0, 20, (4, 10), dtype=np.int32)
    idx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    p = str(tmp_path / "i.npz")
    checkpoint.save_index(p, idx)
    idx2 = checkpoint.load_index(p)
    a = ivf.search(idx, centers, 30.0, k_blocks=idx.num_blocks)
    b = ivf.search(idx2, centers, 30.0, k_blocks=idx2.num_blocks)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_seed_index_roundtrip(tmp_path, rng):
    seq = rng.integers(0, 20, 300).astype(np.int32)
    starts = np.array([0, 150, 300])
    idx = seed_index.build_index(seq, starts)
    p = str(tmp_path / "s.npz")
    checkpoint.save_index(p, idx)
    idx2 = checkpoint.load_index(p)
    np.testing.assert_array_equal(np.asarray(idx.sorted_codes),
                                  np.asarray(idx2.sorted_codes))
    np.testing.assert_array_equal(np.asarray(idx.positions),
                                  np.asarray(idx2.positions))


def test_stats(rng):
    db = rng.integers(0, 20, (512, 10), dtype=np.int32)
    midx = motif.build_index(db, jax.random.PRNGKey(0),
                             motif.MotifSearchConfig())
    s = stats.index_stats(midx)
    assert s["kind"] == "motif" and s["num_tables"] == 4
    total = sum(c * n for c, n in s["tables"][0]["histogram"].items())
    assert total == 512
    iidx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    s2 = stats.index_stats(iidx)
    assert s2["kind"] == "ivf" and 0 <= s2["padding_fraction"] < 1


def test_seed_checkpoint_preserves_groups(tmp_path, rng):
    """A round-tripped group-partitioned SeedIndex keeps group bounds
    (dropping them silently widened probes to the whole DB)."""
    import numpy as np
    from hsearch_tpu.utils import checkpoint
    lens = rng.integers(12, 40, 12)
    seq = rng.integers(0, 20, int(lens.sum())).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    groups = np.repeat(np.arange(3), 4)
    idx = seed_index.build_index(seq, starts, protein_groups=groups)
    p = str(tmp_path / "seed.npz")
    checkpoint.save_index(p, idx)
    idx2 = checkpoint.load_index(p)
    assert idx2.group_starts is not None
    np.testing.assert_array_equal(np.asarray(idx.group_starts),
                                  np.asarray(idx2.group_starts))
    np.testing.assert_array_equal(np.asarray(idx.g10_at),
                                  np.asarray(idx2.g10_at))
