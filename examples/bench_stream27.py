"""2^27-point out-of-HBM scale run: segmented index streamed through
one chip (VERDICT r3 next #2).

    python examples/bench_stream27.py [--log2n=27] [--budgets=0,2,4]
        [--queries=1024] [--oracle-segments=2]

134M all-positions-shaped k-mer points (~3.4 GB int8 — 4x the padded
HBM the round-3 resident engine could hold at 2^24) indexed as
2^24-point segments (search/stream.py), searched with the exact
min-cascade select at kb=128.  Reports, per resident-segment budget:

  * q/s for a --queries-center batch (streamed segments double-buffer
    their h2d under the previous segment's verify GEMMs),
  * the measured per-term costs (per-segment h2d bytes/seconds,
    per-segment search seconds) that make the IGC 2.47B-AA projection
    a computed number instead of a guess,
  * sample weighted recall vs the exact oracle on --oracle-segments
    segments (the oracle decomposes over segments exactly like the
    engine, so a subset gives an unbiased recall denominator for the
    sampled fraction of the database).

Workload: protein_like_db families (bench.py's shape) at L=25, R=35.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K = 25
RADIUS = 35.0
FAMILY = 64


def make_kmers(n: int, seed: int = 27) -> tuple[np.ndarray, np.ndarray]:
    """Family-structured rows (bench.py's protein_like_db, chunked so
    the temporaries stay bounded at 2^27)."""
    rng = np.random.default_rng(seed)
    nfam = max(1, n // FAMILY)
    fam = rng.integers(0, 20, (nfam, K), dtype=np.int8)
    out = np.empty((n, K), np.int8)
    step = 1 << 22
    for lo in range(0, n, step):
        m = min(step, n - lo)
        which = rng.integers(0, nfam, m)
        rows = fam[which]
        flips = rng.poisson(2.0, m).clip(0, K)
        ranks = np.argsort(rng.random((m, K)), axis=1)
        mask = ranks < flips[:, None]
        sub = rng.integers(0, 20, (m, K), dtype=np.int8)
        out[lo:lo + m] = np.where(mask, sub, rows)
    # dedicated query rng: the --load path regenerates queries without
    # replaying the corpus draws, so the choice must not depend on them
    qrng = np.random.default_rng(seed + 1)
    q = fam[qrng.choice(nfam, min(4096, nfam),
                        replace=False)].astype(np.int32)
    return out, q


def main():
    import jax
    if os.environ.get("HSEARCH_PLATFORM"):
        # in-process override (the site customization overrides
        # JAX_PLATFORMS); also keeps smoke tests off the single chip
        jax.config.update("jax_platforms", os.environ["HSEARCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsearch_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    log2n, budgets, n_q, orc_segs = 27, [0], 1024, 2
    kbs = [int(os.environ.get("HSEARCH_STREAM_KB", "128"))]
    save_path = load_path = None
    for a in sys.argv[1:]:
        if a.startswith("--log2n="):
            log2n = int(a.split("=")[1])
        if a.startswith("--budgets="):
            budgets = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--queries="):
            n_q = int(a.split("=")[1])
        if a.startswith("--oracle-segments="):
            orc_segs = int(a.split("=")[1])
        if a.startswith("--kbs="):
            kbs = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--save="):
            save_path = a.split("=", 1)[1]
        if a.startswith("--load="):
            load_path = a.split("=", 1)[1]
    n = 1 << log2n
    seg_pts = min(1 << 24, n)

    from hsearch_tpu.search import evaluate, exact, stream
    from hsearch_tpu.utils import checkpoint

    if load_path and os.path.exists(load_path):
        # build-once/search-many: the host byte set reloads in seconds
        # (the 2^27 build itself was 2,336 s in round 4)
        t0 = time.perf_counter()
        sidx = checkpoint.load_index(load_path)
        build_s = time.perf_counter() - t0
        assert sidx.n_points == n, (sidx.n_points, n)
        # queries derive from the family matrix alone — no corpus gen
        rng = np.random.default_rng(27)
        nfam = max(1, n // FAMILY)
        fam = rng.integers(0, 20, (nfam, K), dtype=np.int8)
        qrng = np.random.default_rng(28)
        queries = fam[qrng.choice(nfam, min(4096, nfam),
                                  replace=False)].astype(np.int32)[:n_q]
        print(f"# segmented index reloaded from {load_path} "
              f"({build_s:.0f}s)", file=sys.stderr, flush=True)
    else:
        t0 = time.perf_counter()
        km, queries = make_kmers(n)
        queries = queries[:n_q]
        print(f"# workload {km.shape} gen="
              f"{time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        sidx = stream.build_segmented(
            km, jax.random.PRNGKey(0), segment_points=seg_pts,
            progress=lambda i, off: print(
                f"# built segment {i} ({off} pts, "
                f"{time.perf_counter() - t0:.0f}s)", file=sys.stderr,
                flush=True))
        build_s = time.perf_counter() - t0
        if save_path:
            t1 = time.perf_counter()
            checkpoint.save_index(save_path, sidx)
            print(f"# checkpoint -> {save_path} "
                  f"({time.perf_counter() - t1:.0f}s)",
                  file=sys.stderr, flush=True)
    seg_bytes = [s.nbytes for s in sidx.segments]
    print(f"# segmented build/load {build_s:.0f}s segments="
          f"{sidx.num_segments} bytes/seg~{seg_bytes[0] / 1e6:.0f}MB",
          file=sys.stderr, flush=True)

    # oracle on a segment subset: global truth restricted to those
    # segments' points == union of per-segment oracles
    orc_segs = min(orc_segs, sidx.num_segments)
    oc = min(64, n_q)
    gci, gki, gd = [], [], []
    for seg in sidx.segments[:orc_segs]:
        c0, k0, d0 = exact.search_radius(seg.host_kmers, queries[:oc],
                                         RADIUS, max_hits=2048)
        gci.append(c0)
        gki.append(k0 + seg.offset)
        gd.append(d0)
    gci, gki, gd = map(np.concatenate, (gci, gki, gd))
    orc_hi = sidx.segments[orc_segs - 1].offset + \
        sidx.segments[orc_segs - 1].n_points
    print(f"# oracle over {orc_segs} segments: {len(gci)} hits",
          file=sys.stderr, flush=True)

    for nres in budgets:
        sidx2 = stream.SegmentedIVF(
            segments=sidx.segments, n_points=sidx.n_points,
            kmer_len=sidx.kmer_len, block_size=sidx.block_size,
            resident=[stream.upload_segment(s) if i < nres else None
                      for i, s in enumerate(sidx.segments)])
        for kb in kbs:
            st: dict = {}
            stream.search_segmented(sidx2, queries[:64], RADIUS,
                                    k_blocks=kb, max_hits=512)   # warm
            t0 = time.perf_counter()
            ci, ki, dd = stream.search_segmented(
                sidx2, queries, RADIUS, k_blocks=kb, max_hits=512,
                center_block=1024, retry_overflow=False, stats_out=st)
            wall = time.perf_counter() - t0
            m = (ci < oc) & (ki < orc_hi)
            rep = evaluate.recall_from_indices(gci, gki, gd, ci[m],
                                               ki[m], RADIUS)
            print(json.dumps({
                "bench": "stream_scale", "n": n, "kb": kb,
                "segments": sidx.num_segments,
                "resident_fraction":
                    round(sidx2.resident_fraction(), 3),
                "queries": int(len(queries)), "wall_s": round(wall, 1),
                "qps": round(len(queries) / wall, 1),
                "sample_recall": round(rep.recall, 4),
                "hits": int(len(ci)), "build_s": round(build_s, 1),
                "bytes_per_segment": int(seg_bytes[0]),
                "stats": {k: int(v) if isinstance(v, (int, np.integer))
                          else v for k, v in st.items()}}), flush=True)
        del sidx2


if __name__ == "__main__":
    main()
