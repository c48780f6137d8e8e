"""2^24-point scale run: streamed FASTA ingest -> sharded IVF -> search.

    python examples/bench_scale24.py --mode=stream   # composed ingest path
    python examples/bench_scale24.py --mode=single   # scaling-table row

VERDICT r2 next #3 / ROADMAP 22: the all-positions k-mer load of the
IGC corpus (2.47B AA) needs the streamed ingest COMPOSED with the
sharded build beyond test scale.  This driver builds a ~16.8M-point
(2^24) all-positions k-mer index from a synthetic family FASTA:

  * ``stream`` mode drives the full multihost path on the real mesh
    (1 chip -> 1x1): io.stream_fasta -> per-chunk all-positions k-mer
    rows -> parallel.multihost.build_ivf_index_streamed (per-shard
    device buffers; the host never stages the full matrix) ->
    multihost.search_ivf; reports build/search time, sample recall vs
    the exact oracle, and peak host RSS.
  * ``single`` mode records the 2^24 scaling-table row on the
    single-device engine (cell-chunked build + approx_max_k block
    select, the 2^23 operating point) with the C++ reference baseline.

Corpus: 419,431 proteins x 64 aa, each embedding one of 4,096 family
motifs (25 aa, 1-2 substitutions) at a random offset -> 40 windows per
protein = 16,777,240 ~ 2^24 rows.  Queries = family motif centers.
"""

import json
import os
import resource
import sys
import time

import numpy as np

K = 25
PLEN = 64
# HSEARCH_SCALE24_NPROT overrides for smoke tests (40 rows per protein)
N_PROT = int(os.environ.get("HSEARCH_SCALE24_NPROT", 419_431))
N_FAM = 4096
RADIUS = 35.0
FASTA = f"/tmp/hsearch_scale24_{N_PROT}.fasta"


def ensure_fasta():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hsearch_tpu.core import alphabet
    if os.path.exists(FASTA) and os.path.getsize(FASTA) > 0:
        return
    rng = np.random.default_rng(24)
    fams = rng.integers(0, 20, (N_FAM, K), dtype=np.int8)
    letters = np.frombuffer(alphabet.AA20.encode(), np.uint8)
    with open(FASTA, "w") as f:
        chunk = 65536
        for lo in range(0, N_PROT, chunk):
            m = min(chunk, N_PROT - lo)
            prot = rng.integers(0, 20, (m, PLEN), dtype=np.int8)
            which = rng.integers(0, N_FAM, m)
            offs = rng.integers(0, PLEN - K + 1, m)
            emb = fams[which].copy()
            # 1-2 substitutions per embedded motif
            for _ in range(2):
                sp = rng.integers(0, K, m)
                keep = rng.random(m) < 0.75
                emb[np.arange(m), sp] = np.where(
                    keep, emb[np.arange(m), sp],
                    rng.integers(0, 20, m, dtype=np.int8))
            cols = offs[:, None] + np.arange(K)[None, :]
            prot[np.arange(m)[:, None], cols] = emb
            txt = letters[prot].tobytes().decode()
            f.write("".join(f">p{lo + i}\n{txt[i * PLEN:(i + 1) * PLEN]}\n"
                            for i in range(m)))
    print(f"# wrote {FASTA}", file=sys.stderr, flush=True)


def centers():
    rng = np.random.default_rng(24)
    return rng.integers(0, 20, (N_FAM, K), dtype=np.int8)[:256] \
        .astype(np.int32)


def kmer_chunks(chunk_aa=1 << 23):
    from hsearch_tpu.core import alphabet, io as hio
    for db in hio.stream_fasta(FASTA, chunk_aa=chunk_aa, seed=0):
        starts = np.asarray(db.starts)
        seq = np.asarray(db.seq)
        rows = alphabet.kmer_view(seq, K)
        pos = np.arange(rows.shape[0])
        pid = np.searchsorted(starts, pos, side="right") - 1
        ok = pos + K <= starts[pid + 1]
        yield np.ascontiguousarray(rows[ok]).astype(np.int32)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def oracle_sample(cen, n_sample, db=None):
    """Exact oracle over the full db for a center sample (held on host
    only for the measurement — the ingest path never stages it)."""
    from hsearch_tpu.search import exact
    if db is None:
        db = np.concatenate(list(kmer_chunks()))
        print(f"# oracle db rows {db.shape} rss={rss_gb():.1f}GB",
              file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    g = exact.search_radius(db, cen[:n_sample], RADIUS, max_hits=2048)
    return g, n_sample / (time.perf_counter() - t0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsearch_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    mode = "single"
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            mode = a.split("=")[1]
    ensure_fasta()
    n_total = N_PROT * (PLEN - K + 1)
    cen = centers()
    from hsearch_tpu.search import evaluate

    if mode == "stream":
        from hsearch_tpu.parallel import multihost
        mesh = multihost.host_mesh()
        t0 = time.perf_counter()
        idx = multihost.build_ivf_index_streamed(
            kmer_chunks(), n_total, jax.random.PRNGKey(0), mesh, K,
            block_size=32, max_hits=512)
        build_s = time.perf_counter() - t0
        ingest_rss = rss_gb()
        print(f"# streamed build {build_s:.1f}s rss={ingest_rss:.1f}GB",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        ci, ki, dd = multihost.search_ivf(idx, cen[:64], RADIUS,
                                          k_blocks=256)
        qps = 64 / (time.perf_counter() - t0)
        (gci, gki, gd), oqps = oracle_sample(cen, 64)
        rep = evaluate.recall_from_indices(gci, gki, gd, ci, ki, RADIUS)
        print(json.dumps({
            "bench": "scale24_stream", "n": n_total,
            "build_s": round(build_s, 1),
            "ingest_peak_rss_gb": round(ingest_rss, 2),
            "qps": round(qps, 1), "oracle_qps": round(oqps, 2),
            "sample_recall": round(rep.recall, 4),
            "hits": int(len(ci))}), flush=True)
    else:
        from hsearch_tpu import native_ext
        from hsearch_tpu.search import ivf
        db = np.concatenate(list(kmer_chunks()))
        print(f"# db staged {db.shape} rss={rss_gb():.1f}GB",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        index = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
        jax.block_until_ready(index.block_centroid)
        build_s = time.perf_counter() - t0
        print(f"# build {build_s:.1f}s B={index.num_blocks}",
              file=sys.stderr, flush=True)
        (gci, gki, gd), oqps = oracle_sample(cen, 64, db=db)
        stats: dict = {}
        out = {}
        # exact min-cascade select by default (round 4): approx_max_k is
        # no longer needed for the big-B select — HSEARCH_APPROX_SELECT=1
        # re-enables the old operating point for A/B
        approx = os.environ.get("HSEARCH_APPROX_SELECT", "0") == "1"
        for kb in (128, 256, 512):
            ivf.search(index, cen[:256], RADIUS, k_blocks=kb,
                       max_hits=512, center_block=256,
                       retry_overflow=False, stats_out=stats,
                       approx_select=approx)         # warm
            t0 = time.perf_counter()
            ci, ki, dd = ivf.search(index, cen[:256], RADIUS, k_blocks=kb,
                                    max_hits=512, center_block=256,
                                    retry_overflow=False, stats_out={},
                                    approx_select=approx)
            qps = 256 / (time.perf_counter() - t0)
            m = ci < 64
            rep = evaluate.recall_from_indices(gci, gki, gd,
                                               ci[m], ki[m], RADIUS)
            if not native_ext.available():
                native_ext.build()
            t0 = time.perf_counter()
            native_ext.brute_search_cpp(cen[:2], db, RADIUS)
            cpp_qps = 2 / (time.perf_counter() - t0)
            out = {"bench": "scale24_single", "n": n_total, "kb": kb,
                   "build_s": round(build_s, 1), "qps": round(qps, 1),
                   "tpu_oracle_qps": round(oqps, 2),
                   "cpp_qps": round(cpp_qps, 3),
                   "vs_baseline": round(qps / cpp_qps, 1),
                   "sample_recall": round(rep.recall, 4),
                   "peak_rss_gb": round(rss_gb(), 2)}
            print(json.dumps(out), flush=True)
            if rep.recall >= 0.99:
                break


if __name__ == "__main__":
    main()
