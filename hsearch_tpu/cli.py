"""Command-line tools mirroring the reference binaries.

    python -m hsearch_tpu <tool> [args]

Tool-to-reference map (file formats match on clean inputs):

    protein2datapoints   hclust/src/hclust/protein2datapoints.cpp
    motif-search         hclust/src/hclust/motif_both_points.cpp
    motif-search-exact   hclust/src/hclust/motif_both_points_noLSH.cpp
    hclust2 / hclust3    hclust/src/hclust/hclust{2,3}.cpp (same greedy
                         algorithm; the device path recomputes distances
                         from integer k-mers, i.e. hclust3's trade-off)
    hclust               hclust/src/hclust/hclust.cpp
    pcluster             pcluster/src/pcluster/pcluster.cpp
    evaluate2            hclust/src/hclust/evaluate2.cpp
    postprocess          hclust/src/hclust/centerDistanceSmapling.cpp
    shuffle-kmers        hclust/src/hclust/shuffle_kmers.cpp
    kmer2coordinates     IGC/shuffle_data/IGC/kmer2coordinates.cpp
    gen-kmers            IGC/shuffle_data/IGC/{suffix_array,
                         gen_kmers_from_suffix_array}.cpp
    orf                  orf/orf_main.cc
    stockholm            IGC/shuffle_data/Pfam/STOCKHOLM.{h,cpp}
    fit-embedding        IGC/distance2coordinate/BLOSUM.m (mdscale)
    bench                (no reference equivalent; BASELINE.json harness)

Unlike the reference, no tool silently overrides its flags (the reference
forces hash_K=hash_L=4 regardless of -k/-l, motif_both_points.cpp:380-381).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _read_kmer_input(path: str, k: int):
    """k-mer FASTA or datapoints file -> (names, kmers (N, k) int32)."""
    from .core import alphabet, embedding, io as hio
    with open(path) as f:
        head = f.read(4096)
    if head.lstrip().startswith(">"):
        db = hio.read_fasta(path)
        keep = [i for i in range(db.num_proteins)
                if len(db.protein(i)) >= k]
        names = [db.names[i] for i in keep]
        km = np.stack([np.asarray(db.protein(i))[:k] for i in keep]) \
            .astype(np.int32) if keep else np.zeros((0, k), np.int32)
        return names, km, None
    names, pts = hio.read_datapoints(path, k * embedding.AA_DIM)
    # recover integer k-mers when the header carries them, else keep points
    kmers = []
    for h in names:
        meta = hio.parse_datapoint_header(h)
        if meta is None:
            return names, None, np.asarray(pts, np.float32)
        kmers.append(alphabet.encode(meta["kmer"]))
    return names, np.stack(kmers).astype(np.int32), None


def cmd_protein2datapoints(args):
    import jax  # noqa: F401  (device warmup not needed; host-only tool)
    from .core import dataprep, embedding, io as hio
    rng = np.random.default_rng(args.seed)
    if args.stream_aa:
        # bounded-memory pass for IGC-scale corpora: chunked read,
        # incremental datapoint writing (identical output to the
        # whole-file path — io.stream_fasta carries one rng)
        total = 0
        with open(args.output, "w") as f:
            chunks = hio.stream_fasta(args.database, seed=args.seed,
                                      chunk_aa=args.stream_aa)
            for headers, kmers in dataprep.stream_kmer_datapoints(
                    chunks, args.kmer_len, rng):
                hio.write_datapoints(f, headers,
                                     embedding.embed_kmers(kmers))
                total += len(headers)
    else:
        db = hio.read_fasta(args.database, seed=args.seed)
        headers, kmers = dataprep.sample_kmer_datapoints(
            db, args.kmer_len, rng)
        hio.write_datapoints(args.output, headers,
                             embedding.embed_kmers(kmers))
        total = len(headers)
    print(f"[WROTE {total} datapoints to {args.output}]",
          file=sys.stderr)


def cmd_motif_search(args):
    import jax
    from .core import embedding
    from .search import evaluate, exact, ivf, motif
    from .core import io as hio
    dnames, dk, dpts = _read_kmer_input(args.database, args.kmer_len)
    cnames, ck, cpts = _read_kmer_input(args.centers, args.kmer_len)
    if dk is None:
        raise SystemExit("database must be k-mer-typed (FASTA or "
                         "headered datapoints)")
    centers = ck if ck is not None else cpts
    key = jax.random.PRNGKey(args.seed)
    if args.engine == "exact":
        ci, ki, dd = exact.search_radius(dk, centers, args.radius,
                                         center_block=args.center_block)
    elif args.engine == "stream":
        # out-of-HBM segmented engine (search/stream.py): host-resident
        # byte set, double-buffered streaming, optional device-resident
        # prefix under a clamped --device-budget
        from .search import stream
        from .utils import checkpoint
        if getattr(args, "index", None):
            index = checkpoint.load_index(
                args.index, device_budget_bytes=args.device_budget)
            print(f"[segmented index reloaded: {index.n_points} points, "
                  f"{index.num_segments} segments, resident "
                  f"{index.resident_fraction():.2f}]", file=sys.stderr)
        else:
            index = stream.build_segmented(
                dk, key, segment_points=args.segment_points,
                block_size=args.block_size,
                device_budget_bytes=args.device_budget)
            if getattr(args, "save_index", None):
                checkpoint.save_index(args.save_index, index)
                print(f"[segmented index -> {args.save_index}]",
                      file=sys.stderr)
        stats: dict = {}
        ci, ki, dd = stream.search_segmented(
            index, centers, args.radius, k_blocks=args.k_blocks,
            max_hits=args.max_hits, center_block=args.center_block,
            retry_overflow=not args.no_retry,
            stats_out=stats, pack_cap_frac=4)
        if args.no_retry and (stats.get("over_blocks")
                              or stats.get("over_hits")):
            print(f"[--no-retry: {stats.get('over_blocks', 0)} "
                  f"center-segment pairs over k-blocks, "
                  f"{stats.get('over_hits', 0)} over max-hits]",
                  file=sys.stderr)
    elif args.engine == "ivf":
        index = ivf.build_index(dk, key, block_size=args.block_size)
        k_blocks = args.k_blocks
        if args.no_retry and not args.force_k_blocks:
            # measured-recall gating by default (VERDICT r2 weak #1):
            # without the lossless retry, a fixed k-blocks budget can
            # silently run far under the recall gate on workloads whose
            # radius/distribution differ from the bench (PIPELINE.md
            # measured kb=128 finding 24,702 of 78,725 hits on a
            # self-hit corpus).  Autotune picks the smallest cap whose
            # MEASURED weighted recall on a query sample reaches the
            # target; --force-k-blocks is the explicit opt-out.
            sample = centers[::max(1, len(centers) // 64)][:64]
            ladder = tuple(args.k_blocks << i for i in range(5))
            k_blocks = ivf.autotune_k_blocks(
                index, np.asarray(sample), args.radius,
                target_recall=args.target_recall, candidates=ladder,
                max_hits=args.max_hits)
            print(f"[--no-retry: measured-recall autotune "
                  f"(target {args.target_recall}) picked "
                  f"k-blocks={k_blocks}]", file=sys.stderr)
        stats: dict = {}
        ci, ki, dd = ivf.search(index, centers, args.radius,
                                k_blocks=k_blocks,
                                max_hits=args.max_hits,
                                center_block=args.center_block,
                                retry_overflow=not args.no_retry,
                                stats_out=stats if args.no_retry else None,
                                approx_select=args.approx_select or None)
        if args.no_retry and (stats.get("over_blocks")
                              or stats.get("over_hits")):
            print(f"[--no-retry: {stats.get('over_blocks', 0)} centers "
                  f"exceeded k-blocks={k_blocks}, "
                  f"{stats.get('over_hits', 0)} exceeded "
                  f"max-hits={args.max_hits}; hit set may be incomplete "
                  "— raise the caps or drop --no-retry]", file=sys.stderr)
    else:
        import dataclasses as _dc
        explicit = {k: v for k, v in (("hash_k", args.hash_k),
                                      ("hash_l", args.hash_l),
                                      ("w", args.width),
                                      ("probes", args.probes))
                    if v is not None}
        if not explicit and not args.no_autotune:
            # measured-recall autotune by default (VERDICT r3 weak #6,
            # same safety posture as the IVF engine): the reference's
            # K=4/L=4/W=50 point silently loses ~29% of weighted recall
            # to bucket skew on family data (BENCH_NOTES per-engine
            # table), so an untouched `--engine lsh` sweeps the tuning
            # grid on a subsample and picks the cheapest config meeting
            # --target-recall.  Any explicit -k/-L/-W/--probes (or
            # --no-autotune) is the opt-out and is honored verbatim.
            from .lsh import tuning
            rng = np.random.default_rng(args.seed)
            db_s = dk if len(dk) <= (1 << 16) else \
                dk[rng.choice(len(dk), 1 << 16, replace=False)]
            cen_s = np.asarray(centers[::max(1, len(centers) // 48)][:48])
            pts = tuning.sweep(np.asarray(db_s), cen_s, args.radius,
                               key=key)
            choice = tuning.best(pts, args.target_recall)
            cfg = _dc.replace(choice.config, radius=args.radius,
                              max_hits=args.max_hits,
                              center_block=args.center_block)
            print(f"[lsh autotune (target {args.target_recall}, "
                  f"sample {len(db_s)}x{len(cen_s)}): {choice.row()}]",
                  file=sys.stderr)
            if choice.recall < args.target_recall:
                print(f"[WARNING: best sampled config reaches only "
                      f"recall {choice.recall:.4f} < "
                      f"{args.target_recall}; consider --engine ivf]",
                      file=sys.stderr)
        else:
            cfg = motif.MotifSearchConfig(
                hash_k=explicit.get("hash_k", 4),
                hash_l=explicit.get("hash_l", 4),
                w=explicit.get("w", 50.0), radius=args.radius,
                probes=explicit.get("probes", 1),
                max_hits=args.max_hits, center_block=args.center_block)
        index = motif.build_index(dk, key, cfg)
        ci, ki, dd = motif.search(index, centers, cfg)
    with open(args.output, "w") as f:
        for a, b, d in zip(ci, ki, dd):
            f.write(f"{cnames[a]} {dnames[b]} {d:g}\n")
    print(f"[{len(ci)} hits -> {args.output}]", file=sys.stderr)
    if args.ground_truth:
        truth = hio.read_triples(args.ground_truth)
        name_ci = [(cnames[a], dnames[b]) for a, b in zip(ci, ki)]
        tp = [(a, b) for a, b, _ in truth]
        td = [d for _, _, d in truth]
        rep = evaluate.weighted_recall(tp, td, name_ci, args.radius)
        print(f"ACCURACY {rep.recall}")
        evaluate.write_accuracy_file(args.output + ".accuracy.txt", rep)


def cmd_motif_search_exact(args):
    from .search import exact
    dnames, dk, _ = _read_kmer_input(args.database, args.kmer_len)
    if dk is None:
        raise SystemExit("input must be k-mer-typed (FASTA or datapoints "
                         "with name#idx$off@KMER*count headers)")
    cnames, ck, cpts = _read_kmer_input(args.centers, args.kmer_len)
    centers = ck if ck is not None else cpts
    ci, ki, dd = exact.search_radius(dk, centers, args.radius)
    with open(args.output, "w") as f:
        for a, b, d in zip(ci, ki, dd):
            f.write(f"{cnames[a]} {dnames[b]} {d:g}\n")
    # misses file (motif_both_points_noLSH.cpp:48-52)
    if args.not_less_than:
        hit_pairs = set(zip(ci.tolist(), ki.tolist()))
        with open(args.not_less_than, "w") as f:
            for a in range(len(cnames)):
                for b in range(len(dnames)):
                    if (a, b) not in hit_pairs:
                        f.write(f"{cnames[a]} {dnames[b]}\n")
    print(f"[{len(ci)} exact hits -> {args.output}]", file=sys.stderr)


def _kmer_matrix(db, kmer_len: int) -> np.ndarray:
    """First kmer_len residues of every long-enough sequence, one
    vectorized gather (a per-protein loop costs minutes at IGC scale)."""
    starts = np.asarray(db.starts)
    keep = np.nonzero(np.diff(starts) >= kmer_len)[0]
    if len(keep) == 0:
        raise SystemExit(f"no sequences of length >= {kmer_len} "
                         "in the database (check -l)")
    return np.asarray(db.seq)[starts[keep][:, None]
                              + np.arange(kmer_len)].astype(np.int32)


def _pin_threads(args, distributed: bool) -> None:
    """Per-process native-kernel thread budget (the reference parses a
    -t flag it never uses, pcluster.cpp:114,127-128; ours is real).
    Unpinned OpenMP pools from N cooperating processes fight for the
    same cores — measured as a 3-5x swing in 2-process aligner numbers
    (VERDICT r3 weak #5) — so distributed runs default to an even
    ncores/nproc split; --threads overrides either way."""
    from . import native_ext
    threads = getattr(args, "threads", None)
    if threads is None and distributed:
        threads = native_ext.default_process_threads(args.dist_nproc)
    if threads:
        eff = native_ext.set_threads(threads)
        print(f"[native threads: {eff}]", file=sys.stderr)


def cmd_hclust2(args):
    import jax
    distributed = getattr(args, "dist_nproc", None) is not None
    _pin_threads(args, distributed)
    if distributed:
        # must precede any backend-initializing jax call in this process
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_nproc, process_id=args.dist_pid)
    from .cluster import greedy
    from .core import alphabet, io as hio
    db = hio.read_fasta(args.database, seed=args.seed)
    km = _kmer_matrix(db, args.kmer_len)
    cfg = greedy.ClusterConfig(hash_k=args.hash_k, hash_l=args.hash_l,
                               w=args.width, radius=args.radius)
    if distributed:
        from .cluster import greedy_dist
        res = greedy_dist.cluster_greedy_distributed(
            km, jax.random.PRNGKey(args.seed), cfg)
    else:
        res = greedy.cluster_greedy(km, jax.random.PRNGKey(args.seed), cfg)
    if getattr(args, "merge_radius", None):
        # hclust v1's centroid-merge stage (hclust.cpp:186-235) applied
        # to the greedy labels: union clusters whose center k-mers fall
        # within --merge-radius (see postprocess.merge_by_center_distance)
        import numpy as np
        from .cluster import postprocess
        lab = np.where(res.parent >= 0, res.parent,
                       np.arange(len(res.parent)))
        lab = postprocess.merge_by_center_distance(
            km, lab, args.merge_radius, jax.random.PRNGKey(args.seed + 1),
            k_blocks=getattr(args, "merge_k_blocks", 128))
        order = np.argsort(lab, kind="stable")
        sl = lab[order]
        groups = np.split(order, np.nonzero(sl[1:] != sl[:-1])[0] + 1)
        # hclust2 blocks list the cluster head first (hclust2.cpp:137-150);
        # the stable label argsort yields ascending row order, so rotate
        # each group's head row (== its label) to the front
        for grp in groups:
            head = np.nonzero(grp == lab[grp[0]])[0]
            if head.size and head[0] != 0:
                h = int(head[0])
                hv = grp[h]
                grp[1:h + 1] = grp[:h].copy()
                grp[0] = hv
    else:
        groups = res.clusters()
    # member lines are the k-mer sequences: the post-processing tools read
    # them back as sequences (centerDistanceSmapling.cpp:119,146)
    strs = alphabet.decode_all(km)
    clusters = [[strs[int(i)] for i in grp] for grp in groups]
    hio.write_clusters(args.output, clusters, style="hclust2")
    print(f"[{len(clusters)} clusters -> {args.output}]", file=sys.stderr)


def cmd_hclust(args):
    import jax
    from .cluster import centroid
    from .core import io as hio
    db = hio.read_fasta(args.database, seed=args.seed)
    km = _kmer_matrix(db, args.kmer_len)
    cfg = centroid.CentroidConfig(hash_k=args.hash_k, hash_l=args.hash_l,
                                  w=args.width, radius=args.radius)
    groups = centroid.cluster_centroid(km, jax.random.PRNGKey(args.seed),
                                       cfg)
    from .core import alphabet
    strs = alphabet.decode_all(km)
    clusters = [[strs[int(i)] for i in grp] for grp in groups]
    hio.write_clusters(args.output, clusters, style="hclust")
    print(f"[{len(clusters)} clusters -> {args.output}]", file=sys.stderr)


def cmd_pcluster(args):
    import jax
    distributed = args.dist_nproc is not None
    _pin_threads(args, distributed)
    if distributed:
        # must precede any backend-initializing jax call in this process
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_nproc, process_id=args.dist_pid)
    from .align import pipeline as apipe
    from .cluster import pcluster
    from .core import io as hio
    db = hio.read_fasta(args.database, seed=args.seed)
    params = apipe.SearchParams(evalue_threshold=args.evalue,
                                max_aln_per_query=args.max_aln,
                                max_m8_per_query=args.max_hit)
    # gapped refinement happens inside cluster_proteins with the same
    # group-partitioned searcher, so refined and unrefined hits share
    # one per-group e-value context (ADVICE r1 #3)
    if distributed:
        from .cluster import pcluster_dist
        res = pcluster_dist.cluster_proteins_distributed(
            db, jax.random.PRNGKey(args.seed), params,
            cluster_evalue=args.cluster_evalue, tables=args.tables,
            bits=args.bits, sigma=args.sigma, gapped=args.gapped)
        # hits are process-local (each process aligned its own groups):
        # per-process m8/aln shards; labels are identical everywhere,
        # so only process 0 writes the cluster file
        shard = f".p{jax.process_index()}"
        write_clusters = jax.process_index() == 0
    else:
        res = pcluster.cluster_proteins(
            db, jax.random.PRNGKey(args.seed), params,
            cluster_evalue=args.cluster_evalue, tables=args.tables,
            bits=args.bits, sigma=args.sigma, gapped=args.gapped)
        shard = ""
        write_clusters = True
    apipe.write_m8(args.output + shard + ".m8", res.hits,
                   db.names, db.names)
    apipe.write_aln(args.output + shard + ".aln",
                    res.hits[:args.max_aln], db.names, db.names)
    n_clusters = 0
    if write_clusters:
        clusters = [[db.names[int(i)] for i in g] for g in res.groups()]
        n_clusters = len(clusters)
        hio.write_clusters(args.output + ".clusters", clusters,
                           style="hclust2")
    print(f"[{n_clusters} clusters, {len(res.hits)} hits -> "
          f"{args.output}{shard}.*]", file=sys.stderr)


def cmd_evaluate2(args):
    import os
    from .core import io as hio
    from .search import evaluate
    truth = hio.read_triples(args.ground_truth)
    tp = [(a, b) for a, b, _ in truth]
    td = [d for _, _, d in truth]
    paths = []
    if os.path.isdir(args.result):
        paths = [os.path.join(args.result, p)
                 for p in sorted(os.listdir(args.result))]
    else:
        paths = [args.result]
    for p in paths:
        found = [(a, b) for a, b, _ in hio.read_triples(p)]
        rep = evaluate.weighted_recall(tp, td, found, args.radius,
                                       weighting=args.weighting)
        print(f"{p} ACCURACY {rep.recall}")


def cmd_evaluate_motifs(args):
    """MEME-vs-hclust motif->protein-set comparison (evaluate.cpp)."""
    from .core import io as hio
    from .search import evaluate
    with open(args.meme) as f:
        f.readline()                       # header line (evaluate.cpp:25)
        meme_pairs = []
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                meme_pairs.append((parts[0], parts[1]))
    triples = hio.read_triples(args.result)
    s1, s2, ratio = evaluate.motif_protein_set_ratio(meme_pairs, triples)
    print(f"ACCURACY: {s1} {s2} {ratio}")


def cmd_postprocess(args):
    from .cluster import postprocess
    from .core import io as hio
    clusters = hio.read_clusters(args.clusters)
    clusters = [c for c in clusters if len(c) >= args.min_size]
    if not clusters:
        raise SystemExit(f"no clusters with >= {args.min_size} members "
                         "(lower --min-size)")
    named = [(f"cluster{i}", c) for i, c in enumerate(clusters)]
    centers = postprocess.cluster_centers(clusters)
    postprocess.write_centers_as_datapoints(
        args.output + "hclust.format.txt",
        [n for n, _ in named], centers)
    postprocess.write_meme(args.output + "meme.format.txt", named)
    inter, _ = postprocess.center_distance_samples(centers)
    with open(args.output + "center_distances.txt", "w") as f:
        for d in inter:
            f.write(f"{d:g}\n")
    print(f"[{len(clusters)} clusters postprocessed -> {args.output}*]",
          file=sys.stderr)


def cmd_shuffle_kmers(args):
    from .cluster import postprocess
    from .core import io as hio
    clusters = hio.read_clusters(args.clusters)
    clusters = [c for c in clusters if len(c) >= args.min_size]
    named = [(f"cluster{i}", c) for i, c in enumerate(clusters)]
    rng = np.random.default_rng(args.seed)
    recs = postprocess.shuffle_motifs(named, rng, args.num_motifs,
                                      args.seqs_per_motif)
    with open(args.output, "w") as f:
        for name, seq in recs:
            f.write(f">{name}\n{seq}\n")
    print(f"[{len(recs)} shuffled records -> {args.output}]",
          file=sys.stderr)


def cmd_kmer2coordinates(args):
    from .core import dataprep, io as hio
    names, km, _ = _read_kmer_input(args.input, args.kmer_len)
    dk = km
    if dk is None:
        raise SystemExit("input must be k-mer-typed (FASTA or datapoints "
                         "with name#idx$off@KMER*count headers)")

    pts = dataprep.kmers_to_coordinates(km)
    hio.write_datapoints(args.output, names, pts)
    print(f"[{len(names)} points -> {args.output}]", file=sys.stderr)


def cmd_gen_kmers(args):
    from .core import alphabet, dataprep, io as hio
    # seed=None: keep unknown residues so unique_kmers excludes windows
    # containing them (randomizing first would fabricate k-mers)
    if args.stream_aa:
        kmers, counts = dataprep.stream_unique_kmers(
            hio.stream_fasta(args.database, seed=None,
                             chunk_aa=args.stream_aa), args.kmer_len)
    else:
        db = hio.read_fasta(args.database, seed=None)
        kmers, counts = dataprep.unique_kmers(db, args.kmer_len)
    # vectorized decode in bounded slices: a per-row decode() was 130 of
    # gen-kmers' 197 s at 9.9M k-mers, and decoding the whole matrix at
    # once would undo the --stream-aa memory bound (a (U,) unicode
    # array is ~4x the int matrix)
    kmers = np.asarray(kmers)
    step = 1 << 20
    with open(args.output, "w") as f:
        for s in range(0, len(kmers), step):
            strs = alphabet.decode_all(kmers[s:s + step])
            f.writelines(f"{t}\t{c}\n"
                         for t, c in zip(strs, counts[s:s + step]))
    print(f"[{len(kmers)} unique {args.kmer_len}-mers -> {args.output}]",
          file=sys.stderr)


def _read_raw_fasta(path: str):
    names, seqs, cur = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if names:
                    seqs.append("".join(cur))
                cur = []          # also drops text before the first '>'
                names.append(line[1:].split(" ")[0])
            elif names:
                cur.append(line)
    if names:
        seqs.append("".join(cur))
    return names, seqs


def cmd_orf(args):
    from .core import orf
    names, dnas = _read_raw_fasta(args.query)
    out_names, peptides = orf.translate_fasta(names, dnas, args.min_len)
    # default output name matches orf_main.cc:12-19
    out = args.output or (args.query + "_translatedAA.fasta")
    with open(out, "w") as f:
        for n, pep in zip(out_names, peptides):
            f.write(f">{n}\n{pep}\n")
    print(f"[{len(peptides)} peptides -> {out}]", file=sys.stderr)


def cmd_stockholm(args):
    from .core import stockholm
    centers = stockholm.extract_centers(args.input, args.length,
                                        sample_every=args.sample_every)
    with open(args.output, "w") as f:
        for label, motif_seq in centers:
            f.write(f">{label}\n{motif_seq}\n")
    print(f"[{len(centers)} centers -> {args.output}]", file=sys.stderr)


def cmd_index_build(args):
    """Build a search index once and checkpoint it (the reference's
    unrealized '//serialize' TODO, hash_search.cpp:254)."""
    import jax
    from .search import ivf, motif
    from .utils import checkpoint, stats
    import json
    _, dk, _ = _read_kmer_input(args.database, args.kmer_len)
    if dk is None:
        raise SystemExit("input must be k-mer-typed (FASTA or datapoints "
                         "with name#idx$off@KMER*count headers)")
    key = jax.random.PRNGKey(args.seed)
    if args.engine == "ivf":
        index = ivf.build_index(dk, key, block_size=args.block_size)
    elif args.engine == "stream":
        from .search import stream
        index = stream.build_segmented(
            dk, key, segment_points=args.segment_points,
            block_size=args.block_size)
    else:
        cfg = motif.MotifSearchConfig(hash_k=args.hash_k,
                                      hash_l=args.hash_l, w=args.width)
        index = motif.build_index(dk, key, cfg)
    checkpoint.save_index(args.output, index)
    print(json.dumps(stats.index_stats(index))[:400], file=sys.stderr)
    print(f"[index -> {args.output}]", file=sys.stderr)


def cmd_serve(args):
    """Persistent query loop: one process keeps the index on device and
    answers motif queries line by line (build cost amortized across a
    serving session — the reference re-reads and re-hashes the database
    on every invocation)."""
    from .core import alphabet
    from .search import ivf, motif, stream
    from .utils import checkpoint
    index = checkpoint.load_index(
        args.index,
        device_budget_bytes=getattr(args, "device_budget", 0))
    is_ivf = isinstance(index, ivf.IVFIndex)
    is_seg = isinstance(index, stream.SegmentedIVF)
    kmer_len = index.kmer_len
    kind = "segmented" if is_seg else ("ivf" if is_ivf else "lsh")
    n_pts = index.n_points if (is_ivf or is_seg) else index.num_points
    extra = (f", {index.num_segments} segments, resident "
             f"{index.resident_fraction():.2f}") if is_seg else ""
    print(f"[serving {kind} index: {n_pts} points, "
          f"L={kmer_len}{extra}; query = one sequence per line, "
          "blank to quit]", file=sys.stderr)
    cfg = motif.MotifSearchConfig(radius=args.radius,
                                  probes=args.probes) \
        if not (is_ivf or is_seg) else None
    fin = open(args.input) if args.input else sys.stdin
    for line in fin:
        seq = line.strip().upper()
        if not seq:
            break
        if seq.startswith(">"):
            continue
        if len(seq) != kmer_len:
            print(f"# query must be length {kmer_len}", file=sys.stderr)
            continue
        q = alphabet.encode(seq).astype(np.int32)[None, :]
        if is_seg:
            ci, ki, dd = stream.search_segmented(index, q, args.radius,
                                                 k_blocks=args.k_blocks)
        elif is_ivf:
            ci, ki, dd = ivf.search(index, q, args.radius,
                                    k_blocks=args.k_blocks)
        else:
            ci, ki, dd = motif.search(index, q, cfg)
        order = np.argsort(dd)
        for j in order:
            print(f"{seq} {int(ki[j])} {dd[j]:g}")
        print(f"# {len(ki)} hits", file=sys.stderr)


def cmd_lsh_sweep(args):
    import jax
    from .lsh import tuning
    _, dk, _ = _read_kmer_input(args.database, args.kmer_len)
    if dk is None:
        raise SystemExit("input must be k-mer-typed (FASTA or datapoints "
                         "with name#idx$off@KMER*count headers)")
    _, ck, cpts = _read_kmer_input(args.centers, args.kmer_len)
    centers = ck if ck is not None else cpts
    pts = tuning.sweep(dk, centers, args.radius,
                       key=jax.random.PRNGKey(args.seed))
    for p in pts:
        print(p.row())
    b = tuning.best(pts, args.min_recall)
    print(f"# best: {b.row()}")


def cmd_fit_embedding(args):
    from .parallel import train
    coords = train.fit_embedding(dim=args.dim, steps=args.steps,
                                 batch=args.batch, kmer_len=args.kmer_len,
                                 lr=args.lr, seed=args.seed)
    np.savetxt(args.output, coords, fmt="%.6f")
    print(f"[{args.dim}-dim embedding -> {args.output}]", file=sys.stderr)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hsearch_tpu",
                                description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="tool", required=True)

    def common_lsh(q):
        q.add_argument("-k", "--hash-k", type=int, default=4)
        q.add_argument("-L", "--hash-l", type=int, default=4)
        q.add_argument("-W", "--width", type=float, default=50.0)
        q.add_argument("-T", "--radius", type=float, default=200.0)
        q.add_argument("--seed", type=int, default=0)

    q = sub.add_parser("protein2datapoints")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=25)
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("--stream-aa", type=int, default=0, metavar="N",
                   help="stream the FASTA in ~N-residue chunks "
                        "(bounded memory; identical output)")
    q.set_defaults(func=cmd_protein2datapoints)

    q = sub.add_parser("motif-search")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-c", "--centers", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=25)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-g", "--ground-truth")
    q.add_argument("--engine", choices=("lsh", "ivf", "exact", "stream"),
                   default="lsh")
    q.add_argument("--segment-points", type=int, default=1 << 22,
                   help="stream engine: points per host segment")
    q.add_argument("--device-budget", type=int, default=0,
                   help="stream engine: HBM bytes for a device-resident"
                   " segment prefix (clamped against measured free HBM"
                   " minus two double-buffer slots; 0 = fully streamed)")
    q.add_argument("--index",
                   help="stream engine: load a checkpointed segmented"
                   " index (.npz from --save-index / index-build) instead"
                   " of rebuilding; -d is then only read for metadata")
    q.add_argument("--save-index",
                   help="stream engine: checkpoint the freshly built"
                   " segmented index to this .npz")
    q.add_argument("--probes", type=int, default=1)
    q.add_argument("--max-hits", type=int, default=256)
    q.add_argument("--block-size", type=int, default=32)
    q.add_argument("--k-blocks", type=int, default=64)
    q.add_argument("--center-block", type=int, default=256)
    q.add_argument("--approx-select", action="store_true",
                   help="ivf engine only: approximate surviving-block"
                   " top-k (3.2x q/s at 2^23 where the 429k-block select"
                   " dominates; voids the exactness guarantee — gate on"
                   " measured recall)")
    q.add_argument("--no-retry", action="store_true",
                   help="ivf engine only: skip the lossless overflow retry."
                   " k-blocks is then AUTOTUNED to the smallest cap whose"
                   " measured weighted recall on a query sample reaches"
                   " --target-recall (overflow counts still reported)")
    q.add_argument("--force-k-blocks", action="store_true",
                   help="with --no-retry: use exactly --k-blocks, skipping"
                   " the measured-recall autotune — the hit set may"
                   " silently be incomplete (explicit opt-out)")
    q.add_argument("--target-recall", type=float, default=0.99,
                   help="autotune gate (weighted recall): --no-retry's "
                        "k-blocks ladder (ivf) and the default lsh "
                        "config sweep")
    q.add_argument("--no-autotune", action="store_true",
                   help="lsh engine only: skip the default config sweep "
                        "and run the reference's K=4/L=4/W=50 point "
                        "verbatim (measured 29%% weighted-recall loss "
                        "to bucket skew on family data — explicit "
                        "opt-out)")
    common_lsh(q)
    # the lsh engine autotunes when NONE of K/L/W/probes is given: the
    # None sentinels distinguish untouched from explicit (the reference
    # instead silently overrides the user's K/L to 4,
    # motif_both_points.cpp:380-381 — the quirk we refuse to copy)
    q.set_defaults(hash_k=None, hash_l=None, width=None, probes=None)
    q.set_defaults(func=cmd_motif_search)

    q = sub.add_parser("motif-search-exact")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-c", "--centers", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=25)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-T", "--radius", type=float, default=200.0)
    q.add_argument("--not-less-than")
    q.set_defaults(func=cmd_motif_search_exact)

    # hclust3 is the reference's memory-lean variant of the same greedy
    # algorithm (hclust3.cpp); here the device path already recomputes
    # distances from integer k-mers, so the alias shares the implementation
    for tool, func in (("hclust2", cmd_hclust2), ("hclust3", cmd_hclust2),
                       ("hclust", cmd_hclust)):
        q = sub.add_parser(tool)
        q.add_argument("-d", "--database", required=True)
        q.add_argument("-o", "--output", required=True)
        q.add_argument("-l", "--kmer-len", type=int, default=25)
        common_lsh(q)
        if tool != "hclust":      # greedy engine only (see greedy_dist)
            q.add_argument("--dist-nproc", type=int, default=None,
                           help="join an N-process jax.distributed "
                                "cluster: bucket rows stride across "
                                "processes, elections merge via one "
                                "edge allgather per round; every "
                                "process runs this command with its "
                                "own --dist-pid (identical cluster "
                                "output on each)")
            q.add_argument("--dist-pid", type=int, default=None)
            q.add_argument("--dist-coordinator", default=None,
                           help="coordinator host:port "
                                "(default: auto-detect)")
        q.add_argument("-t", "--threads", type=int, default=None,
                       help="native-kernel OpenMP threads for this "
                            "process (default: all cores; distributed "
                            "runs default to ncores/nproc)")
        if tool != "hclust":
            q.add_argument("--merge-radius", type=float, default=None,
                           help="post-merge pass: union clusters whose "
                                "center k-mers are within this distance "
                                "(hclust v1's centroid merge, "
                                "hclust.cpp:186-235); counters the "
                                "greedy pass's family fragmentation")
            q.add_argument("--merge-k-blocks", type=int, default=128,
                           help="block cap for the merge pass's "
                                "centers-vs-centers radius search; "
                                "union-find needs only one surviving "
                                "edge per cluster pair, so lower caps "
                                "trade a little merge recall for a "
                                "shorter pass (over-cap counts are "
                                "reported)")
        q.set_defaults(func=func)

    q = sub.add_parser("pcluster")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-e", "--evalue", type=float, default=10.0)
    q.add_argument("--cluster-evalue", type=float, default=1e-3)
    q.add_argument("--max-aln", type=int, default=100)
    q.add_argument("--max-hit", type=int, default=500)
    q.add_argument("--tables", type=int, default=1)
    q.add_argument("--bits", type=int, default=16,
                   help="KLSH code width (reference: 16, pcluster.cpp:14)")
    q.add_argument("--sigma", type=float, default=0.2,
                   help="KLSH kernel bandwidth (reference: 0.2, "
                        "pcluster.cpp:15).  Measured: sigma, not bits, "
                        "is the recall knob — bits=12 sigma=0.1 reaches "
                        "0.99 family recall at tables=1 where the "
                        "reference point needs tables>=4 (BENCH_NOTES "
                        "round-3 sweep)")
    q.add_argument("--gapped", action="store_true",
                   help="re-align strong hits with the banded gapped "
                        "aligner (affine gaps + traceback)")
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("--dist-nproc", type=int, default=None,
                   help="join an N-process jax.distributed cluster: "
                        "groups shard across processes, labels merge "
                        "via union-find over gathered hit edges; every "
                        "process runs this command with its own "
                        "--dist-pid (m8/aln outputs are per-process "
                        "shards <out>.pK.m8)")
    q.add_argument("--dist-pid", type=int, default=None)
    q.add_argument("--dist-coordinator", default=None,
                   help="coordinator host:port (default: auto-detect)")
    q.add_argument("-t", "--threads", type=int, default=None,
                   help="native-kernel OpenMP threads for this process "
                        "(default: all cores; distributed runs default "
                        "to ncores/nproc).  The reference parses -t and "
                        "never uses it (pcluster.cpp:114,127-128)")
    q.set_defaults(func=cmd_pcluster)

    q = sub.add_parser("evaluate2")
    q.add_argument("-g", "--ground-truth", required=True)
    q.add_argument("-r", "--result", required=True,
                   help="result file or directory of result files")
    q.add_argument("-T", "--radius", type=float, default=200.0)
    q.add_argument("--weighting", choices=("search", "pivot"),
                   default="pivot",
                   help="'pivot' = evaluate2.cpp's 49.38 weighting")
    q.set_defaults(func=cmd_evaluate2)

    q = sub.add_parser("evaluate-motifs")
    q.add_argument("-m", "--meme", required=True,
                   help="MEME-style hit list: motif protein per line")
    q.add_argument("-r", "--result", required=True,
                   help="search triples: motif protein distance per line")
    q.set_defaults(func=cmd_evaluate_motifs)

    q = sub.add_parser("postprocess")
    q.add_argument("-c", "--clusters", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("--min-size", type=int, default=50)
    q.set_defaults(func=cmd_postprocess)

    q = sub.add_parser("shuffle-kmers")
    q.add_argument("-c", "--clusters", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("--min-size", type=int, default=100)
    q.add_argument("-m", "--num-motifs", type=int)
    q.add_argument("-n", "--seqs-per-motif", type=int)
    q.add_argument("--seed", type=int, default=0)
    q.set_defaults(func=cmd_shuffle_kmers)

    q = sub.add_parser("kmer2coordinates")
    q.add_argument("-i", "--input", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=10)
    q.set_defaults(func=cmd_kmer2coordinates)

    q = sub.add_parser("gen-kmers")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=10)
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("--stream-aa", type=int, default=0, metavar="N",
                   help="stream the FASTA in ~N-residue chunks")
    q.set_defaults(func=cmd_gen_kmers)

    q = sub.add_parser("orf")
    q.add_argument("-q", "--query", required=True)
    q.add_argument("-o", "--output")
    q.add_argument("--min-len", type=int, default=6)
    q.set_defaults(func=cmd_orf)

    q = sub.add_parser("stockholm")
    q.add_argument("-i", "--input", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-l", "--length", type=int, default=25)
    q.add_argument("--sample-every", type=int, default=1)
    q.set_defaults(func=cmd_stockholm)

    q = sub.add_parser("index-build")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=25)
    q.add_argument("--engine", choices=("lsh", "ivf", "stream"),
                   default="ivf")
    q.add_argument("--segment-points", type=int, default=1 << 22,
                   help="stream engine: points per host segment")
    q.add_argument("--block-size", type=int, default=32)
    common_lsh(q)
    q.set_defaults(func=cmd_index_build)

    q = sub.add_parser("serve")
    q.add_argument("-i", "--index", required=True)
    q.add_argument("--input", help="query file (default stdin)")
    q.add_argument("-T", "--radius", type=float, default=35.0)
    q.add_argument("--k-blocks", type=int, default=64)
    q.add_argument("--probes", type=int, default=8)
    q.add_argument("--device-budget", type=int, default=0,
                   help="segmented index: HBM bytes for a resident"
                   " prefix (clamped; 0 = fully streamed)")
    q.set_defaults(func=cmd_serve)

    q = sub.add_parser("lsh-sweep")
    q.add_argument("-d", "--database", required=True)
    q.add_argument("-c", "--centers", required=True)
    q.add_argument("-l", "--kmer-len", type=int, default=25)
    q.add_argument("-T", "--radius", type=float, default=35.0)
    q.add_argument("--min-recall", type=float, default=0.95)
    q.add_argument("--seed", type=int, default=0)
    q.set_defaults(func=cmd_lsh_sweep)

    q = sub.add_parser("fit-embedding")
    q.add_argument("-o", "--output", required=True)
    q.add_argument("--dim", type=int, default=8)
    q.add_argument("--steps", type=int, default=2000)
    q.add_argument("--batch", type=int, default=4096)
    q.add_argument("--kmer-len", type=int, default=1)
    q.add_argument("--lr", type=float, default=1e-1)
    q.add_argument("--seed", type=int, default=0)
    q.set_defaults(func=cmd_fit_embedding)

    return p


def main(argv=None):
    import os
    from . import __version__
    p = build_parser()
    p.add_argument("--version", action="version",
                   version=f"hsearch_tpu {__version__}")
    p.add_argument("--platform", choices=("cpu", "tpu"),
                   default=os.environ.get("HSEARCH_PLATFORM"),
                   help="force the JAX backend (the JAX_PLATFORMS env var "
                        "alone can be overridden by site customization)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache")
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if not args.no_compile_cache and \
            getattr(args, "dist_nproc", None) is None:
        # (skipped under --dist-nproc: jax.default_backend() would
        # initialize the XLA backend before jax.distributed.initialize)
        import jax
        try:
            # cache only accelerator programs: CPU compiles are fast and
            # CPU AOT entries are machine-feature sensitive across hosts
            if jax.default_backend() != "cpu":
                jax.config.update("jax_compilation_cache_dir",
                                  os.path.expanduser("~/.cache/hsearch_xla"))
                jax.config.update(
                    "jax_persistent_cache_min_entry_size_bytes", -1)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0)
        except Exception:
            pass
    try:
        args.func(args)
    except (ValueError, OSError) as e:
        # input/format errors surface as clean one-line failures, not
        # tracebacks (smithlab's tools print the exception message too,
        # OptionParser.hpp error paths)
        raise SystemExit(f"{args.tool}: {e}")


if __name__ == "__main__":
    main()
