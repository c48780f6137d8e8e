"""Clustering: device leader election == sequential reference; end-to-end."""

import jax
import numpy as np

from hsearch_tpu.cluster import centroid, greedy, union_find
from hsearch_tpu.core import embedding


def _random_kmers(rng, n, l):
    return rng.integers(0, 20, size=(n, l), dtype=np.int32)


def _bucket_dist(bk):
    return np.sqrt(embedding.DISTANCE_SQUARE[
        bk[:, :, None, :], bk[:, None, :, :]].sum(-1))


def test_leader_election_matches_reference(rng):
    """Device first-fit election == sequential hclust2 walk, many cases."""
    for trial in range(20):
        nb, b, l = 4, 12, 6
        bk = rng.integers(0, 20, size=(nb, b, l), dtype=np.int32)
        # duplicate some rows so distances of 0 occur
        bk[:, 5] = bk[:, 1]
        state = rng.integers(0, 2, size=(nb, b)).astype(np.uint8)
        valid = rng.random((nb, b)) > 0.2
        radius = float(rng.uniform(10, 40))
        d = _bucket_dist(bk)
        got = np.asarray(greedy._elect_device(
            jax.numpy.asarray(d, jax.numpy.float32),
            jax.numpy.asarray(state), jax.numpy.asarray(valid),
            jax.numpy.float32(radius)))
        for i in range(nb):
            want = greedy._elect_reference(d[i], state[i], valid[i], radius)
            np.testing.assert_array_equal(got[i], want, err_msg=f"t{trial} b{i}")


def test_cluster_greedy_device_matches_host(rng):
    km = _random_kmers(rng, 150, 8)
    # plant duplicates and near-duplicates to force absorption
    km[50:100] = km[:50]
    cfg = greedy.ClusterConfig(hash_k=8, hash_l=4, w=50.0, radius=20.0,
                               bucket_max=64, bucket_chunk=8)
    key = jax.random.key(0)
    r_dev = greedy.cluster_greedy(km, key, cfg, use_device=True)
    r_host = greedy.cluster_greedy(km, key, cfg, use_device=False)
    np.testing.assert_array_equal(r_dev.parent, r_host.parent)
    np.testing.assert_array_equal(r_dev.merged, r_host.merged)


def test_cluster_greedy_invariants(rng):
    km = _random_kmers(rng, 200, 8)
    km[100:150] = km[:50]  # exact duplicates must co-cluster
    cfg = greedy.ClusterConfig(hash_k=8, hash_l=8, w=50.0, radius=15.0,
                               bucket_max=128)
    res = greedy.cluster_greedy(km, jax.random.key(1), cfg)
    clusters = res.clusters()
    # every point appears exactly once
    all_ids = np.sort(np.concatenate(clusters))
    np.testing.assert_array_equal(all_ids, np.arange(200))
    # members are within radius of their head (greedy guarantee)
    for c in clusters:
        head = km[c[0]]
        for m in c[1:]:
            d = np.sqrt(embedding.DISTANCE_SQUARE[head, km[m]].sum())
            assert d <= cfg.radius + 1e-3
    # identical k-mers hash identically in every table, so each planted
    # duplicate pair must share a cluster (distance 0 <= radius)
    label = np.empty(200, np.int64)
    for cid, c in enumerate(clusters):
        label[c] = cid
    same = sum(int(label[i] == label[100 + i]) for i in range(50))
    assert same == 50


def test_cluster_centroid_runs(rng):
    km = _random_kmers(rng, 60, 6)
    km[30:] = km[:30]
    cfg = centroid.CentroidConfig(hash_k=8, hash_l=4, w=50.0, radius=30.0)
    members = centroid.cluster_centroid(km, jax.random.key(2), cfg)
    all_ids = np.sort(np.concatenate(members))
    np.testing.assert_array_equal(all_ids, np.arange(60))
    assert len(members) < 60  # something merged


def test_union_find():
    uf = union_find.UnionFind(6)
    uf.union_edges([0, 1, 3], [1, 2, 4])
    labels = uf.components()
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[5] == 5
    groups = uf.groups()
    sizes = sorted(len(g) for g in groups)
    assert sizes == [1, 2, 3]


def test_centroid_device_matches_numpy_oracle(rng):
    """The scanned device program == a straightforward numpy round loop
    (same hash draws injected), partition-equal."""
    import jax.numpy as jnp
    from hsearch_tpu.ops import segment as seg_ops

    n, l, rounds, k, w, radius = 64, 6, 5, 8, 50.0, 30.0
    km = rng.integers(0, 20, (n, l), dtype=np.int32)
    km[40:] = km[:24]                       # duplicates to force merges
    d = l * embedding.AA_DIM
    key = jax.random.PRNGKey(5)
    ka, kb = jax.random.split(key)
    a_all = np.asarray(jax.random.normal(ka, (rounds, d, k), jnp.float32))
    b_all = np.asarray(jax.random.uniform(kb, (rounds, k), jnp.float32,
                                          0.0, w))

    got = np.asarray(centroid._cluster_rounds(
        jnp.asarray(km), jnp.asarray(a_all), jnp.asarray(b_all),
        jnp.float32(w), jnp.float32(radius / 2), rounds, chunk=16))

    # numpy oracle with identical semantics
    pts = embedding.embed_kmers(km).astype(np.float32)
    label = np.arange(n)
    sums = pts.copy()
    counts = np.ones(n, np.float32)
    radii = np.zeros(n, np.float32)
    for r in range(rounds):
        alive = counts > 0
        cents = sums / np.maximum(counts, 1.0)[:, None]
        proj = cents @ a_all[r] + b_all[r]
        idx = np.floor(proj / w).astype(np.int32)
        code = np.asarray(seg_ops.pack_codes(jnp.asarray(idx)))
        code = np.where(alive, code, np.iinfo(np.int32).max)
        newid = np.arange(n)
        for c in np.unique(code[alive]):
            mem = np.nonzero(alive & (code == c))[0]
            bc = (cents[mem] * counts[mem, None]).sum(0) / counts[mem].sum()
            dist = np.sqrt(((cents[mem] - bc) ** 2).sum(-1))
            merged = mem[dist + radii[mem] <= radius / 2]
            if len(merged):
                newid[merged] = merged.min()
        label = newid[label]
        # recompute sums/counts directly from point labels (equivalent)
        sums = np.zeros((n, d), np.float32)
        cnt2 = np.zeros(n, np.float32)
        np.add.at(sums, label, pts)
        np.add.at(cnt2, label, 1.0)
        counts = cnt2
        cents2 = sums / np.maximum(counts, 1.0)[:, None]
        dd = np.sqrt(((pts - cents2[label]) ** 2).sum(-1))
        radii = np.zeros(n, np.float32)
        np.maximum.at(radii, label, dd.astype(np.float32))
    # compare partitions (labels up to renaming)
    def canon(lab):
        first = {}
        out = np.empty_like(lab)
        for i, v in enumerate(lab):
            out[i] = first.setdefault(int(v), len(first))
        return out
    np.testing.assert_array_equal(canon(got), canon(label))


def test_bucket_class_matrices_partition(rng):
    """Every active id appears exactly once across all class matrices;
    widths follow the pow-4 ladder; oversize buckets chunk into full
    rows + a remainder row; singletons and size-1 remainders drop."""
    from hsearch_tpu.cluster.greedy import (_bucket_class_matrices,
                                            _class_sizes, _slab_geometry,
                                            ClusterConfig)
    n = 3000
    # engineered code multiset: singleton, pairs, mid sizes, one mega
    # bucket of 600 (> bucket_max=256 -> 2 full rows + remainder 88),
    # and one of 257 (full row + remainder 1 -> dropped)
    sizes = [1, 2, 2, 3, 5, 17, 64, 65, 600, 257]
    codes = np.concatenate([np.full(s, i, np.int64)
                            for i, s in enumerate(sizes)])
    ids = np.arange(len(codes))
    mats = _bucket_class_matrices(codes, ids, 256, n)
    assert all(m.shape[1] in _class_sizes(256) for m, _ in mats)
    got = np.sort(np.concatenate([m[v] for m, v in mats]))
    # dropped: the singleton (1) and the size-1 remainder of 257
    keep = np.ones(len(codes), bool)
    keep[0] = False                      # the singleton bucket
    keep[sum(sizes[:9]) + 256:] = False  # 257's remainder member
    np.testing.assert_array_equal(got, ids[keep])
    # members of one bucket never share a row with another bucket's
    code_pad = np.concatenate([codes, [-1]])
    for m, v in mats:
        for r in range(m.shape[0]):
            row = m[r][v[r]]
            assert len(set(code_pad[row].tolist())) == 1
    # slab geometry: rows multiple of chunk, bounded shapes
    cfg = ClusterConfig()
    for c in _class_sizes(256):
        ck, s = _slab_geometry(c, 10, cfg)
        assert s % ck == 0 and s >= ck


def test_bucketize_device_matches_host(rng):
    """The device bucketizer builds byte-identical class layouts to
    _bucket_class_matrices (same engineered multiset: singletons,
    pairs, mid sizes, oversize chunking, dropped size-1 remainder) —
    including inactive points and id gaps."""
    import jax.numpy as jnp
    from hsearch_tpu.cluster.greedy import (_bucket_class_matrices,
                                            _bucketize_device,
                                            _class_caps, _class_sizes)
    sizes = [1, 2, 2, 3, 5, 17, 64, 65, 600, 257]
    codes_all = np.concatenate([np.full(s, 1000 + 7 * i, np.int32)
                                for i, s in enumerate(sizes)])
    rng.shuffle(codes_all)
    n = len(codes_all) + 37                  # trailing points, some inactive
    codes_all = np.concatenate([codes_all,
                                rng.integers(0, 5, 37).astype(np.int32)])
    active = rng.random(n) > 0.3
    host_mats = _bucket_class_matrices(codes_all[active],
                                       np.nonzero(active)[0], 256, n)
    arenas, rows = _bucketize_device(jnp.asarray(codes_all),
                                     jnp.asarray(active), 256,
                                     _class_caps(n, 256))
    rows = np.asarray(rows)
    classes = _class_sizes(256)
    by_width = {m.shape[1]: m for m, _ in host_mats}
    for ci, c in enumerate(classes):
        got = np.asarray(arenas[ci])[:int(rows[ci])]
        if c not in by_width:
            assert rows[ci] == 0
            continue
        np.testing.assert_array_equal(got, by_width[c])


def test_cluster_greedy_device_bucketize_three_way(rng):
    """device-bucketized == host-bucketized == numpy walk, on a corpus
    mixing duplicates, near-duplicates, and an oversize bucket."""
    km = _random_kmers(rng, 400, 8)
    km[100:200] = km[:100]
    km[200:320] = np.tile(km[5], (120, 1))   # oversize vs bucket_max=64
    cfg = greedy.ClusterConfig(hash_k=8, hash_l=4, w=50.0, radius=20.0,
                               bucket_max=64, bucket_chunk=8)
    key = jax.random.key(7)
    r_dev = greedy.cluster_greedy(km, key, cfg, host_bucketize=False)
    r_hb = greedy.cluster_greedy(km, key, cfg, host_bucketize=True)
    r_np = greedy.cluster_greedy(km, key, cfg, use_device=False)
    np.testing.assert_array_equal(r_dev.parent, r_hb.parent)
    np.testing.assert_array_equal(r_dev.merged, r_hb.merged)
    np.testing.assert_array_equal(r_dev.parent, r_np.parent)
    np.testing.assert_array_equal(r_dev.merged, r_np.merged)


def test_slab_geometry_fits_class_caps():
    """Every slab the dispatch loop can issue fits the static arena cap,
    including non-pow2 bucket_max (ck is then not naturally a power of
    two; unquantized it overshot the cap and failed the dynamic_slice
    at trace time — e.g. bucket_max=100, 30000 size-2 buckets)."""
    from hsearch_tpu.cluster.greedy import (_class_caps, _class_sizes,
                                            _slab_geometry, ClusterConfig)
    for bucket_max in (24, 64, 100, 256, 257):
        cfg = greedy.ClusterConfig(bucket_max=bucket_max)
        for n in (7, 1000, 60000, 1 << 20):
            caps = _class_caps(n, bucket_max)
            for cap, c in zip(caps, _class_sizes(bucket_max)):
                lo = max(c // 4, 1)
                worst = n // (lo + 1) + 1
                if c == bucket_max:
                    worst += n // bucket_max + 1
                for nrows in {1, 2, worst // 2, worst}:
                    if nrows < 1:
                        continue
                    ck, s_rows = _slab_geometry(c, nrows, cfg)
                    assert s_rows % ck == 0
                    assert s_rows <= cap, (bucket_max, n, c, nrows,
                                           ck, s_rows, cap)


def test_cluster_greedy_device_non_pow2_bucket_max(rng):
    """Device-resident path == host paths for a non-pow2 bucket_max and
    a pair-heavy corpus (the config that crashed the slab slicing)."""
    km = _random_kmers(rng, 300, 8)
    km[150:300] = km[:150]                   # 150 size-2 buckets
    cfg = greedy.ClusterConfig(hash_k=8, hash_l=3, w=50.0, radius=20.0,
                               bucket_max=100, bucket_chunk=8)
    key = jax.random.key(11)
    r_dev = greedy.cluster_greedy(km, key, cfg, host_bucketize=False)
    r_hb = greedy.cluster_greedy(km, key, cfg, host_bucketize=True)
    r_np = greedy.cluster_greedy(km, key, cfg, use_device=False)
    np.testing.assert_array_equal(r_dev.parent, r_hb.parent)
    np.testing.assert_array_equal(r_dev.merged, r_hb.merged)
    np.testing.assert_array_equal(r_dev.parent, r_np.parent)
    np.testing.assert_array_equal(r_dev.merged, r_np.merged)


def test_cluster_greedy_oversize_bucket(rng):
    """All-identical k-mers (one bucket >> bucket_max) cluster without
    blowup and every point lands within radius of its head."""
    km = np.tile(rng.integers(0, 20, (1, 8), dtype=np.int32), (700, 1))
    cfg = greedy.ClusterConfig(hash_k=8, hash_l=2, w=50.0, radius=20.0,
                               bucket_max=64)
    res = greedy.cluster_greedy(km, jax.random.key(3), cfg)
    clusters = res.clusters()
    all_ids = np.sort(np.concatenate(clusters))
    np.testing.assert_array_equal(all_ids, np.arange(700))
    # identical points: each padded row absorbs into its first member,
    # so cluster count == ceil(700 / bucket_max) after round 1 merges
    assert len(clusters) <= -(-700 // 64) + 1


def test_decode_all_matches_decode(rng):
    from hsearch_tpu.core import alphabet
    km = rng.integers(0, 22, (50, 9)).astype(np.int64)  # incl. INVALID>=20
    strs = alphabet.decode_all(km)
    for i in range(50):
        assert strs[i] == alphabet.decode(km[i])


def test_merge_by_center_distance(rng):
    """Two fragments of one tight family merge; a far cluster stays.

    The oracle is the transitive closure over exact center-center
    distances (hclust v1's merge criterion, hclust.cpp:186-235)."""
    from hsearch_tpu.cluster import postprocess
    from hsearch_tpu.ops import distance as dist_ops
    import jax.numpy as jnp

    base = rng.integers(0, 20, (1, 12), dtype=np.int32)
    near = base.copy()
    near[0, 0] = (near[0, 0] + 1) % 20          # one substitution
    far = rng.integers(0, 20, (1, 12), dtype=np.int32)
    km = np.concatenate([np.tile(base, (4, 1)), np.tile(near, (4, 1)),
                         np.tile(far, (4, 1))])
    labels = np.repeat([0, 4, 8], 4)             # three center-labeled
    emb = embedding.embed_kmers(km[[0, 4, 8]])
    d = np.sqrt(np.asarray(dist_ops.sq_distance_matrix(
        jnp.asarray(emb), jnp.asarray(emb))).clip(0))
    r = (d[0, 1] + d[0, 2]) / 2                  # splits near from far
    merged = postprocess.merge_by_center_distance(
        km, labels, r, jax.random.key(0))
    assert (merged[:8] == 0).all()               # fragments unify
    assert (merged[8:] == 8).all()               # far cluster untouched


def test_merge_by_center_distance_single_cluster(rng):
    from hsearch_tpu.cluster import postprocess
    km = rng.integers(0, 20, (6, 8), dtype=np.int32)
    labels = np.zeros(6, np.int64)
    out = postprocess.merge_by_center_distance(
        km, labels, 10.0, jax.random.key(0))
    np.testing.assert_array_equal(out, labels)
