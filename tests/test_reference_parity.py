"""End-to-end parity against the REAL reference binaries.

Builds the reference's hclust tools (vendored smithlab_cpp, plain make)
and checks that our engines produce the identical hit set — the
"bit-identical hit sets on clean inputs" gate of BASELINE.md.  Skipped
when the reference tree is not present.

Only deterministic reference paths are compared: motif_both_points_noLSH
(pure double-precision loops).  The LSH/clustering binaries seed from
random_device per run (lsh.hpp:19-20) and cannot be reproduced even by
the reference itself.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from hsearch_tpu.core import alphabet, embedding, io as hio
from hsearch_tpu.search import exact

REF = "/root/reference"
BUILD = "/tmp/refbuild"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="session")
def ref_bin():
    exe = os.path.join(BUILD, "hclust/src/hclust/motif_both_points_noLSH")
    if not os.path.exists(exe):
        if not os.path.isdir(BUILD):
            shutil.copytree(REF, BUILD)
        r = subprocess.run(["make", "-C", os.path.join(BUILD, "hclust")],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(exe):
            pytest.skip("reference build failed")
    return exe


def test_exact_hits_match_reference_binary(tmp_path, rng, ref_bin):
    l = 10
    n, c = 400, 6
    db = rng.integers(0, 20, (n, l), dtype=np.int32)
    centers = rng.integers(0, 20, (c, l), dtype=np.int32)
    # plant near neighbors so the hit set is non-trivial
    for i in range(c):
        for j in range(4):
            row = centers[i].copy()
            row[rng.integers(0, l)] = rng.integers(0, 20)
            db[i * 4 + j] = row
    radius = 30.0

    # write both sides the reference's data-point text format
    kfile = str(tmp_path / "kmers.txt")
    cfile = str(tmp_path / "centers.txt")
    hio.write_datapoints(kfile, [f"k{i}" for i in range(n)],
                         embedding.embed_kmers(db), fmt="%.9g")
    hio.write_datapoints(cfile, [f"c{i}" for i in range(c)],
                         embedding.embed_kmers(centers), fmt="%.9g")
    out = str(tmp_path / "ref_hits.txt")
    r = subprocess.run([ref_bin, "-d", kfile, "-c", cfile, "-l", str(l),
                        "-T", str(radius), "-o", out],
                       capture_output=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr.decode()[:500]
    ref_hits = {}
    for cn, kn, d in hio.read_triples(out):
        ref_hits[(cn, kn)] = d

    ci, ki, dd = exact.search_radius(db, centers, radius)
    ours = {(f"c{a}", f"k{b}"): d for a, b, d in zip(ci, ki, dd)}

    assert set(ours) == set(ref_hits)        # identical hit set
    for k in ours:
        assert abs(ours[k] - ref_hits[k]) < 1e-3, (k, ours[k], ref_hits[k])
    # misses file covers the complement
    misses = sum(1 for _ in open(out + "notlessthan.txt"))
    assert misses == n * c - len(ref_hits)


def test_ivf_hits_match_reference_binary(tmp_path, rng, ref_bin):
    import jax
    from hsearch_tpu.search import ivf
    l, n, c = 10, 512, 4
    db = rng.integers(0, 20, (n, l), dtype=np.int32)
    centers = db[rng.choice(n, c, replace=False)].copy()
    radius = 28.0
    kfile = str(tmp_path / "kmers.txt")
    cfile = str(tmp_path / "centers.txt")
    hio.write_datapoints(kfile, [f"k{i}" for i in range(n)],
                         embedding.embed_kmers(db), fmt="%.9g")
    hio.write_datapoints(cfile, [f"c{i}" for i in range(c)],
                         embedding.embed_kmers(centers), fmt="%.9g")
    out = str(tmp_path / "ref_hits.txt")
    subprocess.run([ref_bin, "-d", kfile, "-c", cfile, "-l", str(l),
                    "-T", str(radius), "-o", out],
                   capture_output=True, cwd=str(tmp_path), check=True)
    ref_pairs = {(cn, kn) for cn, kn, _ in hio.read_triples(out)}

    idx = ivf.build_index(db, jax.random.PRNGKey(0), block_size=32)
    ci, ki, dd = ivf.search(idx, centers, radius, k_blocks=idx.num_blocks,
                            max_hits=1024)
    ours = {(f"c{a}", f"k{b}") for a, b in zip(ci, ki)}
    assert ours == ref_pairs
