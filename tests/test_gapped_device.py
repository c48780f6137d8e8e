"""Device banded-gapped scorer vs the native traceback aligner."""

import numpy as np
import pytest

import jax.numpy as jnp

from hsearch_tpu import native_ext
from hsearch_tpu.align import extend, gapped_device
from hsearch_tpu.core import blosum


def _sub21():
    s = np.full((21, 21), extend.NEGSCORE, np.int32)
    s[:20, :20] = blosum.BLOSUM62
    return s


def _pairs(rng, n_pairs, lmax=90, related=True):
    qs, ds = [], []
    for _ in range(n_pairs):
        lq = int(rng.integers(12, lmax))
        q = rng.integers(0, 20, lq, dtype=np.int32)
        if related:
            d = q.copy()
            # substitutions + an indel to exercise gap paths
            nmut = int(rng.integers(0, max(1, lq // 6)))
            pos = rng.integers(0, lq, nmut)
            d[pos] = rng.integers(0, 20, nmut)
            if lq > 20 and rng.random() < 0.7:
                cut = int(rng.integers(5, lq - 5))
                gap = int(rng.integers(1, 4))
                d = np.concatenate([d[:cut], d[cut + gap:]])
        else:
            d = rng.integers(0, 20, int(rng.integers(12, lmax)),
                             dtype=np.int32)
        qs.append(q)
        ds.append(d)
    return qs, ds


def _batch(qs, ds):
    lq = max(len(x) for x in qs)
    ld = max(len(x) for x in ds)
    q = np.full((len(qs), lq), 20, np.int32)
    d = np.full((len(ds), ld), 20, np.int32)
    for i, (a, b) in enumerate(zip(qs, ds)):
        q[i, :len(a)] = a
        d[i, :len(b)] = b
    return (q, np.asarray([len(x) for x in qs], np.int32),
            d, np.asarray([len(x) for x in ds], np.int32))


@pytest.mark.parametrize("drop", [1 << 20, 30])
def test_matches_native_scores(rng, drop):
    if not native_ext.available():
        native_ext.build()
    if not native_ext.available():
        pytest.skip("native ext unavailable")
    sub = _sub21()
    band = 16
    qs, ds = _pairs(rng, 24)
    q, qlen, d, dlen = _batch(qs, ds)
    score, qe, de = gapped_device.banded_scores(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(d),
        jnp.asarray(dlen), jnp.asarray(sub), 11, 1, drop, band)
    score, qe, de = np.asarray(score), np.asarray(qe), np.asarray(de)
    for i, (a, b) in enumerate(zip(qs, ds)):
        res = native_ext.align_gapped(a, b, sub, 11, 1, drop, band)
        assert res is not None
        ns, ops, e1, e2 = res
        assert score[i] == ns, f"pair {i}: {score[i]} != native {ns}"
        if ns > 0:
            assert (qe[i], de[i]) == (e1, e2), f"pair {i} extents"


def test_unrelated_pairs_low_scores(rng):
    sub = _sub21()
    qs, ds = _pairs(rng, 8, related=False)
    q, qlen, d, dlen = _batch(qs, ds)
    score, _, _ = gapped_device.banded_scores(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(d),
        jnp.asarray(dlen), jnp.asarray(sub), 11, 1, 1 << 20, 16)
    rel_qs, rel_ds = _pairs(rng, 8, related=True)
    q2, ql2, d2, dl2 = _batch(rel_qs, rel_ds)
    s2, _, _ = gapped_device.banded_scores(
        jnp.asarray(q2), jnp.asarray(ql2), jnp.asarray(d2),
        jnp.asarray(dl2), jnp.asarray(sub), 11, 1, 1 << 20, 16)
    assert np.median(np.asarray(s2)) > np.median(np.asarray(score))
