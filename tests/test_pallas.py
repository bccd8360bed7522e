"""Pallas association-aggregation kernel vs the XLA reference op.

Runs in interpreter mode on CPU; the same kernel compiles for TPU (benchmarked
in bench.py when a chip is present).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpmatch_tpu.ops.assoc import assoc_matvec
from fpmatch_tpu.kernels.assoc_pallas import assoc_matvec_pallas


def _rand_edges(rng, n, e):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    return src, dst


@pytest.mark.parametrize("transpose", [False, True])
def test_pallas_matches_xla(rng, transpose):
    n1 = n2 = 16
    e1 = e2 = 64
    c = 8
    src1, dst1 = _rand_edges(rng, n1, e1)
    src2, dst2 = _rand_edges(rng, n2, e2)
    X = jnp.asarray(rng.normal(size=(n1, n2, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(e1, e2)).astype(np.float32))

    want = assoc_matvec(X, Kp, Ke, src1, dst1, src2, dst2,
                        transpose=transpose)
    got = assoc_matvec_pallas(X, Kp, Ke, jnp.asarray(src1),
                              jnp.asarray(dst1), jnp.asarray(src2),
                              jnp.asarray(dst2), transpose=transpose,
                              block_e1=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pallas_padded_edges_inert(rng):
    n = 12
    e_valid, e_pad = 40, 24
    src1, dst1 = _rand_edges(rng, n, e_valid)
    src2, dst2 = _rand_edges(rng, n, e_valid)
    X = jnp.asarray(rng.normal(size=(n, n, 4)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = np.zeros((e_valid + e_pad, e_valid + e_pad), np.float32)
    Ke[:e_valid, :e_valid] = rng.normal(size=(e_valid, e_valid))
    pad = np.zeros(e_pad, np.int32)
    s1p = np.concatenate([src1, pad])
    d1p = np.concatenate([dst1, pad])
    s2p = np.concatenate([src2, pad])
    d2p = np.concatenate([dst2, pad])

    want = assoc_matvec(X, Kp, jnp.asarray(Ke[:e_valid, :e_valid]),
                        src1, dst1, src2, dst2)
    got = assoc_matvec_pallas(X, Kp, jnp.asarray(Ke), jnp.asarray(s1p),
                              jnp.asarray(d1p), jnp.asarray(s2p),
                              jnp.asarray(d2p), block_e1=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("transpose", [False, True])
def test_pallas_large_matches_xla(rng, transpose):
    from fpmatch_tpu.kernels.assoc_pallas import assoc_matvec_pallas_large

    n1 = n2 = 16
    e1 = e2 = 64
    c = 5   # odd: exercises channel padding
    src1, dst1 = _rand_edges(rng, n1, e1)
    src2, dst2 = _rand_edges(rng, n2, e2)
    X = jnp.asarray(rng.normal(size=(n1, n2, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(e1, e2)).astype(np.float32))

    want = assoc_matvec(X, Kp, Ke, src1, dst1, src2, dst2,
                        transpose=transpose)
    got = assoc_matvec_pallas_large(
        X, Kp, Ke, jnp.asarray(src1), jnp.asarray(dst1), jnp.asarray(src2),
        jnp.asarray(dst2), transpose=transpose, block_e1=32, block_e2=16,
        block_c=2, precision="highest", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
