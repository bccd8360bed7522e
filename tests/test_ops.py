"""Numerical unit tests for the masked fixed-shape ops against dense numpy
references (the framework's replacement for the reference repo's missing test
suite — SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpmatch_tpu.ops.sinkhorn import sinkhorn, sinkhorn_batch
from fpmatch_tpu.ops.soft_topk import soft_topk, greedy_perm
from fpmatch_tpu.ops.assoc import (assoc_matvec, assoc_dense, assoc_degree,
                                   assoc_aggregate_mean)
from fpmatch_tpu.ops.feature_align import feature_align
from fpmatch_tpu.ops.spline import spline_basis, spline_conv
from fpmatch_tpu.ops.hungarian import hungarian

from reference_impls import (np_sinkhorn, np_soft_topk, np_greedy_perm,
                             np_assoc_K, np_bilinear_sample)


# ---------------------------------------------------------------- sinkhorn

@pytest.mark.parametrize("n1,n2", [(5, 5), (4, 7), (7, 4), (1, 3)])
def test_sinkhorn_matches_dense_reference(rng, n1, n2):
    S1, S2 = 8, 9
    s = rng.normal(size=(S1, S2)).astype(np.float32)
    got = np.asarray(sinkhorn(jnp.asarray(s), n1, n2, tau=0.1, max_iter=10))
    want = np_sinkhorn(s, n1, n2, tau=0.1, max_iter=10)
    np.testing.assert_allclose(got[:n1, :n2], want, rtol=1e-3, atol=1e-5)
    # padded region must be exactly zero
    assert np.all(got[n1:] == 0) and np.all(got[:, n2:] == 0)


def test_sinkhorn_doubly_stochastic(rng):
    n = 6
    s = rng.normal(size=(8, 8)).astype(np.float32)
    out = np.asarray(sinkhorn(jnp.asarray(s), n, n, tau=0.05, max_iter=40))
    # columns are normalized last → exact; rows converge geometrically
    np.testing.assert_allclose(out[:n, :n].sum(0), 1.0, atol=1e-4)
    np.testing.assert_allclose(out[:n, :n].sum(1), 1.0, atol=2e-2)


def test_sinkhorn_batch_vmap(rng):
    # mixed orientations on the SQUARE pad (the transpose fast path:
    # flipped problems transpose once instead of dual-axis normalizing)
    B, S = 4, 8
    s = rng.normal(size=(B, S, S)).astype(np.float32)
    n1 = np.array([5, 8, 3, 7], np.int32)
    n2 = np.array([7, 8, 3, 4], np.int32)
    out = np.asarray(sinkhorn_batch(jnp.asarray(s), jnp.asarray(n1),
                                    jnp.asarray(n2), tau=0.2))
    for b in range(B):
        want = np_sinkhorn(s[b], n1[b], n2[b], tau=0.2)
        np.testing.assert_allclose(out[b, :n1[b], :n2[b]], want,
                                   rtol=1e-3, atol=1e-5)


def test_sinkhorn_grad_finite(rng):
    s = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))

    def loss(x):
        return jnp.sum(sinkhorn(x, 5, 5, tau=0.1) ** 2)

    g = jax.grad(loss)(s)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- soft topk

@pytest.mark.parametrize("n1,n2,k", [(5, 5, 3.0), (4, 6, 2.0), (6, 4, 4.0)])
def test_soft_topk_matches_reference(rng, n1, n2, k):
    S1, S2 = 8, 8
    s = rng.uniform(size=(S1, S2)).astype(np.float32)
    got = np.asarray(soft_topk(jnp.asarray(s), k, n1, n2, tau=0.05,
                               max_iter=10, extra_iter=6))
    want = np_soft_topk(s, k, n1, n2, tau=0.05, max_iter=10, extra_cap=6)
    np.testing.assert_allclose(got[:n1, :n2], want, rtol=1e-3, atol=2e-4)


def test_soft_topk_mass(rng):
    n = 6
    s = rng.uniform(size=(8, 8)).astype(np.float32)
    k = 3.0
    out = np.asarray(soft_topk(jnp.asarray(s), k, n, n, tau=0.05,
                               max_iter=40, extra_iter=0))
    np.testing.assert_allclose(out.sum(), k, atol=0.05)


def test_soft_topk_k_zero(rng):
    s = rng.uniform(size=(8, 8)).astype(np.float32)
    out = np.asarray(soft_topk(jnp.asarray(s), 0.0, 5, 5, tau=0.05))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out.sum(), 0.0, atol=1e-5)


def test_soft_topk_grad_finite(rng):
    s = jnp.asarray(rng.uniform(size=(8, 8)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(soft_topk(x, 3.0, 6, 6, tau=0.05)))(s)
    assert np.all(np.isfinite(np.asarray(g)))


def test_greedy_perm(rng):
    s = rng.uniform(size=(8, 8)).astype(np.float32)
    n1, n2, k = 6, 7, 4.0
    got = np.asarray(greedy_perm(jnp.asarray(s), k, n1, n2))
    want = np_greedy_perm(s, k, n1, n2)
    np.testing.assert_array_equal(got[:n1, :n2], want)
    assert got.sum() == round(k)
    assert got[:n1, :n2].max(0).sum() == round(k)  # unique columns


# ---------------------------------------------------------------- assoc ops

def _rand_graph(rng, n, density=0.4):
    A = (rng.uniform(size=(n, n)) < density).astype(np.float32)
    np.fill_diagonal(A, 0)
    A = np.maximum(A, A.T)
    src, dst = np.nonzero(A)
    return src.astype(np.int32), dst.astype(np.int32)


def test_assoc_dense_matches_scipy_kron(rng):
    n1, n2 = 4, 5
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)
    got = np.asarray(assoc_dense(jnp.asarray(Kp), jnp.asarray(Ke),
                                 jnp.asarray(src1), jnp.asarray(dst1),
                                 jnp.asarray(src2), jnp.asarray(dst2), n1, n2))
    want = np_assoc_K(Kp, Ke, src1, dst1, src2, dst2, n1, n2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("transpose", [False, True])
def test_assoc_matvec_matches_dense(rng, transpose):
    n1, n2, c = 4, 5, 3
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)

    got = np.asarray(assoc_matvec(jnp.asarray(X), jnp.asarray(Kp),
                                  jnp.asarray(Ke),
                                  jnp.asarray(src1), jnp.asarray(dst1),
                                  jnp.asarray(src2), jnp.asarray(dst2),
                                  transpose=transpose))
    K = np_assoc_K(Kp, Ke, src1, dst1, src2, dst2, n1, n2)
    if transpose:
        K = K.T
    # vec is column-major: vec(X)[i2*n1+i1] = X[i1,i2]
    for ch in range(c):
        vx = X[:, :, ch].T.reshape(-1)
        want = (K @ vx).reshape(n2, n1).T
        np.testing.assert_allclose(got[:, :, ch], want, rtol=1e-4, atol=1e-5)


def test_assoc_matvec_padded_edges_are_inert(rng):
    """Padded edge slots (masked, Ke=0) must not change the result."""
    n1, n2, c = 4, 4, 2
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    e1, e2 = len(src1), len(src2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(e1, e2)).astype(np.float32)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)

    base = np.asarray(assoc_matvec(jnp.asarray(X), jnp.asarray(Kp),
                                   jnp.asarray(Ke), jnp.asarray(src1),
                                   jnp.asarray(dst1), jnp.asarray(src2),
                                   jnp.asarray(dst2)))
    # pad edges pointing at node 0 with zero affinity rows/cols
    src1p = np.concatenate([src1, np.zeros(3, np.int32)])
    dst1p = np.concatenate([dst1, np.zeros(3, np.int32)])
    src2p = np.concatenate([src2, np.zeros(2, np.int32)])
    dst2p = np.concatenate([dst2, np.zeros(2, np.int32)])
    Kep = np.zeros((e1 + 3, e2 + 2), np.float32)
    Kep[:e1, :e2] = Ke
    padded = np.asarray(assoc_matvec(jnp.asarray(X), jnp.asarray(Kp),
                                     jnp.asarray(Kep), jnp.asarray(src1p),
                                     jnp.asarray(dst1p), jnp.asarray(src2p),
                                     jnp.asarray(dst2p)))
    np.testing.assert_allclose(base, padded, rtol=1e-5, atol=1e-6)


def test_assoc_degree(rng):
    n1, n2 = 4, 5
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    e1m = np.ones(len(src1), bool)
    e2m = np.ones(len(src2), bool)
    Kp_present = np.ones((n1, n2), np.float32)
    deg = np.asarray(assoc_degree(jnp.asarray(Kp_present), jnp.asarray(e1m),
                                  jnp.asarray(e2m), jnp.asarray(src1),
                                  jnp.asarray(dst1), jnp.asarray(src2),
                                  jnp.asarray(dst2), n1, n2, transpose=True))
    # count nnz per column of K (row of K^T): edges with src-pair == (i1,i2)
    K = np_assoc_K(Kp_present * 0 + 1,
                   np.ones((len(src1), len(src2)), np.float32),
                   src1, dst1, src2, dst2, n1, n2)
    # count entries, not values: rebuild counting matrix
    cnt = np.zeros((n1 * n2, n1 * n2))
    for a in range(len(src1)):
        for b in range(len(src2)):
            cnt[src2[b] * n1 + src1[a], dst2[b] * n1 + dst1[a]] += 1
    cnt += np.eye(n1 * n2)
    want = cnt.sum(1).reshape(n2, n1).T  # row nnz of K^T = col nnz of K...
    # deg computed with transpose=True counts entries whose *src* pair == node
    np.testing.assert_allclose(deg, want, rtol=1e-6)


def test_assoc_aggregate_mean_matches_torch_sparse_semantics(rng):
    """(Kᵀ·x)/rownnz(Kᵀ) == torch_sparse matmul(adj.t(), x, reduce='mean')."""
    n1, n2, c = 3, 4, 2
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    got = np.asarray(assoc_aggregate_mean(
        jnp.asarray(X), jnp.asarray(Kp), jnp.asarray(Ke),
        jnp.asarray(src1), jnp.asarray(dst1), jnp.asarray(src2),
        jnp.asarray(dst2), jnp.asarray(np.ones((n1, n2), np.float32)),
        jnp.asarray(np.ones(len(src1), bool)),
        jnp.asarray(np.ones(len(src2), bool))))
    K = np_assoc_K(Kp, Ke, src1, dst1, src2, dst2, n1, n2)
    cnt = np.zeros_like(K)
    for a in range(len(src1)):
        for b in range(len(src2)):
            cnt[src2[b] * n1 + src1[a], dst2[b] * n1 + dst1[a]] += 1
    cnt += np.eye(n1 * n2)
    for ch in range(c):
        vx = X[:, :, ch].T.reshape(-1)
        want = (K.T @ vx) / np.maximum(cnt.T.sum(1), 1.0)
        np.testing.assert_allclose(got[:, :, ch].T.reshape(-1), want,
                                   rtol=1e-4, atol=1e-5)


def test_assoc_tri_matvec_matches_loop_reference(rng):
    """Third-order hyperedge propagation vs a direct numpy loop."""
    from fpmatch_tpu.ops.assoc import assoc_tri_matvec

    n1, n2, c, t1, t2 = 7, 6, 3, 5, 4
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    Kt = rng.normal(size=(t1, t2)).astype(np.float32)
    tri1 = rng.integers(0, n1, size=(t1, 3)).astype(np.int32)
    tri2 = rng.integers(0, n2, size=(t2, 3)).astype(np.int32)

    want = np.zeros_like(X)
    for a in range(t1):
        for b in range(t2):
            for r in range(3):
                i, j = tri1[a, r], tri2[b, r]
                i2_, j2_ = tri1[a, (r + 1) % 3], tri2[b, (r + 1) % 3]
                i3_, j3_ = tri1[a, (r + 2) % 3], tri2[b, (r + 2) % 3]
                want[i, j] += Kt[a, b] * 0.5 * (X[i2_, j2_] + X[i3_, j3_])

    got = np.asarray(assoc_tri_matvec(jnp.asarray(X), jnp.asarray(Kt),
                                      jnp.asarray(tri1), jnp.asarray(tri2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_assoc_tri_padded_slots_inert(rng):
    """Padded triangle slots (Kt == 0) must not perturb the result, and the
    degree normalizer must count only real triangles."""
    from fpmatch_tpu.ops.assoc import assoc_tri_degree, assoc_tri_matvec

    n1, n2, c, t1, t2 = 6, 6, 2, 4, 3
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    Kt = rng.normal(size=(t1, t2)).astype(np.float32)
    tri1 = rng.integers(0, n1, size=(t1, 3)).astype(np.int32)
    tri2 = rng.integers(0, n2, size=(t2, 3)).astype(np.int32)
    base = np.asarray(assoc_tri_matvec(jnp.asarray(X), jnp.asarray(Kt),
                                       jnp.asarray(tri1), jnp.asarray(tri2)))

    KtP = np.zeros((t1 + 2, t2 + 1), np.float32)
    KtP[:t1, :t2] = Kt
    tri1P = np.concatenate([tri1, np.zeros((2, 3), np.int32)])
    tri2P = np.concatenate([tri2, np.zeros((1, 3), np.int32)])
    padded = np.asarray(assoc_tri_matvec(
        jnp.asarray(X), jnp.asarray(KtP), jnp.asarray(tri1P),
        jnp.asarray(tri2P)))
    np.testing.assert_allclose(padded, base, rtol=1e-5, atol=1e-6)

    m1 = np.concatenate([np.ones(t1), np.zeros(2)]).astype(np.float32)
    m2 = np.concatenate([np.ones(t2), np.zeros(1)]).astype(np.float32)
    deg = np.asarray(assoc_tri_degree(jnp.asarray(m1), jnp.asarray(m2),
                                      jnp.asarray(tri1P), jnp.asarray(tri2P),
                                      n1, n2))
    degw = np.zeros((n1, n2), np.float32)
    for r in range(3):
        for a in range(t1):
            for b in range(t2):
                degw[tri1[a, r], tri2[b, r]] += 1
    np.testing.assert_allclose(deg, degw)


def test_assoc_matvec_grad_is_bilinear_diag(rng):
    """AD through the factorized matvec must equal the dense-K gradient — the
    replacement for the reference's hand-written bilinear_diag CUDA backward
    (src/extension/bilinear_diag/*, factorize_graph_matching.py:169-186)."""
    n1 = n2 = 3
    src1, dst1 = _rand_graph(rng, n1, density=0.6)
    src2, dst2 = _rand_graph(rng, n2, density=0.6)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)
    X = rng.normal(size=(n1, n2, 2)).astype(np.float32)
    G = rng.normal(size=(n1, n2, 2)).astype(np.float32)  # upstream cotangent

    def f(ke):
        y = assoc_matvec(jnp.asarray(X), jnp.asarray(Kp), ke,
                         jnp.asarray(src1), jnp.asarray(dst1),
                         jnp.asarray(src2), jnp.asarray(dst2))
        return jnp.sum(y * jnp.asarray(G))

    dKe = np.asarray(jax.grad(f)(jnp.asarray(Ke)))

    # finite-difference check
    eps = 1e-3
    for _ in range(5):
        a = rng.integers(len(src1)); b = rng.integers(len(src2))
        Kp_, Ke_p, Ke_m = Kp, Ke.copy(), Ke.copy()
        Ke_p[a, b] += eps; Ke_m[a, b] -= eps
        fp = float(f(jnp.asarray(Ke_p))); fm = float(f(jnp.asarray(Ke_m)))
        np.testing.assert_allclose(dKe[a, b], (fp - fm) / (2 * eps),
                                   rtol=1e-2, atol=1e-3)


# ---------------------------------------------------------------- alignment

def test_feature_align_matches_numpy(rng):
    H, W, C = 15, 20, 4
    feat = rng.normal(size=(H, W, C)).astype(np.float32)
    pts = rng.uniform(low=[5, 5], high=[315, 235], size=(10, 2)).astype(np.float32)
    got = np.asarray(feature_align(jnp.asarray(feat), jnp.asarray(pts),
                                   (320, 240)))
    want = np_bilinear_sample(feat, pts, (320, 240))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- spline

def test_spline_basis_partition_of_unity(rng):
    u = rng.uniform(size=(32, 2)).astype(np.float32)
    b = np.asarray(spline_basis(jnp.asarray(u), 5))
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)
    assert (b >= 0).all()
    # at most 4 non-zeros for dim=2, degree=1
    assert (np.sort(b, axis=-1)[:, :-4] < 1e-6).all()


def test_spline_conv_shapes_and_masking(rng):
    N, E, Cin, Cout, K = 6, 10, 8, 8, 25
    x = rng.normal(size=(N, Cin)).astype(np.float32)
    src = rng.integers(0, 4, size=E).astype(np.int32)
    dst = rng.integers(0, 4, size=E).astype(np.int32)
    attr = rng.uniform(size=(E, 2)).astype(np.float32)
    w = rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1
    wr = rng.normal(size=(Cin, Cout)).astype(np.float32) * 0.1
    b = np.zeros(Cout, np.float32)
    emask = np.arange(E) < 7
    nmask = np.arange(N) < 4
    out = np.asarray(spline_conv(jnp.asarray(x), jnp.asarray(src),
                                 jnp.asarray(dst), jnp.asarray(attr),
                                 jnp.asarray(w), jnp.asarray(wr),
                                 jnp.asarray(b), jnp.asarray(emask),
                                 jnp.asarray(nmask)))
    assert out.shape == (N, Cout)
    assert np.all(out[4:] == 0)          # masked nodes zeroed
    assert np.all(np.isfinite(out))


def test_spline_conv_tap_form_matches_dense_basis(rng):
    """The 2-D tap-form (4 indexed gathers/edge) must equal the dense
    spline_basis contraction EXACTLY in kernel-cell order — checkpoints
    bind the kernel-bank flattening (regression: the first tap-form cut
    transposed it, applying kernels at flipped pseudo-coords)."""
    N, E, Cin, Cout, K = 6, 12, 8, 8, 25
    x = rng.normal(size=(N, Cin)).astype(np.float32)
    src = rng.integers(0, N, size=E).astype(np.int32)
    attr = rng.uniform(size=(E, 2)).astype(np.float32)
    w = rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1
    emask = (np.arange(E) < E - 2).astype(np.float32)
    basis = np.asarray(spline_basis(jnp.asarray(attr), 5)) * emask[:, None]
    want = np.einsum("es,ei,sio->eo", basis, x[src], w)

    # drive the tap path through spline_conv with aggr="add", dst=arange
    # (one edge per output row) and zero root/bias so out rows == messages
    dst = np.arange(E, dtype=np.int32) % N
    out = np.asarray(spline_conv(
        jnp.asarray(np.zeros((N, Cin), np.float32) + x), jnp.asarray(src),
        jnp.asarray(dst), jnp.asarray(attr), jnp.asarray(w),
        jnp.zeros((Cin, Cout)), jnp.zeros(Cout),
        jnp.asarray(emask), jnp.ones(N), aggr="add"))
    want_agg = np.zeros((N, Cout), np.float32)
    np.add.at(want_agg, dst, want)
    np.testing.assert_allclose(out, want_agg, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------- hungarian

def test_hungarian(rng):
    B, S = 2, 6
    s = rng.uniform(size=(B, S, S)).astype(np.float32)
    n1 = np.array([4, 6], np.int32)
    n2 = np.array([5, 6], np.int32)
    out = np.asarray(hungarian(jnp.asarray(s), jnp.asarray(n1), jnp.asarray(n2)))
    from scipy.optimize import linear_sum_assignment
    for b in range(B):
        r, c = linear_sum_assignment(-s[b, :n1[b], :n2[b]])
        want = np.zeros((S, S), np.float32)
        want[r, c] = 1
        np.testing.assert_array_equal(out[b], want)


def test_hyperedge_angle_attrs_grad_finite_on_padded(rng):
    """Padded triangles alias node 0 (zero difference vectors); the norm
    gradient at 0 must not leak NaN through the masked slots (regression:
    first hyperedge train step after init went NaN, 2026-08-19)."""
    from fpmatch_tpu.ops.spline import hyperedge_angle_attrs
    x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    tri = jnp.asarray(np.array([[0, 1, 2], [0, 0, 0], [0, 0, 0]], np.int32))
    mask = jnp.asarray(np.array([True, False, False]))
    g = jax.grad(lambda x: hyperedge_angle_attrs(x, tri, mask).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_hyperedge_angle_attrs(rng):
    from fpmatch_tpu.ops.spline import hyperedge_angle_attrs
    x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    tri = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5], [0, 0, 0]], np.int32))
    mask = jnp.asarray(np.array([True, True, False]))
    out = np.asarray(hyperedge_angle_attrs(x, tri, mask))
    assert out.shape == (3, 3)
    assert np.all(np.abs(out[:2]) <= 1.0 + 1e-5)
    assert np.all(out[2] == 0)
    # parity with direct cosine computation
    a, b, c = np.asarray(x)[[0, 1, 2]]
    v01, v02 = a - b, a - c
    want = np.dot(v01, v02) / (np.linalg.norm(v01) * np.linalg.norm(v02))
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-5)


def test_qap_power_sinkhorn_recovers_planted_permutation(rng):
    """Planted QAP: Kp/Ke from a known permutation — the power iteration must
    recover it (greedy-discretized) on the valid block."""
    from fpmatch_tpu.ops.qap import qap_power_sinkhorn, qap_objective
    from fpmatch_tpu.ops.soft_topk import greedy_perm

    n = 8
    perm = rng.permutation(n)
    src1, dst1 = _rand_graph(rng, n, density=0.5)
    src2, dst2 = perm[src1].astype(np.int32), perm[dst1].astype(np.int32)
    # node affinity high on the planted matches X[i, perm[i]] = 1 — the
    # one-hot row matrix is eye[perm] (eye[:, perm] would be the transpose)
    Kp = (np.eye(n)[perm] + 0.05 * rng.uniform(size=(n, n))).astype(np.float32)
    Ke = np.ones((len(src1), len(src2)), np.float32)

    x = qap_power_sinkhorn(jnp.asarray(Kp), jnp.asarray(Ke),
                           jnp.asarray(src1), jnp.asarray(dst1),
                           jnp.asarray(src2), jnp.asarray(dst2), n, n,
                           iters=30, tau=0.05)
    hard = np.asarray(greedy_perm(x, float(n), n, n))
    acc = hard[np.arange(n), perm].sum() / n
    assert acc >= 0.9, (acc, hard)
    obj = float(qap_objective(jnp.asarray(hard), jnp.asarray(Kp),
                              jnp.asarray(Ke), jnp.asarray(src1),
                              jnp.asarray(dst1), jnp.asarray(src2),
                              jnp.asarray(dst2)))
    assert obj > 0


@pytest.mark.parametrize("transpose", [False, True])
def test_assoc_matvec_fused_matches_gather(rng, transpose):
    from fpmatch_tpu.ops.assoc import assoc_matvec_fused

    n1, n2, c = 5, 4, 3
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    want = assoc_matvec(jnp.asarray(X), jnp.asarray(Kp), jnp.asarray(Ke),
                        src1, dst1, src2, dst2, transpose=transpose)
    got = assoc_matvec_fused(jnp.asarray(X), jnp.asarray(Kp),
                             jnp.asarray(Ke), jnp.asarray(src1),
                             jnp.asarray(dst1), jnp.asarray(src2),
                             jnp.asarray(dst2), transpose=transpose)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("chunk", [3, 8, 64])
def test_assoc_matvec_chunked_matches_gather(rng, transpose, chunk):
    """Chunked large-problem path: exact vs the one-shot op, including
    chunk sizes that do / don't divide E1 (zero-padded tail slots)."""
    from fpmatch_tpu.ops.assoc import assoc_matvec_chunked

    n1, n2, c = 6, 5, 3
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    want = assoc_matvec(jnp.asarray(X), jnp.asarray(Kp), jnp.asarray(Ke),
                        src1, dst1, src2, dst2, transpose=transpose)
    got = assoc_matvec_chunked(jnp.asarray(X), jnp.asarray(Kp),
                               jnp.asarray(Ke), jnp.asarray(src1),
                               jnp.asarray(dst1), jnp.asarray(src2),
                               jnp.asarray(dst2), transpose=transpose,
                               chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
