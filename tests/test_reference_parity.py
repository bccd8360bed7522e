"""Numerical parity against the reference's OWN torch implementations.

Round-1 tests validated every op against numpy re-implementations written in
this repo (tests/reference_impls.py) — self-referential. This module closes
the loop by importing the reference's pure-torch modules directly from
/root/reference (CPU torch is available in this image) and asserting allclose
with shared inputs/weights:

  * src/model/soft_topk.py   — soft_topk / Sinkhorn_m / greedy_perm
  * src/model/sinkhorn.py    — Sinkhorn.forward_ori (in-repo path; the
                               forward_log path delegates to pygmtools, which
                               is not installed — both converge to the same
                               doubly-stochastic limit, so parity is asserted
                               at convergence)
  * src/model/afau.py        — EncodingBlock (mixed-score MHA + AddNorm + FF)
                               with weights copied across frameworks
  * src/loss_func.py         — PermutationLoss / FocalLoss / InnerProductLoss
  * utils/feature_align.py   — bilinear keypoint sampling (square maps:
                               allclose; rectangular maps: the reference's
                               documented axis-mixing bug reproduced + our fix
                               validated against an independent numpy impl)
  * utils/factorize_graph_matching.py — dense K assembly via kronecker_torch
                               vs our factorized assoc ops

Reference files are loaded standalone (no package __init__) with lightweight
stubs for deps the image lacks (pygmtools, the JIT C++ sparse extensions).
"""
from __future__ import annotations

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_num_threads(2)
torch.manual_seed(0)

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)  # lets `utils.hungarian` resolve for loss_func


def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def _load(modname, path, stubs=()):
    for s in stubs:
        _stub(*s) if isinstance(s, tuple) else _stub(s)
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_soft_topk():
    return _load("ref_soft_topk", f"{REF}/src/model/soft_topk.py")


def ref_sinkhorn():
    _stub("pygmtools", sinkhorn=None)
    return _load("ref_sinkhorn", f"{REF}/src/model/sinkhorn.py")


def ref_afau():
    return _load("ref_afau", f"{REF}/src/model/afau.py")


def ref_loss_func():
    return _load("ref_loss_func", f"{REF}/src/loss_func.py")


def ref_feature_align():
    return _load("ref_feature_align", f"{REF}/utils/feature_align.py")


def ref_factorize():
    _stub("src")
    _stub("src.sparse", bilinear_diag_torch=None)
    _stub("src.sparse_torch", CSRMatrix3d=object, CSCMatrix3d=object)
    return _load("ref_factorize", f"{REF}/utils/factorize_graph_matching.py")


# --------------------------------------------------------------------------
# Sinkhorn (src/model/sinkhorn.py:89-169)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("n1,n2", [(6, 6), (4, 7)])
def test_sinkhorn_parity_at_convergence(rng, n1, n2):
    """Our masked log-space Sinkhorn and the reference's original-space
    forward_ori converge to the same doubly-stochastic matrix (the DS limit
    is unique for positive kernels; iteration schedules differ, so parity is
    asserted at convergence, max_iter=200)."""
    from fpmatch_tpu.ops.sinkhorn import sinkhorn

    S1, S2 = 9, 9
    s_np = rng.normal(size=(S1, S2)).astype(np.float32)
    tau, iters = 0.2, 200

    mod = ref_sinkhorn()
    sk = mod.Sinkhorn(max_iter=iters, tau=tau, epsilon=1e-7, log_forward=False)
    ref = sk.forward_ori(torch.from_numpy(s_np[:n1, :n2]).unsqueeze(0),
                         nrows=torch.tensor([n1]), ncols=torch.tensor([n2]),
                         dummy_row=True)[0].numpy()

    ours_padded = np.asarray(sinkhorn(s_np, n1, n2, tau=tau, max_iter=iters,
                                      dummy_row=True))
    ours = ours_padded[:n1, :n2]
    assert np.allclose(ours, ref, atol=2e-3), np.abs(ours - ref).max()
    # padded region must be exactly inert
    assert np.all(ours_padded[n1:] == 0) and np.all(ours_padded[:, n2:] == 0)


# --------------------------------------------------------------------------
# soft_topk + Sinkhorn_m + greedy_perm (src/model/soft_topk.py:8-255)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("n1,n2,k", [(6, 6, 3.4), (5, 8, 2.0), (7, 7, 0.0)])
def test_soft_topk_parity(rng, n1, n2, k):
    from fpmatch_tpu.ops.soft_topk import soft_topk, greedy_perm

    s_np = rng.normal(size=(n1, n2)).astype(np.float32)
    tau, iters = 0.1, 10

    mod = ref_soft_topk()
    x_ref, soft_ref = mod.soft_topk(
        torch.from_numpy(s_np).unsqueeze(0), torch.tensor([k]),
        max_iter=iters, tau=tau, nrows=torch.tensor([n1]),
        ncols=torch.tensor([n2]), return_prob=True)
    x_ref, soft_ref = x_ref[0].numpy(), soft_ref[0].numpy()

    # our op on a padded bucket with the same valid block
    S1, S2 = n1 + 3, n2 + 2
    s_pad = rng.normal(size=(S1, S2)).astype(np.float32)  # garbage padding
    s_pad[:n1, :n2] = s_np
    soft_ours = np.asarray(soft_topk(s_pad, np.float32(k), n1, n2, tau=tau,
                                     max_iter=iters, extra_iter=50))
    assert np.allclose(soft_ours[:n1, :n2], soft_ref, atol=1e-4), \
        np.abs(soft_ours[:n1, :n2] - soft_ref).max()
    assert np.all(soft_ours[n1:] == 0) and np.all(soft_ours[:, n2:] == 0)

    # Greedy discretization on the reference's own soft map. Converged maps
    # contain cells with *bit-identical* values, and torch's descending
    # argsort breaks those ties in a different order than jnp's stable
    # argsort — the tie order is arbitrary in both. So assert algorithmic
    # equivalence: same match count, a valid partial permutation, and the
    # same selected-mass objective.
    ref_map_padded = np.zeros((S1, S2), np.float32)
    ref_map_padded[:n1, :n2] = soft_ref
    x_ours = np.asarray(greedy_perm(ref_map_padded, np.float32(k), n1, n2))
    assert x_ours.sum() == x_ref.sum() == round(k)
    assert np.all(x_ours.sum(0) <= 1) and np.all(x_ours.sum(1) <= 1)
    mass_ours = float((x_ours[:n1, :n2] * soft_ref).sum())
    mass_ref = float((x_ref * soft_ref).sum())
    assert abs(mass_ours - mass_ref) < 1e-5, (mass_ours, mass_ref)


# --------------------------------------------------------------------------
# feature_align (utils/feature_align.py:5-126)
# --------------------------------------------------------------------------

def _numpy_bilinear(feat_hwc, pts, ori_size):
    """Independent correct bilinear sampler (half-pixel centers, x scaled by
    W_f/W, y by H_f/H) used to adjudicate the rectangular-map deviation."""
    h_f, w_f, c = feat_hwc.shape
    w, h = ori_size
    out = np.zeros((len(pts), c), np.float32)
    for i, (px, py) in enumerate(pts):
        x = (px - (w / w_f) / 2) / w * w_f
        y = (py - (h / h_f) / 2) / h * h_f
        x = min(max(x, 0.0), w_f - 1.0)
        y = min(max(y, 0.0), h_f - 1.0)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, w_f - 1), min(y0 + 1, h_f - 1)
        wx, wy = x - x0, y - y0
        out[i] = ((1 - wx) * (1 - wy) * feat_hwc[y0, x0]
                  + (1 - wx) * wy * feat_hwc[y1, x0]
                  + wx * (1 - wy) * feat_hwc[y0, x1]
                  + wx * wy * feat_hwc[y1, x1])
    return out


def test_feature_align_square_parity(rng):
    """On square maps (where the reference's axis mixing is harmless) our
    vectorized sampler reproduces the reference's per-point loops."""
    from fpmatch_tpu.ops.feature_align import feature_align

    mod = ref_feature_align()
    c, hf, wf, n = 5, 16, 16, 12
    ori = (256, 256)
    feat = rng.normal(size=(hf, wf, c)).astype(np.float32)
    pts = rng.uniform(16, 240, size=(n, 2)).astype(np.float32)

    ref = mod.feature_align(
        torch.from_numpy(np.transpose(feat, (2, 0, 1))).unsqueeze(0),
        torch.from_numpy(pts).unsqueeze(0), torch.tensor([n]), ori)[0].numpy()
    ours = np.asarray(feature_align(feat, pts, ori))
    assert np.allclose(ours, ref.T, atol=1e-5), np.abs(ours - ref.T).max()


def test_feature_align_rectangular_deviation_is_the_documented_fix(rng):
    """On rectangular maps the reference mixes the x/y scale factors
    (feature_align.py:57-62: ori_size is (W,H) but feat_size is (H_f,W_f)).
    Our op deviates from the reference there by design — and matches an
    independent correct numpy implementation instead."""
    from fpmatch_tpu.ops.feature_align import feature_align

    mod = ref_feature_align()
    c, hf, wf, n = 4, 15, 20, 10
    ori = (320, 240)  # (W, H)
    feat = rng.normal(size=(hf, wf, c)).astype(np.float32)
    pts = rng.uniform(40, 200, size=(n, 2)).astype(np.float32)

    ref = mod.feature_align(
        torch.from_numpy(np.transpose(feat, (2, 0, 1))).unsqueeze(0),
        torch.from_numpy(pts).unsqueeze(0), torch.tensor([n]), ori)[0].numpy()
    ours = np.asarray(feature_align(feat, pts, ori))
    correct = _numpy_bilinear(feat, pts, ori)
    assert np.allclose(ours, correct, atol=1e-5)
    assert not np.allclose(ours, ref.T, atol=1e-3)  # the documented deviation


# --------------------------------------------------------------------------
# losses (src/loss_func.py)
# --------------------------------------------------------------------------

def _loss_inputs(rng, b=3, s1=8, s2=8):
    ns1 = np.array([6, 8, 5], np.int32)
    ns2 = np.array([6, 8, 7], np.int32)
    pred = rng.uniform(0.02, 0.98, size=(b, s1, s2)).astype(np.float32)
    gt = np.zeros((b, s1, s2), np.float32)
    for i in range(b):
        k = min(ns1[i], ns2[i])
        perm = rng.permutation(ns2[i])[:k]
        gt[i, np.arange(k), perm] = 1.0
    return pred, gt, ns1, ns2


def test_permutation_loss_parity(rng):
    from fpmatch_tpu.train.losses import permutation_loss

    mod = ref_loss_func()
    pred, gt, ns1, ns2 = _loss_inputs(rng)
    ref = mod.PermutationLoss()(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(ns1), torch.from_numpy(ns2)).item()
    ours = float(permutation_loss(pred, gt, ns1, ns2))
    assert math.isclose(ours, ref, rel_tol=1e-5), (ours, ref)


def test_focal_loss_parity(rng):
    from fpmatch_tpu.train.losses import focal_loss

    mod = ref_loss_func()
    pred, gt, ns1, ns2 = _loss_inputs(rng)
    ref = mod.FocalLoss(gamma=2.0, eps=0.0)(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(ns1), torch.from_numpy(ns2)).item()
    # the reference focal loss is unweighted; ours adds the standard alpha
    # class weighting — alpha=0.5 scales both terms by 0.5 uniformly
    ours = float(focal_loss(pred, gt, ns1, ns2, gamma=2.0, alpha=0.5))
    assert math.isclose(2.0 * ours, ref, rel_tol=1e-4), (ours, ref)


def test_inner_product_loss_parity(rng):
    from fpmatch_tpu.train.losses import inner_product_loss

    mod = ref_loss_func()
    pred, gt, ns1, ns2 = _loss_inputs(rng)
    ref = mod.InnerProductLoss()(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(ns1), torch.from_numpy(ns2)).item()
    ours = float(inner_product_loss(pred, gt, ns1, ns2))
    assert math.isclose(ours, ref, rel_tol=1e-5), (ours, ref)


# --------------------------------------------------------------------------
# AFA-U EncodingBlock (src/model/afau.py:88-300) with shared weights
# --------------------------------------------------------------------------

def test_afau_encoding_block_parity(rng):
    import jax
    import jax.numpy as jnp
    from fpmatch_tpu.models.afau import EncodingBlock

    emb, heads, qkv, ff, ms = 24, 4, 8, 16, 8
    R, C = 7, 9

    params_dict = {
        "embedding_dim": emb, "head_num": heads, "qkv_dim": qkv,
        "ff_hidden_dim": ff, "ms_hidden_dim": ms,
        "ms_layer1_init": 10, "ms_layer2_init": 10,
        "sqrt_qkv_dim": math.sqrt(qkv),
    }
    mod = ref_afau()
    blk = mod.EncodingBlock(**params_dict)
    blk.eval()

    row = rng.normal(size=(R, emb)).astype(np.float32)
    col = rng.normal(size=(C, emb)).astype(np.float32)
    cost = rng.normal(size=(R, C)).astype(np.float32)

    ours_blk = EncodingBlock(embedding_dim=emb, head_num=heads, qkv_dim=qkv,
                             ff_hidden=ff, ms_hidden=ms)
    variables = ours_blk.init(jax.random.PRNGKey(0), jnp.asarray(row),
                              jnp.asarray(col), jnp.asarray(cost),
                              jnp.ones(R, bool), jnp.ones(C, bool))
    p = jax.tree.map(np.asarray, variables["params"])
    # our mixed-score MLP hidden width must match the torch block's
    assert p["mha"]["mix1_weight"].shape == (heads, 2, ms)

    with torch.no_grad():
        blk.Wq.weight.copy_(torch.from_numpy(p["Wq"]["kernel"].T))
        blk.Wk.weight.copy_(torch.from_numpy(p["Wk"]["kernel"].T))
        blk.Wv.weight.copy_(torch.from_numpy(p["Wv"]["kernel"].T))
        mha = blk.mixed_score_MHA
        mha.mix1_weight.copy_(torch.from_numpy(p["mha"]["mix1_weight"]))
        mha.mix1_bias.copy_(torch.from_numpy(p["mha"]["mix1_bias"]))
        mha.mix2_weight.copy_(torch.from_numpy(p["mha"]["mix2_weight"]))
        mha.mix2_bias.copy_(torch.from_numpy(p["mha"]["mix2_bias"]))
        blk.multi_head_combine.weight.copy_(
            torch.from_numpy(p["combine"]["kernel"].T))
        blk.multi_head_combine.bias.copy_(
            torch.from_numpy(p["combine"]["bias"]))
        blk.add_n_normalization_1.norm.weight.copy_(
            torch.from_numpy(p["norm1_scale"]))
        blk.add_n_normalization_1.norm.bias.copy_(
            torch.from_numpy(p["norm1_bias"]))
        blk.feed_forward.W1.weight.copy_(torch.from_numpy(p["ff1"]["kernel"].T))
        blk.feed_forward.W1.bias.copy_(torch.from_numpy(p["ff1"]["bias"]))
        blk.feed_forward.W2.weight.copy_(torch.from_numpy(p["ff2"]["kernel"].T))
        blk.feed_forward.W2.bias.copy_(torch.from_numpy(p["ff2"]["bias"]))
        blk.add_n_normalization_2.norm.weight.copy_(
            torch.from_numpy(p["norm2_scale"]))
        blk.add_n_normalization_2.norm.bias.copy_(
            torch.from_numpy(p["norm2_bias"]))

        ref = blk(torch.from_numpy(row).unsqueeze(0),
                  torch.from_numpy(col).unsqueeze(0),
                  torch.from_numpy(cost).unsqueeze(0))[0].numpy()

    ours = np.asarray(ours_blk.apply(
        variables, jnp.asarray(row), jnp.asarray(col), jnp.asarray(cost),
        jnp.ones(R, bool), jnp.ones(C, bool)))
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


# --------------------------------------------------------------------------
# Kronecker affinity factorization (utils/factorize_graph_matching.py)
# --------------------------------------------------------------------------

def test_assoc_ops_match_reference_dense_K(rng):
    """Assemble K densely with the reference's kronecker_torch
    (K = (G2⊗G1) diag(vec Ke) (H2⊗H1)ᵀ + diag(vec Kp), column-major vec) and
    check (a) our assoc_dense builds the same matrix, (b) our factorized
    matvec equals K·vec(X) / Kᵀ·vec(X) without materializing K."""
    import jax.numpy as jnp
    from fpmatch_tpu.ops.assoc import assoc_dense, assoc_matvec

    mod = ref_factorize()
    n1, n2 = 5, 4
    src1 = np.array([0, 1, 2, 3, 4, 0], np.int32)
    dst1 = np.array([1, 2, 3, 4, 0, 2], np.int32)
    src2 = np.array([0, 1, 2, 3], np.int32)
    dst2 = np.array([1, 2, 3, 0], np.int32)
    e1, e2 = len(src1), len(src2)

    def incidence(idx, n, e):
        M = np.zeros((n, e), np.float32)
        M[idx, np.arange(e)] = 1.0
        return M

    G1, H1 = incidence(src1, n1, e1), incidence(dst1, n1, e1)
    G2, H2 = incidence(src2, n2, e2), incidence(dst2, n2, e2)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(e1, e2)).astype(np.float32)

    KG = mod.kronecker_torch(torch.from_numpy(G2).unsqueeze(0),
                             torch.from_numpy(G1).unsqueeze(0))[0].numpy()
    KH = mod.kronecker_torch(torch.from_numpy(H2).unsqueeze(0),
                             torch.from_numpy(H1).unsqueeze(0))[0].numpy()
    vecKe = Ke.T.reshape(-1)          # column-major vec: index e2*ne1 + e1
    vecKp = Kp.T.reshape(-1)          # column-major vec: index i2*n1 + i1
    K_ref = KG @ np.diag(vecKe) @ KH.T + np.diag(vecKp)

    K_ours = np.asarray(assoc_dense(jnp.asarray(Kp), jnp.asarray(Ke),
                                    src1, dst1, src2, dst2, n1, n2))
    assert np.allclose(K_ours, K_ref, atol=1e-5)

    X = rng.normal(size=(n1, n2, 3)).astype(np.float32)
    vecX = X.transpose(2, 1, 0).reshape(3, -1).T     # (n1*n2, C) col-major
    for transpose in (False, True):
        y_ref = (K_ref.T if transpose else K_ref) @ vecX
        Y = np.asarray(assoc_matvec(jnp.asarray(X), jnp.asarray(Kp),
                                    jnp.asarray(Ke), src1, dst1, src2, dst2,
                                    transpose=transpose))
        y_ours = Y.transpose(2, 1, 0).reshape(3, -1).T
        assert np.allclose(y_ours, y_ref, atol=1e-4), (
            transpose, np.abs(y_ours - y_ref).max())
