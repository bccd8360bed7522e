"""Masked loss functions (capability parity with src/loss_func.py).

All losses take padded (B, S1, S2) matrices + per-sample valid counts and
reduce exactly like the reference: summed over valid cells, normalized by the
summed source-node counts (PermutationLoss, loss_func.py:26-59) or averaged
per batch where the reference does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.masking import rect_mask

# NB: must be representable against 1.0 in fp32 — with eps below machine
# epsilon (1.19e-7), clip(p, EPS, 1-EPS) is a no-op at the top end and a
# fully-converged assignment cell (p == 1.0 exactly) makes the BCE compute
# (1-g)·log(1-p) = 0·(-inf) = NaN. Found on TPU with real training data.
EPS = 1e-7


def _valid_mask(ns1, ns2, s1, s2):
    return jax.vmap(lambda a, b: rect_mask(a, b, s1, s2))(ns1, ns2)


def permutation_loss(pred_dsmat, gt_perm, ns1, ns2):
    """Masked binary cross-entropy between the predicted doubly-stochastic
    matrix and the GT permutation; sum over valid cells / sum(ns1)."""
    b, s1, s2 = pred_dsmat.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    p = jnp.clip(pred_dsmat, EPS, 1.0 - EPS)
    ce = -(gt_perm * jnp.log(p) + (1.0 - gt_perm) * jnp.log1p(-p))
    total = jnp.sum(jnp.where(m, ce, 0.0))
    return total / jnp.maximum(jnp.sum(ns1).astype(pred_dsmat.dtype), 1.0)


def cross_entropy_loss(pred_dsmat, gt_perm, ns1, ns2):
    """Row-wise cross entropy against the GT column (loss_func.py:62-113):
    -sum log(p[i, gt_col(i)]) over matched rows / sum(ns1)."""
    b, s1, s2 = pred_dsmat.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    p = jnp.clip(pred_dsmat, EPS, 1.0 - EPS)
    row_has_match = jnp.sum(jnp.where(m, gt_perm, 0.0), axis=2) > 0
    picked = jnp.sum(jnp.where(m, gt_perm * jnp.log(p), 0.0), axis=2)
    total = -jnp.sum(jnp.where(row_has_match, picked, 0.0))
    return total / jnp.maximum(jnp.sum(ns1).astype(pred_dsmat.dtype), 1.0)


def focal_loss(pred_dsmat, gt_perm, ns1, ns2, gamma: float = 0.0,
               alpha: float = 0.5):
    """Focal variant of the permutation BCE (loss_func.py:216-271)."""
    b, s1, s2 = pred_dsmat.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    p = jnp.clip(pred_dsmat, EPS, 1.0 - EPS)
    pos = -alpha * ((1 - p) ** gamma) * gt_perm * jnp.log(p)
    neg = -(1 - alpha) * (p ** gamma) * (1 - gt_perm) * jnp.log1p(-p)
    total = jnp.sum(jnp.where(m, pos + neg, 0.0))
    return total / jnp.maximum(jnp.sum(ns1).astype(pred_dsmat.dtype), 1.0)


def inner_product_loss(pred_dsmat, gt_perm, ns1, ns2):
    """-<pred, gt> over valid cells / sum(ns1) (loss_func.py:318-348)."""
    b, s1, s2 = pred_dsmat.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    total = -jnp.sum(jnp.where(m, pred_dsmat * gt_perm, 0.0))
    return total / jnp.maximum(jnp.sum(ns1).astype(pred_dsmat.dtype), 1.0)


def hamming_loss(pred_perm, gt_perm, ns1, ns2):
    """Differentiable Hamming distance between a (soft) permutation and the
    GT (loss_func.py:349-386), batch mean."""
    b, s1, s2 = pred_perm.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    ham = pred_perm * (1.0 - gt_perm) + (1.0 - pred_perm) * gt_perm
    return jnp.mean(jnp.sum(jnp.where(m, ham, 0.0), axis=(1, 2)))


def offset_loss(p_src, p_tgt_pred, p_tgt_gt, ns, norm: float = 1.0):
    """Robust (smooth-L1-ish) endpoint offset loss between predicted and GT
    displacements (loss_func.py:174-215), masked by node count."""
    b, n, _ = p_src.shape
    mask = (jnp.arange(n)[None, :] < ns[:, None])[..., None]
    d = (p_tgt_pred - p_tgt_gt) / norm
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)[..., None]
    total = jnp.sum(jnp.where(mask, dist, 0.0))
    return total / jnp.maximum(jnp.sum(ns).astype(p_src.dtype), 1.0)


def bce_with_logits(logits, labels):
    """Numerically-stable binary cross entropy on logits (mean)."""
    return jnp.mean(jnp.maximum(logits, 0) - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def distill_infonce(feat_student, feat_teacher, ns, tau: float = 0.07):
    """InfoNCE distillation between per-node embeddings of two models
    (loss_func.py:387+ Distill_InfoNCE): positives are same-node pairs,
    negatives all other valid nodes."""
    n = feat_student.shape[0]
    mask = jnp.arange(n) < ns
    fs = feat_student / jnp.maximum(
        jnp.linalg.norm(feat_student, axis=-1, keepdims=True), 1e-8)
    ft = feat_teacher / jnp.maximum(
        jnp.linalg.norm(feat_teacher, axis=-1, keepdims=True), 1e-8)
    logits = fs @ ft.T / tau
    logits = jnp.where(mask[None, :], logits, -1e9)
    logp = jax.nn.log_softmax(logits, axis=-1)
    pos = jnp.diagonal(logp)
    return -jnp.sum(jnp.where(mask, pos, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1.0)


def distill_quadratic_contrast(sim_student, sim_teacher, ns1, ns2):
    """Quadratic-contrast distillation on similarity matrices
    (loss_func.py Distill_QuadraticContrast): match the teacher's pairwise
    similarity structure in the least-squares sense over valid cells."""
    b, s1, s2 = sim_student.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    d = (sim_student - jax.lax.stop_gradient(sim_teacher)) ** 2
    return jnp.sum(jnp.where(m, d, 0.0)) / jnp.maximum(
        jnp.sum(m.astype(sim_student.dtype)), 1.0)


def permutation_loss_hung(pred_dsmat, pred_perm, gt_perm, ns1, ns2):
    """Hungarian-attention permutation loss (loss_func.py:114-173, BBGM):
    BCE restricted to the attention set = union of the discrete prediction
    and the ground truth, so easy negatives stop dominating."""
    b, s1, s2 = pred_dsmat.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    att = jnp.maximum(jax.lax.stop_gradient(pred_perm), gt_perm)
    p = jnp.clip(pred_dsmat, EPS, 1.0 - EPS)
    ce = -(gt_perm * jnp.log(p) + (1.0 - gt_perm) * jnp.log1p(-p)) * att
    total = jnp.sum(jnp.where(m, ce, 0.0))
    return total / jnp.maximum(jnp.sum(ns1).astype(pred_dsmat.dtype), 1.0)
