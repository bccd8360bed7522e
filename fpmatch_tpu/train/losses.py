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

EPS = 1e-8


def _valid_mask(ns1, ns2, s1, s2):
    return jax.vmap(lambda a, b: rect_mask(a, b, s1, s2))(ns1, ns2)


def permutation_loss(pred_dsmat, gt_perm, ns1, ns2):
    """Masked binary cross-entropy between the predicted doubly-stochastic
    matrix and the GT permutation; sum over valid cells / sum(ns1)."""
    b, s1, s2 = pred_dsmat.shape
    m = _valid_mask(ns1, ns2, s1, s2)
    p = jnp.clip(pred_dsmat, EPS, 1.0 - EPS)
    ce = -(gt_perm * jnp.log(p) + (1.0 - gt_perm) * jnp.log(1.0 - p))
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
    neg = -(1 - alpha) * (p ** gamma) * (1 - gt_perm) * jnp.log(1 - p)
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
