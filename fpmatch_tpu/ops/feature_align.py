"""Vectorized bilinear feature alignment (ROIAlign-style point sampling).

Replaces the reference's per-point Python loops (utils/feature_align.py:5-126)
with one gather-based bilinear interpolation over all keypoints at once.

Note on fidelity: the reference passes ori_size=(W, H)=(320, 240) but indexes
feat_size as (H_f, W_f), mixing the axes' scale factors and clamping the
bottom band of the image (feature_align.py:57-62 with interp feat_size from
`feature.shape[1:3]`). We implement the *correct* mapping — x scaled by
W_f/W, y scaled by H_f/H, half-pixel aligned — and document the deviation;
it is consistent across both images of a pair so matching behaviour is
preserved while features actually correspond to their keypoints.
"""
from __future__ import annotations

import jax.numpy as jnp


def feature_align(feat: jnp.ndarray, points: jnp.ndarray,
                  ori_size: tuple) -> jnp.ndarray:
    """Sample feature vectors at keypoint locations.

    :param feat: (H_f, W_f, C) feature map (NHWC single image)
    :param points: (N, 2) xy keypoint coordinates in original-image pixels
    :param ori_size: (W, H) of the original image
    :return: (N, C) sampled features (padded points sample at (0,0) — callers
             mask downstream)
    """
    h_f, w_f, _ = feat.shape
    w, h = ori_size
    # half-pixel centers: original pixel p maps to feature coord (p - s/2)/s
    sx = w / w_f
    sy = h / h_f
    x = (points[:, 0] - sx / 2.0) / sx
    y = (points[:, 1] - sy / 2.0) / sy

    x0 = jnp.clip(jnp.floor(x), 0, w_f - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h_f - 1)
    x1 = jnp.clip(x0 + 1, 0, w_f - 1)
    y1 = jnp.clip(y0 + 1, 0, h_f - 1)

    xi0, yi0 = x0.astype(jnp.int32), y0.astype(jnp.int32)
    xi1, yi1 = x1.astype(jnp.int32), y1.astype(jnp.int32)

    Ia = feat[yi0, xi0]
    Ib = feat[yi1, xi0]
    Ic = feat[yi0, xi1]
    Id = feat[yi1, xi1]

    xc = jnp.clip(x, 0.0, w_f - 1.0)
    yc = jnp.clip(y, 0.0, h_f - 1.0)
    wx1 = xc - x0
    wy1 = yc - y0
    # dtype-preserving: bf16 feature maps stay bf16 through the blend (the
    # interpolation weights are computed f32 from the coordinates, then cast)
    wa = ((1 - wx1) * (1 - wy1))[:, None].astype(feat.dtype)
    wb = ((1 - wx1) * wy1)[:, None].astype(feat.dtype)
    wc = (wx1 * (1 - wy1))[:, None].astype(feat.dtype)
    wd = (wx1 * wy1)[:, None].astype(feat.dtype)
    return Ia * wa + Ib * wb + Ic * wc + Id * wd


def normalize_over_channels(x: jnp.ndarray, axis: int = -1,
                            eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the channel axis (reference ngm.py:65-67)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)
