"""VGG16 backbone variants (library parity with
src/model/feature_extractor.py:73-165 — the reference keeps VGG16/VGG16-bn
alternatives next to ResNet-18, with node features tapped at conv4_3 and edge
features at conv5_2), plus NoBackbone for non-image data (:168-181).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

# VGG16 layout: (channels, convs-per-stage)
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Backbone(nn.Module):
    """VGG16 with the matcher's taps: node = 3rd conv of stage 4 (relu4_3
    input conv in the reference's indexing), edge = 2nd conv of stage 5."""

    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        nodes = edges = None
        for si, (ch, n_convs) in enumerate(_VGG_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{si + 1}_{ci + 1}")(x)
                if si == 3 and ci == 2:
                    nodes = x               # 256→512 stage tap (stride 8)
                if si == 4 and ci == 1:
                    edges = x               # stage-5 tap (stride 16)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=jnp.float32,
                                     name=f"bn{si + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        global_feat = jnp.max(x, axis=(1, 2))
        return nodes, edges, global_feat


class NoBackbone(nn.Module):
    """Functional non-image pathway (the reference's NoBackbone,
    feature_extractor.py:166-181, is itself a raising stub — here the
    pathway actually works). Consumes precomputed per-keypoint features
    (B, N, F) instead of images and synthesizes the (node_feat, global)
    pair the matcher head expects: node features pass through a Dense
    projection to `out_dim`, the global descriptor is a masked max-pool
    projected to `global_dim`."""

    out_dim: int = 768
    global_dim: int = 512

    @nn.compact
    def __call__(self, feats: jnp.ndarray, node_mask: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param feats: (B, N, F) precomputed keypoint features
        :param node_mask: (B, N) validity
        :return: node features (B, N, out_dim), global (B, global_dim)"""
        x = nn.Dense(self.out_dim, name="proj")(feats)
        x = x * node_mask[..., None]
        neg = jnp.where(node_mask[..., None] > 0, x, -jnp.inf)
        pooled = jnp.max(neg, axis=1)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        g = nn.Dense(self.global_dim, name="global")(pooled)
        return x, g
