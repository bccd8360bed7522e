"""Matcher building blocks: spline message passing, affinity layers,
association-graph GNN layer, match classifier.

Each module mirrors a reference component's math (cited per class) but is a
fresh fixed-shape masked implementation operating on (N1, N2)-matrix-shaped
association features instead of flattened n1·n2 vectors — the column-major vec
bookkeeping of the reference (ngm.py:317-369) disappears because we never
flatten.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.spline import spline_conv
from ..ops.assoc import (assoc_aggregate_mean, assoc_tri_degree,
                         assoc_tri_matvec)
from ..ops.sinkhorn import sinkhorn, sinkhorn_batch


class SplineNet(nn.Module):
    """Two SplineConv layers (dim=2, kernel 5, max aggregation) with a 0.1
    residual blend — reference SConv/SiameseSConvOnNodes
    (src/model/spline_conv.py:7-58)."""

    features: int = 768
    kernel_size: int = 5
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, src, dst, edge_attr, edge_mask, node_mask):
        """x: (N, F); returns x + 0.1 * SConv(x)."""
        k_total = self.kernel_size ** 2
        h = x
        kernel_init = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform")  # torch-style kaiming-uniform
        for i in range(self.num_layers):
            w = self.param(f"conv{i}_weight", kernel_init,
                           (k_total, self.features, self.features))
            wr = self.param(f"conv{i}_root", kernel_init,
                            (self.features, self.features))
            b = self.param(f"conv{i}_bias", nn.initializers.zeros,
                           (self.features,))
            h = spline_conv(h, src, dst, edge_attr, w, wr, b,
                            edge_mask, node_mask, kernel_size=self.kernel_size)
            if i < self.num_layers - 1:
                h = nn.relu(h)
        return (x + 0.1 * h) * node_mask[:, None]


class InnerProductAffinity(nn.Module):
    """Global-feature-gated inner-product affinity
    `softplus(X · diag(tanh(A·w)) · Yᵀ) − 0.5`
    (reference src/model/affinity_layer.py:5-22)."""

    dim: int

    @nn.compact
    def __call__(self, X, Y, weights, mask=None):
        """X: (..., n1, d), Y: (..., n2, d), weights: (..., gdim).

        Output is always f32 (it feeds Sinkhorn / the factorized K); with
        bf16 X/Y the inner-product einsum runs on the MXU in bf16 with f32
        accumulation."""
        coeff = jnp.tanh(nn.Dense(self.dim, name="A")(weights))
        res = jnp.einsum("...id,...jd->...ij",
                         X * coeff[..., None, :].astype(X.dtype), Y,
                         preferred_element_type=jnp.float32)
        res = jax.nn.softplus(res.astype(jnp.float32)) - 0.5
        if mask is not None:
            res = res * mask
        return res


class AssocGNNLayer(nn.Module):
    """One association-graph convolution — the reference hot loop's
    `SAGEConv(x, adj.t()) + n_self_func(x)` plus the embedded-Sinkhorn channel
    (src/model/gnn.py:171-226). The SpMM is the factorized mean aggregation
    over Kᵀ from ops.assoc; the Sinkhorn channel is a per-layer masked
    Sinkhorn on a learned scalar projection of the node embeddings.
    """

    out_features: int = 16
    sk_channel: int = 1
    sk_iter: int = 20
    sk_tau: float = 0.05
    hyperedge: bool = False
    remat_sk: bool = True
    dtype: object = None     # compute dtype (None = f32); params stay f32

    @nn.compact
    def __call__(self, X, Kp, Ke, g1_src, g1_dst, g2_src, g2_dst,
                 kp_present, e1_mask, e2_mask, n1, n2,
                 Kt=None, tri1=None, tri2=None, t1_mask=None, t2_mask=None):
        """X: (N1, N2, C_in) association node features (single pair).

        With dtype=bfloat16 the sparse aggregation's gathers and the Dense
        layers run bf16 (f32 accumulation in the segment sums — see
        ops.assoc.assoc_matvec); the embedded-Sinkhorn channel always runs
        f32 (log-space numerics)."""
        cdt = self.dtype or X.dtype
        Xc = X.astype(cdt)
        agg = assoc_aggregate_mean(Xc, Kp, Ke, g1_src, g1_dst, g2_src,
                                   g2_dst, kp_present, e1_mask, e2_mask,
                                   transpose=True)
        x1 = nn.Dense(self.out_features, name="lin_l", dtype=cdt)(agg)
        x1 = x1 + nn.Dense(self.out_features, use_bias=False,
                           name="lin_r", dtype=cdt)(Xc)
        if self.hyperedge:
            tdeg = assoc_tri_degree(t1_mask, t2_mask, tri1, tri2,
                                    X.shape[0], X.shape[1])
            tagg = assoc_tri_matvec(X, Kt, tri1, tri2) \
                / jnp.maximum(tdeg, 1.0)[..., None]
            x1 = x1 + nn.Dense(self.out_features, use_bias=False,
                               name="lin_t", dtype=cdt)(tagg)
        h = nn.relu(nn.Dense(self.out_features, name="self0", dtype=cdt)(Xc))
        h = nn.relu(nn.Dense(self.out_features, name="self1", dtype=cdt)(h))
        x1 = x1 + h

        if self.sk_channel:
            sk_in = nn.Dense(self.sk_channel, name="classifier",
                             dtype=cdt)(x1)

            def sk_fn(x, a, b):
                return sinkhorn(x, a, b, tau=self.sk_tau,
                                max_iter=self.sk_iter, dummy_row=True)

            if self.remat_sk:
                # the unrolled iterates otherwise all become saved
                # activations; recompute-in-backward is ~free (see
                # NGMConfig.remat_sinkhorn)
                sk_fn = jax.checkpoint(sk_fn)
            chans = []
            for c in range(self.sk_channel):
                chans.append(sk_fn(sk_in[..., c].astype(jnp.float32),
                                   n1, n2))
            x1 = jnp.concatenate(
                [x1, jnp.stack(chans, axis=-1).astype(x1.dtype)], axis=-1)
        return x1 * kp_present[..., None].astype(x1.dtype)


class AssocGNNLayerBatched(nn.Module):
    """Batch-first AssocGNNLayer whose sparse aggregation is computed by the
    CALLER — the edge-sharded multi-chip path feeds the shard_map'd halo
    matvec from parallel.edge_partition.batched_row_sharded_aggregate here
    (shard_map cannot sit under nn.vmap, so this variant is not vmapped).
    The parameter tree is identical to AssocGNNLayer under nn.vmap — child
    names, Dense shapes — so checkpoints interchange between the single-chip
    and sharded paths."""

    out_features: int = 16
    sk_channel: int = 1
    sk_iter: int = 20
    sk_tau: float = 0.05
    remat_sk: bool = True
    dtype: object = None     # compute dtype (None = f32); params stay f32

    @nn.compact
    def __call__(self, X, agg, kp_present, n1, n2):
        """X: (B, N1, N2, C_in); agg: (B, N1, N2, C_in) mean-aggregated
        Kᵀ·vec(X); kp_present: (B, N1, N2); n1, n2: (B,)."""
        cdt = self.dtype or X.dtype
        Xc = X.astype(cdt)
        x1 = nn.Dense(self.out_features, name="lin_l", dtype=cdt)(agg)
        x1 = x1 + nn.Dense(self.out_features, use_bias=False,
                           name="lin_r", dtype=cdt)(Xc)
        h = nn.relu(nn.Dense(self.out_features, name="self0", dtype=cdt)(Xc))
        h = nn.relu(nn.Dense(self.out_features, name="self1", dtype=cdt)(h))
        x1 = x1 + h

        if self.sk_channel:
            sk_in = nn.Dense(self.sk_channel, name="classifier",
                             dtype=cdt)(x1)

            def sk_fn(x, a, b):
                return sinkhorn_batch(x, a, b, tau=self.sk_tau,
                                      max_iter=self.sk_iter, dummy_row=True)

            if self.remat_sk:
                sk_fn = jax.checkpoint(sk_fn)
            chans = [sk_fn(sk_in[..., c].astype(jnp.float32), n1, n2)
                     for c in range(self.sk_channel)]
            x1 = jnp.concatenate(
                [x1, jnp.stack(chans, axis=-1).astype(x1.dtype)], axis=-1)
        return x1 * kp_present[..., None].astype(x1.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics are computed over the VALID
    region only (padded positions excluded), so training normalization does
    not depend on the padding bucket size. Variable/param names match
    flax.linen.BatchNorm ("mean"/"var"/"scale"/"bias") — checkpoints are
    interchangeable, and eval mode (running stats) is bit-identical."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (B, H, W, C); mask: (B, H, W, 1) in {0, 1}."""
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if train:
            cnt = jnp.maximum(mask.sum(), 1.0)
            mean = (x * mask).sum(axis=(0, 1, 2)) / cnt
            var = (jnp.square(x - mean) * mask).sum(axis=(0, 1, 2)) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class MatchClassifier(nn.Module):
    """Genuine/imposter classifier on the masked similarity matrix — a small
    CNN over the match map (reference ngm.py:75-106). Pooling is masked (the
    global average divides by the valid area) and BatchNorm statistics are
    masked too, so neither logits nor train-mode normalization depend on the
    padding bucket size."""

    channels: Tuple[int, ...] = (16, 32)

    @nn.compact
    def __call__(self, match_mat, n1, n2, train: bool = False,
                 extra_features=None):
        """match_mat: (B, S1, S2); n1, n2: (B,) valid counts.

        extra_features: optional (B, F) scalars appended to the pooled
        representation before the final Dense — e.g. the AFA-U matchable
        fraction and match-map statistics (`ngm.cls_k_features`), which
        carry the pore-constellation signal the similarity map alone misses
        against same-ridge-field impostors (RESULTS.md sibling study)."""
        x = match_mat[..., None]

        def level_mask(h, w, shift):
            rows = jnp.arange(h)[None, :, None]
            cols = jnp.arange(w)[None, None, :]
            vr = jnp.ceil(n1 / (1 << shift)).astype(jnp.int32)[:, None, None]
            vc = jnp.ceil(n2 / (1 << shift)).astype(jnp.int32)[:, None, None]
            return ((rows < vr) & (cols < vc)).astype(x.dtype)[..., None]

        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.relu(x)
            m = level_mask(x.shape[1], x.shape[2], i)
            # zero the invalid region: otherwise it carries bias/BN constants
            # whose interaction with the conv's array-edge zero padding (and
            # with boundary-straddling pool cells) depends on the bucket size
            x = MaskedBatchNorm(name=f"bn{i}")(x, m, train=train) * m
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # masked global average over the (downscaled) valid region
        m = level_mask(x.shape[1], x.shape[2], len(self.channels))
        pooled = (x * m).sum(axis=(1, 2)) / jnp.maximum(
            m.sum(axis=(1, 2)), 1.0)
        if extra_features is not None:
            pooled = jnp.concatenate([pooled, extra_features], axis=-1)
        return nn.Dense(1, name="fc")(pooled)[..., 0]


class BilinearAffinity(nn.Module):
    """Bilinear affinity M = X·A·Yᵀ with a learnable square A initialized at
    identity (reference src/model/pca_affinity.py:8-32, the PCA-GM affinity;
    library component, not wired into NGMNet)."""

    dim: int

    @nn.compact
    def __call__(self, X, Y, mask=None):
        A = self.param("A", lambda key, shape: jnp.eye(shape[0]),
                       (self.dim, self.dim))
        res = jnp.einsum("...id,...de,...je->...ij", X, (A + A.T) / 2, Y)
        if mask is not None:
            res = res * mask
        return res


class DenseAssocGNNLayer(nn.Module):
    """Dense-K association conv (reference GNNLayer, gnn.py:11-87): row-
    normalized adjacency ⊙ edge-feature tensor matmul, for problems small
    enough to materialize K. Library alternative to AssocGNNLayer."""

    out_features: int = 16

    @nn.compact
    def __call__(self, K, X, mask):
        """K: (M, M) dense affinity; X: (M, C); mask: (M,) valid assoc nodes."""
        A = (K > 0).astype(K.dtype) * mask[None, :] * mask[:, None]
        A = A / jnp.maximum(A.sum(axis=1, keepdims=True), 1.0)
        x1 = nn.relu(nn.Dense(self.out_features, name="n_fc0")(X))
        x1 = nn.relu(nn.Dense(self.out_features, name="n_fc1")(x1))
        x2 = (A * K) @ x1
        h = nn.relu(nn.Dense(self.out_features, name="self0")(X))
        h = nn.relu(nn.Dense(self.out_features, name="self1")(h))
        return (x2 + h) * mask[:, None]
