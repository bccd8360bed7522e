"""AFA-U attention module predicting k (the number of true matches).

Re-implementation of the reference encoder (src/model/afau.py:22-300 driven
by ngm.py:386-412): one bipartite cross-attention layer whose attention
scores mix the q·k dot products with the Sinkhorn cost matrix through a tiny
per-head 2→16→1 MLP, followed by Add & InstanceNorm and a feed-forward block;
row/col embeddings are max-pooled and fed to two small MLP heads whose
averaged sigmoid is k/min(n1,n2).

Deviations from the reference (documented):
  * attention softmax and instance-norm statistics are masked to valid nodes
    (the reference includes batch-max padding rows in both, making results
    depend on batch composition — afau.py:288, 152);
  * the -inf pad + maxpool over nodes (ngm.py:402-405) becomes a masked max.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masking import NEG_INF


def masked_instance_norm(x, mask, scale, bias, eps=1e-5):
    """InstanceNorm over the node axis with validity mask.
    x: (n, d); mask: (n,)."""
    m = mask[:, None].astype(x.dtype)
    cnt = jnp.maximum(m.sum(), 1.0)
    mean = (x * m).sum(0) / cnt
    var = (((x - mean) ** 2) * m).sum(0) / cnt
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias) * m


class MixedScoreAttention(nn.Module):
    """Cross-set MHA with per-head score mixing (afau.py:204-300)."""

    head_num: int = 16
    qkv_dim: int = 16
    ms_hidden: int = 16
    ms_init: float = 10.0

    @nn.compact
    def __call__(self, q, k, v, cost, col_mask):
        """q: (H, R, D), k/v: (H, C, D), cost: (R, C), col_mask: (C,)."""
        init = nn.initializers.uniform(scale=2 * self.ms_init)

        def centered(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - self.ms_init

        mix1_w = self.param("mix1_weight", centered,
                            (self.head_num, 2, self.ms_hidden))
        mix1_b = self.param("mix1_bias", centered,
                            (self.head_num, self.ms_hidden))
        mix2_w = self.param("mix2_weight", centered,
                            (self.head_num, self.ms_hidden, 1))
        mix2_b = self.param("mix2_bias", centered, (self.head_num, 1))

        dot = jnp.einsum("hrd,hcd->hrc", q, k) / jnp.sqrt(float(self.qkv_dim))
        two = jnp.stack([dot, jnp.broadcast_to(cost[None], dot.shape)],
                        axis=-1)                      # (H, R, C, 2)
        ms1 = jax.nn.relu(jnp.einsum("hrcs,hsm->hrcm", two, mix1_w)
                          + mix1_b[:, None, None, :])
        ms2 = (jnp.einsum("hrcm,hmo->hrco", ms1, mix2_w)
               + mix2_b[:, None, None, :])[..., 0]    # (H, R, C)
        ms2 = jnp.where(col_mask[None, None, :], ms2, NEG_INF)
        w = jax.nn.softmax(ms2, axis=-1)
        w = jnp.where(col_mask[None, None, :], w, 0.0)
        return jnp.einsum("hrc,hcd->hrd", w, v)       # (H, R, D)


class EncodingBlock(nn.Module):
    """One side of the bipartite encoder (afau.py:88-142)."""

    embedding_dim: int = 600
    head_num: int = 16
    qkv_dim: int = 16
    ff_hidden: int = 256
    ms_hidden: int = 16

    @nn.compact
    def __call__(self, row_emb, col_emb, cost, row_mask, col_mask):
        h, d = self.head_num, self.qkv_dim
        q = nn.Dense(h * d, use_bias=False, name="Wq")(row_emb)
        k = nn.Dense(h * d, use_bias=False, name="Wk")(col_emb)
        v = nn.Dense(h * d, use_bias=False, name="Wv")(col_emb)

        def heads(x):
            return jnp.transpose(x.reshape(x.shape[0], h, d), (1, 0, 2))

        att = MixedScoreAttention(head_num=h, qkv_dim=d,
                                  ms_hidden=self.ms_hidden, name="mha")(
            heads(q), heads(k), heads(v), cost, col_mask)
        att = jnp.transpose(att, (1, 0, 2)).reshape(row_emb.shape[0], h * d)
        mh = nn.Dense(self.embedding_dim, name="combine")(att)

        s1 = self.param("norm1_scale", nn.initializers.ones,
                        (self.embedding_dim,))
        b1 = self.param("norm1_bias", nn.initializers.zeros,
                        (self.embedding_dim,))
        out1 = masked_instance_norm(row_emb + mh, row_mask, s1, b1)
        ff = nn.Dense(self.embedding_dim, name="ff2")(
            nn.relu(nn.Dense(self.ff_hidden, name="ff1")(out1)))
        s2 = self.param("norm2_scale", nn.initializers.ones,
                        (self.embedding_dim,))
        b2 = self.param("norm2_bias", nn.initializers.zeros,
                        (self.embedding_dim,))
        return masked_instance_norm(out1 + ff, row_mask, s2, b2)


class AFAUEncoder(nn.Module):
    """Full AFA-U head: bipartite encoder + pooled k regressors
    (afau.py:22-57 + the driver logic in ngm.py:386-412).

    Works on a single pair; vmap for batches. Returns k ∈ [0, 1]."""

    univ_size: int = 600
    reg_hidden: int = 8

    @nn.compact
    def __call__(self, cost, n1, n2):
        """cost: (S1, S2) detached Sinkhorn output."""
        s1, s2 = cost.shape
        row_mask = jnp.arange(s1) < n1
        col_mask = jnp.arange(s2) < n2
        # one-hot position init for columns, zeros for rows (ngm.py:392-399)
        row_emb = jnp.zeros((s1, self.univ_size), cost.dtype)
        col_emb = (jax.nn.one_hot(jnp.arange(s2), self.univ_size,
                                  dtype=cost.dtype)
                   * col_mask[:, None])

        row_out = EncodingBlock(self.univ_size, name="row_block")(
            row_emb, col_emb, cost, row_mask, col_mask)
        col_out = EncodingBlock(self.univ_size, name="col_block")(
            col_emb, row_emb, cost.T, col_mask, row_mask)

        # masked max-pool over nodes (replaces -inf pad + MaxPool1d)
        g_row = jnp.max(jnp.where(row_mask[:, None], row_out, NEG_INF), axis=0)
        g_col = jnp.max(jnp.where(col_mask[:, None], col_out, NEG_INF), axis=0)

        def head(name, g):
            h = nn.relu(nn.Dense(self.reg_hidden, name=f"{name}_fc1")(g))
            return nn.Dense(1, name=f"{name}_fc2")(h)[0]

        k_logit = 0.5 * (head("final_row", g_row) + head("final_col", g_col))
        return jax.nn.sigmoid(k_logit)


class TensorNetworkModule(nn.Module):
    """SimGNN tensor network producing a similarity vector from two graph
    embeddings (reference afau.py:303-347; AFA-I component)."""

    filters: int
    tensor_neurons: int = 16

    @nn.compact
    def __call__(self, emb1, emb2):
        """emb1/emb2: (B, filters) graph-level embeddings."""
        W = self.param("weight_matrix", nn.initializers.glorot_uniform(),
                       (self.filters, self.filters, self.tensor_neurons))
        Wb = self.param("weight_matrix_block",
                        nn.initializers.glorot_uniform(),
                        (self.tensor_neurons, 2 * self.filters))
        b = self.param("bias", nn.initializers.zeros, (self.tensor_neurons,))
        scoring = jnp.einsum("bi,ijt,bj->bt", emb1, W, emb2)
        block = jnp.concatenate([emb1, emb2], axis=-1) @ Wb.T
        return nn.relu(scoring + block + b)


class DenseAttentionModule(nn.Module):
    """SimGNN dense attention pooling to a graph-level embedding
    (reference afau.py:350-399)."""

    filters: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B, N, filters); mask: (B, N) validity."""
        W = self.param("weight_matrix", nn.initializers.glorot_uniform(),
                       (self.filters, self.filters))
        if mask is not None:
            cnt = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
            mean = (x * mask[..., None]).sum(1) / cnt
        else:
            mean = x.mean(1)
        g = jnp.tanh(mean @ W)
        koefs = jax.nn.sigmoid(jnp.einsum("bnf,bf->bn", x, g))
        w = koefs[..., None] * x
        if mask is not None:
            w = w * mask[..., None]
        return w.sum(1)
