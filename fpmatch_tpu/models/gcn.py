"""Alternative graph-convolution layers (library capability parity with
src/model/gcn.py — Gconv, ChannelIndependentConv (CIE, ICLR'20) and their
Siamese wrappers; the reference keeps them available though `Net` doesn't wire
them). Fixed-shape masked edge-list formulation.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _norm_adj_apply(x, src, dst, edge_mask, n):
    """Row-normalized adjacency action: (D⁻¹A)·x on a padded edge list."""
    msg = x[src] * edge_mask[:, None]
    agg = jax.ops.segment_sum(msg, dst, num_segments=n)
    deg = jax.ops.segment_sum(edge_mask.astype(x.dtype), dst,
                              num_segments=n)
    return agg / jnp.maximum(deg, 1.0)[:, None]


class Gconv(nn.Module):
    """Kipf-Welling-style conv: A·relu(a(x)) + relu(u(x))
    (reference gcn.py:8-40)."""

    out_features: int

    @nn.compact
    def __call__(self, x, src, dst, edge_mask, node_mask):
        n = x.shape[0]
        ax = nn.relu(nn.Dense(self.out_features, name="a_fc")(x))
        ux = nn.relu(nn.Dense(self.out_features, name="u_fc")(x))
        out = _norm_adj_apply(ax, src, dst, edge_mask, n) + ux
        return out * node_mask[:, None]


class ChannelIndependentConv(nn.Module):
    """CIE layer: node and edge channels update each other
    (reference gcn.py:41-111). Edge features live on the padded edge list."""

    out_features: int

    @nn.compact
    def __call__(self, x, edge_feat, src, dst, edge_mask, node_mask):
        n = x.shape[0]
        x1 = nn.Dense(self.out_features, name="node_fc")(x)
        x2 = nn.Dense(self.out_features, name="node_sfc")(x)
        e1 = nn.Dense(self.out_features, name="edge_fc")(edge_feat)

        # node update: aggregate source-node features gated by edge features
        msg = nn.relu(x1[src]) * nn.relu(e1) * edge_mask[:, None]
        agg = jax.ops.segment_sum(msg, dst, num_segments=n)
        deg = jax.ops.segment_sum(edge_mask.astype(x.dtype), dst,
                                  num_segments=n)
        node_out = agg / jnp.maximum(deg, 1.0)[:, None] + nn.relu(x2)

        return node_out * node_mask[:, None], nn.relu(e1) * edge_mask[:, None]


class SiameseGconv(nn.Module):
    """Shared-parameter Gconv applied to both graphs of a pair."""

    out_features: int

    @nn.compact
    def __call__(self, pair_inputs: Tuple):
        g = Gconv(self.out_features, name="gconv")
        return tuple(g(*args) for args in pair_inputs)
