"""B-spline kernel message passing math (SplineCNN, Fey et al. CVPR'18).

A from-scratch TPU formulation of what the reference gets from
`torch_geometric.nn.SplineConv` (src/model/spline_conv.py:17: dim=2,
kernel_size=5, degree=1, open splines, aggr='max').

For degree-1 open B-splines with m = kernel_size-1 intervals per dimension,
a pseudo-coordinate u ∈ [0,1] activates the two adjacent knots ⌊u·m⌋ and
⌊u·m⌋+1 with hat weights (1-frac, frac). In 2-D each edge activates 4 of the
K = kernel_size² kernel weight matrices with product weights.

TPU layout: instead of per-edge (in×out) matmuls (scalar-loop shaped), we
precompute all K kernel projections of the node features with one batched
matmul  XW[n, s, o] = Σ_i X[n, i] · W[s, i, o]  (MXU-friendly: K matmuls of
(N, C_in)×(C_in, C_out)), then each edge takes its 4 active taps as indexed
row-gathers from the (N·K, C_out) projection table, weighted by the hat
products — the 2**D-sparse basis is never densified (see spline_conv).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1e30


def spline_basis(u: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Dense degree-1 open B-spline basis.

    :param u: (E, D) pseudo-coordinates in [0, 1]
    :param kernel_size: knots per dimension (reference uses 5)
    :return: (E, kernel_size**D) basis weights, 2**D non-zeros per edge
    """
    e, d = u.shape
    m = kernel_size - 1
    p = jnp.clip(u, 0.0, 1.0) * m
    k0 = jnp.clip(jnp.floor(p), 0, m - 1).astype(jnp.int32)   # (E, D)
    frac = p - k0
    # per-dim two-tap weights → dense per-dim basis (E, D, kernel_size)
    onehot0 = jax.nn.one_hot(k0, kernel_size, dtype=u.dtype)
    onehot1 = jax.nn.one_hot(k0 + 1, kernel_size, dtype=u.dtype)
    per_dim = onehot0 * (1.0 - frac)[..., None] + onehot1 * frac[..., None]
    # outer product across dims, flattened with dim-0 SLOWEST
    # (index = k_0·kernel_size**(D-1) + … + k_{D-1}); the repo's learned
    # checkpoints bind this kernel-bank order
    basis = per_dim[:, 0, :]
    for dim in range(1, d):
        basis = (basis[:, :, None] * per_dim[:, dim, None, :]).reshape(e, -1)
    return basis


def spline_conv(x: jnp.ndarray, src, dst, edge_attr: jnp.ndarray,
                weight: jnp.ndarray, root_weight: jnp.ndarray,
                bias: jnp.ndarray, edge_mask: jnp.ndarray,
                node_mask: jnp.ndarray, kernel_size: int = 5,
                aggr: str = "max") -> jnp.ndarray:
    """One SplineConv layer on a padded edge-list graph.

    out[i] = aggr_{e: dst[e]=i} Σ_s B_s(u_e) · (x[src[e]] @ W_s)
             + x[i] @ W_root + b

    :param x: (N, C_in) node features
    :param weight: (K, C_in, C_out) kernel weights, K = kernel_size**dim
    :param root_weight: (C_in, C_out)
    :param bias: (C_out,)
    :param edge_mask/node_mask: padding masks
    """
    n, _ = x.shape
    # Tap-form: degree-1 2-D splines activate exactly 4 of the K kernel
    # cells per edge, so the dense (E, K) basis contraction is 6.25× wasted
    # FLOPs. Project the node features against all K kernels ONCE on the
    # node side (N·K·C_in·C_out — N < E and shared across edges), then each
    # edge does 4 indexed row-gathers from the (N·K, C_out) table weighted
    # by its hat-product weights. FLOP history at flagship shapes (E=384,
    # C=768, K=25): dense Z-form einsum 11.3 GFLOP/graph/layer (measured
    # 2.61 ms, MXU-bound); node-side projection + dense (E, K, C_out)
    # gather 1.9 GFLOP but 29 MB/graph of gathered intermediate (3.45 ms,
    # HBM-bound); this form keeps the 1.9 GFLOP and moves only
    # 4·E·C_out gathered rows (≈4.7 MB/graph).
    # mixed precision: compute in x's dtype (bf16 halves the MXU time of the
    # node-side projection and the HBM traffic of the tap gathers + their
    # backward scatters); params are cast down at use, f32 masters upstream
    weight = weight.astype(x.dtype)
    root_weight = root_weight.astype(x.dtype)
    bias = bias.astype(x.dtype)
    if edge_attr.shape[1] == 2:
        m = kernel_size - 1
        p = jnp.clip(edge_attr, 0.0, 1.0) * m             # (E, 2)
        k0 = jnp.clip(jnp.floor(p), 0, m - 1).astype(jnp.int32)
        frac = p - k0
        xw = jnp.einsum("ni,sio->nso", x, weight)         # (N, K, C_out)
        table = xw.reshape(n * kernel_size ** 2, -1)
        base = src * (kernel_size ** 2)
        msg = jnp.zeros((src.shape[0], weight.shape[-1]), x.dtype)
        for a in (0, 1):                                  # dim-0 taps
            wa = (1.0 - frac[:, 0]) if a == 0 else frac[:, 0]
            for b in (0, 1):                              # dim-1 taps
                wb = (1.0 - frac[:, 1]) if b == 0 else frac[:, 1]
                # cell flattening MUST match spline_basis (dim-0 SLOWEST:
                # index = k_0·kernel_size + k_1) — checkpoints bind the
                # kernel-bank order, and the first tap-form cut flipped it
                # (caught by review: transposed-weight outputs, 2026-08-19)
                cell = kernel_size * (k0[:, 0] + a) + (k0[:, 1] + b)
                w_e = (wa * wb * edge_mask).astype(x.dtype)
                msg = msg + w_e[:, None] * table[base + cell]
    else:  # general-D fallback: dense basis contraction
        basis = (spline_basis(edge_attr, kernel_size)
                 * edge_mask[:, None]).astype(x.dtype)
        xs = x[src]
        msg = jnp.einsum("es,ei,sio->eo", basis, xs, weight)

    if aggr == "max":
        msg = jnp.where(edge_mask[:, None], msg, NEG)
        agg = jax.ops.segment_max(msg, dst, num_segments=n)
        agg = jnp.where(agg <= NEG / 2, 0.0, agg)         # isolated nodes → 0
    elif aggr == "add":
        msg = msg * edge_mask[:, None]
        agg = jax.ops.segment_sum(msg, dst, num_segments=n)
    elif aggr == "mean":
        msg = msg * edge_mask[:, None]
        agg = jax.ops.segment_sum(msg, dst, num_segments=n)
        deg = jax.ops.segment_sum(edge_mask.astype(x.dtype), dst,
                                  num_segments=n)
        agg = agg / jnp.maximum(deg, 1.0)[:, None]
    else:
        raise ValueError(f"unknown aggregation: {aggr}")

    out = agg + x @ root_weight + bias
    return out * node_mask[:, None]


def edge_pseudo_coords(points: jnp.ndarray, src, dst,
                       rescale: float) -> jnp.ndarray:
    """Edge pseudo-coordinates: normalized coordinate differences in [0,1]
    (reference gmdataset.py:173: 0.5·(P_i − P_j)/rescale + 0.5, clipped)."""
    diff = 0.5 * (points[src] - points[dst]) / rescale + 0.5
    return jnp.clip(diff, 0.0, 1.0)


def hyperedge_angle_attrs(x: jnp.ndarray, tri: jnp.ndarray,
                          tri_mask: jnp.ndarray) -> jnp.ndarray:
    """Triangle-angle hyperedge attributes (reference
    spline_conv.py:83-100 vertex_attr_to_hyperedge_attr): for each triangle
    (i, j, k), the cosines of the three corner angles in feature space.

    :param x: (N, F) node features; tri: (T, 3) indices; tri_mask: (T,)
    :return: (T, 3) cosine features, zero on padded slots
    """
    a = x[tri[:, 0]]
    b = x[tri[:, 1]]
    c = x[tri[:, 2]]
    v01 = a - b
    v02 = a - c
    v12 = b - c

    def norm(v):
        # safe norm: padded triangles alias node 0, so v == 0 exactly —
        # d‖v‖/dv at 0 is NaN and poisons the whole gradient through the
        # masked-out slots (0 · NaN = NaN). max() INSIDE the sqrt routes the
        # gradient to the constant branch at v = 0, keeping it finite.
        return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-12))

    cos1 = jnp.sum(v01 * v02, -1) / (norm(v01) * norm(v02))
    cos2 = jnp.sum(-v01 * v12, -1) / (norm(v01) * norm(v12))
    cos3 = jnp.sum(v12 * v02, -1) / (norm(v12) * norm(v02))
    out = jnp.stack([cos1, cos2, cos3], axis=-1)
    return out * tri_mask[:, None]
