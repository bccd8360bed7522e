"""Fixed-shape padded graph pytrees.

Replaces the reference's ragged per-sample tensors + dense incidence matrices
G/H (utils/build_graphs.py:12-74) and the batched CSR/CSC sparse zoo
(src/sparse_torch/csx_matrix.py) with edge-list pytrees padded to static shape
buckets. The incidence factorization A = G·Hᵀ is represented implicitly:
directed edge e runs src[e] → dst[e], i.e. G[i,e] = 1 iff src[e] == i and
H[j,e] = 1 iff dst[e] == j.

All arrays are padded: `n_nodes` / `n_edges` give the valid counts; padded
edge slots point at node index `n_max - 1`-safe sentinel (0) and are masked by
`edge_mask`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class Graph(NamedTuple):
    """One keypoint graph, padded to (n_max, e_max)."""

    points: jnp.ndarray      # (n_max, 2) float32 keypoint xy in image pixels
    src: jnp.ndarray         # (e_max,) int32 edge source node index
    dst: jnp.ndarray         # (e_max,) int32 edge destination node index
    n_nodes: jnp.ndarray     # () int32
    n_edges: jnp.ndarray     # () int32
    # hyperedges (triangles) for hyperedge attrs (spline_conv.py:83-100)
    tri: jnp.ndarray         # (t_max, 3) int32 triangle node indices
    n_tri: jnp.ndarray       # () int32

    @property
    def n_max(self) -> int:
        return self.points.shape[0]

    @property
    def e_max(self) -> int:
        return self.src.shape[0]

    def node_mask(self) -> jnp.ndarray:
        return jnp.arange(self.n_max) < self.n_nodes

    def edge_mask(self) -> jnp.ndarray:
        return jnp.arange(self.e_max) < self.n_edges

    def tri_mask(self) -> jnp.ndarray:
        return jnp.arange(self.tri.shape[0]) < self.n_tri


class GraphPair(NamedTuple):
    """A matching problem: two graphs + supervision.

    `gt_perm` is the (n1_max, n2_max) 0/1 ground-truth assignment;
    `label` is the genuine(1)/imposter(0) pair label for verification.
    """

    g1: Graph
    g2: Graph
    images: Optional[jnp.ndarray]   # (2, H, W, 3) normalized, NHWC; None for QAP
    gt_perm: jnp.ndarray            # (n_max, n_max) float32
    label: jnp.ndarray              # () float32
    gt_k: jnp.ndarray               # () float32 — sum of gt_perm


def pad_points(points: np.ndarray, n_max: int) -> np.ndarray:
    """Zero-pad an (n, 2) point array to (n_max, 2)."""
    out = np.zeros((n_max, 2), dtype=np.float32)
    n = min(len(points), n_max)
    if n:
        out[:n] = points[:n]
    return out


def make_graph(points: np.ndarray, src: np.ndarray, dst: np.ndarray,
               tri: np.ndarray, n_max: int, e_max: int, t_max: int) -> Graph:
    """Build a padded Graph (host side, numpy)."""
    n = int(len(points))
    e = int(len(src))
    t = int(len(tri))
    if n > n_max:
        raise ValueError(f"{n} nodes exceed bucket n_max={n_max}")
    if e > e_max:
        raise ValueError(f"{e} edges exceed bucket e_max={e_max}")
    t = min(t, t_max)
    src_p = np.zeros((e_max,), dtype=np.int32)
    dst_p = np.zeros((e_max,), dtype=np.int32)
    src_p[:e] = src
    dst_p[:e] = dst
    tri_p = np.zeros((t_max, 3), dtype=np.int32)
    if t:
        tri_p[:t] = tri[:t]
    return Graph(
        points=jnp.asarray(pad_points(points, n_max)),
        src=jnp.asarray(src_p),
        dst=jnp.asarray(dst_p),
        n_nodes=jnp.asarray(n, dtype=jnp.int32),
        n_edges=jnp.asarray(e, dtype=jnp.int32),
        tri=jnp.asarray(tri_p),
        n_tri=jnp.asarray(t, dtype=jnp.int32),
    )
