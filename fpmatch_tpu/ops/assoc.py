"""Factorized association-graph sparse ops — the TPU replacement for the
reference's entire native sparse stack (src/extension/sparse_dot/*,
src/extension/bilinear_diag/*, src/sparse_torch/csx_matrix.py,
utils/factorize_graph_matching.py).

The FGM factorization (Zhou & De la Torre, TPAMI'15) of the association
affinity matrix is

    K = diag(vec(Kp)) + (G2 ⊗ G1) · diag(vec(Ke)) · (H2 ⊗ H1)ᵀ

with column-major vec: association node (i1, i2) ↦ i2·n1 + i1, association
edge (e1, e2) ↦ e2·ne1 + e1, and incidence columns one-hot (G[i,e]=1 iff
src[e]==i, H[j,e]=1 iff dst[e]==j).

Key identity — K never needs to be materialized. For X ∈ R^{n1×n2×C} viewed as
vec'd association node features,

    (K·vec X)[i1,i2] = Kp[i1,i2]·X[i1,i2]
                     + Σ_{e1,e2} 1[src1(e1)=i1] 1[src2(e2)=i2] · Ke[e1,e2]
                       · X[dst1(e1), dst2(e2)]

i.e. gather X by (dst1, dst2) → scale by Ke → two *separable* segment-sums
(over e2 into src2, over e1 into src1). The gathers/scatters are along dense
regular axes, which vectorizes on TPU (no CSR pointer chasing), and JAX AD of
this expression reproduces the reference's hand-written CUDA backward
(`bilinear_diag`, the VJP wrt Ke) automatically.

The transposed product Kᵀ·vec X (what the model actually uses —
`SAGEConv(x, adj.t())`, src/model/gnn.py:208) just swaps the src/dst roles.

All functions are single-pair with static shapes + masks; vmap for batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=False)


def assoc_matvec(X: jnp.ndarray, Kp: jnp.ndarray, Ke: jnp.ndarray,
                 src1, dst1, src2, dst2,
                 transpose: bool = False) -> jnp.ndarray:
    """K · vec(X) (or Kᵀ · vec(X)) without materializing K.

    :param X:  (N1, N2, C) association node features as a matrix stack
    :param Kp: (N1, N2) node affinities (diagonal of K); zero-padded
    :param Ke: (E1, E2) edge affinities; zero-padded (padded edges MUST carry
               Ke == 0 — padding slots alias node 0 and must not contribute)
    :param src1, dst1: (E1,) int32 graph-1 edge endpoints
    :param src2, dst2: (E2,) int32 graph-2 edge endpoints
    :param transpose: compute Kᵀ·x instead of K·x
    :return: (N1, N2, C)
    """
    n1, n2, _ = X.shape
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2
    # gather: W[e1, e2, c] = X[dst1[e1], dst2[e2], c]. dtype-generic: with
    # bfloat16 X the gathers and the Ke multiply (the HBM-dominant work) run
    # in bf16, while both segment-sums accumulate f32 (the converts fuse
    # into the scatter producers) and the result is always f32.
    W = X[dst1][:, dst2]                      # (E1, E2, C)
    W = W * Ke[..., None].astype(W.dtype)
    # scatter-add, separable: over e2 into src2 then e1 into src1
    T = _segment_sum(jnp.swapaxes(W, 0, 1).astype(jnp.float32),
                     src2, n2)                             # (N2, E1, C)
    Y = _segment_sum(jnp.swapaxes(T, 0, 1), src1, n1)      # (N1, N2, C)
    return Y + Kp[..., None] * X.astype(jnp.float32)


def assoc_matvec_fused(X: jnp.ndarray, Kp: jnp.ndarray, Ke: jnp.ndarray,
                       src1, dst1, src2, dst2,
                       transpose: bool = False) -> jnp.ndarray:
    """K·vec(X) via a single fused contraction — the large-problem path.

    The gather/segment-sum form materializes the (E1, E2, C) weighted tensor
    (880 MB at UNIV scale), collapsing to ~0.3 G edges/s; fusing the e2
    contraction into one einsum lets XLA keep it in registers/VMEM:
    measured 6.5 ms vs 43 ms per n=600/e=3600 pair (f32-exact, HIGHEST
    precision). Prefer `assoc_matvec` for bucket-scale problems (its
    gather path is ~16 G edges/s at n=64).
    """
    n1, n2, _ = X.shape
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2
    rows = X[dst1]                                    # (E1, N2, C)
    G2 = jax.nn.one_hot(dst2, n2, dtype=X.dtype)      # (E2, N2) gather matrix
    S2 = jax.nn.one_hot(src2, n2, dtype=X.dtype)      # (E2, N2) scatter matrix
    t = jnp.einsum("enc,fn,ef,fm->emc", rows, G2, Ke, S2,
                   precision=jax.lax.Precision.HIGHEST)
    Y = _segment_sum(t, src1, n1)
    return Y + Kp[..., None] * X


def assoc_matvec_chunked(X: jnp.ndarray, Kp: jnp.ndarray, Ke: jnp.ndarray,
                         src1, dst1, src2, dst2,
                         transpose: bool = False,
                         chunk: int = 256) -> jnp.ndarray:
    """K·vec(X) with the E1 axis processed in fixed-size chunks via lax.scan.

    The large-problem sweet spot: keeps the gather/segment-sum formulation's
    minimal FLOP count (E1·E2·C multiplies — no one-hot matmul inflation,
    unlike `assoc_matvec_fused`) while bounding the live intermediate to
    (chunk, E2, C) instead of the full (E1, E2, C) tensor that collapses the
    plain gather path at UNIV scale (~830 MB at n=600, e≈3600). HBM-roofline
    cost ≈ 2·E1·N2·C·4 bytes of gather+scatter traffic.
    """
    n1, n2, _ = X.shape
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2
    e1 = Ke.shape[0]
    n_chunks = -(-e1 // chunk)
    pad = n_chunks * chunk - e1
    # padded edge slots carry Ke == 0 (contribute nothing; alias row 0)
    Kep = jnp.pad(Ke, ((0, pad), (0, 0)))
    d1 = jnp.pad(jnp.asarray(dst1), (0, pad)).reshape(n_chunks, chunk)
    s1 = jnp.pad(jnp.asarray(src1), (0, pad)).reshape(n_chunks, chunk)
    Kec = Kep.reshape(n_chunks, chunk, -1)

    def body(carry, sl):
        ke, d1c, s1c = sl
        W = X[d1c][:, dst2]                              # (chunk, E2, C)
        W = W * ke[..., None].astype(W.dtype)
        T = _segment_sum(jnp.swapaxes(W, 0, 1).astype(jnp.float32),
                         src2, n2)                       # (N2, chunk, C)
        Y = _segment_sum(jnp.swapaxes(T, 0, 1), s1c, n1)   # (N1, N2, C)
        return carry + Y, None

    Y0 = Kp[..., None] * X.astype(jnp.float32)
    Y, _ = jax.lax.scan(body, Y0, (Kec, d1, s1))
    return Y


# association-edge count above which the chunked path wins (empirical
# crossover on v5e; the one-shot gather/segment-sum is faster below it).
# At UNIV scale (13M assoc edges) the driver capture reads: chunked(256)
# 2.45 G edges/s vs fused einsum 1.05 G vs Pallas kernel v2 0.54 G
# (BENCH_r03 capture 2026-08-19) — the chunked gather/scatter is the
# large-problem dispatch winner.
CHUNKED_NNZ_THRESHOLD = 1_000_000
CHUNK_E1 = 256


def assoc_matvec_auto(X, Kp, Ke, src1, dst1, src2, dst2,
                      transpose: bool = False):
    """Static-shape dispatch between the one-shot gather path (bucket-scale)
    and the chunked bounded-memory path (UNIV-scale)."""
    if Ke.shape[0] * Ke.shape[1] >= CHUNKED_NNZ_THRESHOLD:
        return assoc_matvec_chunked(X, Kp, Ke, src1, dst1, src2, dst2,
                                    transpose=transpose, chunk=CHUNK_E1)
    return assoc_matvec(X, Kp, Ke, src1, dst1, src2, dst2,
                        transpose=transpose)


def assoc_degree(Kp_present: jnp.ndarray, e1_mask, e2_mask,
                 src1, dst1, src2, dst2, n1: int, n2: int,
                 transpose: bool = False) -> jnp.ndarray:
    """Number of stored entries per row of K (or Kᵀ) — the normalizer of the
    reference's mean aggregation (`torch_sparse.matmul(..., reduce='mean')`).

    The reference's collate stores *all* n1·n2 diagonal Kp entries plus one
    entry per association edge (factorize_graph_matching.py:90-95), so
    deg(i1,i2) = indeg1(i1)·indeg2(i2) + 1 on the valid block.

    :param Kp_present: (N1, N2) 1.0 where a diagonal entry exists (valid block)
    :param e1_mask/e2_mask: (E,) validity of padded edge slots
    :return: (N1, N2) float degree
    """
    tgt1 = src1 if transpose else dst1
    tgt2 = src2 if transpose else dst2
    deg1 = _segment_sum(e1_mask.astype(jnp.float32), tgt1, n1)   # (N1,)
    deg2 = _segment_sum(e2_mask.astype(jnp.float32), tgt2, n2)   # (N2,)
    return deg1[:, None] * deg2[None, :] + Kp_present


def assoc_aggregate_mean(X, Kp, Ke, src1, dst1, src2, dst2,
                         Kp_present, e1_mask, e2_mask,
                         transpose: bool = True):
    """Mean-aggregated sparse propagation: row-wise (Kᵀ·x) / rownnz(Kᵀ) —
    exactly what `SAGEConv(x, adj.t())` computes in the reference hot loop
    (src/model/gnn.py:207-209).
    """
    n1, n2, _ = X.shape
    y = assoc_matvec_auto(X, Kp, Ke, src1, dst1, src2, dst2,
                          transpose=transpose)
    deg = assoc_degree(Kp_present, e1_mask, e2_mask, src1, dst1, src2, dst2,
                       n1, n2, transpose=transpose)
    return y / jnp.maximum(deg, 1.0)[..., None]


def assoc_tri_matvec(X: jnp.ndarray, Kt: jnp.ndarray, tri1, tri2
                     ) -> jnp.ndarray:
    """Third-order (hyperedge) association propagation.

    The reference builds triangle hyperedges (gmdataset.py:180-189) and
    triangle-angle attributes (spline_conv.py:83-100) but its Net.forward
    never enables them (`hyperedge=False` at ngm.py:255); this op makes the
    pathway actually usable. For each pair of triangles (t1, t2) with
    affinity Kt[t1, t2] and each corner rotation r, the corner match
    (a1, a2) receives the mean of its partner-corner features:

        Y[a1, a2] += Kt[t1, t2] · (X[b1, b2] + X[c1, c2]) / 2

    Separable gather/segment-sum structure identical to `assoc_matvec`
    (the hyperedge set is the outer product of the two triangle lists), so
    it vectorizes on TPU the same way. Symmetric in the corner rotation —
    no transpose variant needed.

    :param X:   (N1, N2, C) association node features
    :param Kt:  (T1, T2) triangle-pair affinities; padded slots MUST carry
                Kt == 0 (they alias node 0)
    :param tri1: (T1, 3) int32 triangle corners of graph 1
    :param tri2: (T2, 3) int32 triangle corners of graph 2
    :return: (N1, N2, C)
    """
    n1, n2, _ = X.shape
    Y = jnp.zeros_like(X)
    for r in range(3):
        a1, b1, c1 = tri1[:, r], tri1[:, (r + 1) % 3], tri1[:, (r + 2) % 3]
        a2, b2, c2 = tri2[:, r], tri2[:, (r + 1) % 3], tri2[:, (r + 2) % 3]
        W = 0.5 * (X[b1][:, b2] + X[c1][:, c2])          # (T1, T2, C)
        W = W * Kt[..., None]
        T = _segment_sum(jnp.swapaxes(W, 0, 1), a2, n2)  # (N2, T1, C)
        Y = Y + _segment_sum(jnp.swapaxes(T, 0, 1), a1, n1)
    return Y


def assoc_tri_degree(t1_mask, t2_mask, tri1, tri2, n1: int, n2: int
                     ) -> jnp.ndarray:
    """Hyperedge count per association node (normalizer for mean
    aggregation over `assoc_tri_matvec`): Σ_r tdeg1_r(i1) · tdeg2_r(i2)."""
    deg = jnp.zeros((n1, n2), jnp.float32)
    for r in range(3):
        d1 = _segment_sum(t1_mask.astype(jnp.float32), tri1[:, r], n1)
        d2 = _segment_sum(t2_mask.astype(jnp.float32), tri2[:, r], n2)
        deg = deg + d1[:, None] * d2[None, :]
    return deg


def assoc_dense(Kp, Ke, src1, dst1, src2, dst2, n1: int, n2: int):
    """Materialize K densely (test/reference path only; replaces the dense
    `construct_aff_mat`/RebuildFGM path, factorize_graph_matching.py:10-54).

    Returns (n1·n2, n1·n2) with column-major vec indexing (i2·n1 + i1).
    """
    m = n1 * n2
    row = (src2[None, :] * n1 + src1[:, None]).reshape(-1)   # (E1*E2,)
    col = (dst2[None, :] * n1 + dst1[:, None]).reshape(-1)
    val = Ke.reshape(-1)                                     # e1-major… careful
    # Ke is (E1, E2); flatten must match row/col layout (e1 outer, e2 inner)
    K = jnp.zeros((m, m), Kp.dtype).at[row, col].add(val)
    diag = Kp.T.reshape(-1)                                  # vec col-major
    return K + jnp.diag(diag)


def edge_incidence_gather(F: jnp.ndarray, src, dst) -> jnp.ndarray:
    """[F·G ; F·H] edge features by gathering node features at both endpoints
    (replaces utils/build_graphs.py:144-170 reshape_edge_feature)."""
    return jnp.concatenate([F[src], F[dst]], axis=-1)
