"""Blocked Pallas kernel for UNIV-scale association aggregation.

The bucket-scale kernel (assoc_pallas.py) builds one-hot gather/scatter
matrices over the FULL node/edge ranges — at UNIV_SIZE (n=600, e≈3600) those
matmuls inflate MXU work ~100× and lose to XLA's fused einsum. This module
restores speed-of-light by exploiting the geometry the reference's CUDA CSR
kernels never could (src/extension/sparse_dot/csr_dot_csc_cuda.cu): Delaunay
edges are spatially local, so with nodes sorted along one axis every edge's
endpoints fall in a narrow band. We tile:

  * nodes of graph 1 → row-blocks of R1, graph 2 → col-blocks of R2;
  * edges grouped by their SCATTER endpoint's block (disjoint output tiles);
  * each edge's GATHER endpoint then lies in a 3-block window around the
    scatter block (guaranteed by construction; violators are spilled to the
    XLA path);
  * per (i, j) tile: local one-hot matmuls over the 3R window — one-hot
    sizes shrink from (E, N) to (B, 3R), cutting the flop inflation ~10×,
    which is exactly the gap to the HBM roofline.

All tiles are static-shape; the grid streams (row-block × col-block) tiles
with Pallas double-buffering the X window (9 neighboring blocks as separate
refs — BlockSpec index maps can't express overlapping windows, three
shifted refs per axis can) and the block-gathered KeR tensor.

Pipeline per pair (Ke and the plan are reused across GNN layers /
Sinkhorn iterations — only X changes):

    plan = plan_univ(points1, points2, src1, dst1, src2, dst2, transpose)
    KeR  = gather_ke_blocks(Ke, plan)          # once per pair
    Y    = assoc_matvec_univ(X, Kp, Ke, KeR, plan)   # per layer
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class UnivPlan(NamedTuple):
    """Host-built blocking metadata (numpy; static shapes per (pair, R1, R2)).

    Node indices below are in SORTED order (spatial sort along x); apply
    `perm1`/`perm2` to rows/cols of X/Kp before the kernel and scatter the
    result back (assoc_matvec_univ does both)."""
    r1: int
    r2: int
    b1: int                 # padded edges per row-block
    b2: int                 # padded edges per col-block
    n1p: int                # N1 padded to I·r1
    n2p: int
    transpose: bool
    perm1: np.ndarray       # (N1,) sorted-node -> original-node
    perm2: np.ndarray
    e1_idx: np.ndarray      # (I, B1) original edge id; pad = E1 (zero Ke row)
    d1_loc: np.ndarray      # (I, B1, 1) gather row local to 3R1 window
    s1_loc: np.ndarray      # (I, B1, 1) scatter row local to R1 block
    e2_idx: np.ndarray      # (J, B2)
    d2_loc: np.ndarray      # (J, B2, 1)
    s2_loc: np.ndarray      # (J, B2, 1)
    spill1: np.ndarray      # (K1,) original e1 ids handled by the XLA path
    spill2: np.ndarray      # (K2,) original e2 ids
    # orientation-swapped edge endpoints in ORIGINAL node ids (for the
    # XLA spill fallback)
    src1: np.ndarray
    dst1: np.ndarray
    src2: np.ndarray
    dst2: np.ndarray


def _plan_axis(points, scat, gath, r):
    """Sort nodes along x, group edges by scatter-endpoint block, localize
    indices to the block/window.

    Returns (perm, n_pad, e_idx (I,B), d_loc, s_loc, spill_ids, bmax)."""
    n = len(points)
    perm = np.argsort(points[:, 0], kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=np.int32)
    s = inv[scat]           # sorted coords
    d = inv[gath]
    n_pad = _round_up(max(n, r), r)
    nblk = n_pad // r
    blk = s // r
    # window test: gather endpoint within [ (b-1)·r, (b+2)·r )
    ok = (d >= (blk - 1) * r) & (d < (blk + 2) * r)
    spill = np.nonzero(~ok)[0].astype(np.int32)
    groups = [np.nonzero(ok & (blk == b))[0].astype(np.int32)
              for b in range(nblk)]
    bmax = max(1, max(len(g) for g in groups))
    ne = len(scat)
    e_idx = np.full((nblk, bmax), ne, np.int32)
    d_loc = np.zeros((nblk, bmax), np.int32)
    s_loc = np.zeros((nblk, bmax), np.int32)
    for b, g in enumerate(groups):
        e_idx[b, :len(g)] = g
        d_loc[b, :len(g)] = d[g] - (b - 1) * r   # local to the 3r window
        s_loc[b, :len(g)] = s[g] - b * r
    return (perm, n_pad, e_idx, d_loc[..., None], s_loc[..., None], spill,
            bmax)


def plan_univ(points1, points2, src1, dst1, src2, dst2, *,
              r1: int = 32, r2: int = 128, transpose: bool = False,
              b1: Optional[int] = None, b2: Optional[int] = None
              ) -> UnivPlan:
    """Build the blocking plan for one pair.

    `transpose=True` plans Kᵀ·x (the model orientation): scatter = dst,
    gather = src — matching assoc_matvec's role swap."""
    src1 = np.asarray(src1, np.int32)
    dst1 = np.asarray(dst1, np.int32)
    src2 = np.asarray(src2, np.int32)
    dst2 = np.asarray(dst2, np.int32)
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2
    # assoc_matvec semantics: scatter to src, gather from dst
    p1, n1p, e1i, d1l, s1l, sp1, bm1 = _plan_axis(
        np.asarray(points1), src1, dst1, r1)
    p2, n2p, e2i, d2l, s2l, sp2, bm2 = _plan_axis(
        np.asarray(points2), src2, dst2, r2)
    b1 = b1 or _round_up(bm1, 8)
    b2 = b2 or _round_up(bm2, 128)
    pad1 = b1 - e1i.shape[1]
    pad2 = b2 - e2i.shape[1]
    e1n = len(src1)
    e2n = len(src2)
    e1i = np.pad(e1i, ((0, 0), (0, pad1)), constant_values=e1n)
    d1l = np.pad(d1l, ((0, 0), (0, pad1), (0, 0)))
    s1l = np.pad(s1l, ((0, 0), (0, pad1), (0, 0)))
    e2i = np.pad(e2i, ((0, 0), (0, pad2)), constant_values=e2n)
    d2l = np.pad(d2l, ((0, 0), (0, pad2), (0, 0)))
    s2l = np.pad(s2l, ((0, 0), (0, pad2), (0, 0)))
    return UnivPlan(r1=r1, r2=r2, b1=b1, b2=b2, n1p=n1p, n2p=n2p,
                    transpose=transpose, perm1=p1, perm2=p2,
                    e1_idx=e1i, d1_loc=d1l, s1_loc=s1l,
                    e2_idx=e2i, d2_loc=d2l, s2_loc=s2l,
                    spill1=sp1, spill2=sp2,
                    src1=src1, dst1=dst1, src2=src2, dst2=dst2)


def gather_ke_blocks(Ke: jnp.ndarray, plan: UnivPlan,
                     dtype=None) -> jnp.ndarray:
    """(I·B1, J·B2) block-gathered Ke (padded slots read an appended zero
    row/col). One gather per pair, amortized over layers. Pass
    dtype=jnp.bfloat16 for the precision="default" kernel mode — KeR is
    the dominant HBM stream, so halving it halves the bandwidth bill."""
    e1, e2 = Ke.shape
    Kz = jnp.pad(Ke, ((0, 1), (0, 1)))
    rows = plan.e1_idx.reshape(-1)           # (I*B1,)
    cols = plan.e2_idx.reshape(-1)           # (J*B2,)
    out = Kz[rows][:, cols]
    return out.astype(dtype) if dtype is not None else out


def _univ_kernel(*refs, c: int, r1: int, r2: int, b1: int, b2: int,
                 prec, fused_ta: bool):
    # refs: 9 X windows (C,R1,R2), KeR tile (B1,B2), d1,s1 (1,B1,1),
    #       d2,s2 (1,B2,1), out (C,R1,R2)
    (x00, x01, x02, x10, x11, x12, x20, x21, x22, ke_ref,
     d1_ref, s1_ref, d2_ref, s2_ref, y_ref) = refs

    def mm(a, b, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(a, b, dims, precision=prec,
                                   preferred_element_type=jnp.float32)

    dt = x11.dtype
    d1 = d1_ref[0]                      # (B1, 1)
    s1 = s1_ref[0]
    d2 = d2_ref[0]                      # (B2, 1)
    s2 = s2_ref[0]

    def oh(idx_col, size):
        colid = jax.lax.broadcasted_iota(jnp.int32,
                                         (idx_col.shape[0], size), 1)
        return (idx_col == colid).astype(dt)

    r1g = oh(d1, 3 * r1)                # (B1, 3R1)
    s1g = oh(s1, r1)                    # (B1, R1)
    r2g = oh(d2, 3 * r2)                # (B2, 3R2)
    s2g = oh(s2, r2)                    # (B2, R2)
    ke = ke_ref[...]                    # (B1, B2)

    rows = ((x00, x01, x02), (x10, x11, x12), (x20, x21, x22))
    if fused_ta:
        # the ta contraction carries ~55% of the tile flops — run it for
        # ALL channels as ONE (C·3R1, 3R2)x(3R2, B2) matmul (better MXU
        # occupancy, 1 op instead of C), then finish per channel
        xw_all = jnp.concatenate(
            [jnp.concatenate([blk[...] for blk in row], axis=2)
             for row in rows], axis=1)                     # (C, 3R1, 3R2)
        ta_all = mm(xw_all.reshape(c * 3 * r1, 3 * r2), r2g,
                    (((1,), (1,)), ((), ())))              # (C·3R1, B2)
        for ch in range(c):
            ta = ta_all[ch * 3 * r1:(ch + 1) * 3 * r1]     # (3R1, B2)
            xe = mm(r1g, ta)                               # (B1, B2)
            t = mm(ke * xe, s2g)                           # (B1, R2)
            y_ref[ch] = mm(s1g, t, (((0,), (0,)), ((), ())))
        return
    for ch in range(c):
        xw = jnp.concatenate(
            [jnp.concatenate([blk[ch] for blk in row], axis=1)
             for row in rows], axis=0)                     # (3R1, 3R2)
        ta = mm(xw, r2g, (((1,), (1,)), ((), ())))         # (3R1, B2)
        xe = mm(r1g, ta)                                   # (B1, B2)
        t = mm(ke * xe, s2g)                               # (B1, R2)
        y_ref[ch] = mm(s1g, t, (((0,), (0,)), ((), ())))   # (R1, R2)


@functools.partial(jax.jit, static_argnames=("r1", "r2", "b1", "b2",
                                             "precision", "interpret",
                                             "fused_ta"))
def _univ_pallas(Xp, KeR, d1l, s1l, d2l, s2l, *, r1, r2, b1, b2,
                 precision="highest", interpret=False, fused_ta=False):
    """Xp: (C, n1p + 2r1, n2p + 2r2) halo-padded sorted features.
    Returns (C, n1p, n2p)."""
    c = Xp.shape[0]
    n1p = Xp.shape[1] - 2 * r1
    n2p = Xp.shape[2] - 2 * r2
    I, J = n1p // r1, n2p // r2

    x_specs = [
        pl.BlockSpec((c, r1, r2),
                     functools.partial(lambda i, j, dr, dc: (0, i + dr,
                                                             j + dc),
                                       dr=dr, dc=dc),
                     memory_space=pltpu.VMEM)
        for dr in range(3) for dc in range(3)
    ]
    grid = (I, J)
    out = pl.pallas_call(
        functools.partial(_univ_kernel, c=c, r1=r1, r2=r2, b1=b1, b2=b2,
                          prec=_PRECS[precision], fused_ta=fused_ta),
        grid=grid,
        in_specs=x_specs + [
            pl.BlockSpec((b1, b2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),          # KeR tile
            pl.BlockSpec((1, b1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # d1_loc
            pl.BlockSpec((1, b1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # s1_loc
            pl.BlockSpec((1, b2, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),          # d2_loc
            pl.BlockSpec((1, b2, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),          # s2_loc
        ],
        out_specs=pl.BlockSpec((c, r1, r2), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n1p, n2p), jnp.float32),
        interpret=interpret,
    )(*([Xp] * 9 + [KeR, d1l, s1l, d2l, s2l]))
    return out


_PRECS = {"highest": jax.lax.Precision.HIGHEST,
          "default": jax.lax.Precision.DEFAULT}


def assoc_matvec_univ(X, Kp, Ke, plan: UnivPlan,
                      KeR: Optional[jnp.ndarray] = None, *,
                      precision: str = "highest",
                      interpret: bool = False,
                      fused_ta: bool = False) -> jnp.ndarray:
    """Drop-in K·vec(X) / Kᵀ·vec(X) (orientation baked into the plan) for
    UNIV-scale pairs. Same contract as ops.assoc.assoc_matvec.

    Spilled edges (outside the 3-block locality window — rare for
    spatially-sorted Delaunay graphs) go through the XLA gather path and
    are added on top, so the result is exact for arbitrary graphs.
    """
    from ..ops.assoc import assoc_matvec

    n1, n2, c = X.shape
    compute_dtype = jnp.bfloat16 if precision == "default" else X.dtype
    if KeR is None:
        KeR = gather_ke_blocks(Ke, plan, dtype=compute_dtype)
    elif KeR.dtype != compute_dtype:
        KeR = KeR.astype(compute_dtype)
    p1 = jnp.asarray(plan.perm1)
    p2 = jnp.asarray(plan.perm2)
    Xs = X[p1][:, p2].astype(compute_dtype)           # sorted order
    Xs = jnp.transpose(Xs, (2, 0, 1))                 # (C, N1, N2)
    Xp = jnp.pad(Xs, ((0, 0),
                      (plan.r1, plan.n1p - n1 + plan.r1),
                      (plan.r2, plan.n2p - n2 + plan.r2)))
    Ys = _univ_pallas(Xp, KeR,
                      jnp.asarray(plan.d1_loc), jnp.asarray(plan.s1_loc),
                      jnp.asarray(plan.d2_loc), jnp.asarray(plan.s2_loc),
                      r1=plan.r1, r2=plan.r2, b1=plan.b1, b2=plan.b2,
                      precision=precision, interpret=interpret,
                      fused_ta=fused_ta)
    Ys = jnp.transpose(Ys, (1, 2, 0))[:n1, :n2]       # sorted (N1, N2, C)
    Y = jnp.zeros_like(X).at[p1[:, None], p2[None, :]].set(Ys)

    # exact remainder: spilled e1 rows (vs all e2) + kept e1 (vs spilled e2)
    # — the plan stores the orientation-swapped endpoints, so the fallback
    # runs assoc_matvec in its plain (non-transposed) form
    zero_kp = jnp.zeros_like(Kp)
    if len(plan.spill1):
        sp = plan.spill1
        Y = Y + assoc_matvec(X, zero_kp, Ke[jnp.asarray(sp)],
                             plan.src1[sp], plan.dst1[sp],
                             plan.src2, plan.dst2)
    if len(plan.spill2):
        sp2 = plan.spill2
        keep1 = np.setdiff1d(np.arange(Ke.shape[0]), plan.spill1)
        Y = Y + assoc_matvec(X, zero_kp,
                             Ke[jnp.asarray(keep1)][:, jnp.asarray(sp2)],
                             plan.src1[keep1], plan.dst1[keep1],
                             plan.src2[sp2], plan.dst2[sp2])
    return Y + Kp[..., None] * X


__all__ = ["UnivPlan", "plan_univ", "gather_ke_blocks", "assoc_matvec_univ"]
