"""Pallas TPU kernel for the factorized association-graph aggregation.

Computes, per pair (the SpMM hot op — replaces the reference's
csr_dot_csc/csr_dot_diag CUDA kernels, src/extension/sparse_dot/*):

    Y[a, b, c] = Kp[a, b]·X[a, b, c]
               + Σ_{e1: s1(e1)=a} Σ_{e2: s2(e2)=b} Ke[e1, e2] · X[g1(e1), g2(e2), c]

Strategy: the irregular gathers/scatters become dense one-hot matmuls built
*inside* the kernel from the prefetched index vectors (MXU-friendly; TPUs
have no fast random scatter), with every intermediate VMEM-resident:

  XG2[n, e2, c] = X[n, g2(e2), c]            (one matmul, once per pair)
  per e1-block B:
    rows  = OneHot(g1[B]) @ XG2              (gather rows)
    w     = Ke[B] ⊙ rows                     (VPU)
    t     = w @ OneHot(s2)ᵀ                  (scatter e2→n2)
    Y    += OneHot(s1[B])ᵀ @ t               (scatter e1-block→n1)

The E1 grid dimension streams edge blocks through VMEM, so association
graphs far larger than VMEM (UNIV_SIZE-scale, n1·n2=360k) pipeline cleanly —
the single-chip half of the edge-partitioned design (parallel/edge_partition
shards the same E1 axis across chips).

Padding contract: padded e1/e2 slots must carry Ke == 0 (they alias node 0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _one_hot(idx, size, dtype):
    """(len(idx), size) one-hot built from broadcasted iota (TPU needs 2D)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], size), 1)
    return (idx[:, None] == cols).astype(dtype)


def _kernel(g1_ref, s1_ref, g2_ref, s2_ref,      # scalar-prefetch (SMEM)
            x_ref, kp_ref, ke_ref,               # VMEM inputs
            y_ref,                               # VMEM output
            xg2_ref, acc_ref,                    # VMEM scratch
            *, block_e1: int, n1: int, n2: int, c: int, e2: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    g2 = g2_ref[...]
    s2 = s2_ref[...]

    @pl.when(step == 0)
    def _init():
        # XG2[n, e2*c] = X[n, g2(e2), c]  via  OneHot(g2) @ X-matrix
        oh_g2 = _one_hot(g2, n2, x_ref.dtype)            # (E2, N2)
        x = x_ref[...].reshape(n1, n2, c)
        # (E2, N2) @ (N2, C) batched over n1 → do as (N1·C, N2) layout:
        xt = jnp.swapaxes(x, 1, 2).reshape(n1 * c, n2)   # (N1*C, N2)
        g = jax.lax.dot_general(
            xt, oh_g2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (N1*C, E2)
        xg2_ref[...] = g.reshape(n1, c, e2)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g1 = g1_ref[pl.ds(step * block_e1, block_e1)]
    s1 = s1_ref[pl.ds(step * block_e1, block_e1)]
    ke = ke_ref[...]                                     # (block_e1, E2)

    # gather rows of XG2 by g1 → (B, E2, C)
    oh_g1 = _one_hot(g1, n1, x_ref.dtype)                # (B, N1)
    xg2 = xg2_ref[...].reshape(n1, c * e2)
    rows = jax.lax.dot_general(
        oh_g1, xg2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (B, C*E2)
    rows = rows.reshape(-1, c, e2)

    w = rows * ke[:, None, :]                            # (B, C, E2)

    # scatter e2 → n2: w @ OneHot(s2)  (E2, N2)
    oh_s2 = _one_hot(s2, n2, x_ref.dtype)                # (E2, N2)
    t = jax.lax.dot_general(
        w.reshape(-1, e2), oh_s2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (B*C, N2)
    t = t.reshape(-1, c, n2)                             # (B, C, N2)

    # scatter block rows → n1: OneHot(s1)ᵀ @ t
    oh_s1 = _one_hot(s1, n1, x_ref.dtype)                # (B, N1)
    contrib = jax.lax.dot_general(
        oh_s1, t.reshape(-1, c * n2), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (N1, C*N2)
    acc_ref[...] += contrib.reshape(n1, c, n2)

    @pl.when(step == nsteps - 1)
    def _finalize():
        x = x_ref[...].reshape(n1, n2, c)
        kp = kp_ref[...]
        y = jnp.swapaxes(acc_ref[...], 1, 2)             # (N1, N2, C)
        y_ref[...] = (y + kp[:, :, None] * x).reshape(n1, n2 * c)


@functools.partial(jax.jit,
                   static_argnames=("transpose", "block_e1", "interpret"))
def assoc_matvec_pallas(X, Kp, Ke, src1, dst1, src2, dst2, *,
                        transpose: bool = False, block_e1: int = 128,
                        interpret: bool = False):
    """Pallas K·vec(X) / Kᵀ·vec(X) for one pair.

    Same contract as ops.assoc.assoc_matvec. X: (N1, N2, C); Ke: (E1, E2).
    E1 must be divisible by block_e1.
    """
    n1, n2, c = X.shape
    e1, e2 = Ke.shape
    assert e1 % block_e1 == 0, (e1, block_e1)
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2

    grid = (e1 // block_e1,)
    out = pl.pallas_call(
        functools.partial(_kernel, block_e1=block_e1, n1=n1, n2=n2, c=c,
                          e2=e2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n1, n2 * c), lambda i, *_: (0, 0)),   # X
                pl.BlockSpec((n1, n2), lambda i, *_: (0, 0)),       # Kp
                pl.BlockSpec((block_e1, e2), lambda i, *_: (i, 0)),  # Ke
            ],
            out_specs=pl.BlockSpec((n1, n2 * c), lambda i, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n1, c, e2), jnp.float32),   # XG2
                pltpu.VMEM((n1, c, n2), jnp.float32),   # accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n1, n2 * c), X.dtype),
        interpret=interpret,
    )(dst1, src1, dst2, src2, X.reshape(n1, n2 * c), Kp, Ke)
    return out.reshape(n1, n2, c)
