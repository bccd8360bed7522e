"""Pallas TPU kernel for the factorized association-graph aggregation.

Computes, per pair (the SpMM hot op — replaces the reference's
csr_dot_csc/csr_dot_diag CUDA kernels, src/extension/sparse_dot/*):

    Y[a, b, c] = Kp[a, b]·X[a, b, c]
               + Σ_{e1: s1(e1)=a} Σ_{e2: s2(e2)=b} Ke[e1, e2] · X[g1(e1), g2(e2), c]

Strategy: the irregular gathers/scatters become dense one-hot matmuls built
*inside* the kernel from the edge-index vectors (MXU-friendly; TPUs have no
fast random scatter), with every intermediate VMEM-resident:

  XG2[c, n, e2] = X[c, n, g2(e2)]            (one matmul per channel, once)
  per e1-block B, per channel c:
    rows  = OneHot(g1[B]) @ XG2[c]           (gather rows)      (B, E2)
    w     = Ke[B] ⊙ rows                     (VPU)
    t     = w @ OneHot(s2)                   (scatter e2→n2)    (B, N2)
    Y[c] += OneHot(s1[B])ᵀ @ t               (scatter block→n1) (N1, N2)

Data is channel-major (C, N1, N2) so every matmul is plain 2-D with the lane
dimension ∈ {N2, E2} — Mosaic supports no lane-splitting reshapes. The C loop
is a static Python unroll (C = 1 or 17 in the model).

The E1 grid dimension streams edge blocks through VMEM, so association
graphs far larger than VMEM (UNIV_SIZE-scale, n1·n2=360k) pipeline cleanly —
the single-chip half of the edge-partitioned design (parallel/edge_partition
shards the same E1 axis across chips).

Index vectors ride in VMEM as (E, 1) int32 (SMEM only serves scalar loads).
Padding contract: padded e1/e2 slots must carry Ke == 0 (they alias node 0).

RUNTIME TRAP (axon PJRT, empirically characterized in round 2): if the FIRST
Mosaic/Pallas compilation in a process happens after an XLA program containing
scatter ops has executed, every pallas_call in that process dispatches at
~33 ms flat (~350x slow) — permanently; jax.clear_caches() + recompile does
not recover. Compiling any Pallas kernel BEFORE the first scatter program
makes all subsequent Pallas programs fast, even ones compiled later. Call
`inoculate()` early in any process that mixes Pallas kernels with XLA
scatter/segment-sum programs (bench.py does).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def inoculate():
    """Compile + run one trivial Pallas kernel. See the module docstring:
    on the axon runtime the first Pallas compilation must precede the first
    XLA scatter execution or every pallas_call runs ~350x slow forever."""
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))


def _one_hot(idx_col, size, dtype):
    """idx_col: (L, 1) int32 → (L, size) one-hot (2D iota for TPU)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], size), 1)
    return (idx_col == cols).astype(dtype)


# HIGHEST precision: the MXU's default bf16 input rounding costs ~1% absolute
# error vs the f32 segment-sum reference; 3-pass f32 matmuls restore parity.
# DEFAULT (single bf16 pass) is ~3x the MXU throughput — the production mode
# for GNN aggregation where bf16 message precision is standard.
_PRECS = {"highest": jax.lax.Precision.HIGHEST,
          "default": jax.lax.Precision.DEFAULT}


def _kernel(x_ref, kp_ref, ke_ref, g1_ref, s1_ref, g2_ref, s2_ref,
            y_ref, xg2_ref, acc_ref,
            *, n1: int, n2: int, c: int, e2: int, prec):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def _mm(a, b, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(a, b, dims, precision=prec,
                                   preferred_element_type=jnp.float32)

    @pl.when(step == 0)
    def _init():
        oh_g2_t = _one_hot(g2_ref[...], n2, x_ref.dtype)  # (E2, N2)
        for ch in range(c):
            # XG2[ch] = X[ch] @ OneHot(g2)ᵀ : (N1, N2) @ (N2, E2)
            xg2_ref[ch] = _mm(x_ref[ch], oh_g2_t, (((1,), (1,)), ((), ())))
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ke = ke_ref[...]                                     # (B, E2)
    oh_g1 = _one_hot(g1_ref[...], n1, x_ref.dtype)       # (B, N1)
    oh_s1 = _one_hot(s1_ref[...], n1, x_ref.dtype)       # (B, N1)
    oh_s2 = _one_hot(s2_ref[...], n2, x_ref.dtype)       # (E2, N2)

    for ch in range(c):
        rows = _mm(oh_g1, xg2_ref[ch])                   # (B, E2)
        t = _mm(rows * ke, oh_s2)                        # (B, N2)
        contrib = _mm(oh_s1, t, (((0,), (0,)), ((), ())))  # (N1, N2)
        acc_ref[ch] += contrib

    @pl.when(step == nsteps - 1)
    def _finalize():
        kp = kp_ref[...]
        for ch in range(c):
            y_ref[ch] = acc_ref[ch] + kp * x_ref[ch]


@functools.partial(jax.jit,
                   static_argnames=("transpose", "block_e1", "precision",
                                    "interpret"))
def assoc_matvec_pallas(X, Kp, Ke, src1, dst1, src2, dst2, *,
                        transpose: bool = False, block_e1: int = 128,
                        precision: str = "highest",
                        interpret: bool = False):
    """Pallas K·vec(X) / Kᵀ·vec(X) for one pair.

    Same contract as ops.assoc.assoc_matvec. X: (N1, N2, C); Ke: (E1, E2).
    E1 must be divisible by block_e1. precision="highest" is f32-exact
    (3-pass MXU); "default" is single-pass bf16 (~1e-2 rel error, ~3x faster).
    """
    n1, n2, c = X.shape
    e1, e2 = Ke.shape
    assert e1 % block_e1 == 0, (e1, block_e1)
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2

    grid = (e1 // block_e1,)
    xc = jnp.transpose(X, (2, 0, 1))                      # (C, N1, N2)
    out = pl.pallas_call(
        functools.partial(_kernel, n1=n1, n2=n2, c=c, e2=e2,
                          prec=_PRECS[precision]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, n1, n2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # X (ch-major)
            pl.BlockSpec((n1, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # Kp
            pl.BlockSpec((block_e1, e2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # Ke block
            pl.BlockSpec((block_e1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # g1 block
            pl.BlockSpec((block_e1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # s1 block
            pl.BlockSpec((e2, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # g2
            pl.BlockSpec((e2, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # s2
        ],
        out_specs=pl.BlockSpec((c, n1, n2), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, n1, e2), jnp.float32),   # XG2
            pltpu.VMEM((c, n1, n2), jnp.float32),   # accumulator
        ],
        out_shape=jax.ShapeDtypeStruct((c, n1, n2), X.dtype),
        interpret=interpret,
    )(xc, Kp, Ke, dst1[:, None], src1[:, None], dst2[:, None], src2[:, None])
    return jnp.transpose(out, (1, 2, 0))


# --------------------------------------------------------------------------
# UNIV-scale variant: triple-blocked (channel-chunk × e2-block × e1-block)
# so no buffer exceeds VMEM and the (E1, E2, C) weighted-product tensor is
# never materialized in HBM — the single-chip "long-context" kernel for
# association graphs at UNIV_SIZE (n=600: 360k assoc nodes, ~13M assoc
# edges; XLA's gather path runs ~43 ms/pair here, this kernel streams it).
# --------------------------------------------------------------------------

def _kernel_large(x_ref, ke_ref, g1_ref, s1_ref, g2_ref, s2_ref,
                  y_ref, xg2_ref, acc_ref,
                  *, n1: int, n2: int, cb: int, prec):
    j = pl.program_id(1)
    i = pl.program_id(2)
    nj = pl.num_programs(1)
    ni = pl.num_programs(2)

    def mm(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())), precision=prec,
                                   preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _build_xg2():
        oh_g2 = _one_hot(g2_ref[...], n2, x_ref.dtype)   # (B2, N2)
        for ch in range(cb):
            xg2_ref[ch] = mm(x_ref[ch], oh_g2, (((1,), (1,))))

    @pl.when((j == 0) & (i == 0))
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ke = ke_ref[...]                                     # (B1, B2)
    oh_g1 = _one_hot(g1_ref[...], n1, x_ref.dtype)       # (B1, N1)
    oh_s1 = _one_hot(s1_ref[...], n1, x_ref.dtype)       # (B1, N1)
    oh_s2 = _one_hot(s2_ref[...], n2, x_ref.dtype)       # (B2, N2)
    for ch in range(cb):
        rows = mm(oh_g1, xg2_ref[ch], (((1,), (0,))))    # (B1, B2)
        t = mm(rows * ke, oh_s2, (((1,), (0,))))         # (B1, N2)
        acc_ref[ch] += mm(oh_s1, t, (((0,), (0,))))      # (N1, N2)

    # diag(Kp)·X is added host-side (keeps Kp out of VMEM)
    @pl.when((j == nj - 1) & (i == ni - 1))
    def _finalize():
        for ch in range(cb):
            y_ref[ch] = acc_ref[ch]


@functools.partial(jax.jit,
                   static_argnames=("transpose", "block_e1", "block_e2",
                                    "block_c", "precision", "interpret"))
def assoc_matvec_pallas_large(X, Kp, Ke, src1, dst1, src2, dst2, *,
                              transpose: bool = False, block_e1: int = 256,
                              block_e2: int = 256, block_c: int = 1,
                              precision: str = "default",
                              interpret: bool = False):
    """Blocked Pallas K·vec(X) for pairs whose Ke/X exceed VMEM.

    Requires E1 % block_e1 == E2 % block_e2 == 0 with block_e1 % 8 == 0 and
    block_e2 % 128 == 0 (Mosaic tiling); C is zero-padded to a multiple of
    block_c. `precision="default"` uses bf16 MXU passes (~1% error);
    "highest" is f32-exact (verified 1.5e-5 vs the XLA op at n=600).

    Status: correct and VMEM-bounded at UNIV scale (n=600, e≈4k: 360k assoc
    nodes); wall-clock currently parity with XLA's gather path (~42 ms/pair)
    — the one-hot gathers inflate MXU flops ~100x and the 3-level grid pays
    per-step overhead. The planned speed-of-light revision streams Ke tiles
    by explicit double-buffered DMA and uses index-driven dynamic row
    gathers instead of one-hot matmuls.
    """
    n1, n2, c = X.shape
    e1, e2 = Ke.shape
    assert e1 % block_e1 == 0 and e2 % block_e2 == 0, (e1, e2)
    if transpose:
        src1, dst1 = dst1, src1
        src2, dst2 = dst2, src2
    c_pad = (-c) % block_c
    if c_pad:
        X = jnp.concatenate(
            [X, jnp.zeros((n1, n2, c_pad), X.dtype)], axis=-1)
    c_total = c + c_pad
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    grid = (c_total // block_c, e2 // block_e2, e1 // block_e1)
    xc = jnp.transpose(X, (2, 0, 1))                     # (C, N1, N2)
    out = pl.pallas_call(
        functools.partial(_kernel_large, n1=n1, n2=n2, cb=block_c,
                          prec=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_c, n1, n2), lambda cb, j, i: (cb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e1, block_e2), lambda cb, j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e1, 1), lambda cb, j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e1, 1), lambda cb, j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e2, 1), lambda cb, j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e2, 1), lambda cb, j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_c, n1, n2),
                               lambda cb, j, i: (cb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_c, n1, block_e2), jnp.float32),
            pltpu.VMEM((block_c, n1, n2), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((c_total, n1, n2), X.dtype),
        interpret=interpret,
    )(xc, Ke, dst1[:, None], src1[:, None], dst2[:, None], src2[:, None])
    y = jnp.transpose(out, (1, 2, 0))[:, :, :c]
    return y + Kp[:, :, None] * X[:, :, :c]
