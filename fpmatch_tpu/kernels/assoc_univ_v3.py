"""UNIV-scale association matvec, kernel v3: padded-degree dense form.

Replaces the v2 blocked one-hot-matmul kernel (assoc_univ.py, 0.53 G edges/s
— the FLOP-inflated dead end) with the minimal-FLOP chunked formulation's
math (ops/assoc.assoc_matvec_chunked, the measured XLA dispatch winner at
2.45 G edges/s) restructured around what Mosaic actually lowers fast on this
chip (probed 2026-08-20):

  * within-tile LANE gather (`take_along_axis(x, idx, axis=1)`, idx < 128,
    shapes equal) — native dynamic lane shuffle;
  * row DMA HBM→VMEM with scalar-prefetched indices;
  * small MXU matmuls.
  Sublane (axis-0) dynamic gather is NOT usable (3-minute compiles at 8
  rows, backend crash at 7200), and there is no scatter — so both the
  chunked form's e2-axis gather *and* its segment-sum scatters must be
  re-expressed.

Reformulation (reference equivalent of the whole file:
src/extension/sparse_dot/csr_dot_csc_cuda.cu — CSR×CSC row-program):

  Y[i1, i2, c] = Kp[i1,i2]·X[i1,i2,c]
               + Σ_{s1 < S1} Σ_{s2 < S2}
                   KeP[i1,s1,i2,s2] · X[in1(i1,s1), in2(i2,s2), c]

where each node's incident edges are padded to fixed slot counts
(S1 = max out-degree of graph 1, S2 of graph 2; pad slots carry Ke = 0), so
BOTH segment-sums become dense reductions over static slot axes — no
scatter. The e2-axis gather becomes, with graph-2 nodes spatially sorted,
a *banded lane gather*: in2(i2, s2) lies within ±band of i2 (Delaunay
locality), so for each aligned 128-lane window of i2 the gathered lanes come
from at most the 3 neighbouring windows, each a verified within-tile lane
gather + select (windows with no hits are skipped via host-computed flags;
true band violators are spilled to the XLA path).

Layout: one kernel row-tile handles 8 output rows i1 × C=16 channels on the
128 sublanes (r = 8·? no — r = i1_local·C + c, i1-major); lanes are the
sorted-i2 axis padded to a multiple of 128. The per-(i1,s1) input row
X_T[in1(i1,s1)] = (C, N2p) is DMA'd from HBM with double buffering across
grid steps; KeP arrives through the normal Pallas block pipeline. The
per-row Ke vector (8, 128) is broadcast to all 16 channel sublanes with one
tiny MXU matmul (E·kv, E the static 0/1 expansion matrix) — Mosaic has no
per-element sublane broadcast.

FLOP inflation vs the minimal chunked form is (S1·S2)/(d̄1·d̄2) ≈ 2–4× for
Delaunay degree distributions — paid in VPU ops that now run entirely from
VMEM, vs the chunked XLA path's ~1.8 GB/matvec of HBM round-trips for its
(chunk, E2, C) intermediates.

Pipeline per pair (plan + KeP are Ke-only — amortized over GNN layers):

    plan = plan_univ_v3(pts1, pts2, src1, dst1, src2, dst2, transpose=True)
    KeP  = build_kep(Ke, plan)                    # once per pair (XLA)
    Y    = assoc_matvec_univ_v3(X, Kp, Ke, plan, KeP)   # per layer
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.assoc import assoc_matvec

I1_TILE = 8          # output rows per kernel row-tile
LANE = 128           # lane-window width
C_DEFAULT = 16

# perf-bisection switches (debug only; wrong results when set):
# comma-separated list in FPMATCH_UNIV3_ABLATE from
# {nogather, nodot, nocond, nodma}
import os as _os
_ABLATE = set(filter(None,
                     _os.environ.get("FPMATCH_UNIV3_ABLATE", "").split(",")))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class UnivPlanV3(NamedTuple):
    """Host-built metadata (numpy, static shapes per pair)."""
    n1: int
    n2: int
    n1p: int            # n1 padded to I1_TILE
    n2p: int            # n2 padded to LANE
    s1: int             # graph-1 slots per output row
    s2: int             # graph-2 slots per output column
    transpose: bool
    perm2: np.ndarray   # (n2,) sorted-col -> original-col
    inv2: np.ndarray    # (n2,) original-col -> sorted-col
    d1_slot: np.ndarray  # (n1p, s1) int32 in1 row per slot (pad: 0)
    e1_slot: np.ndarray  # (n1p, s1) int32 edge id (pad: E1 -> zero Ke row)
    e2_slot: np.ndarray  # (s2, n2p) int32 edge id (pad: E2)
    # banded gather tables, per (s2, window, neighbour k in {w-1, w, w+1}):
    gat_idx: np.ndarray  # (s2, W, 3, LANE) int32 local lane index
    gat_msk: np.ndarray  # (s2, W, 3, LANE) float32 1.0 on hits
    win_any: np.ndarray  # (s2, W, 3) int32 1 if neighbour k has any hit
    # spilled edges (band violations / slot overflow), original node ids,
    # orientation already swapped to (out, in) roles:
    spill1: np.ndarray   # (k1,) e1 ids whose ALL pairs go to the XLA path
    spill2: np.ndarray   # (k2,) e2 ids
    out1: np.ndarray     # (E1,) swapped endpoints for the spill fallback
    in1: np.ndarray
    out2: np.ndarray
    in2: np.ndarray


def plan_univ_v3(pts2: np.ndarray, src1, dst1, src2, dst2,
                 transpose: bool = True, s1_cap: int = 16,
                 s2_cap: int = 16) -> UnivPlanV3:
    """Build the padded-degree plan.

    :param pts2: (n2, 2) graph-2 node coordinates (spatial sort key). Graph 1
        needs no sort — its rows are DMA-gathered individually.
    :param transpose: plan Kᵀ·x (the model's orientation): out = dst,
        in = src per assoc_matvec's role swap.
    """
    src1 = np.asarray(src1, np.int32)
    dst1 = np.asarray(dst1, np.int32)
    src2 = np.asarray(src2, np.int32)
    dst2 = np.asarray(dst2, np.int32)
    # assoc_matvec semantics: Y[src] += Ke·X[dst]; transpose=True swaps the
    # roles, so its output rows are dst and its gathered rows src (matching
    # edge_partition.plan_row_shards)
    if transpose:
        out1, in1 = dst1, src1
        out2, in2 = dst2, src2
    else:
        out1, in1 = src1, dst1
        out2, in2 = src2, dst2
    e1, e2 = len(out1), len(out2)
    n1 = int(max(out1.max(), in1.max())) + 1 if e1 else 1
    n2 = len(pts2)

    # spatial sort of graph-2 nodes (x-major) => banded in2-vs-out2
    perm2 = np.argsort(pts2[:, 0], kind="stable").astype(np.int32)
    inv2 = np.empty_like(perm2)
    inv2[perm2] = np.arange(n2, dtype=np.int32)

    n1p = _round_up(n1, I1_TILE)
    n2p = _round_up(n2, LANE)
    W = n2p // LANE

    # ---- graph-1 slots ----------------------------------------------------
    order1 = np.argsort(out1, kind="stable")
    deg1 = np.bincount(out1, minlength=n1)
    s1 = int(min(max(deg1.max(), 1), s1_cap))
    d1_slot = np.zeros((n1p, s1), np.int32)
    e1_slot = np.full((n1p, s1), e1, np.int32)
    spill1 = []
    starts = np.zeros(n1 + 1, np.int64)
    np.cumsum(deg1, out=starts[1:])
    for i in range(n1):
        es = order1[starts[i]:starts[i + 1]]
        keep = es[:s1]
        d1_slot[i, :len(keep)] = in1[keep]
        e1_slot[i, :len(keep)] = keep
        spill1.extend(es[s1:])

    # ---- graph-2 slots + banded gather tables ------------------------------
    o2s = inv2[out2]                 # sorted out-column per edge
    i2s = inv2[in2]                  # sorted in-column per edge
    order2 = np.argsort(o2s, kind="stable")
    deg2 = np.bincount(o2s, minlength=n2)
    s2 = int(min(max(deg2.max(), 1), s2_cap))
    e2_slot = np.full((s2, n2p), e2, np.int32)
    d2s = np.zeros((s2, n2p), np.int32)      # sorted in-column per slot
    d2_ok = np.zeros((s2, n2p), bool)
    spill2 = []
    starts2 = np.zeros(n2 + 1, np.int64)
    np.cumsum(deg2, out=starts2[1:])
    for i in range(n2):
        es = order2[starts2[i]:starts2[i + 1]]
        w = i // LANE
        kept = 0
        for eid in es:
            tgt = i2s[eid]
            if kept < s2 and abs(tgt // LANE - w) <= 1:
                e2_slot[kept, i] = eid
                d2s[kept, i] = tgt
                d2_ok[kept, i] = True
                kept += 1
            else:
                spill2.append(eid)
    # pad slots gather lane 0 of the centre window with mask 0
    d2s[~d2_ok] = 0

    gat_idx = np.zeros((s2, W, 3, LANE), np.int32)
    gat_msk = np.zeros((s2, W, 3, LANE), np.float32)
    for s in range(s2):
        for w in range(W):
            cols = slice(w * LANE, (w + 1) * LANE)
            tgt = d2s[s, cols]
            ok = d2_ok[s, cols]
            for k in range(3):
                wk = w + k - 1
                if wk < 0 or wk >= W:
                    continue
                hit = ok & (tgt // LANE == wk)
                gat_idx[s, w, k][hit] = tgt[hit] - wk * LANE
                gat_msk[s, w, k][hit] = 1.0
    win_any = (gat_msk.sum(-1) > 0).astype(np.int32)

    return UnivPlanV3(
        n1=n1, n2=n2, n1p=n1p, n2p=n2p, s1=s1, s2=s2, transpose=transpose,
        perm2=perm2, inv2=inv2, d1_slot=d1_slot, e1_slot=e1_slot,
        e2_slot=e2_slot, gat_idx=gat_idx, gat_msk=gat_msk, win_any=win_any,
        spill1=np.asarray(sorted(spill1), np.int32),
        spill2=np.asarray(sorted(set(spill2)), np.int32),
        out1=out1, in1=in1, out2=out2, in2=in2)


def build_kep(Ke: jnp.ndarray, plan: UnivPlanV3,
              dtype=jnp.float32) -> jnp.ndarray:
    """Gather Ke into the padded-degree tensor (device, once per pair):
    KeP[t1, s1, s2, r8, j] = Ke[e1_slot[8·t1+r8, s1], e2_slot[s2, j]]
    with pad slots reading appended zero row/col."""
    e1, e2 = Ke.shape
    Kz = jnp.pad(Ke, ((0, 1), (0, 1))).astype(dtype)
    kep = Kz[plan.e1_slot][:, :, plan.e2_slot]        # (n1p, s1, s2, n2p)
    t1 = plan.n1p // I1_TILE
    kep = kep.reshape(t1, I1_TILE, plan.s1, plan.s2, plan.n2p)
    return jnp.transpose(kep, (0, 2, 3, 1, 4))        # (t1, s1, s2, 8, n2p)


def _kernel(d1_ref,                      # SMEM (n1p, s1) int32
            win_ref,                     # SMEM (s2, W, 3) int32
            xt_ref,                      # ANY  (n1p, C, n2p)
            kep_ref,                     # VMEM block (1, 1, s2, 8, n2p)
            idx_ref,                     # VMEM (s2, W, 3, LANE) int32
            msk_ref,                     # VMEM (s2, W, 3, LANE) f32
            y_ref,                       # VMEM block (1, 128, n2p) out
            r_ref,                       # scratch (2, 128, n2p)
            sem,                         # DMA sems (2, I1_TILE)
            acc_ref,                     # scratch (128, n2p) f32
            *, s1: int, s2: int, n2p: int, c: int):
    t1 = pl.program_id(0)
    si = pl.program_id(1)
    n_t1 = pl.num_programs(0)
    n_s1 = pl.num_programs(1)
    W = n2p // LANE
    step = t1 * n_s1 + si

    def dma(slot, tt, ss):
        """Start the 8 row DMAs for grid step (tt, ss) into r_ref[slot]."""
        if "nodma" in _ABLATE:
            return
        for i in range(I1_TILE):
            row = d1_ref[tt * I1_TILE + i, ss]
            pltpu.make_async_copy(
                xt_ref.at[row],
                r_ref.at[slot, pl.ds(i * c, c), :],
                sem.at[slot, i],
            ).start()

    def wait(slot):
        if "nodma" in _ABLATE:
            return
        for i in range(I1_TILE):
            pltpu.make_async_copy(
                xt_ref.at[0],
                r_ref.at[slot, pl.ds(i * c, c), :],
                sem.at[slot, i],
            ).wait()

    # double buffer: step 0 starts its own DMA; every step prefetches step+1
    @pl.when(step == 0)
    def _():
        dma(0, t1, si)

    nxt = step + 1
    @pl.when(nxt < n_t1 * n_s1)
    def _():
        dma(nxt % 2, nxt // n_s1, nxt % n_s1)

    wait(step % 2)
    R = r_ref[step % 2]                                   # (128, n2p)

    @pl.when(si == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # static 0/1 channel-expansion matrix: E[r, i] = 1 iff r // c == i
    rows = jax.lax.broadcasted_iota(jnp.int32, (I1_TILE * c, I1_TILE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (I1_TILE * c, I1_TILE), 1)
    E = (rows // c == cols).astype(jnp.float32)

    def s2_body(s, _):
        kv = kep_ref[0, 0, s]                             # (8, n2p)
        for w in range(W):                                # static windows
            g = jnp.zeros((I1_TILE * c, LANE), jnp.float32)
            # all 3 neighbour windows run UNCONDITIONALLY: inactive ones
            # multiply by an all-zero mask. An earlier variant guarded each
            # with lax.cond on a host flag — the ~165 scalar branches per
            # grid step cost 16 of the kernel's 26 ms (ablation matrix,
            # logs/univ3_ablate.log); masked-dead work is free by
            # comparison.
            for k in range(3):
                wk = w + k - 1
                if wk < 0 or wk >= W:
                    continue
                win = R[:, wk * LANE:(wk + 1) * LANE]
                if "nogather" in _ABLATE:
                    gk = win
                else:
                    idx = jnp.broadcast_to(idx_ref[s, w, k][None, :],
                                           (I1_TILE * c, LANE))
                    gk = jnp.take_along_axis(win, idx, axis=1)
                g = g + gk * msk_ref[s, w, k][None, :]
            # per-row Ke broadcast: row group i1 (16 channel sublanes)
            # multiplies by kv[i1]. A (128,8)@(8,128) HIGHEST-precision MXU
            # expand cost 11 of the 26 ms (6-pass emulation, 55 tiny
            # matmuls/step); 8 static row-slices with native (1,128) ->
            # (16,128) sublane broadcast are ~free.
            if "nodot" not in _ABLATE:
                ws = slice(w * LANE, (w + 1) * LANE)
                for i in range(I1_TILE):
                    rs = slice(i * c, (i + 1) * c)
                    acc_ref[rs, ws] += g[rs] * kv[i:i + 1, ws]
            else:
                acc_ref[:, w * LANE:(w + 1) * LANE] += g
        return 0

    jax.lax.fori_loop(0, s2, s2_body, 0, unroll=False)

    @pl.when(si == n_s1 - 1)
    def _():
        y_ref[0] = acc_ref[...]


def assoc_matvec_univ_v3(X: jnp.ndarray, Kp: jnp.ndarray, Ke: jnp.ndarray,
                         plan: UnivPlanV3, KeP: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """K·vec(X) (orientation fixed by the plan) via the v3 kernel.

    :param X: (n1, n2, C) f32; :param Kp: (n1, n2); :param Ke: (E1, E2)
        (used only for the spill fallback); :param KeP: from `build_kep`.
    """
    n1, n2, c = X.shape
    p = plan
    assert n1 == p.n1 and n2 == p.n2
    t1 = p.n1p // I1_TILE
    W = p.n2p // LANE

    # per-matvec prep (X changes every layer): sorted-col transpose + pad
    Xs = X[:, p.perm2]                                     # (n1, n2, C)
    Xt = jnp.pad(jnp.transpose(Xs, (0, 2, 1)),
                 ((0, p.n1p - n1), (0, 0), (0, p.n2p - n2)))   # (n1p, C, n2p)

    grid = (t1, p.s1)
    out = pl.pallas_call(
        functools.partial(_kernel, s1=p.s1, s2=p.s2, n2p=p.n2p, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # d1_slot
            pl.BlockSpec(memory_space=pltpu.SMEM),         # win_any
            pl.BlockSpec(memory_space=pltpu.ANY),          # Xt (HBM)
            pl.BlockSpec((1, 1, p.s2, I1_TILE, p.n2p),
                         lambda i, s: (i, s, 0, 0, 0)),    # KeP
            pl.BlockSpec(memory_space=pltpu.VMEM),         # gat_idx
            pl.BlockSpec(memory_space=pltpu.VMEM),         # gat_msk
        ],
        out_specs=pl.BlockSpec((1, I1_TILE * c, p.n2p), lambda i, s: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t1, I1_TILE * c, p.n2p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, I1_TILE * c, p.n2p), jnp.float32),
            pltpu.SemaphoreType.DMA((2, I1_TILE)),
            pltpu.VMEM((I1_TILE * c, p.n2p), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(p.d1_slot), jnp.asarray(p.win_any), Xt,
      KeP, jnp.asarray(p.gat_idx), jnp.asarray(p.gat_msk))

    # (t1, 8*C, n2p) -> (n1, n2, C) in original column order
    Y = out.reshape(t1, I1_TILE, c, p.n2p)[:, :, :, :n2]
    Y = jnp.transpose(Y.reshape(p.n1p, c, n2), (0, 2, 1))[:n1]
    Y = Y[:, p.inv2]                                       # unsort columns
    Y = Y + Kp[..., None] * X

    # spilled edges through the one-shot XLA path (zero Kp; roles already
    # swapped in the plan, so transpose=False here)
    if len(p.spill1):
        Y = Y + assoc_matvec(X, jnp.zeros_like(Kp), Ke[p.spill1],
                             p.out1[p.spill1], p.in1[p.spill1],
                             p.out2, p.in2, transpose=False)
    if len(p.spill2):
        keep1 = np.setdiff1d(np.arange(Ke.shape[0], dtype=np.int32),
                             p.spill1)
        Y = Y + assoc_matvec(X, jnp.zeros_like(Kp), Ke[keep1][:, p.spill2],
                             p.out1[keep1], p.in1[keep1],
                             p.out2[p.spill2], p.in2[p.spill2],
                             transpose=False)
    return Y
