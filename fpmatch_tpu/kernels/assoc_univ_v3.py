"""UNIV-scale association matvec, kernel v3: padded-degree dense form.

Replaces the v2 blocked one-hot-matmul kernel (assoc_univ.py, 0.53 G edges/s
— the FLOP-inflated dead end) with the minimal-FLOP chunked formulation's
math (ops/assoc.assoc_matvec_chunked, the XLA dispatch winner at 2.45 G
edges/s) restructured around what Mosaic actually lowers fast on this chip
(probed 2026-08-20). Measured at n=600 / 13M association edges on the v5e:
**2.9 G edges/s f32-exact (one-shot wrapper), 4.4 G edges/s bf16 in-layout
chained** (the multi-layer regime) — 1.2×/1.8× the chunked-XLA dispatch
default. The build sequence and each step's ablation evidence:
logs/univ3_ablate.log, logs/univ3_sweep.log, RESULTS.md round-4 section.

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

import os as _os

# row-tile height: output rows per kernel grid step (env knob for tuning)
I1_TILE = int(_os.environ.get("FPMATCH_UNIV3_TILE", "16"))
LANE = 128           # lane-window width
C_DEFAULT = 16

# perf-bisection switches (debug only; wrong results when set):
# comma-separated list in FPMATCH_UNIV3_ABLATE from
# {nogather, nodot, nocond, nodma, nospill, nospill1, nospill2}
# (plus FPMATCH_UNIV3_NOGROUP=1: uniform slot planes, no degree grouping)
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
    s1: int             # graph-1 slots per output row (global cap)
    s2: int             # graph-2 slots per output column
    transpose: bool
    # degree-class row grouping: graph-1 nodes are sorted by out-degree
    # (ascending) and the row-tile grid is split into <= 3 contiguous
    # groups, each run as its own pallas_call with only s1_g slot planes —
    # low-degree tiles stop paying the global cap's padded planes (the
    # measured ~2.3x slot-inflation's s1 share). (t0, t1, s1_g) in tiles;
    # s1_g == 0 groups (zero-degree rows, e.g. bucket padding) skip the
    # kernel outright.
    perm1: np.ndarray   # (n1,) sorted-row -> original-row
    inv1: np.ndarray    # (n1,) original-row -> sorted-row
    groups: tuple       # ((t0, t1, s1_g), ...)
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


def _auto_cap(deg: np.ndarray, spill_frac: float = 0.005) -> int:
    """Smallest slot count whose overflow (edges beyond it, summed over
    nodes) is <= spill_frac of all edges: padded planes past the typical
    degree are pure masked work in the kernel (measured sweep at n=600:
    cap 9 beats the max-degree 11 by ~7%, cap <= 8 loses to XLA spill
    cost — logs/univ3_sweep.log)."""
    # clamped to >= 1: a zero-edge side (1-2 keypoints, no Delaunay edges —
    # reachable from cli/match.py, which only rejects zero-keypoint images)
    # would otherwise make s1/s2 = 0 and the kernel would index a zero-width
    # slot table at trace time
    total = max(int(deg.sum()), 1)
    for s in range(1, int(deg.max()) + 1):
        if np.maximum(deg - s, 0).sum() <= spill_frac * total:
            return s
    return max(1, int(deg.max()))


def plan_univ_v3(pts2: np.ndarray, src1, dst1, src2, dst2,
                 transpose: bool = True, s1_cap: int = None,
                 s2_cap: int = None, n1: int = None) -> UnivPlanV3:
    """Build the padded-degree plan.

    :param pts2: (n2, 2) graph-2 node coordinates (spatial sort key). Graph 1
        needs no sort — its rows are DMA-gathered individually.
    :param transpose: plan Kᵀ·x (the model's orientation): out = dst,
        in = src per assoc_matvec's role swap.
    :param s1_cap, s2_cap: slot counts per node (None = auto: smallest cap
        spilling <= 0.5% of that side's edges to the XLA path).
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
    if n1 is None:   # in-model use passes the padded bucket size explicitly
        n1 = int(max(out1.max(), in1.max())) + 1 if e1 else 1
    n2 = len(pts2)

    # spatial sort of graph-2 nodes (x-major) => banded in2-vs-out2
    perm2 = np.argsort(pts2[:, 0], kind="stable").astype(np.int32)
    inv2 = np.empty_like(perm2)
    inv2[perm2] = np.arange(n2, dtype=np.int32)

    # degree sort of graph-1 nodes (rows need no spatial order — each row's
    # inputs are DMA-gathered individually), so low-degree tiles can run
    # with fewer slot planes (see UnivPlanV3.groups)
    deg1_orig = np.bincount(out1, minlength=n1)
    perm1 = np.argsort(deg1_orig, kind="stable").astype(np.int32)
    inv1 = np.empty_like(perm1)
    inv1[perm1] = np.arange(n1, dtype=np.int32)
    out1 = inv1[out1]
    in1 = inv1[in1]

    n1p = _round_up(n1, I1_TILE)
    n2p = _round_up(n2, LANE)
    W = n2p // LANE

    # ---- graph-1 slots ----------------------------------------------------
    order1 = np.argsort(out1, kind="stable")
    deg1 = np.bincount(out1, minlength=n1)
    if s1_cap is not None:
        s1 = int(min(max(deg1.max(), 1), s1_cap))
    else:
        # With degree-class grouping the top group pays max-degree planes
        # only for its own tiles, while the spill postlude measured ~half
        # the whole matvec (logs/univ3_ablate_r5.log nospill: 2.92 -> 1.41
        # ms) — so auto plans carry the FULL degree table (spill1 empty)
        # unless the max degree is pathological (> 2x the 0.5%-overflow
        # cap), where padded planes would out-cost the XLA fallback.
        s1 = int(min(max(deg1.max(), 1), max(2 * _auto_cap(deg1), 12)))
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
    s2 = int(min(max(deg2.max(), 1), s2_cap or _auto_cap(deg2)))
    e2_slot = np.full((s2, n2p), e2, np.int32)
    d2s = np.zeros((s2, n2p), np.int32)      # sorted in-column per slot
    d2_ok = np.zeros((s2, n2p), bool)
    spill2 = []
    starts2 = np.zeros(n2 + 1, np.int64)
    np.cumsum(deg2, out=starts2[1:])
    for i in range(n2):
        es = order2[starts2[i]:starts2[i + 1]]
        w = i // LANE
        # fill same-window targets into LOW slot planes, cross-window into
        # high ones: a slot plane's side windows then activate only when
        # cross-window edges reach that plane, so the trace-time win_any
        # pruning below kills far more (plane, window, k) gather blocks
        es = sorted(es, key=lambda eid: abs(int(i2s[eid]) // LANE - w))
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

    # ---- degree-class tile groups ------------------------------------------
    # per-tile slot requirement (rows are degree-sorted, so this is
    # non-decreasing); optimal <= 3 contiguous groups minimizing
    # sum(group_tiles * group_s1) by exhaustive split search
    T = n1p // I1_TILE
    smax = np.zeros(T, np.int64)
    for t in range(T):
        rows = deg1[t * I1_TILE:(t + 1) * I1_TILE]
        smax[t] = min(int(rows.max()) if len(rows) else 0, s1)
    best_cost, best_groups = None, ((0, T, s1),)
    if _os.environ.get("FPMATCH_UNIV3_NOGROUP"):  # ablation: uniform planes
        best_cost = T * s1
    else:
        for a in range(1, T + 1):
            for b in range(a, T + 1):
                bounds = [(0, a), (a, b), (b, T)]
                gs = [(t0, t1, int(smax[t1 - 1])) for t0, t1 in bounds
                      if t1 > t0]
                cost = sum((t1 - t0) * sg for t0, t1, sg in gs)
                if best_cost is None or cost < best_cost:
                    best_cost, best_groups = cost, tuple(gs)

    return UnivPlanV3(
        n1=n1, n2=n2, n1p=n1p, n2p=n2p, s1=s1, s2=s2, transpose=transpose,
        perm1=perm1, inv1=inv1, groups=best_groups,
        perm2=perm2, inv2=inv2, d1_slot=d1_slot, e1_slot=e1_slot,
        e2_slot=e2_slot, gat_idx=gat_idx, gat_msk=gat_msk, win_any=win_any,
        spill1=np.asarray(sorted(spill1), np.int32),
        spill2=np.asarray(sorted(set(spill2)), np.int32),
        out1=out1, in1=in1, out2=out2, in2=in2)


def build_kep(Ke: jnp.ndarray, plan: UnivPlanV3, dtype=jnp.float32) -> tuple:
    """Gather Ke into per-group padded-degree tensors (device, once per
    pair): KeP_g[t, s1, s2, r, j] = Ke[e1_slot[I1_TILE·(t0+t)+r, s1],
    e2_slot[s2, j]] with pad slots reading the appended zero row/col. One
    tensor per degree-class tile group (UnivPlanV3.groups), each holding
    only that group's s1_g slot planes; s1_g == 0 groups carry None."""
    Kz = jnp.pad(Ke, ((0, 1), (0, 1))).astype(dtype)
    out = []
    for t0, t1, sg in plan.groups:
        if sg == 0:
            out.append(None)
            continue
        rows = plan.e1_slot[t0 * I1_TILE:t1 * I1_TILE, :sg]
        kep = Kz[rows][:, :, plan.e2_slot]       # (rows, sg, s2, n2p)
        kep = kep.reshape(t1 - t0, I1_TILE, sg, plan.s2, plan.n2p)
        out.append(jnp.transpose(kep, (0, 2, 3, 1, 4)))
    return tuple(out)


def _kernel(d1_ref,                      # SMEM (n1p, s1) int32
            xt_ref,                      # ANY  (n1p, C, n2p)
            kep_ref,                     # VMEM block (1, s1, s2, 8, n2p)
            idx_ref,                     # VMEM (s2, W, 3, LANE) int32
            msk_ref,                     # VMEM (s2, W, 3, LANE) compute dtype
            y_ref,                       # VMEM block (1, 128, n2p) out
            r_ref,                       # scratch (2, 128, n2p)
            sem,                         # DMA sems (2, I1_TILE)
            acc_ref,                     # scratch (128, n2p) f32
            *, s1: int, s2: int, n2p: int, c: int,
            win_any: tuple, all_ones: tuple, interpret: bool = False):
    t1 = pl.program_id(0)
    n_t1 = pl.num_programs(0)
    W = n2p // LANE
    # the whole s1 loop runs INSIDE one grid step: with grid (t1, s1) the
    # measured per-step fixed cost (~4 us x 825 steps = a 3.3 ms floor that
    # survived removing ALL inner compute, logs/univ3_ablate.log "oneplane")
    # dominated the kernel; 75 fat steps amortize it 11x.

    def dma(slot, tt, ss):
        """Start the 8 row DMAs for (row-tile tt, slot plane ss)."""
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

    # double buffer across s1 iterations and across grid steps with a
    # GLOBAL slot counter (t1*s1 + j) % 2: with odd s1 a per-step j-parity
    # slot collides at the tile boundary (the last group computes from the
    # same slot the next tile's prefetch writes — a device fault on chip)
    base = t1 * s1
    @pl.when(t1 == 0)
    def _():
        dma(0, t1, 0)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # static 0/1 channel-expansion matrix: E[r, i] = 1 iff r // c == i
    # (bf16 path's MXU row broadcast)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (I1_TILE * c, I1_TILE), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (I1_TILE * c, I1_TILE), 1)
    E = (rows_i // c == cols_i).astype(jnp.float32)

    for j in range(s1):
        if j + 1 < s1:
            dma((base + j + 1) % 2, t1, j + 1)
        else:
            @pl.when(t1 + 1 < n_t1)
            def _():
                dma((base + j + 1) % 2, t1 + 1, 0)
        wait((base + j) % 2)
        R = r_ref[(base + j) % 2]                         # (128, n2p)
        # bf16 path: bitcast ONCE per row group to 32-bit row-pairs for the
        # lane gathers (tpu.dynamic_gather wants 32-bit data; lane shuffles
        # never mix rows, so the packing is transparent; bitcasting a window
        # SLICE instead trips "Invalid input layout")
        R32 = None
        if R.dtype == jnp.bfloat16 and not interpret and \
                "nogather" not in _ABLATE:
            R32 = pltpu.bitcast(R, jnp.int32)             # (64, n2p)

        # the (plane, window, neighbour) nest is UNROLLED with trace-time
        # pruning from the host plan: win_any skips gather blocks with no
        # hits (~1/3 after plan_univ_v3's slot reordering), all_ones skips
        # the mask multiply where every lane is a same-window hit. History
        # (logs/univ3_ablate.log): lax.cond guards instead cost 16 of
        # 26 ms (scalar branches); a HIGHEST-precision MXU channel-expand
        # cost another 11 ms.
        for s in range(1 if "oneplane" in _ABLATE else s2):
            kv = kep_ref[0, j, s]                         # (8, n2p)
            for w in range(W):                            # static windows
                if not any(win_any[s][w][k] for k in range(3)) \
                        and "nogather" not in _ABLATE:
                    continue
                g = None
                for k in range(3):
                    wk = w + k - 1
                    if wk < 0 or wk >= W:
                        continue
                    if not win_any[s][w][k] and "nogather" not in _ABLATE:
                        continue
                    if "nogather" in _ABLATE:
                        gk = R[:, wk * LANE:(wk + 1) * LANE]
                    elif R32 is not None:
                        win32 = R32[:, wk * LANE:(wk + 1) * LANE]
                        idx = jnp.broadcast_to(idx_ref[s, w, k][None, :],
                                               win32.shape)
                        gk = pltpu.bitcast(
                            jnp.take_along_axis(win32, idx, axis=1),
                            jnp.bfloat16)
                    else:
                        win = R[:, wk * LANE:(wk + 1) * LANE]
                        idx = jnp.broadcast_to(idx_ref[s, w, k][None, :],
                                               (I1_TILE * c, LANE))
                        gk = jnp.take_along_axis(win, idx, axis=1)
                    if not all_ones[s][w][k]:
                        gk = gk * msk_ref[s, w, k][None, :]
                    g = gk if g is None else g + gk
                if g is None:
                    continue
                # per-row Ke broadcast (pad slots already carry kv == 0)
                ws = slice(w * LANE, (w + 1) * LANE)
                if "nodot" in _ABLATE:
                    acc_ref[:, ws] += g.astype(jnp.float32)
                elif R.dtype == jnp.bfloat16:
                    # one (128,8)@(8,128) DEFAULT-precision MXU expand +
                    # one full-tile update: the 8-slice f32 form below is
                    # ~24 small RMW ops per window, and DEFAULT's bf16
                    # rounding of kv is within this path's accuracy class
                    kec = jax.lax.dot_general(
                        E, kv[:, ws], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[:, ws] += g.astype(jnp.float32) * kec
                else:
                    for i in range(I1_TILE):
                        rs = slice(i * c, (i + 1) * c)
                        acc_ref[rs, ws] += (g[rs] * kv[i:i + 1, ws]
                                            ).astype(jnp.float32)

    y_ref[0] = acc_ref[...]


def univ_v3_prep(X: jnp.ndarray, plan: UnivPlanV3,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """(n1, n2, C) -> the kernel's sorted-transposed layout (n1p, Cp, n2p).
    One gather + one transpose; in a chained multi-layer model do this ONCE
    and keep the layout between layers (the kernel's output reshapes to
    this layout for free). The channel dim pads to a multiple of 8 — the
    per-row DMA destination slice [i*C, (i+1)*C) must be sublane-aligned
    (Mosaic memref_slice fault otherwise; hit by the model's C=1 first
    GNN layer and C=17 later layers)."""
    p = plan
    cp = _round_up(X.shape[-1], 8)
    Xs = X[p.perm1][:, p.perm2]
    return jnp.pad(jnp.transpose(Xs, (0, 2, 1)),
                   ((0, p.n1p - p.n1), (0, cp - X.shape[-1]),
                    (0, p.n2p - p.n2))).astype(compute_dtype)


def univ_v3_unprep(Yt: jnp.ndarray, plan: UnivPlanV3) -> jnp.ndarray:
    """Inverse of `univ_v3_prep` (output is f32 (n1, n2, C))."""
    p = plan
    Y = jnp.transpose(Yt[p.inv1][:, :, :p.n2], (0, 2, 1))
    return Y[:, p.inv2]


def assoc_matvec_univ_v3_raw(Xt: jnp.ndarray, Kpt: jnp.ndarray,
                             Ket: jnp.ndarray, plan: UnivPlanV3,
                             KeP: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """K·vec(X) entirely in the sorted-transposed layout: Xt from
    `univ_v3_prep` -> Yt (n1p, C, n2p) f32, INCLUDING the Kp diagonal and
    the spilled edges. Chain layers through this (one free reshape per
    layer, no per-layer permutes/transposes — those were ~3.3 ms of the
    5.5 ms round-3 wrapper).

    :param Kpt: (n1p, n2p) f32 — Kp in sorted-column order, zero-padded
        (`univ_v3_prep_kp`).
    :param Ket: (E1, E2) Ke — only the spilled edges are read.
    """
    p = plan
    n1p, c, n2p = Xt.shape
    t1 = n1p // I1_TILE
    # no Mosaic on CPU backends: tests, CPU-mesh runs, and init-on-host
    # (`with jax.default_device(cpu)`) interpret instead
    dflt = jax.config.jax_default_device
    interpret = (interpret or jax.default_backend() == "cpu"
                 or (dflt is not None and dflt.platform == "cpu"))

    win_any = tuple(tuple(tuple(bool(v) for v in row)
                          for row in plane) for plane in p.win_any)
    ones = (p.gat_msk == 1.0).all(-1) & (p.win_any > 0)
    all_ones = tuple(tuple(tuple(bool(v) for v in row)
                           for row in plane) for plane in ones)

    # one pallas_call per degree-class tile group (plan.groups): each group
    # runs only its own s1_g slot planes — low-degree tiles stop paying the
    # global cap's padded planes, zero-degree groups (bucket pad rows) skip
    # the kernel outright
    idx_arr = jnp.asarray(p.gat_idx)
    msk_arr = jnp.asarray(p.gat_msk, Xt.dtype)
    blocks = []
    for g, (t0g, t1g, sg) in enumerate(p.groups):
        tg = t1g - t0g
        if sg == 0:
            blocks.append(jnp.zeros((tg, I1_TILE * c, p.n2p), jnp.float32))
            continue
        d1_g = p.d1_slot[t0g * I1_TILE:t1g * I1_TILE, :sg]
        blocks.append(pl.pallas_call(
            functools.partial(_kernel, s1=sg, s2=p.s2, n2p=p.n2p, c=c,
                              win_any=win_any, all_ones=all_ones,
                              interpret=interpret),
            grid=(tg,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),         # d1_slot
                pl.BlockSpec(memory_space=pl.ANY),             # Xt (HBM)
                pl.BlockSpec((1, sg, p.s2, I1_TILE, p.n2p),
                             lambda i: (i, 0, 0, 0, 0)),       # KeP
                pl.BlockSpec(memory_space=pltpu.VMEM),         # gat_idx
                pl.BlockSpec(memory_space=pltpu.VMEM),         # gat_msk
            ],
            out_specs=pl.BlockSpec((1, I1_TILE * c, p.n2p),
                                   lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((tg, I1_TILE * c, p.n2p),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, I1_TILE * c, p.n2p), Xt.dtype),
                pltpu.SemaphoreType.DMA((2, I1_TILE)),
                pltpu.VMEM((I1_TILE * c, p.n2p), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.asarray(d1_g), Xt,
          # KeP stays f32 even on the bf16 path: Mosaic can't broadcast a
          # bf16 (1,128) row slice at a sublane offset inside a packed
          # (16,128) tile ("Invalid input layout"); the f32 row broadcast
          # is native
          KeP[g].astype(jnp.float32),
          idx_arr, msk_arr))

    out = jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
    # (t1, 16*C, n2p) rows are (i1_local*C + c) row-major -> a FREE reshape
    Yt = out.reshape(p.n1p, c, p.n2p)
    Yt = Yt + Kpt[:, None, :] * Xt.astype(jnp.float32)

    # spilled edges, computed IN LAYOUT (sorted columns, channel-major).
    # Ket may be padded wider than the plan's real edge lists (the model's
    # static buckets); only the plan's rows/cols are read.
    inv2 = p.inv2
    e1_real, e2_real = len(p.out1), len(p.out2)
    if "nospill" in _ABLATE:   # timing-only: results wrong when spills exist
        return Yt
    # Both spill forms are gather -> one-hot matmul: the round-4 forms paid
    # (a) a materialized (E1, C, n2p) row gather (~146 MB/matvec at n=600)
    # and (b) segment_sum scatters, which XLA serializes on TPU — together
    # ~half the matvec (logs/univ3_ablate_r5.log). The one-hot segment
    # matrices are trace-time constants (<10 MB) and the contraction runs
    # on the MXU (< 1 GFLOP at n=600 caps).
    if len(p.spill1) and "nospill1" not in _ABLATE:
        sp = p.spill1
        k1 = len(sp)
        rows = Xt[p.in1[sp]].astype(jnp.float32)          # (k1, C, n2p)
        in2s = inv2[p.in2]
        out2s = inv2[p.out2]
        G = rows[:, :, in2s]                              # (k1, C, E2)
        W = G * Ket[sp, :e2_real].astype(jnp.float32)[:, None, :]
        seg2 = np.zeros((e2_real, p.n2p), np.float32)     # out2 one-hot
        seg2[np.arange(e2_real), out2s] = 1.0
        T = W.reshape(k1 * c, e2_real) @ jnp.asarray(seg2)
        Yt = Yt.at[p.out1[sp]].add(T.reshape(k1, c, p.n2p))
    if len(p.spill2) and "nospill2" not in _ABLATE:
        keep1 = np.setdiff1d(np.arange(e1_real, dtype=np.int32),
                             p.spill1)
        f = p.spill2
        k2 = len(f)
        cols_in = inv2[p.in2[f]]
        cols_out = inv2[p.out2[f]]
        # small fancy slice (E1k, k2), NOT Ke[keep1][:, f] which would
        # materialize a full (E1, E2) copy per matvec
        kef = Ket[keep1[:, None], f[None, :]].astype(jnp.float32)
        # gather the k2 input COLUMNS first (n1p, C, k2), then the edge
        # rows from that small tensor
        xc = Xt[:, :, cols_in].astype(jnp.float32)        # (n1p, C, k2)
        W = xc[p.in1[keep1]] * kef[:, None, :]            # (E1k, C, k2)
        seg1 = np.zeros((p.n1p, len(keep1)), np.float32)  # out1 one-hot
        seg1[p.out1[keep1], np.arange(len(keep1))] = 1.0
        T = jnp.asarray(seg1) @ W.reshape(len(keep1), c * k2)
        # scatter the k2 output columns with a second one-hot matmul too:
        # XLA lowers .at[:, :, cols_out].add to a serialized lane scatter
        sc2 = np.zeros((k2, p.n2p), np.float32)
        sc2[np.arange(k2), cols_out] = 1.0
        Yt = Yt + (T.reshape(p.n1p * c, k2) @ jnp.asarray(sc2)
                   ).reshape(p.n1p, c, p.n2p)
    return Yt


def univ_v3_prep_kp(Kp: jnp.ndarray, plan: UnivPlanV3) -> jnp.ndarray:
    """Kp (n1, n2) -> sorted-row, sorted-column, zero-padded (n1p, n2p)
    f32."""
    p = plan
    return jnp.pad(Kp[p.perm1][:, p.perm2].astype(jnp.float32),
                   ((0, p.n1p - p.n1), (0, p.n2p - p.n2)))


def assoc_matvec_univ_v3(X: jnp.ndarray, Kp: jnp.ndarray, Ke: jnp.ndarray,
                         plan: UnivPlanV3, KeP: jnp.ndarray,
                         compute_dtype=jnp.float32,
                         interpret: bool = False) -> jnp.ndarray:
    """K·vec(X) (orientation fixed by the plan): convenience wrapper around
    the layout pipeline prep -> raw kernel -> unprep. For multi-layer use,
    call `univ_v3_prep`/`univ_v3_prep_kp` once and chain
    `assoc_matvec_univ_v3_raw` — the per-layer permute/transpose pair this
    wrapper pays (~3.3 ms at n=600) disappears.

    :param compute_dtype: dtype of the kernel gather/multiply path
        (accumulation stays f32). bfloat16 halves the gather register
        traffic at ~1e-3 relative error.
    """
    n1, n2, c = X.shape
    assert n1 == plan.n1 and n2 == plan.n2
    Xt = univ_v3_prep(X, plan, compute_dtype)
    Kpt = univ_v3_prep_kp(Kp, plan)
    Yt = assoc_matvec_univ_v3_raw(Xt, Kpt, Ke, plan, KeP,
                                  interpret=interpret)
    return univ_v3_unprep(Yt, plan)[..., :c]   # drop channel padding
