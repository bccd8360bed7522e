"""Edge-partitioned association graphs — the multi-chip scaling axis.

The reference never solved this (SURVEY.md §5 "long-context"): association
graphs have n1·n2 nodes and ≈ e1·e2 edges; at UNIV_SIZE=600 that is 360k
nodes and ~3.2M nnz, beyond one chip's appetite once batched. Its analogue of
sequence parallelism is partitioning K's edges across chips.

Design (BASELINE.json north star): the factorization makes this clean —
association edges are the outer product (e1, e2) of the two graphs' edge
lists, so sharding the *graph-1 edge axis* E1 across the mesh shards the
association edge set row-contiguously:

  * Ke (E1, E2)            → sharded on axis 0
  * src1/dst1 (E1,)        → sharded
  * X (N1, N2, C) features → replicated (N1·N2·C is the small side: boundary
                             node features are what ring-exchange would move;
                             at these sizes all-gather of X is the overlap-
                             friendly choice, and XLA fuses it with the local
                             gather)
  * per-shard partial Y^p = scatter_add(Ke^p ⊙ gather(X)) → psum over the
    mesh → full Y on every chip.

The per-shard compute is exactly ops.assoc.assoc_matvec restricted to an E1
slice, so one code path serves 1 chip and N chips. Communication is a single
psum of (N1, N2, C) per layer riding ICI, overlapped by XLA with the
segment-sums (latency-hiding double buffering comes with the Pallas kernel).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.assoc import assoc_matvec


def edge_sharded_matvec(mesh: Mesh, axis: str = "edge"):
    """Build a shard_map'd K·x (or Kᵀ·x) over an edge-sharded mesh axis.

    Returned fn signature matches ops.assoc.assoc_matvec with arrays already
    device-put: X replicated, (Ke, src1, dst1) sharded along E1.
    """

    def _local(X, Kp, Ke_shard, src1_shard, dst1_shard, src2, dst2,
               transpose):
        # Kp (diagonal) is added once globally: only shard 0 contributes it
        shard_idx = jax.lax.axis_index(axis)
        kp_local = jnp.where(shard_idx == 0, Kp, jnp.zeros_like(Kp))
        y = assoc_matvec(X, kp_local, Ke_shard, src1_shard, dst1_shard,
                         src2, dst2, transpose=transpose)
        return jax.lax.psum(y, axis)

    @partial(jax.jit, static_argnames=("transpose",))
    def fn(X, Kp, Ke, src1, dst1, src2, dst2, transpose=False):
        mapped = jax.shard_map(
            partial(_local, transpose=transpose), mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(),
        )
        return mapped(X, Kp, Ke, src1, dst1, src2, dst2)

    return fn


def shard_pair_for_edges(mesh: Mesh, Ke, src1, dst1, axis: str = "edge"):
    """Device-put the E1-axis-sharded operands."""
    sh = NamedSharding(mesh, P(axis))
    return (jax.device_put(Ke, sh), jax.device_put(src1, sh),
            jax.device_put(dst1, sh))


def make_edge_mesh(n_devices: Optional[int] = None, axis: str = "edge"
                   ) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


# ---------------------------------------------------------------------------
# v2: row-sharded association matvec with all-to-all boundary exchange
# ---------------------------------------------------------------------------
#
# The v1 scheme above replicates X and psums the full (N1, N2, C) every
# layer: per-chip memory does not shrink with the mesh. v2 is the BASELINE
# north star — shard the association-NODE space by graph-1 rows:
#
#   * X, Y (N1, N2, C)  → sharded on N1: chip q owns rows [q·r, (q+1)·r)
#   * edges (e1, e2)    → assigned to the chip that owns their OUTPUT row
#     (scatter endpoint of graph-1 edge e1), so each scatter is chip-local
#   * the only cross-chip data an edge needs is its INPUT row of X when that
#     row lives on another chip (the "halo"). Delaunay graphs have bounded
#     degree, so with the natural spatially-coherent node order the halo is
#     a thin boundary: comm volume per layer = O(halo) rows, not O(N1).
#
# Exchange: each chip packs the rows every peer needs into a
# (p, s_max, N2, C) buffer and runs ONE all_to_all per layer. Edges are
# split into (local, halo) groups so XLA can overlap the all_to_all with
# the local contraction (no data dependency between them).
#
# The e2 axis is never sharded (E2·N2·C is the small side); src2/dst2/Ke
# columns are replicated. Replaces what a CUDA stack would do with NCCL
# all-to-all + stream overlap (the reference never attempted it).


class RowShardPlan(NamedTuple):
    """Host-built metadata for `row_sharded_matvec` (all numpy, static
    shapes; build once per (graph pair, mesh size) and reuse every layer)."""
    n_shards: int
    rows_per: int          # owned N1 rows per chip (N1 padded to p·rows_per)
    s_max: int             # send slots per (chip, peer) pair
    transpose: bool        # plan built for Kᵀ·x (graph-2 roles swap too)
    send_idx: np.ndarray   # (p, p, s_max) int32 — LOCAL row q sends to peer r
    send_mask: np.ndarray  # (p, p, s_max) float32 — 1.0 on real slots
    # per-chip edge groups (padded to uniform lengths; padded slots carry
    # Ke == 0 via ke_row == E1 which indexes an appended zero row):
    loc_gather: np.ndarray   # (p, e_loc) int32 — local row to gather from
    loc_scatter: np.ndarray  # (p, e_loc) int32 — local output row
    loc_ke_row: np.ndarray   # (p, e_loc) int32 — row of Ke for this edge
    halo_gather: np.ndarray  # (p, e_halo) int32 — slot into the recv buffer
    halo_scatter: np.ndarray  # (p, e_halo) int32
    halo_ke_row: np.ndarray  # (p, e_halo) int32


def _pad2d(rows, width, fill):
    out = np.full((len(rows), width), fill, np.int32)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out


def plan_row_shards(n1: int, src1, dst1, n_shards: int,
                    transpose: bool = False) -> RowShardPlan:
    """Partition graph-1 rows into `n_shards` contiguous blocks and group
    edges by output-row owner, splitting each chip's edges into local vs
    halo by where their input row lives.

    `transpose=True` plans for Kᵀ·x (the model's orientation): output rows
    are src1, input rows dst1 — matching `assoc_matvec`'s role swap.
    """
    src1 = np.asarray(src1, np.int32)
    dst1 = np.asarray(dst1, np.int32)
    # assoc_matvec semantics: Y[src] += Ke · X[dst]; transpose swaps roles
    in_rows, out_rows = (src1, dst1) if transpose else (dst1, src1)

    p = n_shards
    rows_per = -(-n1 // p)

    def owner(r):
        return np.minimum(r // rows_per, p - 1)

    e_owner = owner(out_rows)
    in_owner = owner(in_rows)
    is_local = e_owner == in_owner

    # send lists: rows chip q owns that chip r's halo edges read
    send = [[[] for _ in range(p)] for _ in range(p)]
    for q in range(p):
        for r in range(p):
            if q == r:
                continue
            need = np.unique(in_rows[(e_owner == r) & (in_owner == q)])
            send[q][r] = list(need)
    s_max = max(1, max(len(send[q][r]) for q in range(p) for r in range(p)))

    send_idx = np.zeros((p, p, s_max), np.int32)
    send_mask = np.zeros((p, p, s_max), np.float32)
    # recv slot lookup: on chip r, the row `g` sent by chip q lands at
    # flat slot q*s_max + position(g in send[q][r])
    slot_of = [dict() for _ in range(p)]
    for q in range(p):
        for r in range(p):
            rows = send[q][r]
            send_idx[q, r, :len(rows)] = np.asarray(rows, np.int32) \
                - q * rows_per
            send_mask[q, r, :len(rows)] = 1.0
            for k, g in enumerate(rows):
                slot_of[r][g] = q * s_max + k

    loc_g, loc_s, loc_k = [], [], []
    hal_g, hal_s, hal_k = [], [], []
    for q in range(p):
        mine = np.nonzero(e_owner == q)[0]
        lm = mine[is_local[mine]]
        hm = mine[~is_local[mine]]
        loc_g.append(in_rows[lm] - q * rows_per)
        loc_s.append(out_rows[lm] - q * rows_per)
        loc_k.append(lm)
        hal_g.append(np.asarray([slot_of[q][g] for g in in_rows[hm]],
                                np.int32))
        hal_s.append(out_rows[hm] - q * rows_per)
        hal_k.append(hm)

    e1 = len(src1)
    e_loc = max(1, max(len(x) for x in loc_g))
    e_halo = max(1, max(len(x) for x in hal_g))
    return RowShardPlan(
        n_shards=p, rows_per=rows_per, s_max=s_max, transpose=transpose,
        send_idx=send_idx, send_mask=send_mask,
        loc_gather=_pad2d(loc_g, e_loc, 0),
        loc_scatter=_pad2d(loc_s, e_loc, 0),
        loc_ke_row=_pad2d(loc_k, e_loc, e1),       # e1 → appended zero row
        halo_gather=_pad2d(hal_g, e_halo, 0),
        halo_scatter=_pad2d(hal_s, e_halo, 0),
        halo_ke_row=_pad2d(hal_k, e_halo, e1),
    )


# one-hot-einsum FLOP volume (E1p·E2·N2 ∝ its MXU FLOPs) above which the
# chunked gather/scatter form wins. The one-hot form costs ~2·E1p·E2·N2·C
# FLOPs — N2× the minimal count — but has no scatter along e2; at bucket
# scale (N2=64, E1p·E2·N2 ≈ 9M) the MXU eats that easily, while at
# UNIV/bench scale the inflation loses to the minimal-FLOP chunked path by
# ~7× (local) and turned the p8 halo contraction into 60 CPU-GFLOPs
# (logs/bench_edge_partition*.log, 2026-08-19). The threshold must weigh
# N2, not just nnz: a small-nnz halo group over a wide N2 is still huge.
_ONEHOT_FLOP_THRESHOLD = 64_000_000
_CHUNK_E1 = 256


def _edge_contract(rows, Ke, src2, dst2, scat1, n_out, n2, vary=()):
    """Per-chip partial Y: rows (E1p, N2, C) already gathered on the e1 axis;
    contract the e2 axis (gather dst2 → scale Ke → scatter src2) and
    segment-sum into n_out output rows. Static-shape dispatch between the
    MXU one-hot form (small) and bounded-memory chunked gather/scatter
    (large), exactly like ops.assoc.assoc_matvec_auto.

    `vary`: mesh axes this runs manual over (shard_map) — the chunked
    path's scan carry must be created device-varying over them."""
    if Ke.shape[0] * Ke.shape[1] * n2 >= _ONEHOT_FLOP_THRESHOLD:
        return _edge_contract_chunked(rows, Ke, src2, dst2, scat1, n_out, n2,
                                      vary=vary)
    G2 = jax.nn.one_hot(dst2, n2, dtype=rows.dtype)
    S2 = jax.nn.one_hot(src2, n2, dtype=rows.dtype)
    t = jnp.einsum("enc,fn,ef,fm->emc", rows, G2, Ke, S2,
                   precision=jax.lax.Precision.HIGHEST)
    return jax.ops.segment_sum(t, scat1, num_segments=n_out)


def _edge_contract_chunked(rows, Ke, src2, dst2, scat1, n_out, n2,
                           chunk: int = _CHUNK_E1, vary=()):
    """Chunked-e1 gather/scatter form of `_edge_contract`: minimal FLOP count
    (E1p·E2·C) with the live intermediate bounded to (chunk, E2, C) — the
    per-shard restriction of ops.assoc.assoc_matvec_chunked (rows arrive
    pre-gathered here). Padded chunk slots carry Ke == 0 and scatter into
    row 0 with zero weight."""
    e1p = rows.shape[0]
    n_chunks = -(-e1p // chunk)
    pad = n_chunks * chunk - e1p
    rp = jnp.pad(rows, ((0, pad), (0, 0), (0, 0))).reshape(
        n_chunks, chunk, *rows.shape[1:])
    kep = jnp.pad(Ke, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
    sp = jnp.pad(scat1, (0, pad)).reshape(n_chunks, chunk)

    def body(carry, sl):
        r, ke, s1c = sl
        W = r[:, dst2] * ke[..., None]                      # (chunk, E2, C)
        T = jax.ops.segment_sum(jnp.swapaxes(W, 0, 1), src2,
                                num_segments=n2)            # (N2, chunk, C)
        Y = jax.ops.segment_sum(jnp.swapaxes(T, 0, 1), s1c,
                                num_segments=n_out)         # (n_out, N2, C)
        return carry + Y, None

    Y0 = jnp.zeros((n_out, n2, rows.shape[-1]), rows.dtype)
    if vary:  # inside shard_map the carry must match the body's VMA type
        Y0 = jax.lax.pcast(Y0, tuple(vary), to="varying")
    Y, _ = jax.lax.scan(body, Y0, (rp, kep, sp))
    return Y


def row_sharded_matvec(mesh: Mesh, plan: RowShardPlan, axis: str = "edge"):
    """Build the sharded K·vec(X) (orientation fixed by the plan).

    Inputs at call time (already device_put by `shard_rows`):
      X  (p·rows_per, N2, C)  sharded P(axis)      — owned rows per chip
      Kp (p·rows_per, N2)     sharded P(axis)
      KeL (p, e_loc, E2), KeH (p, e_halo, E2) sharded P(axis) — per-chip Ke
      src2, dst2 (E2,) replicated (pre-swapped if the plan is transposed)
    Output: Y (p·rows_per, N2, C) sharded P(axis) — stays sharded, so
    chained layers never materialize the full X anywhere.
    """
    p, rows_per, s_max = plan.n_shards, plan.rows_per, plan.s_max
    send_idx = jnp.asarray(plan.send_idx)
    send_mask = jnp.asarray(plan.send_mask)
    loc_g = jnp.asarray(plan.loc_gather)
    loc_s = jnp.asarray(plan.loc_scatter)
    hal_g = jnp.asarray(plan.halo_gather)
    hal_s = jnp.asarray(plan.halo_scatter)

    def _local(X_loc, Kp_loc, KeL, KeH, src2, dst2):
        # X_loc (rows_per, N2, C); KeL (1, e_loc, E2) → squeeze chip axis
        q = jax.lax.axis_index(axis)
        n2 = X_loc.shape[1]
        KeL_, KeH_ = KeL[0], KeH[0]

        # 1. pack + launch the halo all-to-all (send_idx[q] rows per peer)
        pack = X_loc[send_idx[q]] * send_mask[q][..., None, None]
        recv = jax.lax.all_to_all(pack, axis, split_axis=0, concat_axis=0)
        halo = recv.reshape(p * s_max, *X_loc.shape[1:])

        # 2. local contraction — no dependency on `recv`, so the TPU
        #    scheduler overlaps it with the exchange
        y = _edge_contract(X_loc[loc_g[q]], KeL_, src2, dst2, loc_s[q],
                           rows_per, n2, vary=(axis,))
        y = y + Kp_loc[..., None] * X_loc

        # 3. halo contraction once the exchange lands
        y = y + _edge_contract(halo[hal_g[q]], KeH_, src2, dst2, hal_s[q],
                               rows_per, n2, vary=(axis,))
        return y

    @jax.jit
    def fn(X, Kp, KeL, KeH, src2, dst2):
        if plan.transpose:
            src2, dst2 = dst2, src2
        return jax.shard_map(
            _local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(axis))(X, Kp, KeL, KeH, src2, dst2)

    return fn


def shard_rows(mesh: Mesh, plan: RowShardPlan, X, Kp, Ke,
               axis: str = "edge"):
    """Host-side prep: pad X/Kp rows to p·rows_per, gather per-chip Ke rows
    (padded slots read the appended zero row), device_put sharded."""
    p, rows_per = plan.n_shards, plan.rows_per
    n1 = X.shape[0]
    X = np.asarray(X)
    Kp = np.asarray(Kp)
    Ke = np.asarray(Ke)
    pad = p * rows_per - n1
    Xp = np.pad(X, ((0, pad), (0, 0), (0, 0)))
    Kpp = np.pad(Kp, ((0, pad), (0, 0)))
    Kez = np.concatenate([Ke, np.zeros((1, Ke.shape[1]), Ke.dtype)], 0)
    KeL = Kez[plan.loc_ke_row]       # (p, e_loc, E2)
    KeH = Kez[plan.halo_ke_row]      # (p, e_halo, E2)
    sh = NamedSharding(mesh, P(axis))
    return (jax.device_put(Xp, sh), jax.device_put(Kpp, sh),
            jax.device_put(KeL, sh), jax.device_put(KeH, sh))


def halo_fraction(plan: RowShardPlan) -> float:
    """Comm-volume diagnostic: rows exchanged per layer relative to what v1
    full replication moves. v1's psum/all-gather delivers every other chip's
    rows to each chip — p·(p-1)·rows_per row-transfers per layer; v2 moves
    only the real halo (Σ send rows). < 1 means v2 strictly beats
    replication; for spatially-ordered Delaunay rows it shrinks further as
    rows_per grows (boundary/area)."""
    moved = float(plan.send_mask.sum())
    return moved / (plan.n_shards * (plan.n_shards - 1) * plan.rows_per)


# ---------------------------------------------------------------------------
# v3: batched row-sharded aggregation for the in-model multi-chip path
# ---------------------------------------------------------------------------
#
# The v2 machinery above is per-pair with per-plan padded shapes — right for
# the op-level API, wrong inside a jitted batched model (shapes must be
# static across batches, and shard_map cannot sit under the model's nn.vmap).
# v3 stacks per-sample RowShardPlans into one BatchRowPlan with STATIC caps
# (e_cap = E1, s_cap = rows_per — both are true upper bounds), and the
# aggregate shard_maps once over the mesh with the batch axis inside, so
# NGMNet's assoc-GNN loop can call it directly. Inside the shard_map the
# per-sample work is vmapped; the halo all_to_all vectorizes over the batch
# axis like any named-axis collective.


class BatchRowPlan(NamedTuple):
    """Stacked per-sample row-shard plans, uniform static shapes, jnp arrays.
    Built host-side per batch by `plan_batch_rows`; shapes depend only on
    (B, p, rows_per, E1), so jit never retraces across batches."""
    send_idx: jnp.ndarray     # (B, p, p, s_cap) int32
    send_mask: jnp.ndarray    # (B, p, p, s_cap) float32
    loc_gather: jnp.ndarray   # (B, p, e_cap) int32
    loc_scatter: jnp.ndarray  # (B, p, e_cap) int32
    loc_ke_row: jnp.ndarray   # (B, p, e_cap) int32 (E1 → appended zero row)
    halo_gather: jnp.ndarray  # (B, p, e_cap) int32 (slot into recv buffer)
    halo_scatter: jnp.ndarray  # (B, p, e_cap) int32
    halo_ke_row: jnp.ndarray  # (B, p, e_cap) int32
    # orientation guard: shape (1,) iff the plan was built with
    # transpose=True, else (0,). Shape-encoded (not a bool leaf) so the
    # check in batched_row_sharded_aggregate works under jit, where the
    # plan's array leaves are tracers whose VALUES are unreadable but whose
    # SHAPES are static. A transpose=False plan silently computes K·x where
    # the model needs Kᵀ·x — this makes the mismatch loud.
    transpose_tag: jnp.ndarray


def plan_batch_rows(n1: int, src1, dst1, n_shards: int,
                    transpose: bool = True) -> BatchRowPlan:
    """Build a BatchRowPlan for a padded batch.

    :param n1: padded node count (must be divisible by n_shards)
    :param src1, dst1: (B, E1) int graph-1 edge endpoints (padded slots may
        alias node 0 — they carry Ke == 0 in the model, so they contribute
        nothing; they do occupy local-edge slots on chip 0)
    """
    src1 = np.asarray(src1)
    dst1 = np.asarray(dst1)
    B, E1 = src1.shape
    p = n_shards
    assert n1 % p == 0, f"n1={n1} must be divisible by n_shards={p}"
    rows_per = n1 // p
    s_cap, e_cap = rows_per, E1

    f = dict(send_idx=np.zeros((B, p, p, s_cap), np.int32),
             send_mask=np.zeros((B, p, p, s_cap), np.float32),
             loc_gather=np.zeros((B, p, e_cap), np.int32),
             loc_scatter=np.zeros((B, p, e_cap), np.int32),
             loc_ke_row=np.full((B, p, e_cap), E1, np.int32),
             halo_gather=np.zeros((B, p, e_cap), np.int32),
             halo_scatter=np.zeros((B, p, e_cap), np.int32),
             halo_ke_row=np.full((B, p, e_cap), E1, np.int32))
    for b in range(B):
        pl = plan_row_shards(n1, src1[b], dst1[b], p, transpose=transpose)
        s_b = pl.s_max
        f["send_idx"][b, :, :, :s_b] = pl.send_idx
        f["send_mask"][b, :, :, :s_b] = pl.send_mask
        eL = pl.loc_gather.shape[1]
        f["loc_gather"][b, :, :eL] = pl.loc_gather
        f["loc_scatter"][b, :, :eL] = pl.loc_scatter
        f["loc_ke_row"][b, :, :eL] = pl.loc_ke_row
        eH = pl.halo_gather.shape[1]
        # remap recv slots q*s_b + k → q*s_cap + k for the uniform buffer
        hg = pl.halo_gather
        f["halo_gather"][b, :, :eH] = (hg // s_b) * s_cap + hg % s_b
        f["halo_scatter"][b, :, :eH] = pl.halo_scatter
        f["halo_ke_row"][b, :, :eH] = pl.halo_ke_row
    return BatchRowPlan(
        transpose_tag=jnp.zeros((1,) if transpose else (0,), jnp.int32),
        **{k: jnp.asarray(v) for k, v in f.items()})


def batched_row_sharded_aggregate(mesh: Mesh, axis: str = "edge",
                                  batch_axis: Optional[str] = None,
                                  transpose: bool = True):
    """Build the in-model sharded Kᵀ·vec(X): X/Kp/output row-sharded on the
    mesh, one halo all_to_all per call, batch axis vmapped inside (and
    optionally itself sharded over `batch_axis` for DP×edge 2-D meshes).

    Returned fn(X, Kp, Ke, plan, src2, dst2) → Y, all (B, …)-leading:
      X (B, N1, N2, C), Kp (B, N1, N2), Ke (B, E1, E2) — Ke padded slots
      MUST carry 0 — plan a BatchRowPlan for (N1, E1, p), src2/dst2 (B, E2).
    Mean normalization (degree divide) is the caller's, as in ops.assoc.
    """
    p = mesh.shape[axis]
    vary_axes = (axis,) + ((batch_axis,) if batch_axis else ())

    def _one(X, Kp, KeL, KeH, send_idx, send_mask,
             loc_g, loc_s, hal_g, hal_s, src2, dst2):
        """Single sample on one chip. X (rows_per, N2, C)."""
        rows_per, n2, _ = X.shape
        s_cap = send_idx.shape[-1]
        # 1. pack + launch the halo exchange
        pack = X[send_idx] * send_mask[..., None, None]   # (p, s_cap, N2, C)
        recv = jax.lax.all_to_all(pack, axis, split_axis=0, concat_axis=0)
        halo = recv.reshape(p * s_cap, n2, X.shape[-1])
        # 2. local contraction — independent of `recv`, overlappable
        y = _edge_contract(X[loc_g], KeL, src2, dst2, loc_s, rows_per, n2,
                           vary=vary_axes)
        y = y + Kp[..., None] * X
        # 3. halo contraction once the exchange lands
        return y + _edge_contract(halo[hal_g], KeH, src2, dst2, hal_s,
                                  rows_per, n2, vary=vary_axes)

    def _local(X, Kp, KeL, KeH, send_idx, send_mask,
               loc_g, loc_s, hal_g, hal_s, src2, dst2):
        # chip axis of the plan operands arrives as a singleton — squeeze
        return jax.vmap(_one)(X, Kp, KeL[:, 0], KeH[:, 0],
                              send_idx[:, 0], send_mask[:, 0],
                              loc_g[:, 0], loc_s[:, 0],
                              hal_g[:, 0], hal_s[:, 0], src2, dst2)

    bp = batch_axis
    sharded = P(bp, axis)
    rep = P(bp)

    def fn(X, Kp, Ke, plan: BatchRowPlan, src2, dst2):
        plan_transpose = plan.transpose_tag.shape[0] == 1
        if plan_transpose != transpose:
            raise ValueError(
                f"BatchRowPlan was built with transpose={plan_transpose} but "
                f"this aggregate computes transpose={transpose} — the plan "
                "would silently route the wrong K orientation")
        if transpose:
            src2, dst2 = dst2, src2
        # gather per-chip Ke rows on device (Ke is model-computed); row E1
        # reads the appended zero row so padded plan slots contribute nothing
        Kez = jnp.concatenate(
            [Ke, jnp.zeros((Ke.shape[0], 1, Ke.shape[2]), Ke.dtype)], axis=1)
        KeL = jax.vmap(lambda kz, idx: kz[idx])(
            Kez, plan.loc_ke_row)                          # (B, p, e_cap, E2)
        KeH = jax.vmap(lambda kz, idx: kz[idx])(Kez, plan.halo_ke_row)
        return jax.shard_map(
            _local, mesh=mesh,
            in_specs=(sharded, sharded, sharded, sharded,
                      sharded, sharded, sharded, sharded, sharded, sharded,
                      rep, rep),
            out_specs=sharded,
        )(X, Kp, KeL, KeH, plan.send_idx, plan.send_mask,
          plan.loc_gather, plan.loc_scatter,
          plan.halo_gather, plan.halo_scatter, src2, dst2)

    return fn


def edge_partition_reference(X, Kp, Ke, src1, dst1, src2, dst2,
                             n_shards: int, transpose=False):
    """Host-loop reference implementation for tests: split E1 into shards,
    sum partials."""
    e1 = Ke.shape[0]
    per = e1 // n_shards
    y = jnp.zeros_like(X)
    for s in range(n_shards):
        sl = slice(s * per, (s + 1) * per if s < n_shards - 1 else e1)
        kp = Kp if s == 0 else jnp.zeros_like(Kp)
        y = y + assoc_matvec(X, kp, Ke[sl], src1[sl], dst1[sl], src2, dst2,
                             transpose=transpose)
    return y
