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
from typing import Optional

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
