"""Multi-host orchestration (ICI within a slice, DCN across hosts).

The reference has no distributed backend at all (SURVEY.md §2.4 — its
DataParallel usage is commented out). Here multi-host runs use
`jax.distributed` + GSPMD: every host calls `initialize()`, builds the same
global mesh, feeds its local shard of each batch, and XLA routes collectives
over ICI (intra-slice) / DCN (cross-host) automatically.

This module is exercised on single-host virtual meshes in CI; on a real pod
slice the same code paths run unchanged with `jax.distributed.initialize`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["PROCESS_ID"]))


def make_hybrid_mesh(data: int, edge: int = 1) -> Mesh:
    """(data, edge) mesh over all global devices. The edge axis should map to
    ICI neighbors (it carries the per-layer psum of the edge-partitioned
    association matvec); mesh_utils orders device grids so the innermost axis
    is ICI-contiguous."""
    from jax.experimental import mesh_utils

    n = data * edge
    avail = jax.devices()
    if n == len(avail):
        devices = mesh_utils.create_device_mesh((data, edge))
    else:
        # a strict subset of the devices (e.g. --mesh 2x2 on an 8-device
        # host): create_device_mesh insists on covering every device, so
        # lay the subset out directly — contiguous ids keep the edge axis
        # ICI-adjacent on real hardware
        devices = np.asarray(avail[:n]).reshape(data, edge)
    return Mesh(devices, ("data", "edge"))


def global_batch_from_local(local_batch, mesh: Mesh):
    """Assemble a globally-sharded PairBatch from per-host local shards
    (jax.make_array_from_process_local_data); on one process this is just a
    device_put with the data sharding."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch)
