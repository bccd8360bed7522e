"""Device mesh + sharding helpers.

Replaces the reference's src/parallel/ (DataParallel subclass with custom
CSX-aware scatter/gather, data_parallel.py:6-46, scatter_gather.py:6-71)
with GSPMD: a Mesh + NamedShardings and jit; XLA inserts the collectives.

Phase 1 (this module): data parallelism — batch axis of every PairBatch leaf
sharded over the "data" mesh axis, params/opt state replicated.
Phase 2 (parallel/edge_partition.py): edge-partitioned association graphs for
pairs too large for one chip.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_data or len(devices)
    dev_array = mesh_utils.create_device_mesh((n,), devices=devices[:n])
    return Mesh(dev_array, ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over "data"; works for every PairBatch leaf."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host PairBatch with its batch axis over the mesh.

    Leaves whose leading axis cannot split over the data axis (e.g. the
    BatchRowPlan transpose tag, shape (1,)/(0,)) are replicated instead.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n = mesh.shape["data"] if "data" in mesh.shape else mesh.size

    def put(x):
        import numpy as _np
        shape = getattr(x, "shape", None)
        divisible = (shape is not None and len(shape) >= 1
                     and shape[0] % n == 0 and shape[0] > 0)
        return jax.device_put(_np.asarray(x) if shape is None else x,
                              sh if divisible else rep)

    return jax.tree_util.tree_map(put, batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
