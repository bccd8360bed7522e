"""Edge-partition v2 performance on the virtual CPU mesh — VERDICT's
"structure but no performance evidence" item.

Measures, at fixed TOTAL work (one n1=n2=N pair, Delaunay graphs):
  * single-device assoc matvec (the chunked large-problem path)
  * row_sharded_matvec on p = 2, 4, 8 mesh shards
  * per-p halo fraction, and an overlap proxy: t_full vs t_local_only +
    t_exchange_only (t_full < sum ⇒ the all_to_all overlaps the local
    contraction, as edge_partition.py's design claims)

Interpretation caveat (printed in the JSON): the 8 "devices" are virtual
XLA-CPU devices sharing this host's ~4 cores, so absolute speedups are
meaningless; what transfers to real ICI-connected chips is (a) the comm
VOLUME (halo fraction × N1·N2·C bytes/layer), (b) the comm/compute ratio,
(c) the overlap behavior. The ICI extrapolation in RESULTS.md is computed
from these.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bench_edge_partition.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def median_s(fn, iters=7):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from fpmatch_tpu.core.build_graphs import build_edges
    from fpmatch_tpu.ops.assoc import assoc_matvec_chunked
    from fpmatch_tpu.parallel.edge_partition import (halo_fraction,
                                                     plan_row_shards,
                                                     row_sharded_matvec,
                                                     shard_rows)
    from jax.sharding import Mesh

    n, c = 512, 16
    rng = np.random.default_rng(0)
    pts1 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    pts2 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    # spatially-coherent node order (what the model's plan would use) keeps
    # the halo a thin boundary
    order1 = np.argsort(pts1[:, 0])
    pts1 = pts1[order1]
    _, s1, d1 = build_edges(pts1, stg="tri")
    _, s2, d2 = build_edges(pts2, stg="tri")
    e1, e2 = len(s1), len(s2)
    nnz = e1 * e2 + n * n
    X = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(e1, e2)).astype(np.float32))

    out = {"n": n, "c": c, "e1": e1, "e2": e2, "assoc_edges": nnz,
           "note": "virtual CPU devices share ~4 cores; read comm volume/"
                   "overlap, not absolute speedup"}

    f1 = jax.jit(lambda x: assoc_matvec_chunked(
        x, Kp, Ke, s1, d1, s2, d2, transpose=True, chunk=256))
    t1 = median_s(lambda: f1(X))
    out["single_device_s"] = round(t1, 4)
    out["single_device_edges_per_s"] = round(nnz / t1, 0)

    devices = jax.devices()
    for p in (2, 4, 8):
        mesh = Mesh(np.array(devices[:p]), ("edge",))
        plan = plan_row_shards(n, s1, d1, p, transpose=True)
        Xs, Kps, KeL, KeH = shard_rows(mesh, plan, X, Kp, Ke)
        fn = row_sharded_matvec(mesh, plan)
        tp = median_s(lambda: fn(Xs, Kps, KeL, KeH, s2, d2))
        row = {
            "sharded_s": round(tp, 4),
            "edges_per_s": round(nnz / tp, 0),
            "halo_fraction_vs_replication": round(halo_fraction(plan), 4),
            "halo_rows_per_layer": int(plan.send_mask.sum()),
            "halo_bytes_per_layer": int(plan.send_mask.sum()) * n * c * 4,
            "efficiency_vs_1dev": round(t1 / (tp * 1), 4),
        }
        out[f"p{p}"] = row

    # ---- overlap proxy on the 8-way mesh -----------------------------------
    p = 8
    mesh = Mesh(np.array(devices[:p]), ("edge",))
    plan = plan_row_shards(n, s1, d1, p, transpose=True)
    Xs, Kps, KeL, KeH = shard_rows(mesh, plan, X, Kp, Ke)

    from functools import partial
    from jax.sharding import PartitionSpec as P

    send_idx = jnp.asarray(plan.send_idx)
    send_mask = jnp.asarray(plan.send_mask)

    def _exchange_only(X_loc):
        q = jax.lax.axis_index("edge")
        pack = X_loc[send_idx[q]] * send_mask[q][..., None, None]
        recv = jax.lax.all_to_all(pack, "edge", split_axis=0, concat_axis=0)
        return recv.sum(axis=(0, 1))  # force materialization

    ex = jax.jit(lambda x: jax.shard_map(
        _exchange_only, mesh=mesh, in_specs=(P("edge"),),
        out_specs=P("edge"))(x))

    t_full = median_s(lambda: row_sharded_matvec(mesh, plan)(
        Xs, Kps, KeL, KeH, s2, d2))
    t_ex = median_s(lambda: ex(Xs))

    # local-only: zero halo work by zeroing KeH (same program shape)
    KeH0 = jax.tree_util.tree_map(jnp.zeros_like, KeH)
    t_loc = median_s(lambda: row_sharded_matvec(mesh, plan)(
        Xs, Kps, KeL, KeH0, s2, d2))
    out["overlap_proxy_p8"] = {
        "t_full_s": round(t_full, 4),
        "t_exchange_only_s": round(t_ex, 4),
        "t_local_plus_zero_halo_s": round(t_loc, 4),
        "overlap_evidence": bool(t_full < t_loc + t_ex),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
