"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel
training step and the edge-partitioned association matvec."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
    # XLA-CPU collectives rendezvous all 8 virtual devices; keep these tests
    # on one xdist worker so concurrent workers can't starve a device past
    # the 40s rendezvous timeout (the round-1 dryrun abort mode)
    pytest.mark.xdist_group("mesh8"),
]


def _rand_graph(rng, n, density=0.5):
    A = (rng.uniform(size=(n, n)) < density).astype(np.float32)
    np.fill_diagonal(A, 0)
    A = np.maximum(A, A.T)
    src, dst = np.nonzero(A)
    return src.astype(np.int32), dst.astype(np.int32)


@pytest.mark.parametrize("transpose", [False, True])
def test_edge_sharded_matvec_matches_single_device(rng, transpose):
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import (edge_sharded_matvec,
                                                     make_edge_mesh,
                                                     shard_pair_for_edges)

    n1, n2, c = 8, 8, 4
    src1, dst1 = _rand_graph(rng, n1)
    src2, dst2 = _rand_graph(rng, n2)
    e1 = (len(src1) // 8) * 8  # multiple of mesh size
    src1, dst1 = src1[:e1], dst1[:e1]
    X = jnp.asarray(rng.normal(size=(n1, n2, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(e1, len(src2))).astype(np.float32))
    s1, d1 = jnp.asarray(src1), jnp.asarray(dst1)
    s2, d2 = jnp.asarray(src2), jnp.asarray(dst2)

    want = assoc_matvec(X, Kp, Ke, s1, d1, s2, d2, transpose=transpose)

    mesh = make_edge_mesh(8)
    fn = edge_sharded_matvec(mesh)
    Ke_s, s1_s, d1_s = shard_pair_for_edges(mesh, Ke, s1, d1)
    got = fn(X, Kp, Ke_s, s1_s, d1_s, s2, d2, transpose=transpose)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("transpose", [False, True])
def test_row_sharded_matvec_matches_single_device(rng, transpose):
    """v2 row-sharded matvec (all-to-all halo exchange) vs the one-chip op."""
    from fpmatch_tpu.core.build_graphs import build_edges
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import (
        halo_fraction, make_edge_mesh, plan_row_shards, row_sharded_matvec,
        shard_rows)

    n1, n2, c = 240, 10, 3
    pts = rng.uniform(size=(n1, 2)).astype(np.float32)
    pts = pts[np.argsort(pts[:, 0])]          # spatially-coherent row order
    _, src1, dst1 = build_edges(pts, stg="tri")
    src2, dst2 = _rand_graph(rng, n2)
    e1, e2 = len(src1), len(src2)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(e1, e2)).astype(np.float32)

    want = assoc_matvec(jnp.asarray(X), jnp.asarray(Kp), jnp.asarray(Ke),
                        jnp.asarray(src1), jnp.asarray(dst1),
                        jnp.asarray(src2), jnp.asarray(dst2),
                        transpose=transpose)

    mesh = make_edge_mesh(8)
    plan = plan_row_shards(n1, src1, dst1, 8, transpose=transpose)
    fn = row_sharded_matvec(mesh, plan)
    Xs, Kps, KeL, KeH = shard_rows(mesh, plan, X, Kp, Ke)
    got = np.asarray(fn(Xs, Kps, KeL, KeH, jnp.asarray(src2),
                        jnp.asarray(dst2)))[:n1]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)

    # scaling structure: per-layer comm is a thin halo (≪ the v1
    # full-replication volume) and per-chip X memory < the full problem;
    # both ratios improve as n1 grows (boundary/area — measured: halo_frac
    # 0.34/0.22/0.15/0.10 and per-chip 1.12/1.06/0.76/0.55x of full at
    # n1=48/128/240/600 on 8 shards)
    assert halo_fraction(plan) < 0.25
    per_chip_rows = plan.rows_per + plan.n_shards * plan.s_max
    assert per_chip_rows < n1


def test_row_sharded_chained_layers_stay_sharded(rng):
    """Chained propagation consumes the sharded Y directly — the full X is
    never materialized between layers."""
    from fpmatch_tpu.core.build_graphs import build_edges
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import (
        make_edge_mesh, plan_row_shards, row_sharded_matvec, shard_rows)

    n1, n2, c = 40, 6, 2
    pts = rng.uniform(size=(n1, 2)).astype(np.float32)
    pts = pts[np.argsort(pts[:, 0])]
    _, src1, dst1 = build_edges(pts, stg="tri")
    src2, dst2 = _rand_graph(rng, n2)
    X = rng.normal(size=(n1, n2, c)).astype(np.float32)
    Kp = rng.normal(size=(n1, n2)).astype(np.float32)
    Ke = rng.normal(size=(len(src1), len(src2))).astype(np.float32)

    w = assoc_matvec(jnp.asarray(X), jnp.asarray(Kp), jnp.asarray(Ke),
                     jnp.asarray(src1), jnp.asarray(dst1),
                     jnp.asarray(src2), jnp.asarray(dst2), transpose=True)
    want = assoc_matvec(w, jnp.asarray(Kp), jnp.asarray(Ke),
                        jnp.asarray(src1), jnp.asarray(dst1),
                        jnp.asarray(src2), jnp.asarray(dst2), transpose=True)

    mesh = make_edge_mesh(8)
    plan = plan_row_shards(n1, src1, dst1, 8, transpose=True)
    fn = row_sharded_matvec(mesh, plan)
    Xs, Kps, KeL, KeH = shard_rows(mesh, plan, X, Kp, Ke)
    s2, d2 = jnp.asarray(src2), jnp.asarray(dst2)
    y1 = fn(Xs, Kps, KeL, KeH, s2, d2)
    assert "edge" in str(y1.sharding.spec)          # still row-sharded
    y2 = fn(y1, Kps, KeL, KeH, s2, d2)
    np.testing.assert_allclose(np.asarray(y2)[:n1], np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_edge_partition_reference_matches(rng):
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import edge_partition_reference

    n = 6
    src1, dst1 = _rand_graph(rng, n)
    src2, dst2 = _rand_graph(rng, n)
    X = jnp.asarray(rng.normal(size=(n, n, 3)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(len(src1), len(src2))).astype(np.float32))
    want = assoc_matvec(X, Kp, Ke, src1, dst1, src2, dst2)
    got = edge_partition_reference(X, Kp, Ke, src1, dst1, src2, dst2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_data_parallel_train_step_runs_on_mesh(rng):
    """The driver's dryrun_multichip path as a regression test.

    Runs in a SUBPROCESS: if the XLA-CPU collective rendezvous aborts
    (SIGABRT after its 40 s timeout under host overload), it must not take
    the whole pytest process down with it."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900,
        env={**__import__('os').environ,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_hybrid_mesh_and_global_batch(rng):
    """(data=4, edge=2) hybrid mesh: batch sharded over data, replicated over
    edge; single-process global assembly path."""
    import jax.numpy as jnp
    from fpmatch_tpu.parallel.distributed import (global_batch_from_local,
                                                  make_hybrid_mesh)

    mesh = make_hybrid_mesh(4, 2)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    g = global_batch_from_local({"x": x}, mesh)
    assert g["x"].shape == (8, 16)
    assert len(g["x"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(g["x"]), np.asarray(x))


def test_batched_row_aggregate_matches_vmapped_op(rng):
    """v3 in-model batched row-sharded aggregate vs the single-chip op,
    batch of 2 pairs with different graphs, padded edge slots present."""
    from fpmatch_tpu.ops.assoc import assoc_matvec
    from fpmatch_tpu.parallel.edge_partition import (
        batched_row_sharded_aggregate, make_edge_mesh, plan_batch_rows)

    B, n, c, E = 2, 16, 3, 40
    src = np.zeros((B, 2, E), np.int32)
    dst = np.zeros((B, 2, E), np.int32)
    ne = np.zeros((B, 2), np.int32)
    for b in range(B):
        for v in range(2):
            s, d = _rand_graph(rng, n, density=0.3)
            k = min(len(s), E)
            src[b, v, :k], dst[b, v, :k] = s[:k], d[:k]
            ne[b, v] = k
    X = jnp.asarray(rng.normal(size=(B, n, n, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
    Ke = rng.normal(size=(B, E, E)).astype(np.float32)
    for b in range(B):  # padded edge slots must carry Ke == 0
        Ke[b, ne[b, 0]:, :] = 0.0
        Ke[b, :, ne[b, 1]:] = 0.0
    Ke = jnp.asarray(Ke)

    want = jax.vmap(lambda x, kp, ke, s1, d1, s2, d2: assoc_matvec(
        x, kp, ke, s1, d1, s2, d2, transpose=True))(
        X, Kp, Ke, src[:, 0], dst[:, 0], src[:, 1], dst[:, 1])

    mesh = make_edge_mesh(8)
    plan = plan_batch_rows(n, src[:, 0], dst[:, 0], 8, transpose=True)
    agg = jax.jit(batched_row_sharded_aggregate(mesh, transpose=True))
    got = agg(X, Kp, Ke, plan, jnp.asarray(src[:, 1]), jnp.asarray(dst[:, 1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_univ_scale_batched_row_aggregate_matches_single_device(rng):
    """Flagship UNIV scale through the v3 in-model path: one n=600 Delaunay
    pair (e1=e2≈3600, ~13M association edges) row-sharded over the 8-device
    mesh vs the single-chip auto-dispatch op. Exercises the spill/halo/plan
    behavior at the size the kernel design is for — not the n=16 toy."""
    from fpmatch_tpu.core.build_graphs import build_edges
    from fpmatch_tpu.ops.assoc import assoc_matvec_auto
    from fpmatch_tpu.parallel.edge_partition import (
        batched_row_sharded_aggregate, halo_fraction, make_edge_mesh,
        plan_batch_rows, plan_row_shards)

    n, c = 600, 4
    pts1 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    pts1 = pts1[np.argsort(pts1[:, 0])]       # spatially-coherent row order
    pts2 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    _, s1, d1 = build_edges(pts1, stg="tri")
    _, s2, d2 = build_edges(pts2, stg="tri")
    e1, e2 = len(s1), len(s2)
    X = rng.normal(size=(1, n, n, c)).astype(np.float32)
    Kp = rng.normal(size=(1, n, n)).astype(np.float32)
    Ke = rng.normal(size=(1, e1, e2)).astype(np.float32)

    want = assoc_matvec_auto(jnp.asarray(X[0]), jnp.asarray(Kp[0]),
                             jnp.asarray(Ke[0]), jnp.asarray(s1),
                             jnp.asarray(d1), jnp.asarray(s2),
                             jnp.asarray(d2), transpose=True)

    mesh = make_edge_mesh(8)
    plan = plan_batch_rows(n, s1[None], d1[None], 8, transpose=True)
    agg = jax.jit(batched_row_sharded_aggregate(mesh, transpose=True))
    got = agg(jnp.asarray(X), jnp.asarray(Kp), jnp.asarray(Ke), plan,
              jnp.asarray(s2)[None], jnp.asarray(d2)[None])
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want),
                               rtol=5e-4, atol=5e-4)

    # at this scale the halo must be a thin boundary (boundary/area):
    # measured 0.09-0.10 at n=600/p=8 on spatially-ordered Delaunay rows
    pl = plan_row_shards(n, s1, d1, 8, transpose=True)
    assert halo_fraction(pl) < 0.15


def test_ngm_forward_edge_sharded_matches_single_device():
    """Full NGM forward with the 3 assoc-GNN layers row-sharded over the
    8-device mesh vs the plain single-device forward: same params (the
    sharded path's parameter tree is interchangeable), allclose outputs."""
    import dataclasses
    from fpmatch_tpu.core.config import Config, ShapeConfig, NGMConfig, \
        BackboneConfig
    from fpmatch_tpu.data.synthetic import synthetic_pair_batch
    from fpmatch_tpu.models.ngm import NGMNet
    from fpmatch_tpu.parallel.edge_partition import (make_edge_mesh,
                                                     plan_batch_rows)

    cfg = Config(
        shapes=ShapeConfig(n_max=16, e_max=64, t_max=16, univ_size=24),
        backbone=BackboneConfig(stem_channels=8,
                                stage_channels=(8, 8, 16, 16),
                                blocks_per_stage=1),
        ngm=dataclasses.replace(
            NGMConfig(), node_feature_dim=32, global_state_dim=32,
            gnn_feat=(8, 8, 8), sk_iter=4, sk_layer_iter=4,
            topk_extra_iter=2, afa_reg_hidden=4))
    batch = synthetic_pair_batch(cfg, batch_size=2, n_range=(10, 14),
                                 image_hw=(32, 48), seed=3)

    model1 = NGMNet(cfg)
    variables = model1.init(jax.random.PRNGKey(0), batch, train=False)
    want = jax.jit(lambda v, b: model1.apply(v, b, train=False))(
        variables, batch)

    mesh = make_edge_mesh(8)
    plan = plan_batch_rows(cfg.shapes.n_max, np.asarray(batch.src[:, 0]),
                           np.asarray(batch.dst[:, 0]), 8, transpose=True)
    batch_sh = batch._replace(row_plan=plan)
    model2 = NGMNet(cfg, mesh=mesh)
    got = jax.jit(lambda v, b: model2.apply(v, b, train=False))(
        variables, batch_sh)

    assert set(got) == set(want)
    # the sharded sum reassociates (local + halo partials), so outputs agree
    # to accumulation order, not bitwise — observed max |Δ| ≈ 1.5e-4 on
    # post-Sinkhorn quantities
    for k in ("ds_mat", "perm_mat", "cls_prob", "k_prob", "raw_scores"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-2, atol=2e-3, err_msg=k)


def test_ngm_flagship_shapes_edge_sharded_forward_and_train_step():
    """Flagship SHAPES (n_max=64, e_max=384, univ=600 — the production
    config's buckets) through the edge-sharded model on the 8-device mesh:
    forward parity AND one train step vs single-device. The backbone is
    shrunk (CPU-mesh wall-clock), but every shape the sharding plan, spill
    and halo machinery sees is the flagship's."""
    import dataclasses
    from fpmatch_tpu.core.config import Config, ShapeConfig, NGMConfig, \
        BackboneConfig
    from fpmatch_tpu.core.config import default_stages
    from fpmatch_tpu.data.synthetic import synthetic_pair_batch
    from fpmatch_tpu.models.ngm import NGMNet
    from fpmatch_tpu.parallel.edge_partition import (make_edge_mesh,
                                                     plan_batch_rows)
    from fpmatch_tpu.train.state import create_state
    from fpmatch_tpu.train.step import make_train_step

    cfg = Config(
        shapes=ShapeConfig(),            # flagship: 64 / 384 / 384 / 600
        backbone=BackboneConfig(stem_channels=8,
                                stage_channels=(8, 8, 16, 16),
                                blocks_per_stage=1),
        ngm=dataclasses.replace(
            NGMConfig(), node_feature_dim=32, global_state_dim=32,
            gnn_feat=(8, 8, 8), sk_iter=4, sk_layer_iter=4,
            topk_extra_iter=2, afa_reg_hidden=4))
    assert cfg.shapes.n_max == 64 and cfg.shapes.univ_size == 600
    batch = synthetic_pair_batch(cfg, batch_size=2, n_range=(48, 62),
                                 image_hw=(64, 96), seed=5)

    model1 = NGMNet(cfg)
    variables = model1.init(jax.random.PRNGKey(0), batch, train=False)
    want = jax.jit(lambda v, b: model1.apply(v, b, train=False))(
        variables, batch)

    mesh = make_edge_mesh(8)
    plan = plan_batch_rows(cfg.shapes.n_max, np.asarray(batch.src[:, 0]),
                           np.asarray(batch.dst[:, 0]), 8, transpose=True)
    batch_sh = batch._replace(row_plan=plan)
    model2 = NGMNet(cfg, mesh=mesh)
    got = jax.jit(lambda v, b: model2.apply(v, b, train=False))(
        variables, batch_sh)
    for k in ("ds_mat", "cls_prob", "k_prob", "raw_scores"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-2, atol=2e-3, err_msg=k)
    # perm_mat is a discrete binarization: the sharded sum reassociates, so
    # near-tie assignments may flip. Require the flip rate tiny (observed
    # 6/8192 at these shapes), not bitwise equality.
    flips = np.abs(np.asarray(got["perm_mat"])
                   - np.asarray(want["perm_mat"])).sum()
    assert flips <= 0.005 * got["perm_mat"].size, f"{flips} perm flips"

    # one train step each (stage 3: every partition trains, all losses on)
    stage = default_stages()[2]
    m_single = make_train_step(model1, stage)(
        create_state(variables, stage), batch)[1]
    m_shard = make_train_step(model2, stage)(
        create_state(variables, stage), batch_sh)[1]
    assert np.isfinite(m_shard["total_loss"])
    np.testing.assert_allclose(np.asarray(m_shard["total_loss"]),
                               np.asarray(m_single["total_loss"]), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(m_shard["accuracy"]),
                               np.asarray(m_single["accuracy"]), atol=0.05)
