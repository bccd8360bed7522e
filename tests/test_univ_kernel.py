"""Blocked UNIV-scale Pallas kernel vs the XLA gather path (interpret mode
on CPU; the TPU bench lives in bench.py/RESULTS.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpmatch_tpu.core.build_graphs import build_edges
from fpmatch_tpu.kernels.assoc_univ import (assoc_matvec_univ,
                                            gather_ke_blocks, plan_univ)
from fpmatch_tpu.ops.assoc import assoc_matvec


def _pair(rng, n1, n2):
    p1 = rng.uniform(size=(n1, 2)).astype(np.float32) * [4.0, 1.0]
    p2 = rng.uniform(size=(n2, 2)).astype(np.float32) * [4.0, 1.0]
    _, s1, d1 = build_edges(p1, stg="tri")
    _, s2, d2 = build_edges(p2, stg="tri")
    return p1, p2, s1, d1, s2, d2


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("fused_ta", [False, True])
def test_univ_blocked_matches_xla(rng, transpose, fused_ta):
    n1, n2, c = 150, 140, 3
    p1, p2, s1, d1, s2, d2 = _pair(rng, n1, n2)
    X = jnp.asarray(rng.normal(size=(n1, n2, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(len(s1), len(s2))).astype(np.float32))

    want = assoc_matvec(X, Kp, Ke, s1, d1, s2, d2, transpose=transpose)

    plan = plan_univ(p1, p2, s1, d1, s2, d2, r1=16, r2=128,
                     transpose=transpose)
    got = assoc_matvec_univ(X, Kp, Ke, plan, interpret=True,
                            fused_ta=fused_ta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_univ_plan_locality_and_spill(rng):
    """Spatially-sorted Delaunay: the spill set must be a small fraction,
    and every kept edge's gather endpoint must fit its 3-block window."""
    n1, n2 = 300, 300
    p1, p2, s1, d1, s2, d2 = _pair(rng, n1, n2)
    plan = plan_univ(p1, p2, s1, d1, s2, d2, r1=32, r2=128, transpose=True)
    assert len(plan.spill1) < 0.05 * len(s1)
    assert (plan.d1_loc >= 0).all() and (plan.d1_loc < 3 * plan.r1).all()
    assert (plan.d2_loc >= 0).all() and (plan.d2_loc < 3 * plan.r2).all()
    # KeR covers exactly the kept edges once
    Ke = jnp.asarray(rng.normal(size=(len(s1), len(s2))).astype(np.float32))
    KeR = gather_ke_blocks(Ke, plan)
    kept1 = plan.e1_idx[plan.e1_idx < len(s1)]
    assert len(np.unique(kept1)) == len(kept1)
    assert len(kept1) + len(plan.spill1) == len(s1)
    assert KeR.shape == (plan.e1_idx.size, plan.e2_idx.size)


def test_univ_spill_only_graph_still_exact(rng):
    """A random (non-local) graph spills heavily but stays exact via the
    XLA fallback."""
    n1, n2, c = 40, 40, 2
    s1 = rng.integers(0, n1, 120).astype(np.int32)
    d1 = rng.integers(0, n1, 120).astype(np.int32)
    s2 = rng.integers(0, n2, 110).astype(np.int32)
    d2 = rng.integers(0, n2, 110).astype(np.int32)
    p1 = rng.uniform(size=(n1, 2)).astype(np.float32)
    p2 = rng.uniform(size=(n2, 2)).astype(np.float32)
    X = jnp.asarray(rng.normal(size=(n1, n2, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n1, n2)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(120, 110)).astype(np.float32))
    want = assoc_matvec(X, Kp, Ke, s1, d1, s2, d2, transpose=True)
    plan = plan_univ(p1, p2, s1, d1, s2, d2, r1=8, r2=128, transpose=True)
    got = assoc_matvec_univ(X, Kp, Ke, plan, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# kernel v3: padded-degree dense form (assoc_univ_v3)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("transpose", [True, False])
def test_univ_v3_matches_xla(rng, transpose):
    """v3 kernel (interpret mode) vs the one-shot XLA op, Delaunay pair."""
    from fpmatch_tpu.kernels.assoc_univ_v3 import (assoc_matvec_univ_v3,
                                                   build_kep, plan_univ_v3)

    n, c = 200, 16
    pts1 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    pts2 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    _, s1, d1 = build_edges(pts1, stg="tri")
    _, s2, d2 = build_edges(pts2, stg="tri")
    X = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(len(s1), len(s2))).astype(np.float32))

    want = assoc_matvec(X, Kp, Ke, jnp.asarray(s1), jnp.asarray(d1),
                        jnp.asarray(s2), jnp.asarray(d2), transpose=transpose)

    plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=transpose)
    KeP = build_kep(Ke, plan)
    got = assoc_matvec_univ_v3(X, Kp, Ke, plan, KeP, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_univ_v3_spill_capture(rng):
    """Slot-cap overflow and band violations go to the spill lists and the
    result stays exact."""
    from fpmatch_tpu.kernels.assoc_univ_v3 import (assoc_matvec_univ_v3,
                                                   build_kep, plan_univ_v3)

    n, c = 140, 4
    pts2 = rng.uniform(size=(n, 2)).astype(np.float32)
    # random (non-local) graphs force band violations; tiny caps force
    # slot overflow
    def rg(n, m):
        src = rng.integers(0, n, size=m).astype(np.int32)
        dst = (src + rng.integers(1, n, size=m).astype(np.int32)) % n
        return src, dst
    s1, d1 = rg(n, 600)
    s2, d2 = rg(n, 600)
    X = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(600, 600)).astype(np.float32))

    want = assoc_matvec(X, Kp, Ke, jnp.asarray(s1), jnp.asarray(d1),
                        jnp.asarray(s2), jnp.asarray(d2), transpose=True)
    plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=True,
                        s1_cap=4, s2_cap=4)
    assert len(plan.spill1) > 0 and len(plan.spill2) > 0
    KeP = build_kep(Ke, plan)
    got = assoc_matvec_univ_v3(X, Kp, Ke, plan, KeP, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_univ_v3_auto_plan_no_row_spill(rng):
    """Auto-capped plans carry the full degree table (spill1 empty): the
    spill postlude measured ~half the matvec (logs/univ3_ablate_r5.log)
    while degree-class grouping confines the extra slot planes to the
    top tiles. Only pathological max degrees (> 2x the 0.5%-overflow cap)
    may still spill rows."""
    from fpmatch_tpu.kernels.assoc_univ_v3 import plan_univ_v3

    for n in (200, 600):
        pts1 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
        pts2 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
        _, s1, d1 = build_edges(pts1, stg="tri")
        _, s2, d2 = build_edges(pts2, stg="tri")
        plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=True)
        assert len(plan.spill1) == 0
        deg1 = np.bincount(np.asarray(d1), minlength=n)  # transpose: out=dst
        assert plan.s1 == deg1.max()
        # grouping still tiers the planes: the first group must be cheaper
        # than the global max-degree cap
        assert plan.groups[0][2] < plan.s1


def test_univ_v3_degenerate_zero_edge_side(rng):
    """A 1-2 keypoint image has no Delaunay edges. cli/match.py only rejects
    zero-keypoint images and auto-routes n_max >= 256 through this kernel,
    so the plan must survive zero-edge sides (round-4 advisor finding:
    _auto_cap returned 0 → s1 = 0 → zero-width slot table trace crash)."""
    from fpmatch_tpu.kernels.assoc_univ_v3 import (assoc_matvec_univ_v3,
                                                   build_kep, plan_univ_v3)

    n, c = 130, 4
    pts2 = rng.uniform(size=(n, 2)).astype(np.float32)
    empty = np.zeros(0, np.int32)
    s2, d2 = rg2(rng, n)
    X = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

    # zero edges on side 1 (and a padded-width Ke, as the model ships)
    Ke = jnp.zeros((8, len(s2)), np.float32)
    want = assoc_matvec(X, Kp, Ke[:0], empty, empty, jnp.asarray(s2),
                        jnp.asarray(d2), transpose=True)
    plan = plan_univ_v3(pts2, empty, empty, s2, d2, transpose=True, n1=n)
    assert plan.s1 >= 1 and plan.s2 >= 1
    got = assoc_matvec_univ_v3(X, Kp, Ke[:0], plan, build_kep(Ke[:0], plan),
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # zero edges on BOTH sides: pure Kp diagonal
    plan = plan_univ_v3(pts2, empty, empty, empty, empty, transpose=True,
                        n1=n)
    assert plan.s1 >= 1 and plan.s2 >= 1
    got = assoc_matvec_univ_v3(X, Kp, jnp.zeros((0, 0), np.float32), plan,
                               build_kep(jnp.zeros((0, 0), np.float32),
                                         plan), interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(Kp[..., None] * X),
                               rtol=1e-5, atol=1e-5)


def rg2(rng, n):
    """A small Delaunay edge set over n spatially random nodes."""
    pts = rng.uniform(size=(n, 2)).astype(np.float32) * [4.0, 1.0]
    _, s, d = build_edges(pts, stg="tri")
    return s, d


def test_ngm_forward_univ_kernel_path_matches_default():
    """NGMNet(univ_plan=...) single-pair serving path (v3 kernel, interpret
    on CPU) vs the default chunked/auto dispatch: same params, allclose."""
    import dataclasses
    from fpmatch_tpu.core.config import (BackboneConfig, Config, NGMConfig,
                                         ShapeConfig)
    from fpmatch_tpu.data.synthetic import synthetic_pair_batch
    from fpmatch_tpu.kernels.assoc_univ_v3 import plan_univ_v3
    from fpmatch_tpu.models.ngm import NGMNet

    cfg = Config(
        shapes=ShapeConfig(n_max=32, e_max=160, t_max=32, univ_size=24),
        backbone=BackboneConfig(stem_channels=8,
                                stage_channels=(8, 8, 16, 16),
                                blocks_per_stage=1),
        ngm=dataclasses.replace(
            NGMConfig(), node_feature_dim=32, global_state_dim=32,
            gnn_feat=(8, 8, 8), sk_iter=4, sk_layer_iter=4,
            topk_extra_iter=2, afa_reg_hidden=4))
    batch = synthetic_pair_batch(cfg, batch_size=1, n_range=(24, 30),
                                 image_hw=(32, 48), seed=7)

    model1 = NGMNet(cfg)
    variables = model1.init(jax.random.PRNGKey(0), batch, train=False)
    want = model1.apply(variables, batch, train=False)

    N = cfg.shapes.n_max
    pts2 = np.full((N, 2), 1e9, np.float32)
    n2 = int(batch.n_nodes[0, 1])
    pts2[:n2] = np.asarray(batch.points[0, 1, :n2])
    pts2[n2:, 0] += np.arange(N - n2)
    e1, e2 = int(batch.n_edges[0, 0]), int(batch.n_edges[0, 1])
    plan = plan_univ_v3(pts2, np.asarray(batch.src[0, 0, :e1]),
                        np.asarray(batch.dst[0, 0, :e1]),
                        np.asarray(batch.src[0, 1, :e2]),
                        np.asarray(batch.dst[0, 1, :e2]),
                        transpose=True, n1=N)
    model2 = NGMNet(cfg, univ_plan=plan)
    got = model2.apply(variables, batch, train=False)
    for k in ("ds_mat", "cls_prob", "k_prob", "raw_scores"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)
