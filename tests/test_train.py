"""Training-layer tests: losses, metrics, optimizer partitions, train step."""
import numpy as np
import pytest

# one xdist worker per heavy module keeps the module-scoped jitted-model
# fixtures shared instead of re-compiling on every worker
pytestmark = pytest.mark.xdist_group("train")

import jax
import jax.numpy as jnp

from fpmatch_tpu.core.config import Config, ShapeConfig, StageConfig, default_stages
from fpmatch_tpu.models.ngm import NGMNet
from fpmatch_tpu.train.losses import permutation_loss, bce_with_logits
from fpmatch_tpu.train.state import (create_state, get_learning_rates,
                                     set_learning_rates, param_labels)
from fpmatch_tpu.train.step import make_train_step, make_eval_step
from fpmatch_tpu.train.scheduler import WarmupPlateau
from fpmatch_tpu.evaluation.metrics import (matching_accuracy,
                                            verification_metrics)

from test_model import tiny_config, make_batch


def test_permutation_loss_reference(rng):
    """Masked BCE sum / sum(n1) against a direct computation."""
    B, S = 2, 6
    pred = rng.uniform(0.05, 0.95, size=(B, S, S)).astype(np.float32)
    gt = np.zeros((B, S, S), np.float32)
    gt[0, :4, :4] = np.eye(4)
    gt[1, :5, :5] = np.eye(5)
    n1 = np.array([4, 5], np.int32)
    n2 = np.array([4, 5], np.int32)
    got = float(permutation_loss(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(n1), jnp.asarray(n2)))
    want = 0.0
    for b in range(B):
        p = pred[b, :n1[b], :n2[b]]
        g = gt[b, :n1[b], :n2[b]]
        want += -(g * np.log(p) + (1 - g) * np.log(1 - p)).sum()
    want /= n1.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_matching_accuracy():
    pred = np.zeros((1, 5, 5), np.float32)
    gt = np.zeros((1, 5, 5), np.float32)
    pred[0, :3, :3] = np.eye(3)
    gt[0, :4, :4] = np.eye(4)
    acc = matching_accuracy(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.asarray([4]), jnp.asarray([4]))
    np.testing.assert_allclose(np.asarray(acc), [0.75])


def test_verification_metrics_sklearn_free(rng):
    labels = np.r_[np.ones(50), np.zeros(50)]
    scores = np.r_[rng.normal(1.0, 0.5, 50), rng.normal(-1.0, 0.5, 50)]
    m = verification_metrics(labels, scores)
    assert 0.9 < m["roc_auc"] <= 1.0
    assert m["eer"] < 0.15
    assert abs(m["far"] - m["frr"]) < 0.1
    # sanity vs sklearn if available
    try:
        from sklearn.metrics import roc_auc_score
        np.testing.assert_allclose(m["roc_auc"],
                                   roc_auc_score(labels, scores), atol=1e-6)
    except ImportError:
        pass


def test_param_partitions():
    rng = np.random.default_rng(0)
    cfg = tiny_config()
    batch = make_batch(rng)
    model = NGMNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    labels = param_labels(variables["params"])
    flat = jax.tree_util.tree_leaves(labels)
    assert set(flat) <= {"backbone", "main", "k", "cls"}
    assert "afau" in variables["params"]
    assert all(l == "k" for l in
               jax.tree_util.tree_leaves(labels["afau"]))
    assert all(l == "cls" for l in
               jax.tree_util.tree_leaves(labels["match_cls"]))
    assert all(l == "backbone" for l in
               jax.tree_util.tree_leaves(labels["backbone"]))


@pytest.fixture(scope="module")
def model_batch_vars():
    """Shared init: model.init dominates these tests' runtime."""
    rng = np.random.default_rng(0)
    cfg = tiny_config()
    batch = make_batch(rng)
    model = NGMNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, batch, model, variables


@pytest.mark.parametrize("stage_idx", [0, 1, 5])
def test_train_step_respects_stage_freezing(stage_idx, model_batch_vars):
    cfg, batch, model, variables = model_batch_vars
    stage = default_stages()[stage_idx]
    state = create_state(variables, stage)
    step_fn = make_train_step(model, stage)
    # host snapshot before the step: train_step donates the input state
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, metrics = step_fn(state, batch)

    def changed(tree_a, tree_b):
        return any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                   for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                                   jax.tree_util.tree_leaves(tree_b)))

    p1 = new_state.params
    assert changed(p0["afau"], p1["afau"]) == stage.train_k
    assert changed(p0["match_cls"], p1["match_cls"]) == stage.train_cls
    assert changed(p0["vertex_aff"], p1["vertex_aff"]) == stage.train_main
    assert changed(p0["backbone"], p1["backbone"]) == stage.train_main
    assert np.isfinite(float(metrics["total_loss"]))


def test_eval_step_and_lr_update(model_batch_vars):
    cfg, batch, model, variables = model_batch_vars
    stage = default_stages()[2]  # all partitions on
    state = create_state(variables, stage)
    eval_fn = make_eval_step(model, stage)
    metrics, outputs = eval_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert outputs["cls_prob"].shape == (2,)

    lrs = get_learning_rates(state.opt_state)
    assert set(lrs) == {"backbone", "main", "k", "cls"}
    new_opt = set_learning_rates(state.opt_state, {"main": 1e-5})
    assert abs(get_learning_rates(new_opt)["main"] - 1e-5) < 1e-12
    # untouched partitions keep their LR
    assert get_learning_rates(new_opt)["k"] == lrs["k"]


def test_eval_step_hungarian_mask_round_trip(model_batch_vars):
    """The --discretize hungarian path: host LAPJV on the first segment's
    ds_mat, second segment ranks the greedy fill by mask * ds_mat
    (reference ngm.py:444-449). The discretized perm must select only
    Hungarian-approved cells, and scores must stay finite."""
    from fpmatch_tpu.ops.hungarian import hungarian_host
    from fpmatch_tpu.train.step import make_eval_step_masked

    cfg, batch, model, variables = model_batch_vars
    stage = default_stages()[2]
    state = create_state(variables, stage)
    _, out = make_eval_step(model, stage)(state, batch)
    mask = hungarian_host(np.asarray(out["ds_mat"]),
                          np.asarray(batch.n_nodes[:, 0]),
                          np.asarray(batch.n_nodes[:, 1]))
    # a valid assignment: one per row/col on the valid block
    assert mask.shape == out["ds_mat"].shape
    assert (mask.sum(axis=2) <= 1).all() and (mask.sum(axis=1) <= 1).all()
    _, out2 = make_eval_step_masked(model, stage)(state, batch, mask)
    perm = np.asarray(out2["perm_mat"])
    assert ((perm == 1) <= (mask == 1)).all()  # only approved cells selected
    assert np.isfinite(np.asarray(out2["cls_prob"])).all()


def test_metrics_logger_writes_jsonl(tmp_path):
    """MetricsLogger (wired behind cli/train.py --log-dir) writes greppable
    JSONL rows — the reference's per-iteration TB scalars equivalent."""
    import json
    from fpmatch_tpu.utils.logging import MetricsLogger

    ml = MetricsLogger(str(tmp_path), use_tensorboard=False)
    ml.log_scalars(0, {"total_loss": 1.5, "accuracy": 0.25},
                   prefix="stage1/")
    ml.log_scalars(1, {"total_loss": 1.2}, prefix="stage1/")
    ml.close()
    rows = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 2
    assert rows[0]["stage1/total_loss"] == 1.5
    assert rows[0]["step"] == 0 and rows[1]["step"] == 1


def test_warmup_plateau():
    sched = WarmupPlateau({"main": 1e-3}, warmup_epochs=2, patience=1,
                          factor=0.5)
    assert sched.step(1.0)["main"] == pytest.approx(5e-4)   # warmup 1/2
    assert sched.step(1.0)["main"] == pytest.approx(1e-3)   # warmup 2/2
    sched.step(0.5)                                          # improves
    sched.step(0.6)                                          # bad 1
    lrs = sched.step(0.7)                                    # bad 2 > patience
    assert lrs["main"] == pytest.approx(5e-4)
    assert sched.reduced


def test_permutation_loss_finite_at_perfect_prediction():
    """fp32 edge: p == 1.0 exactly at a gt=1 cell must not NaN (0·log 0).
    Regression for the TPU training NaN at step 32 of the first real run."""
    import jax.numpy as jnp

    p = jnp.asarray(np.array([[[1.0, 0.0], [0.0, 1.0]]], np.float32))
    g = p
    l = float(permutation_loss(p, g, jnp.asarray([2]), jnp.asarray([2])))
    assert np.isfinite(l) and l < 1e-5


def test_restore_loose_cross_architecture(tmp_path):
    """restore_loose + warm_start: a checkpoint saved from one architecture
    warm-starts another (shape-mismatched tensors keep their fresh init) and
    the restore is a host-numpy load — no device/sharding replay."""
    from fpmatch_tpu.train.checkpoints import (restore_loose, save_checkpoint,
                                               warm_start)

    a = {"params": {"w": jnp.ones((4, 4)), "v": jnp.ones((3,))},
         "batch_stats": {"m": jnp.zeros((3,))}}

    class S:
        params = a["params"]
        batch_stats = a["batch_stats"]
        step = jnp.zeros((), jnp.int32)

    save_checkpoint(str(tmp_path), "ck", S)
    restored = restore_loose(str(tmp_path), "ck")
    fresh = {"w": jnp.full((4, 4), 7.0),      # same shape -> restored
             "v": jnp.full((5,), 7.0),        # changed shape -> kept fresh
             "u": jnp.full((2,), 7.0)}        # new tensor -> kept fresh
    out = warm_start(fresh, restored["params"])
    assert isinstance(out["w"], np.ndarray) and out["w"].sum() == 16
    np.testing.assert_array_equal(out["v"], fresh["v"])
    np.testing.assert_array_equal(out["u"], fresh["u"])
