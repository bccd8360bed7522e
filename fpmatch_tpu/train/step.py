"""Jitted train/eval steps with stage-conditional loss composition.

Loss composition mirrors src/train/training_loop.py:44-51:
  stage 6       → cls only
  stages 4, 5   → ks + cls
  otherwise     → perm + ks + cls
expressed through StageConfig.loss_{perm,ks,cls} flags so arbitrary curricula
are possible.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import StageConfig
from ..evaluation.metrics import matching_accuracy
from ..models.ngm import NGMNet, PairBatch
from .losses import permutation_loss
from .state import TrainState, make_optimizer


def loss_and_metrics(model: NGMNet, params, batch_stats, batch: PairBatch,
                     stage: StageConfig, train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(variables, batch, train=False)
        new_stats = batch_stats

    n1 = batch.n_nodes[:, 0]
    n2 = batch.n_nodes[:, 1]
    perm_loss = permutation_loss(out["ds_mat"], batch.gt_perm, n1, n2)
    total = jnp.zeros(())
    if stage.loss_perm:
        total = total + perm_loss
    if stage.loss_ks:
        total = total + out["ks_loss"]
    if stage.loss_cls:
        total = total + out["cls_loss"]

    acc = jnp.mean(matching_accuracy(out["perm_mat"], batch.gt_perm, n1, n2))
    metrics = {
        "loss": perm_loss,
        "total_loss": total,
        "ks_loss": out["ks_loss"],
        "ks_error": out["ks_error"],
        "cls_loss": out["cls_loss"],
        "accuracy": acc,
    }
    return total, (metrics, new_stats, out)


def make_train_step(model: NGMNet, stage: StageConfig, jit: bool = True):
    """Build the train step. jit=True (default) returns it jitted with the
    input state donated (params + adam moments reuse their buffers in place).
    jit=False returns the raw traceable function — for embedding in a larger
    jitted program (e.g. a lax.fori_loop chain of steps, as bench.py does:
    donation would make repeated timing calls reuse deleted buffers)."""
    tx = make_optimizer(stage)

    # the incoming state is donated: params + adam moments (~0.5 GB at 45M
    # params) get reused in place instead of re-allocated every step.
    # Callers that retain an old state (best-state tracking) must deep-copy.
    def _train_step(state: TrainState, batch: PairBatch
                    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_metrics(model, p, state.batch_stats, batch,
                                       stage, train=True),
            has_aux=True)
        (_, (metrics, new_stats, _)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), metrics

    if not jit:
        return _train_step
    train_step = jax.jit(_train_step, donate_argnums=(0,))
    return train_step


def make_eval_step(model: NGMNet, stage: StageConfig):

    @jax.jit
    def eval_step(state: TrainState, batch: PairBatch):
        _, (metrics, _, out) = loss_and_metrics(
            model, state.params, state.batch_stats, batch, stage, train=False)
        return metrics, {"cls_prob": out["cls_prob"],
                         "k_prob": out["k_prob"],
                         "perm_mat": out["perm_mat"],
                         "ds_mat": out["ds_mat"]}

    return eval_step
