"""Jitted train/eval steps with stage-conditional loss composition.

Loss composition mirrors src/train/training_loop.py:44-51:
  stage 6       → cls only
  stages 4, 5   → ks + cls
  otherwise     → perm + ks + cls
expressed through StageConfig.loss_{perm,ks,cls} flags so arbitrary curricula
are possible.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import StageConfig
from ..evaluation.metrics import matching_accuracy
from ..models.ngm import NGMNet, PairBatch
from .losses import permutation_loss
from .state import TrainState, make_optimizer


def loss_and_metrics(model: NGMNet, params, batch_stats, batch: PairBatch,
                     stage: StageConfig, train: bool,
                     hungarian_mask=None):
    variables = {"params": params, "batch_stats": batch_stats}
    extra_kw = {} if hungarian_mask is None else \
        {"hungarian_mask": hungarian_mask}
    if train:
        bn_kw = {}
        if model.cfg.train.bn_follows_trainability:
            # frozen partitions keep their BN in running-average mode: no
            # batch-stat reductions (2x forward, logs/iso_train_fwd.log)
            # and no stats drift under frozen convs
            bn_kw = dict(bn_main=stage.train_main, bn_cls=stage.train_cls)
        out, mutated = model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"], **bn_kw,
                                   **extra_kw)
        # eval-mode BN only reads its stats — the mutated collection can be
        # partial (or empty) when some partitions' BN ran frozen
        mut = mutated.get("batch_stats", {})
        new_stats = {**batch_stats, **mut} if mut else batch_stats
    else:
        out = model.apply(variables, batch, train=False, **extra_kw)
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
    from .state import partition_of

    def _train_step(state: TrainState, batch: PairBatch
                    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # differentiate ONLY the partitions this stage trains: the frozen
        # partitions' optimizer branch is set_to_zero (their updates are
        # zeros regardless of grads), so computing their backward — e.g.
        # the whole ResNet backward in the k-only stages 2/4 — is pure
        # waste. This also matches torch grad-clip semantics: params with
        # requires_grad=False contribute nothing to the global clip norm.
        trainable_part = {"backbone": stage.train_main,
                          "main": stage.train_main,
                          "k": stage.train_k,
                          "cls": stage.train_cls}
        live = {name: sub for name, sub in state.params.items()
                if trainable_part[partition_of(name)]}
        frozen = {name: sub for name, sub in state.params.items()
                  if name not in live}

        # frozen params enter as a runtime argument, NOT a closure: closed-
        # over arrays become XLA constants (compile bloat at 45M params and
        # a measured 1e-4-relative forward drift from constant-folding);
        # argnums=0 keeps the backward restricted to the live partitions
        def loss_of(live_params, frozen_params):
            p = {**live_params, **frozen_params}
            return loss_and_metrics(model, p, state.batch_stats, batch,
                                    stage, train=True)

        grad_fn = jax.value_and_grad(loss_of, argnums=0, has_aux=True)
        (_, (metrics, new_stats, _)), live_grads = grad_fn(live, frozen)
        grads = {**live_grads,
                 **jax.tree_util.tree_map(jnp.zeros_like, frozen)}
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), metrics

    if not jit:
        return _train_step
    train_step = jax.jit(_train_step, donate_argnums=(0,), **_jit_kwargs())
    return train_step


def _jit_kwargs():
    """XLA-CPU's concurrency-optimized thunk scheduler can deadlock the
    in-process collectives used by CPU-mesh training/tests (threads block in
    one rendezvous while the peers that would complete it are never
    scheduled; the 40 s watchdog then aborts the process — see
    __graft_entry__.dryrun_multichip for the full account). Sequential
    scheduling removes the hazard. TPU/real meshes are unaffected."""
    if jax.default_backend() == "cpu":
        return {"compiler_options": {
            "xla_cpu_enable_concurrency_optimized_scheduler": False}}
    return {}


def make_eval_step(model: NGMNet, stage: StageConfig):

    @partial(jax.jit, **_jit_kwargs())
    def eval_step(state: TrainState, batch: PairBatch):
        _, (metrics, _, out) = loss_and_metrics(
            model, state.params, state.batch_stats, batch, stage, train=False)
        return metrics, {"cls_prob": out["cls_prob"],
                         "k_prob": out["k_prob"],
                         "perm_mat": out["perm_mat"],
                         "ds_mat": out["ds_mat"]}

    return eval_step


def make_eval_step_masked(model: NGMNet, stage: StageConfig):
    """Eval step whose greedy fill ranks by `hungarian_mask * ds_mat`
    (reference ngm.py:444-449): the second jit segment of the host-Hungarian
    discretization round-trip. The mask comes from ops.hungarian.hungarian_host
    run on the first segment's `ds_mat` (the axon TPU runtime rejects host
    callbacks inside jit, so the solve lives between segments)."""

    @partial(jax.jit, **_jit_kwargs())
    def eval_step(state: TrainState, batch: PairBatch, hungarian_mask):
        _, (metrics, _, out) = loss_and_metrics(
            model, state.params, state.batch_stats, batch, stage,
            train=False, hungarian_mask=hungarian_mask)
        return metrics, {"cls_prob": out["cls_prob"],
                         "k_prob": out["k_prob"],
                         "perm_mat": out["perm_mat"],
                         "ds_mat": out["ds_mat"]}

    return eval_step
