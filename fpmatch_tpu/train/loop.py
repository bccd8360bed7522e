"""Stage-curriculum trainer (capability parity with train.py +
src/train/training_loop.py + src/train/evaluation.py).

Per stage: fresh optimizer over the stage's trainable partitions, warmup →
plateau LR schedule, per-epoch train (3 passes over the loader, matching
training_loop.py:21) + validation, best-model tracking with reload-on-LR-drop,
early stopping, periodic test evaluation, checkpointing with resume.
"""
from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


def _copy_state(state):
    """Deep-copy a TrainState. train_step donates its input buffers, so any
    state retained across steps (best-state tracking, reload-on-LR-drop)
    must own fresh buffers."""
    return jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, state)

from ..core.config import StageConfig
from ..evaluation.metrics import verification_metrics
from ..models.ngm import NGMNet
from .checkpoints import save_checkpoint, warm_start
from .scheduler import WarmupPlateau
from .state import TrainState, create_state, set_learning_rates
from .step import make_eval_step, make_train_step

logger = logging.getLogger("fpmatch_tpu.train")


@dataclass
class EpochStats:
    metrics: Dict[str, float] = field(default_factory=dict)

    def update(self, batch_metrics: Dict):
        for k, v in batch_metrics.items():
            v = float(v)
            if k in self.metrics:
                n = self.metrics[f"_n_{k}"]
                self.metrics[k] = (self.metrics[k] * n + v) / (n + 1)
                self.metrics[f"_n_{k}"] = n + 1
            else:
                self.metrics[k] = v
                self.metrics[f"_n_{k}"] = 1

    def get(self) -> Dict[str, float]:
        return {k: v for k, v in self.metrics.items()
                if not k.startswith("_n_")}


def train_stage(model: NGMNet, state: TrainState, stage: StageConfig,
                train_loader, val_loader, *, test_loader=None,
                checkpoint_dir: Optional[str] = None,
                passes_per_epoch: int = 3, eval_every: int = 5,
                early_stop_patience: int = 10,
                log_fn: Callable[[str], None] = logger.info,
                metrics_logger=None, numbered_checkpoints: bool = False):
    """Run one curriculum stage; returns (state, history)."""
    train_step = make_train_step(model, stage)
    eval_step = make_eval_step(model, stage)
    sched = WarmupPlateau(
        base_lrs={"backbone": stage.backbone_lr, "main": stage.lr,
                  "k": stage.k_lr, "cls": stage.cls_lr},
        warmup_epochs=stage.warmup_epochs, factor=stage.lr_decay,
        patience=stage.patience)

    best_val = float("inf")
    best_state = state
    bad_epochs = 0
    history: List[Dict[str, float]] = []

    for epoch in range(stage.start_epoch, stage.num_epochs):
        t0 = time.time()
        stats = EpochStats()
        n_steps = n_pairs = 0
        t_first = None
        for _ in range(passes_per_epoch):
            for batch in train_loader:
                state, metrics = train_step(state, batch)
                # step-throughput instrumentation: sync on the first step's
                # metrics so compile/dispatch pipelining doesn't pollute the
                # steady-state window, then let the rest enqueue freely
                if t_first is None:
                    jax.block_until_ready(metrics["total_loss"])
                    t_first = time.time()
                else:
                    n_steps += 1
                    n_pairs += int(batch.batch_size)
                stats.update(metrics)
        if n_steps:
            jax.block_until_ready(metrics["total_loss"])
            train_secs = time.time() - t_first
        train_metrics = stats.get()

        vstats = EpochStats()
        for batch in val_loader:
            metrics, _ = eval_step(state, batch)
            vstats.update(metrics)
        val_metrics = vstats.get()
        val_loss = val_metrics.get("total_loss", float("inf"))

        lrs = sched.step(val_loss)
        state = state._replace(
            opt_state=set_learning_rates(state.opt_state, lrs))

        if val_loss < best_val:
            best_val = val_loss
            best_state = _copy_state(state)
            bad_epochs = 0
            if checkpoint_dir:
                save_checkpoint(checkpoint_dir, f"{stage.name}_best", state,
                                extra={"stage": stage.name, "epoch": epoch})
        else:
            bad_epochs += 1

        if sched.reduced:
            # reload best weights on LR drop (train.py:409-417); copy so the
            # retained best_state never shares (donatable) buffers with the
            # live state
            fresh = _copy_state(best_state)
            state = fresh._replace(
                opt_state=set_learning_rates(fresh.opt_state, lrs))

        row = {"epoch": epoch, "time_s": time.time() - t0,
               **{f"train_{k}": v for k, v in train_metrics.items()},
               **{f"val_{k}": v for k, v in val_metrics.items()}}
        if n_steps:
            row["train_pairs_per_s"] = round(n_pairs / max(train_secs,
                                                           1e-9), 2)
            row["train_step_ms"] = round(1e3 * train_secs / n_steps, 1)
        history.append(row)
        if metrics_logger is not None:
            metrics_logger.log_scalars(
                epoch, {k: v for k, v in row.items() if k != "epoch"},
                prefix=f"{stage.name}/")
        log_fn(f"[{stage.name}] epoch {epoch}: "
               f"train_loss={train_metrics.get('total_loss', 0):.4f} "
               f"val_loss={val_loss:.4f} "
               f"acc={train_metrics.get('accuracy', 0):.4f} "
               f"({row['time_s']:.1f}s"
               + (f", {row['train_pairs_per_s']} pairs/s, "
                  f"{row['train_step_ms']} ms/step" if n_steps else "")
               + ")")

        if checkpoint_dir:
            save_checkpoint(checkpoint_dir, f"{stage.name}_last", state,
                            extra={"stage": stage.name, "epoch": epoch})
            if numbered_checkpoints:
                # per-epoch numbered snapshots (reference
                # training_loop.py:117-122 params_epoch_N); off by default —
                # best/last cover resume, numbered covers forensics
                save_checkpoint(checkpoint_dir,
                                f"{stage.name}_epoch{epoch:04d}", state,
                                extra={"stage": stage.name, "epoch": epoch})

        if test_loader is not None and (epoch + 1) % eval_every == 0:
            # periodic eval is advisory — a transient device/tunnel error
            # must not kill a long training run
            try:
                tm = evaluate_verification(model, state, stage, test_loader)
                log_fn(f"[{stage.name}] epoch {epoch} test: "
                       f"EER={tm.get('eer', float('nan')):.4f} "
                       f"ROC-AUC={tm.get('roc_auc', float('nan')):.4f}")
            except Exception as e:  # noqa: BLE001
                log_fn(f"[{stage.name}] epoch {epoch} test eval failed "
                       f"({type(e).__name__}: {e}); continuing")

        if bad_epochs >= early_stop_patience:
            log_fn(f"[{stage.name}] early stop at epoch {epoch}")
            break

    return best_state, history


def run_curriculum(model: NGMNet, variables, stages, train_loader, val_loader,
                   *, test_loader=None, checkpoint_dir: Optional[str] = None,
                   metrics_logger=None, **kw):
    """Run the full multi-stage curriculum with warm starts between stages."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    all_history = {}
    state = None
    for stage in stages:
        new_state = create_state({"params": params,
                                  "batch_stats": batch_stats}, stage)
        if state is not None:
            new_state = new_state._replace(
                params=warm_start(new_state.params, state.params),
                batch_stats=state.batch_stats)
        state, hist = train_stage(model, new_state, stage, train_loader,
                                  val_loader, test_loader=test_loader,
                                  checkpoint_dir=checkpoint_dir,
                                  metrics_logger=metrics_logger, **kw)
        params, batch_stats = state.params, state.batch_stats
        all_history[stage.name] = hist
    return state, all_history


def evaluate_verification(model: NGMNet, state: TrainState,
                          stage: StageConfig, loader) -> Dict[str, float]:
    """Collect genuine/imposter scores over a loader → ROC/EER report
    (evaluate_binary_classifier.py:92-159)."""
    eval_step = make_eval_step(model, stage)
    labels, scores, k_probs = [], [], []
    match_stats = EpochStats()
    for batch in loader:
        metrics, out = eval_step(state, batch)
        match_stats.update(metrics)
        labels.append(np.asarray(batch.label))
        scores.append(np.asarray(out["cls_prob"]))
        k_probs.append(np.asarray(out["k_prob"]))
    labels = np.concatenate(labels)
    # fused verification score: cls_prob * k_prob. The AFA-U matchable-
    # fraction carries the pore-constellation signal the classifier alone
    # misses against same-ridge-field sibling impostors (RESULTS.md:
    # sibling EER 0.42 -> 0.05); matches cli/evaluate.py --score fused.
    scores = np.concatenate(scores) * np.concatenate(k_probs)
    report: Dict[str, float] = dict(match_stats.get())
    if len(np.unique(labels)) == 2:
        report.update(verification_metrics(labels, scores))
    report["n_pairs"] = float(len(labels))
    return report
