"""Training state: one optax multi_transform replaces the reference's three
optimizers + LR-as-freezing hacks (train.py:157-257, stage2.yml LR=1e-20).

Parameters are partitioned by top-level module name into four groups —
backbone / main (graph-matching trunk) / k (AFA-U head) / cls (match
classifier) — each with its own injectable learning rate so the host-side
warmup+plateau scheduler can retune without recompiling. Stage freezing is an
optax mask (`set_to_zero`), not a tiny LR.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..core.config import StageConfig

K_MODULES = ("afau",)
CLS_MODULES = ("match_cls",)
BACKBONE_MODULES = ("backbone",)


def param_labels(params) -> Any:
    """Label every leaf by its partition from the top-level module name."""

    def label_tree(name, tree):
        if name in K_MODULES:
            lab = "k"
        elif name in CLS_MODULES:
            lab = "cls"
        elif name in BACKBONE_MODULES:
            lab = "backbone"
        else:
            lab = "main"
        return jax.tree_util.tree_map(lambda _: lab, tree)

    return {name: label_tree(name, sub) for name, sub in params.items()}


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(stage: StageConfig) -> optax.GradientTransformation:
    """Build the per-partition optimizer for one curriculum stage."""

    def adamw(lr):
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=1e-2)
        return tx

    def branch(enabled, lr):
        return adamw(lr) if enabled else optax.set_to_zero()

    transforms = {
        "backbone": branch(stage.train_main, stage.backbone_lr),
        "main": branch(stage.train_main, stage.lr),
        "k": branch(stage.train_k, stage.k_lr),
        "cls": branch(stage.train_cls, stage.cls_lr),
    }
    tx = optax.multi_transform(transforms, param_labels)
    if stage.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(stage.grad_clip), tx)
    return tx


def create_state(variables, stage: StageConfig) -> TrainState:
    # own fresh buffers: train_step donates its input state, and the caller's
    # `variables` (possibly shared with other states) must stay valid
    params = jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, variables["params"])
    tx = make_optimizer(stage)
    return TrainState(
        params=params,
        batch_stats=jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, "copy") else x,
            variables.get("batch_stats", FrozenDict())),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def set_learning_rates(opt_state, new_lrs: Dict[str, float]):
    """Host-side LR update (plateau/warmup) through injected hyperparams.
    `new_lrs` maps partition name → new absolute LR. Works for both the bare
    multi_transform state and the (clip, multi_transform) chain tuple."""
    if hasattr(opt_state, "inner_states"):
        new_inner = {}
        for label, st in opt_state.inner_states.items():
            inner = st.inner_state
            if label in new_lrs and hasattr(inner, "hyperparams"):
                hp = dict(inner.hyperparams)
                hp["learning_rate"] = jnp.asarray(new_lrs[label],
                                                  jnp.float32)
                inner = inner._replace(hyperparams=hp)
            new_inner[label] = st._replace(inner_state=inner)
        return opt_state._replace(inner_states=new_inner)
    # chain: find the element carrying inner_states
    assert isinstance(opt_state, tuple)
    return tuple(set_learning_rates(s, new_lrs)
                 if hasattr(s, "inner_states") else s for s in opt_state)


def get_learning_rates(opt_state) -> Dict[str, float]:
    if hasattr(opt_state, "inner_states"):
        out = {}
        for label, st in opt_state.inner_states.items():
            if hasattr(st.inner_state, "hyperparams"):
                out[label] = float(
                    st.inner_state.hyperparams["learning_rate"])
        return out
    for s in opt_state:
        if hasattr(s, "inner_states"):
            return get_learning_rates(s)
    return {}
