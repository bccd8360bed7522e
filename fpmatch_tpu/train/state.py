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


def partition_of(name: str) -> str:
    """Partition of a top-level param module name."""
    if name in K_MODULES:
        return "k"
    if name in CLS_MODULES:
        return "cls"
    if name in BACKBONE_MODULES:
        return "backbone"
    return "main"


def param_labels(params) -> Any:
    """Label every leaf by its partition from the top-level module name."""

    return {name: jax.tree_util.tree_map(lambda _, n=name: partition_of(n),
                                         sub)
            for name, sub in params.items()}


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


def _lr_paths(opt_state):
    """[(partition label, key path)] for every injected learning_rate.

    Uses optax's public `tree_utils.tree_get_all_with_path` (stable API)
    instead of sniffing `inner_states`/`hyperparams` attributes, so an optax
    upgrade that reshuffles internal state types fails loudly here rather
    than silently disabling LR scheduling. The partition label is the
    multi_transform inner-states dict key — the unique string DictKey on the
    path besides the trailing 'learning_rate' one.
    """
    import optax.tree_utils as otu

    out = []
    for path, _ in otu.tree_get_all_with_path(opt_state, "learning_rate"):
        labels = [k.key for k in path
                  if type(k).__name__ == "DictKey"
                  and isinstance(k.key, str) and k.key != "learning_rate"]
        if len(labels) != 1:
            raise RuntimeError(
                "cannot identify the parameter partition for the optimizer "
                f"learning_rate at path {path}; optax state layout changed — "
                "update fpmatch_tpu.train.state._lr_paths")
        out.append((labels[0], path))
    if not out:
        raise RuntimeError(
            "optimizer state exposes no injected learning_rate hyperparams; "
            "LR scheduling would be a silent no-op (optax layout change?)")
    return out


def _set_at(node, path, value):
    """Functionally replace the leaf at an optax/jax key path."""
    if not path:
        return value
    k, rest = path[0], path[1:]
    kind = type(k).__name__
    if kind == "DictKey":
        new = dict(node)
        new[k.key] = _set_at(node[k.key], rest, value)
        return new if isinstance(node, dict) else type(node)(new)
    if kind in ("NamedTupleKey", "GetAttrKey"):
        child = getattr(node, k.name)
        return node._replace(**{k.name: _set_at(child, rest, value)})
    if kind == "SequenceKey":
        seq = list(node)
        seq[k.idx] = _set_at(node[k.idx], rest, value)
        if isinstance(node, tuple):
            return type(node)(*seq) if hasattr(node, "_fields") \
                else tuple(seq)
        return type(node)(seq)
    raise RuntimeError(f"unknown key type {kind} in optimizer state path")


def set_learning_rates(opt_state, new_lrs: Dict[str, float]):
    """Host-side LR update (plateau/warmup) through injected hyperparams.
    `new_lrs` maps partition name → new absolute LR; labels for frozen
    partitions (set_to_zero — no hyperparams) are ignored. Raises if the
    state exposes no injectable LRs at all (see _lr_paths)."""
    for label, path in _lr_paths(opt_state):
        if label in new_lrs:
            opt_state = _set_at(opt_state, list(path),
                                jnp.asarray(new_lrs[label], jnp.float32))
    return opt_state


def get_learning_rates(opt_state) -> Dict[str, float]:
    return {label: float(_get_at(opt_state, path))
            for label, path in _lr_paths(opt_state)}


def _get_at(node, path):
    for k in path:
        kind = type(k).__name__
        if kind == "DictKey":
            node = node[k.key]
        elif kind in ("NamedTupleKey", "GetAttrKey"):
            node = getattr(node, k.name)
        elif kind == "SequenceKey":
            node = node[k.idx]
        else:
            raise RuntimeError(f"unknown key type {kind}")
    return node
