"""Orbax checkpointing of params/batch_stats/opt_state + curriculum metadata.

Replaces utils/models_sl.py + the checkpoints/checkpoint.json resume protocol
(train.py:65-69, 380-417): per-epoch checkpoints, best-model tracking, and
shape-mismatch-tolerant warm starts across stages.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(ckpt_dir: str, name: str, state, extra: Optional[Dict] = None):
    """Save a TrainState under `ckpt_dir/name` plus a JSON sidecar."""
    path = os.path.join(_abs(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "step": state.step}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta_path = os.path.join(_abs(ckpt_dir), "checkpoint.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta["latest"] = name
    if extra:
        meta.update(extra)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)


def restore_params(ckpt_dir: str, name: str, template) -> Any:
    """Restore {params, batch_stats, step} matching `template`'s structure."""
    path = os.path.join(_abs(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    target = {"params": template.params, "batch_stats": template.batch_stats,
              "step": template.step}
    return ckptr.restore(path, target)


def restore_loose(ckpt_dir: str, name: str) -> Any:
    """Restore a checkpoint WITHOUT a shape template, as host numpy arrays —
    for cross-architecture warm starts where the strict template restore of
    restore_params would raise on any shape change (e.g. warm-starting a
    stride-8 multi-tap model from a stride-16 run), and independent of the
    devices the checkpoint was saved on (a templateless StandardCheckpointer
    restore replays saved shardings and fails off-device). Pair with
    warm_start."""
    path = os.path.join(_abs(ckpt_dir), name)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)


def warm_start(params, restored_params) -> Any:
    """Copy restored leaves into `params` wherever path+shape match — the
    shape-mismatch-tolerant load of utils/models_sl.py:20-28 that lets the
    architecture evolve between stages."""
    flat_new, treedef = jax.tree_util.tree_flatten_with_path(params)
    restored_flat = dict(jax.tree_util.tree_flatten_with_path(restored_params)[0])
    out = []
    for path, leaf in flat_new:
        r = restored_flat.get(path)
        if r is not None and np.shape(r) == np.shape(leaf):
            out.append(r)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def read_meta(ckpt_dir: str) -> Dict:
    meta_path = os.path.join(_abs(ckpt_dir), "checkpoint.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}
