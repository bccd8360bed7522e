"""Pore-detector training: balanced patch classification + full-image
validation + threshold grid search.

Compact capability-parity rebuild of pore-detection/train.py:218-846:
  * patch BCE training over any of the 18 architectures;
  * per-epoch full-image validation via mutual-NN F-score, keep-best;
  * grid search over detection probability then NMS IoU on the val split.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .architectures import make_architecture, receptive_field
from .evaluate import aggregate_scores, detection_scores
from .inference import detect_pores_in_image
from .patches import extract_balanced_patches


def make_patch_bank(images: Sequence[np.ndarray],
                    pore_sets: Sequence[np.ndarray], window: int,
                    seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for img, pores in zip(images, pore_sets):
        x, y = extract_balanced_patches(img, pores, window=window, rng=rng)
        xs.append(x)
        ys.append(y)
    return np.concatenate(xs), np.concatenate(ys)


def train_pore_detector(arch: str, images, pore_sets, val_images,
                        val_pore_sets, *, features: int = 40,
                        epochs: int = 5, batch_size: int = 256,
                        lr: float = 1e-3, seed: int = 0,
                        probability: float = 0.65, nms_iou: float = 0.2,
                        log_fn=print) -> Dict:
    """Train one architecture; returns dict with variables + val report."""
    window = receptive_field(arch)
    model = make_architecture(arch, features=features)
    X, Y = make_patch_bank(images, pore_sets, window, seed)
    log_fn(f"[poredet] {arch}: {len(X)} patches (window {window})")

    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, window, window, 1)), train=False)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            logits_p = jnp.clip(out[:, 0, 0, 0], 1e-6, 1 - 1e-6)
            loss = -jnp.mean(yb * jnp.log(logits_p)
                             + (1 - yb) * jnp.log(1 - logits_p))
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    rng = np.random.default_rng(seed)
    best = {"f_score": -1.0}
    key = jax.random.PRNGKey(seed)
    for epoch in range(epochs):
        order = rng.permutation(len(X))
        losses = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, jnp.asarray(X[idx]),
                jnp.asarray(Y[idx]), sub)
            losses.append(float(loss))
        vars_now = {"params": params, "batch_stats": batch_stats}
        report = validate_full_images(model, vars_now, val_images,
                                      val_pore_sets, window=window,
                                      probability=probability,
                                      nms_iou=nms_iou)
        log_fn(f"[poredet] {arch} epoch {epoch}: "
               f"loss={np.mean(losses):.4f} val_f={report['f_score']:.4f}")
        if report["f_score"] > best["f_score"]:
            best = {**report, "variables": vars_now, "epoch": epoch}
    return best


def validate_full_images(model, variables, images, pore_sets, *, window,
                         probability, nms_iou) -> Dict[str, float]:
    per_image = []
    for img, gt in zip(images, pore_sets):
        pred, _ = detect_pores_in_image(model, variables, img,
                                        probability=probability,
                                        window=window, nms_iou=nms_iou)
        per_image.append(detection_scores(np.asarray(gt), pred))
    return aggregate_scores(per_image)


def final_test_phases(model, variables, test_sets: Dict[str, Tuple], *,
                      window, probability, nms_iou, log_fn=print
                      ) -> Dict[str, Dict[str, float]]:
    """The reference's TEST I / TEST II final-evaluation phases
    (pore-detection/train.py:694-830): run the kept-best model with the
    grid-searched (probability, NMS) on each held-out test range and report
    F-score, true-detection rate (precision) and false-detection rate
    (1 − recall) per phase.

    :param test_sets: {"test_i": (images, pore_sets), "test_ii": (...)} —
        any number of named phases (the reference hard-codes two)
    """
    reports = {}
    for name, (images, pore_sets) in test_sets.items():
        if not images:
            continue
        r = validate_full_images(model, variables, images, pore_sets,
                                 window=window, probability=probability,
                                 nms_iou=nms_iou)
        r["true_detection_rate"] = r.get("precision", 0.0)
        r["false_detection_rate"] = 1.0 - r.get("recall", 0.0)
        log_fn(f"[poredet] {name.upper()}: F={r['f_score']:.4f} "
               f"TDR={r['true_detection_rate']:.4f} "
               f"FDR={r['false_detection_rate']:.4f}")
        reports[name] = r
    return reports


def grid_search_thresholds(model, variables, images, pore_sets, *, window,
                           probabilities=(0.5, 0.6, 0.65, 0.7, 0.8),
                           nms_ious=(0.1, 0.2, 0.3), log_fn=print) -> Dict:
    """Two-stage grid search as in the reference (train.py:512-692):
    probability first at fixed IoU, then IoU at the best probability."""
    best_p, best_f = None, -1.0
    for p in probabilities:
        r = validate_full_images(model, variables, images, pore_sets,
                                 window=window, probability=p, nms_iou=0.2)
        log_fn(f"[grid] prob={p}: f={r['f_score']:.4f}")
        if r["f_score"] > best_f:
            best_p, best_f = p, r["f_score"]
    best_iou = 0.2
    for iou in nms_ious:
        r = validate_full_images(model, variables, images, pore_sets,
                                 window=window, probability=best_p,
                                 nms_iou=iou)
        log_fn(f"[grid] iou={iou}: f={r['f_score']:.4f}")
        if r["f_score"] > best_f:
            best_iou, best_f = iou, r["f_score"]
    return {"probability": best_p, "nms_iou": best_iou, "f_score": best_f}


def save_variables(path, variables) -> None:
    """Persist trained detector variables as a flat .npz (no orbax — pore
    detectors are small and the reference ships raw state dicts too,
    pore-detection/train.py torch.save)."""
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables).items()}
    np.savez(path, **flat)


def load_variables(path):
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    return unflatten_dict(flat)
