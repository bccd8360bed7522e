"""Verification evaluation CLI — parity with evaluate_binary_classifier.py.

Loads a trained checkpoint, runs the test split's genuine/imposter pairs,
computes the EER-threshold metric suite, and writes the artifact set the
reference produces (evaluate_binary_classifier.py:161-349): metrics.csv,
eval.log, ROC/PR curve plots, k-prediction histograms, and example match
visualizations.
"""
from __future__ import annotations

import argparse
import csv
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Evaluate verification EER/ROC")
    ap.add_argument("--data-root", default="dataset/Synthetic")
    ap.add_argument("--dataset", default="Synthetic",
                    choices=["Synthetic", "L3SFV2Augmented", "PolyUDBII",
                             "PolyUDBI", "L3SF"])
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint name (default: latest from meta)")
    ap.add_argument("--output-dir", default="results/binary-classifier")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--n-max", type=int, default=64)
    ap.add_argument("--e-max", type=int, default=384)
    ap.add_argument("--univ", type=int, default=600)
    ap.add_argument("--num-viz", type=int, default=4)
    ap.add_argument("--limit", type=int, default=None,
                    help="seeded random subsample of this many test pairs "
                         "(A/B studies; full protocol when omitted)")
    ap.add_argument("--augment", action="store_true",
                    help="augment test pairs (harder cross-session protocol)")
    ap.add_argument("--score", default="fused",
                    choices=["fused", "cls", "k"],
                    help="verification score: 'fused' = cls_prob * k_prob "
                         "(the AFA-U matchable-fraction is the pore-level "
                         "signal — against same-ridge-field sibling "
                         "impostors it cuts EER ~8x vs the reference's "
                         "classifier-only score, see RESULTS.md); 'cls' = "
                         "reference-parity classifier probability")
    ap.add_argument("--discretize", default="greedy",
                    choices=["greedy", "hungarian"],
                    help="match discretization: 'greedy' ranks the greedy "
                         "fill by the soft-top-k map directly (device-only, "
                         "the default); 'hungarian' reproduces the "
                         "reference's full path (ngm.py:444-449) — host "
                         "LAPJV on the soft-top-k map between jit segments, "
                         "greedy fill ranked by hungarian*ds_mat. Costs a "
                         "second forward per batch")
    ap.add_argument("--thread-workers", action="store_true",
                    help="thread loader workers instead of spawn processes")
    ap.add_argument("--node-taps", default="layer3",
                    help="backbone node-feature taps, must match the "
                         "checkpoint (e.g. 'layer2,layer3' for the stride-8 "
                         "multi-tap config)")
    ap.add_argument("--hyperedge", action="store_true",
                    help="enable the third-order (triangle hyperedge) "
                         "association term (must match training)")
    ap.add_argument("--cls-k-features", action="store_true",
                    help="checkpoint was trained with k-statistic features "
                         "in the match classifier")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute in the backbone + graph-side hot "
                         "path (f32 checkpoints load unchanged — params "
                         "stay f32 masters)")
    args = ap.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(message)s",
        handlers=[logging.StreamHandler(sys.stdout),
                  logging.FileHandler(os.path.join(args.output_dir,
                                                   "eval.log"))])
    log = logging.getLogger("fpmatch_tpu.eval").info

    import dataclasses
    from ..core.config import Config, ShapeConfig, default_stages
    from ..data.benchmark import make_benchmark
    from ..data.pipeline import DataLoader, PairDataset
    from ..evaluation.metrics import (pr_curve, roc_curve,
                                      verification_metrics)
    from ..models.ngm import NGMNet
    from ..train.checkpoints import read_meta, restore_params
    from ..train.state import create_state
    from ..train.step import make_eval_step, make_eval_step_masked

    from . import model_config_from_args
    cfg = model_config_from_args(args)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=args.batch_size,
                                      worker_processes=not args.thread_workers))

    # probe BEFORE the DataLoader exists — its background device_put
    # prefetch thread inflates a synced probe into a false degraded alarm
    from ..utils.profiling import warn_if_degraded_dispatch
    warn_if_degraded_dispatch(log)

    bench = make_benchmark(args.dataset, "test", root=args.data_root,
                           task="classify")
    pd = PairDataset(bench, cfg, augment=args.augment)
    if args.limit and len(pd.pairs) > args.limit:
        keep = np.random.default_rng(0).choice(
            len(pd.pairs), size=args.limit, replace=False)
        pd.pairs = [pd.pairs[i] for i in sorted(keep)]
        log(f"seeded subsample: {args.limit} of the full protocol")
    loader = DataLoader(pd, cfg, drop_last=False, device_prefetch=True)
    pair_ids = list(pd.pairs)
    log(f"test pairs: {len(pd)}")

    model = NGMNet(cfg)
    example = next(iter(loader))
    log("initializing model…")
    # init on host CPU: eager Flax init over the TPU tunnel costs minutes of
    # per-dispatch latency (RESULTS.md "eager Flax init"; same fix as
    # cli/train.py) — the finished pytree ships in one transfer.
    # Init from host-built ZEROS of the example's spec, not the example
    # itself: the loader H2D-prefetches batches, and reading one back
    # (device_put -> cpu -> D2H) intermittently deadlocks against the
    # prefetch threads on the tunneled TPU (futex hang inside
    # jax.Array._value; stack in logs/run6_evals2.log). Init only feeds
    # shapes — the checkpoint restore overwrites every value.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        example_host = jax.tree.map(
            lambda a: jnp.zeros(a.shape, a.dtype) if hasattr(a, "shape")
            else a, example)
        variables = model.init(jax.random.PRNGKey(0), example_host,
                               train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    stage = default_stages()[-1]
    state = create_state(variables, stage)
    meta = read_meta(args.checkpoint_dir)
    ckpt_name = args.checkpoint or meta.get("latest")
    if ckpt_name:
        restored = restore_params(args.checkpoint_dir, ckpt_name, state)
        state = state._replace(params=restored["params"],
                               batch_stats=restored["batch_stats"])
        log(f"restored checkpoint {ckpt_name}")
    else:
        log("WARNING: no checkpoint found — evaluating random weights")

    eval_step = make_eval_step(model, stage)
    masked_step = None
    if args.discretize == "hungarian":
        from ..ops.hungarian import hungarian_host
        masked_step = make_eval_step_masked(model, stage)
        log("discretize=hungarian: host LAPJV between jit segments "
            "(second forward per batch)")
    labels, scores, k_probs, n_mins = [], [], [], []
    viz_saved = 0
    n_batches = len(loader)
    import time as _time
    t0 = _time.time()
    for bi, batch in enumerate(loader):
        if bi % 50 == 0 and bi:
            rate = bi / (_time.time() - t0)
            log(f"batch {bi}/{n_batches} ({rate:.2f} batches/s, "
                f"eta {(n_batches - bi) / max(rate, 1e-9):.0f}s)")
        _, out = eval_step(state, batch)
        if masked_step is not None:
            mask = hungarian_host(np.asarray(out["ds_mat"]),
                                  np.asarray(batch.n_nodes[:, 0]),
                                  np.asarray(batch.n_nodes[:, 1]))
            _, out = masked_step(state, batch, mask)
        labels.append(np.asarray(batch.label))
        scores.append(np.asarray(out["cls_prob"]))
        k_probs.append(np.asarray(out["k_prob"]))
        n_mins.append(np.asarray(batch.n_nodes).min(axis=1))
        if viz_saved < args.num_viz:
            viz_saved += save_match_viz(batch, out, args.output_dir,
                                        viz_saved, args.num_viz)
    labels = np.concatenate(labels)
    cls_scores = np.concatenate(scores)
    k_probs = np.concatenate(k_probs)
    scores = {"fused": cls_scores * k_probs, "cls": cls_scores,
              "k": k_probs}[args.score]
    log(f"verification score: {args.score}")

    # per-pair scores (subset analyses, e.g. sibling hard-impostor EER via
    # scripts/hard_impostor_report.py). The loader is sequential
    # (shuffle=False) and the final partial batch wraps indices mod the
    # dataset length — reproduce that to align ids with scores.
    scores_path = os.path.join(args.output_dir, "scores.csv")
    with open(scores_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id_a", "id_b", "label", "score", "cls_prob", "k_prob"])
        for i in range(len(scores)):
            a, b = pair_ids[i % len(pair_ids)]
            w.writerow([a, b, int(labels[i]), f"{scores[i]:.6f}",
                        f"{cls_scores[i]:.6f}", f"{k_probs[i]:.6f}"])
    log(f"wrote {scores_path}")

    report = verification_metrics(labels, scores)
    log(f"report: { {k: round(v, 5) for k, v in report.items()} }")

    # metrics.csv (same column set as the reference artifact)
    csv_path = os.path.join(args.output_dir, "metrics.csv")
    cols = ["accuracy", "precision", "recall", "f1", "roc_auc", "pr_auc",
            "far", "frr", "eer", "threshold"]
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        w.writerow([report[c] for c in cols])
    log(f"wrote {csv_path}")

    # sibling hard-impostor subset (when the dataset has a siblings.json
    # sidecar): EER restricted to sibling↔partner impostors + all genuine,
    # and the sibling FAR at the full-set EER threshold
    partners = bench._sibling_partners()
    if partners:
        pset = {frozenset(it) for it in partners.items()}
        person = {k: v["cls"] for k, v in bench.data_dict.items()}
        sib_mask = np.array(
            [labels[i] == 0 and frozenset(
                (person[pair_ids[i % len(pair_ids)][0]],
                 person[pair_ids[i % len(pair_ids)][1]])) in pset
             for i in range(len(scores))])
        if sib_mask.any():
            sel = (labels == 1) | sib_mask
            sib = verification_metrics(labels[sel], scores[sel])
            sib["sibling_far_at_full_threshold"] = float(
                (scores[sib_mask] >= report["threshold"]).mean())
            sib["n_sibling_impostors"] = int(sib_mask.sum())
            log(f"sibling subset: { {k: round(v, 5) for k, v in sib.items()} }")
            with open(os.path.join(args.output_dir, "sibling_metrics.csv"),
                      "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(sorted(sib))
                w.writerow([sib[c] for c in sorted(sib)])

    plot_curves(labels, scores, k_probs, args.output_dir)
    return report


def plot_curves(labels, scores, k_probs, output_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..evaluation.metrics import pr_curve, roc_curve

    fpr, tpr, _ = roc_curve(labels, scores)
    plt.figure(figsize=(5, 5))
    plt.plot(fpr, tpr)
    plt.plot([0, 1], [0, 1], "--", alpha=0.4)
    plt.xlabel("FPR")
    plt.ylabel("TPR")
    plt.title("ROC")
    plt.savefig(os.path.join(output_dir, "roc_curve.png"), dpi=120)
    plt.close()

    p, r = pr_curve(labels, scores)
    plt.figure(figsize=(5, 5))
    plt.plot(r, p)
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.title("PR")
    plt.savefig(os.path.join(output_dir, "pr_curve.png"), dpi=120)
    plt.close()

    plt.figure(figsize=(6, 4))
    for val, name in ((1.0, "genuine"), (0.0, "imposter")):
        sel = labels == val
        if sel.any():
            plt.hist(k_probs[sel], bins=20, alpha=0.6, label=name)
    plt.xlabel("predicted k fraction")
    plt.legend()
    plt.savefig(os.path.join(output_dir, "k_histogram.png"), dpi=120)
    plt.close()


def save_match_viz(batch, out, output_dir, start_idx, max_viz) -> int:
    """Render keypoint match lines for a few pairs (utils/visualize.py
    equivalent on the padded batch)."""
    from ..utils.visualize import visualize_match
    import numpy as np

    saved = 0
    B = int(np.asarray(batch.label).shape[0])
    for b in range(min(B, max_viz - start_idx)):
        path = os.path.join(output_dir,
                            f"match_{start_idx + saved:02d}.png")
        visualize_match(
            np.asarray(batch.images[b]), np.asarray(batch.points[b]),
            np.asarray(batch.n_nodes[b]), np.asarray(out["perm_mat"][b]),
            float(np.asarray(batch.label[b])),
            float(np.asarray(out["cls_prob"][b])), path)
        saved += 1
    return saved


if __name__ == "__main__":
    main()
