"""Keypoint matching recall/precision/F1 on GENUINE pairs — the
correspondence-quality counterpart of the verification report (the
reference's matching_accuracy, evaluation_metric.py:58-200, is recall).

The in-training `acc` metric averages matching recall over genuine AND
impostor pairs (impostors have no GT matches, contributing 0), so it
understates correspondence quality by ~the impostor fraction; this script
reports the genuine-only numbers.

Usage:
  python scripts/matching_recall_report.py --data-root dataset/SyntheticV2 \
      --checkpoint-dir checkpoints/run4 --node-taps layer2,layer3 [--sets test]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="dataset/SyntheticV2")
    ap.add_argument("--dataset", default="Synthetic")
    ap.add_argument("--sets", default="test")
    ap.add_argument("--checkpoint-dir", default="checkpoints/run4")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--node-taps", default="layer2,layer3")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap evaluated batches")
    ap.add_argument("--hyperedge", action="store_true")
    args = ap.parse_args()

    import jax

    from fpmatch_tpu.core.config import Config, default_stages
    from fpmatch_tpu.data.benchmark import make_benchmark
    from fpmatch_tpu.data.pipeline import DataLoader, PairDataset
    from fpmatch_tpu.evaluation.metrics import (matching_precision,
                                                matching_recall)
    from fpmatch_tpu.models.ngm import NGMNet
    from fpmatch_tpu.train.checkpoints import read_meta, restore_params
    from fpmatch_tpu.train.state import create_state
    from fpmatch_tpu.train.step import make_eval_step

    cfg = Config()
    taps = tuple(args.node_taps.split(","))
    if taps != ("layer3",):
        tap_ch = {"layer1": 64, "layer2": 128, "layer3": 256}
        feat = sum(tap_ch[t] for t in taps) + 512
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, node_taps=taps),
            ngm=dataclasses.replace(cfg.ngm, node_feature_dim=feat))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, image_channels=1,
                                      worker_processes=True))
    if args.hyperedge:
        cfg = dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, hyperedge=True))

    bench = make_benchmark(args.dataset, args.sets, root=args.data_root,
                           task="classify")
    pd = PairDataset(bench, cfg)
    loader = DataLoader(pd, cfg, drop_last=False, device_prefetch=True)

    model = NGMNet(cfg)
    example = next(iter(loader))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0),
                               jax.device_put(example, cpu), train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    stage = default_stages()[-1]
    state = create_state(variables, stage)
    name = args.checkpoint or read_meta(args.checkpoint_dir).get("latest")
    restored = restore_params(args.checkpoint_dir, name, state)
    state = state._replace(params=restored["params"],
                           batch_stats=restored["batch_stats"])
    eval_step = make_eval_step(model, stage)

    rec, prec, weights = [], [], []
    for bi, batch in enumerate(loader):
        if args.limit and bi >= args.limit:
            break
        _, out = eval_step(state, batch)
        n1, n2 = batch.n_nodes[:, 0], batch.n_nodes[:, 1]
        r = np.asarray(matching_recall(out["perm_mat"], batch.gt_perm,
                                       n1, n2))
        p = np.asarray(matching_precision(out["perm_mat"], batch.gt_perm,
                                          n1, n2))
        genuine = np.asarray(batch.label) > 0.5
        rec.extend(r[genuine].tolist())
        prec.extend(p[genuine].tolist())
        weights.extend(np.asarray(batch.gt_perm.sum((1, 2)))[genuine]
                       .tolist())

    rec_a, prec_a = np.asarray(rec), np.asarray(prec)
    w = np.asarray(weights)
    out = {
        "sets": args.sets,
        "checkpoint": f"{args.checkpoint_dir}:{name}",
        "n_genuine_pairs": len(rec_a),
        "matching_recall": round(float(rec_a.mean()), 4),
        "matching_precision": round(float(prec_a.mean()), 4),
        "matching_f1": round(float(
            2 * rec_a.mean() * prec_a.mean()
            / max(rec_a.mean() + prec_a.mean(), 1e-8)), 4),
        "matching_recall_gt_weighted": round(
            float((rec_a * w).sum() / max(w.sum(), 1.0)), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
