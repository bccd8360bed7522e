"""Train a pore detector end-to-end on synthetic impressions and write the
artifact set: trained weights (.npz), metrics.csv (val grid search + TEST
I/II final phases), and a CNN-vs-DPF comparison table.

Reference flow: pore-detection/train.py (patch BCE → full-image val →
threshold grid search → TEST I/II). Runs on CPU or TPU.

Usage: python scripts/train_poredet.py [--arch net13] [--out results/poredet]
"""
from __future__ import annotations

import argparse
import csv
import json
import os


def main():
    import jax
    if os.environ.get("POREDET_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fpmatch_tpu.data.generator import render_impression
    from fpmatch_tpu.poredet.train import (final_test_phases,
                                           grid_search_thresholds,
                                           save_variables,
                                           train_pore_detector)
    from fpmatch_tpu.poredet.dpf import detect_pores_dpf as dpf_compact
    from fpmatch_tpu.poredet.dpf import detect_pores_lemes
    from fpmatch_tpu.poredet.evaluate import (aggregate_scores,
                                              detection_scores)
    from fpmatch_tpu.poredet.architectures import make_architecture, \
        receptive_field

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="net13")
    ap.add_argument("--out", default="results/poredet")
    ap.add_argument("--train-n", type=int, default=12)
    ap.add_argument("--val-n", type=int, default=4)
    ap.add_argument("--test-n", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=6)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    def render_set(seed0, n):
        imgs, gts = [], []
        for i in range(n):
            img, pores, ids = render_impression(
                seed0 + i, 1001, out_size=(240, 200), n_pores=70)
            imgs.append(img)
            gts.append(pores[ids >= 0])  # true pores only (no spurious)
        return imgs, gts

    tr_imgs, tr_gts = render_set(9000, args.train_n)
    va_imgs, va_gts = render_set(9500, args.val_n)
    te_imgs, te_gts = render_set(9800, args.test_n)

    best = train_pore_detector(args.arch, tr_imgs, tr_gts, va_imgs, va_gts,
                               epochs=args.epochs)
    grid = grid_search_thresholds(
        make_architecture(args.arch), best["variables"], va_imgs, va_gts,
        window=receptive_field(args.arch))
    print("grid best:", {k: v for k, v in grid.items() if k != "variables"})

    phases = final_test_phases(
        make_architecture(args.arch), best["variables"],
        {"TEST_I": (va_imgs, va_gts), "TEST_II": (te_imgs, te_gts)},
        window=receptive_field(args.arch),
        probability=grid["probability"], nms_iou=grid["nms_iou"])

    save_variables(os.path.join(args.out, f"{args.arch}.npz"),
                   best["variables"])

    # classical baselines on the same test images
    rows = []
    for name, fn in (("dpf_compact", dpf_compact),
                     ("dpf_lemes", detect_pores_lemes)):
        per = [detection_scores(gt, np.asarray(fn(img), np.float32))
               for img, gt in zip(te_imgs, te_gts)]
        rows.append({"detector": name, **aggregate_scores(per)})
    for phase, rep in phases.items():
        rows.append({"detector": f"{args.arch}:{phase}", **rep})
    rows.append({"detector": f"{args.arch}:val_grid",
                 **{k: v for k, v in grid.items() if k != "variables"}})

    cols = sorted({k for r in rows for k in r})
    with open(os.path.join(args.out, "metrics.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)
    print(json.dumps(rows, default=float, indent=1))


if __name__ == "__main__":
    main()
