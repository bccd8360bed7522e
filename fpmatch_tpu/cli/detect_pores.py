"""Out-of-the-box pore detection CLI (parity with
pore-detection/pore_detect_clean.py): run a trained (or DPF) detector over a
dataset tree and write Coordinates/*.txt next to predictions, ready for the
matching data layer. Also the `init_dataset` role (init_dataset.py:7-53):
with --copy-into, detected coordinates are placed beside the images so the
matcher's dataset indexer picks them up.
"""
from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import cv2
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="dataset image tree")
    ap.add_argument("--out", default="Prediction", help="output root")
    ap.add_argument("--method", default="dpf", choices=["dpf", "cnn"])
    ap.add_argument("--arch", default="net17nomax")
    ap.add_argument("--checkpoint", default=None,
                    help="msgpack file of detector variables (cnn method)")
    ap.add_argument("--probability", type=float, default=0.65)
    ap.add_argument("--nms-iou", type=float, default=0.2)
    ap.add_argument("--copy-into", default=None,
                    help="also write .txt files next to the images "
                         "(init_dataset.py behaviour)")
    args = ap.parse_args(argv)

    from ..poredet.dpf import detect_pores_dpf
    from ..poredet.inference import write_coordinates

    image_root = Path(args.images)
    out_root = Path(args.out)

    detector = None
    if args.method == "cnn":
        import jax
        from flax import serialization
        from ..poredet.architectures import make_architecture, receptive_field

        model = make_architecture(args.arch)
        window = receptive_field(args.arch)
        x0 = np.zeros((1, window, window, 1), np.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x0, train=False)
        if args.checkpoint:
            with open(args.checkpoint, "rb") as f:
                variables = serialization.from_bytes(variables, f.read())
        from ..poredet.inference import detect_pores_in_image

        def detector(img):
            coords, _ = detect_pores_in_image(
                model, variables, img, probability=args.probability,
                window=window, nms_iou=args.nms_iou)
            return coords
    else:
        detector = detect_pores_dpf

    n = 0
    for img_path in sorted(image_root.rglob("*.jpg")):
        img = cv2.imread(str(img_path), cv2.IMREAD_GRAYSCALE)
        coords = detector(img)
        rel = img_path.relative_to(image_root).with_suffix(".txt")
        write_coordinates(str(out_root / rel), coords)
        if args.copy_into:
            dst = Path(args.copy_into) / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(out_root / rel, dst)
        n += 1
    print(f"detected pores in {n} images → {out_root}")


if __name__ == "__main__":
    main()
