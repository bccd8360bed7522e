"""Full-image pore inference: fully-convolutional sweep + NMS → coordinates.

Parity with pore-detection/entireImage.py:13-156 and
pore_detect_clean.py:16-111: the valid-padded patch CNN applied to a whole
image yields a shrunken probability map; cells above `probability` become
fixed-size boxes which greedy IoU-NMS prunes; surviving box corners (offset
by the window half-size to undo the valid-conv shrink) are the pore
coordinates.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def nms_boxes(coords: np.ndarray, scores: np.ndarray, box_size: int,
              iou_threshold: float) -> np.ndarray:
    """Greedy NMS over equal-size square boxes anchored at `coords` (y, x).
    Returns indices of kept boxes (torchvision.ops.nms equivalent)."""
    if len(coords) == 0:
        return np.zeros((0,), np.int64)
    order = np.argsort(-scores, kind="stable")
    y = coords[:, 0].astype(np.float64)
    x = coords[:, 1].astype(np.float64)
    keep = []
    suppressed = np.zeros(len(coords), bool)
    area = float(box_size) * box_size
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iy = np.maximum(0.0, box_size - np.abs(y - y[i]))
        ix = np.maximum(0.0, box_size - np.abs(x - x[i]))
        inter = iy * ix
        iou = inter / (2 * area - inter)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def detect_pores_in_image(model, variables, image: np.ndarray, *,
                          probability: float = 0.65, window: int = 17,
                          nms_iou: float = 0.2,
                          box_size: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the detector over a full grayscale image.

    :param image: (H, W) uint8
    :return: (pore xy coordinates in image space (n, 2), probability map)
    """
    x = jnp.asarray(image, jnp.float32)[None, :, :, None] / 255.0
    pred = model.apply(variables, x, train=False)
    pmap = np.asarray(pred)[0, :, :, 0]
    ys, xs = np.nonzero(pmap >= probability)
    scores = pmap[ys, xs]
    coords = np.stack([ys, xs], axis=1)
    from .. import native
    keep = native.nms_fixed_boxes(coords.astype(np.int32),
                                  scores.astype(np.float32),
                                  box_size or window, nms_iou)
    half = window // 2
    # map-cell (y, x) + half = pore center in input-image space
    out = np.stack([xs[keep] + half, ys[keep] + half], axis=1).astype(np.float32)
    return out, pmap


def write_coordinates(path: str, coords: np.ndarray) -> None:
    """Coordinates/*.txt output format (x,y per line — the matcher's .txt
    keypoint reader consumes this directly)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for x, y in coords:
            f.write(f"{float(x):.1f},{float(y):.1f}\n")


def detect_dataset(model, variables, image_dir: str, out_dir: str, **kw):
    """pore_detect_clean.py equivalent: sweep a directory tree, write
    Coordinates/*.txt next to predictions."""
    import cv2

    image_dir = Path(image_dir)
    out_dir = Path(out_dir)
    n = 0
    for img_path in sorted(image_dir.rglob("*.jpg")):
        img = cv2.imread(str(img_path), cv2.IMREAD_GRAYSCALE)
        coords, _ = detect_pores_in_image(model, variables, img, **kw)
        rel = img_path.relative_to(image_dir).with_suffix(".txt")
        write_coordinates(str(out_dir / rel), coords)
        n += 1
    return n
