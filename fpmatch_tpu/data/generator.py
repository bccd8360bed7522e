"""Synthetic fingerprint image + pore-annotation generator.

The reference repo ships no data (its `dataset/` holds only split scripts);
its pipeline expects `dataset/Synthetic/R1..R5/{subject}.jpg + .tsv`
(src/dataset.py:3-12, dataset/split.py:78-84). This module synthesizes that
layout so the full image pipeline — augmentation, Delaunay graphs, training,
verification ROC/EER — runs end-to-end without external downloads.

Images are Gabor-style ridge fields: a smooth random orientation field θ(x,y)
drives cos(2π/λ·(x·cosθ + y·sinθ)) ridges; sweat pores are bright dots pinned
to ridge centers and recorded as keypoints. One RNG seed per finger makes
fingers distinct and impressions reproducible.
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import cv2
import numpy as np


def _orientation_field(h: int, w: int, rng: np.random.Generator,
                       scale: int = 8) -> np.ndarray:
    """Smooth random orientation field in [0, π)."""
    coarse = rng.normal(size=(scale, scale, 2))
    field = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_CUBIC)
    field = cv2.GaussianBlur(field, (0, 0), min(h, w) / 8)
    return 0.5 * np.arctan2(field[..., 0], field[..., 1])


def render_fingerprint(seed: int, size: Tuple[int, int] = (480, 400),
                       wavelength: float = 9.0, n_pores: int = 120
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Render one finger. Returns (uint8 grayscale image, (n, 2) pore xy)."""
    rng = np.random.default_rng(seed)
    h, w = size
    theta = _orientation_field(h, w, rng)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # integrate a locally-oriented phase: approximate with projection onto
    # the local orientation plus smooth phase jitter
    jitter = cv2.GaussianBlur(rng.normal(0, 1, (h, w)), (0, 0), 24) * 6
    phase = (xx * np.cos(theta) + yy * np.sin(theta)) / wavelength + jitter
    ridges = np.cos(2 * np.pi * phase)

    # elliptical fingerprint mask
    cy, cx = h / 2, w / 2
    mask = (((yy - cy) / (h * 0.45)) ** 2 + ((xx - cx) / (w * 0.42)) ** 2) < 1

    img = (0.55 - 0.35 * ridges)
    img = np.where(mask, img, 0.92)

    # pores: bright dots on ridge centers (ridges ≈ 1 → dark; pores sit on
    # the dark ridge line ridges > 0.6)
    ridge_zone = (ridges > 0.6) & mask
    ys, xs = np.nonzero(ridge_zone)
    pores = []
    if len(ys):
        order = rng.permutation(len(ys))
        taken = np.zeros((h // 8 + 2, w // 8 + 2), bool)  # spacing grid
        for idx in order:
            y, x = int(ys[idx]), int(xs[idx])
            gy, gx = y // 8, x // 8
            if taken[gy, gx]:
                continue
            taken[gy, gx] = True
            pores.append((x, y))
            if len(pores) >= n_pores:
                break
    for (x, y) in pores:
        cv2.circle(img, (x, y), 1, 1.0, -1)

    img8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    img8 = cv2.GaussianBlur(img8, (3, 3), 0)
    return img8, np.array(pores, np.float32).reshape(-1, 2)


def write_subject(out_dir: Path, subject: str, img: np.ndarray,
                  pores: np.ndarray) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out_dir / f"{subject}.jpg"),
                cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    with open(out_dir / f"{subject}.tsv", "w") as f:
        f.write("x\ty\n")
        for x, y in pores:
            f.write(f"{x:.2f}\t{y:.2f}\n")


def generate_synthetic_dataset(root: str, *, fingers_per_split=(12, 4, 4),
                               n_pores: int = 110, seed: int = 0,
                               size=(480, 400)) -> Path:
    """Create dataset/Synthetic-style R1..R5 layout.

    fingers_per_split = (train, test, val) counts; train fingers spread over
    R1-R3 round-robin (the reference's person-level split protocol)."""
    root = Path(root)
    train_n, test_n, val_n = fingers_per_split
    fid = 0
    for i in range(train_n):
        img, pores = render_fingerprint(seed * 100_003 + fid, size, n_pores=n_pores)
        write_subject(root / f"R{i % 3 + 1}", f"f{fid:04d}", img, pores)
        fid += 1
    for i in range(test_n):
        img, pores = render_fingerprint(seed * 100_003 + fid, size, n_pores=n_pores)
        write_subject(root / "R4", f"f{fid:04d}", img, pores)
        fid += 1
    for i in range(val_n):
        img, pores = render_fingerprint(seed * 100_003 + fid, size, n_pores=n_pores)
        write_subject(root / "R5", f"f{fid:04d}", img, pores)
        fid += 1
    return root


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="dataset/Synthetic")
    ap.add_argument("--train", type=int, default=60)
    ap.add_argument("--test", type=int, default=20)
    ap.add_argument("--val", type=int, default=20)
    ap.add_argument("--pores", type=int, default=110)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = generate_synthetic_dataset(
        args.root, fingers_per_split=(args.train, args.test, args.val),
        n_pores=args.pores, seed=args.seed)
    print(f"synthetic dataset written to {out}")
