"""DPF — classical dynamic pore filtering detector (host side, numpy/cv2).

Capability parity with pore-detection/dpf.py (Lemes et al.'s detector): no
learning, pure CV. Pores are small bright blobs enclosed by dark ridge
material; the "dynamic" part adapts the enclosure test radius to the local
ridge period.

Pipeline here: Otsu binarization → connected components of the bright phase →
size gate from the estimated ridge period → ring-enclosure test (a fraction
of the surrounding ring must be ridge) → centroid output.
"""
from __future__ import annotations

import cv2
import numpy as np


def estimate_ridge_period(binary: np.ndarray) -> float:
    """Median run-length of the ridge phase along rows ≈ ridge period/2."""
    runs = []
    for row in binary[:: max(1, binary.shape[0] // 64)]:
        changes = np.nonzero(np.diff(row.astype(np.int8)))[0]
        if len(changes) > 2:
            runs.extend(np.diff(changes))
    return float(np.median(runs)) if runs else 8.0


def detect_pores_dpf(image: np.ndarray, *, min_area: int = 1,
                     max_area_scale: float = 1.2,
                     ring_scale: float = 1.6,
                     enclosure: float = 0.55) -> np.ndarray:
    """Detect pores in a grayscale fingerprint. Returns (n, 2) xy.

    :param enclosure: minimum dark fraction on the surrounding ring
    """
    if image.ndim == 3:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    blur = cv2.GaussianBlur(image, (3, 3), 0)
    _, binary = cv2.threshold(blur, 0, 255,
                              cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    bright = binary > 0                  # valleys + pores are bright
    dark = ~bright                       # ridges

    period = estimate_ridge_period(dark)
    max_area = int(np.ceil((period * max_area_scale) ** 2))

    n_comp, labels, stats, centroids = cv2.connectedComponentsWithStats(
        bright.astype(np.uint8), connectivity=8)

    h, w = image.shape
    yy, xx = np.mgrid[-16:17, -16:17]
    rr = np.sqrt(xx ** 2 + yy ** 2)
    pores = []
    for c in range(1, n_comp):
        area = stats[c, cv2.CC_STAT_AREA]
        if not (min_area <= area <= max_area):
            continue
        cx, cy = centroids[c]
        icx, icy = int(round(cx)), int(round(cy))
        radius = max(2.0, ring_scale * np.sqrt(area / np.pi))
        if radius > 15:
            continue
        if not (16 <= icx < w - 16 and 16 <= icy < h - 16):
            continue
        ring = (rr >= radius) & (rr < radius + 2)
        patch_dark = dark[icy - 16:icy + 17, icx - 16:icx + 17]
        frac = patch_dark[ring].mean() if ring.any() else 0.0
        if frac >= enclosure:
            pores.append((cx, cy))
    return np.asarray(pores, np.float32).reshape(-1, 2)
