"""Native host runtime: compile-on-demand C++ kernels with ctypes bindings.

Mirrors the role of the reference's JIT-compiled torch extensions
(src/sparse.py:11-16 compiles at import) without torch: g++ builds a shared
library into a cache directory on first use; every entry point has a pure
numpy/scipy fallback so the framework works even without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC_DIR = Path(__file__).parent / "csrc"
_CACHE_DIR = Path(os.environ.get("FPMATCH_NATIVE_CACHE",
                                 Path.home() / ".cache" / "fpmatch_tpu"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _source_hash() -> str:
    h = hashlib.sha256()
    for src in sorted(_SRC_DIR.glob("*.cpp")):
        h.update(src.read_bytes())
    return h.hexdigest()[:16]


def _build() -> Optional[ctypes.CDLL]:
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    so_path = _CACHE_DIR / f"libfpmatch_{_source_hash()}.so"
    if not so_path.exists():
        srcs = [str(p) for p in sorted(_SRC_DIR.glob("*.cpp"))]
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-fopenmp", "-std=c++17", *srcs, "-o", str(so_path)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired) as e:
            msg = getattr(e, "stderr", b"")
            print(f"fpmatch_tpu.native: build failed ({e}); "
                  f"{msg[:500] if msg else ''} — using numpy fallbacks")
            return None
    lib = ctypes.CDLL(str(so_path))
    lib.lapjv_batch.argtypes = [
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.lapjv_batch.restype = None
    lib.nms_fixed_boxes.argtypes = [
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_float,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.nms_fixed_boxes.restype = ctypes.c_int32
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
                _build_failed = _lib is None
    return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------------------ wrappers

PAD_COST = 1e6


def lap_maximize_batch(scores: np.ndarray, n1: np.ndarray, n2: np.ndarray
                       ) -> np.ndarray:
    """Batched maximum-score assignment over valid (n1[b], n2[b]) blocks.
    scores: (B, S1, S2) float32 → 0/1 assignment of the same shape."""
    lib = get_lib()
    scores = np.ascontiguousarray(scores, np.float32)
    B, s1, s2 = scores.shape
    out = np.zeros_like(scores)
    if lib is None:
        from scipy.optimize import linear_sum_assignment
        for b in range(B):
            a, c = int(n1[b]), int(n2[b])
            if a and c:
                r, col = linear_sum_assignment(-scores[b, :a, :c])
                out[b, r, col] = 1.0
        return out

    n = int(max(s1, s2))
    costs = np.full((B, n, n), PAD_COST, np.float32)
    for b in range(B):
        a, c = int(n1[b]), int(n2[b])
        costs[b, :a, :c] = -scores[b, :a, :c]
    rowsol = np.zeros((B, n), np.int32)
    lib.lapjv_batch(B, n, np.ascontiguousarray(costs), rowsol)
    for b in range(B):
        a, c = int(n1[b]), int(n2[b])
        for i in range(a):
            j = rowsol[b, i]
            if j < c:
                out[b, i, j] = 1.0
    return out


def nms_fixed_boxes(coords: np.ndarray, scores: np.ndarray, box_size: int,
                    iou_threshold: float) -> np.ndarray:
    """Greedy equal-box NMS; returns kept indices (score-descending)."""
    lib = get_lib()
    m = len(coords)
    if m == 0:
        return np.zeros((0,), np.int64)
    if lib is None:
        from ..poredet.inference import nms_boxes
        return nms_boxes(coords, scores, box_size, iou_threshold)
    keep = np.zeros((m,), np.int32)
    lib.nms_fixed_boxes(m, np.ascontiguousarray(coords, np.int32),
                        np.ascontiguousarray(scores, np.float32),
                        int(box_size), float(iou_threshold), keep)
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]
