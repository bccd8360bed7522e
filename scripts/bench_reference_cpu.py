"""Measure the reference's own hot ops (CPU torch) to ground bench.py's
vs_baseline estimate in real numbers instead of a guess.

The full reference Net cannot run here (torch_geometric/torch_sparse are
absent and there is no GPU), but its per-pair hot path is pure torch:
  - Sinkhorn forward (src/model/sinkhorn.py:89-169, max_iter=20 eager loop)
  - soft_topk + greedy_perm (src/model/soft_topk.py:80-255, Sinkhorn_m with
    the data-dependent overshoot loop)
  - hungarian (utils/hungarian.py — scipy per sample)
  - construct_aff_mat scipy path (utils/factorize_graph_matching.py:57-137)
These run per-sample in the reference's python loop (src/model/ngm.py:326-449)
— the measured total is a *floor* on its per-pair cost in this environment.

Usage: python scripts/bench_reference_cpu.py
Prints one JSON line with per-op ms/pair and the implied pairs/s floor.
"""
from __future__ import annotations

import importlib.util
import json
import sys
import time
import types

import numpy as np
import torch

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch.manual_seed(0)


def _stub(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def _load(modname, path):
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def median_ms(fn, iters=20):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    _stub("pygmtools", sinkhorn=None)
    _stub("src")
    _stub("src.sparse", bilinear_diag_torch=None)
    _stub("src.sparse_torch", CSRMatrix3d=object, CSCMatrix3d=object)
    sk_mod = _load("ref_sinkhorn", f"{REF}/src/model/sinkhorn.py")
    topk_mod = _load("ref_soft_topk", f"{REF}/src/model/soft_topk.py")
    fact_mod = _load("ref_factorize",
                     f"{REF}/utils/factorize_graph_matching.py")
    hung_mod = _load("ref_hungarian", f"{REF}/utils/hungarian.py")

    # our benchmark regime: ~50 keypoints/graph (n_max=64 bucket), Delaunay
    # edges e ~ 6n; the reference's ngm.py VERIFICATION path runs these ops
    # once per pair inside a python loop over the batch
    n1 = n2 = 50
    e1 = e2 = 280
    s = torch.randn(1, n1, n2)
    ns1, ns2 = torch.tensor([n1]), torch.tensor([n2])

    out = {}

    # the runtime forward delegates to pygmtools (absent here); forward_ori
    # is the reference's own in-file implementation of the same iteration
    sk = sk_mod.Sinkhorn(max_iter=20, tau=0.05, epsilon=1e-10)
    out["sinkhorn_ms"] = median_ms(
        lambda: sk.forward_ori(torch.exp(s / 0.05), ns1, ns2,
                               dummy_row=True))

    ks = torch.tensor([40])
    out["soft_topk_ms"] = median_ms(
        lambda: topk_mod.soft_topk(s, ks, max_iter=20, tau=0.05,
                                   nrows=ns1, ncols=ns2, return_prob=True))

    out["hungarian_ms"] = median_ms(lambda: hung_mod.hungarian(s, ns1, ns2))

    # Kronecker connectivity assembly: the reference's scipy path
    # (utils/factorize_graph_matching.py kronecker_sparse), run per pair
    # for KroG and KroH before every forward on non-CUDA setups
    idx1 = np.random.randint(0, n1, (2, e1))
    idx2 = np.random.randint(0, n2, (2, e2))
    G1 = np.zeros((n1, e1), np.float32)
    H1 = np.zeros((n1, e1), np.float32)
    G1[idx1[0], np.arange(e1)] = 1
    H1[idx1[1], np.arange(e1)] = 1
    G2 = np.zeros((n2, e2), np.float32)
    H2 = np.zeros((n2, e2), np.float32)
    G2[idx2[0], np.arange(e2)] = 1
    H2[idx2[1], np.arange(e2)] = 1
    out["kronecker_sparse_GH_ms"] = median_ms(
        lambda: (fact_mod.kronecker_sparse(G2, G1),
                 fact_mod.kronecker_sparse(H2, H1)), iters=5)

    hot = sum(v for k, v in out.items()
              if k.endswith("_ms") and isinstance(v, float))
    out["hot_ops_total_ms_per_pair"] = round(hot, 3)
    out["implied_pairs_per_s_floor_cpu"] = round(1000.0 / hot, 2)
    out["note"] = ("per-pair floor from the reference's own eager torch ops "
                   "on this host's CPU; excludes CNN backbone, SplineConv, "
                   "NGM layers, data loading")
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
