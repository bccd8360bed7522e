"""Block-size sweep for the UNIV-scale association kernel on the real chip.

Each (r1, r2, precision) config runs in its OWN subprocess — mixing Mosaic
and large XLA programs in one axon process flips it into the ~33 ms/dispatch
poison mode (see bench.py run_stage docstring). The parent only aggregates
JSON lines.

Usage: python scripts/tune_univ.py            # sweep, prints a table
       python scripts/tune_univ.py --one R1 R2 PREC   # single config (child)
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

CONFIGS = [
    # (r1, r2): r2 should stay lane-aligned (128); r1 sweeps the sublane dim
    (8, 128), (16, 128), (32, 128), (64, 128), (32, 256), (16, 256),
]
PRECS = ["highest", "default"]
FUSED = [False, True]


def run_one(r1: int, r2: int, prec: str, fused_ta: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from fpmatch_tpu.core.build_graphs import build_edges
    from fpmatch_tpu.kernels.assoc_univ import (assoc_matvec_univ,
                                                gather_ke_blocks, plan_univ)

    rng = np.random.default_rng(0)
    n, c = 600, 16
    pts1 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    pts2 = rng.uniform(size=(n, 2)).astype(np.float32) * [400, 300]
    _, s1, d1 = build_edges(pts1, stg="tri")
    _, s2, d2 = build_edges(pts2, stg="tri")
    X = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(len(s1), len(s2))).astype(np.float32))
    nnz = len(s1) * len(s2) + n * n

    plan = plan_univ(pts1, pts2, s1, d1, s2, d2, r1=r1, r2=r2,
                     transpose=True)
    dt = jnp.bfloat16 if prec == "default" else jnp.float32
    KeR = jax.block_until_ready(
        jax.jit(lambda k: gather_ke_blocks(k, plan, dtype=dt))(Ke))
    ker_mb = KeR.size * KeR.dtype.itemsize / 1e6
    # chained-slope timing (see bench.chained_slope_seconds): the axon
    # tunnel's per-dispatch cost (up to ~33 ms in mixed Mosaic/XLA mode)
    # swamps ms-scale kernels; the slope between a 12-chain and a 2-chain
    # cancels it exactly.
    def make_chain(steps):
        @jax.jit
        def chain(x, kr):
            def body(_, acc):
                y = assoc_matvec_univ(acc, Kp, Ke, plan, kr, precision=prec,
                                      fused_ta=fused_ta)
                return y / jnp.maximum(jnp.abs(y).max(), 1.0)
            return jax.lax.fori_loop(0, steps, body, x)
        return lambda: chain(X, KeR)

    lo_n, hi_n = 2, 12
    try:
        f_lo, f_hi = make_chain(lo_n), make_chain(hi_n)
        jax.block_until_ready(f_lo())
        jax.block_until_ready(f_hi())
    except Exception as e:  # noqa: BLE001
        return {"r1": r1, "r2": r2, "prec": prec, "fused_ta": fused_ta,
                "error": f"{type(e).__name__}: {e}"[:300]}
    best_lo = best_hi = float("inf")
    for _ in range(3):
        for which, f in (("lo", f_lo), ("hi", f_hi)):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                ts.append(time.perf_counter() - t0)
            m = float(np.median(ts))
            if which == "lo":
                best_lo = min(best_lo, m)
            else:
                best_hi = min(best_hi, m)
    best = max((best_hi - best_lo) / (hi_n - lo_n), 1e-9)
    return {"r1": r1, "r2": r2, "prec": prec, "fused_ta": fused_ta,
            "b1": plan.b1, "b2": plan.b2,
            "spill": int(len(plan.spill1) + len(plan.spill2)),
            "ker_mb": round(ker_mb, 1), "ms": round(best * 1e3, 2),
            "edges_per_s": round(nnz / best, 0)}


def main():
    if len(sys.argv) >= 5 and sys.argv[1] == "--one":
        fused = len(sys.argv) >= 6 and sys.argv[5] == "fused"
        print(json.dumps(run_one(int(sys.argv[2]), int(sys.argv[3]),
                                 sys.argv[4], fused)))
        return
    rows = []
    for r1, r2 in CONFIGS:
        for prec in PRECS:
          for fused in FUSED:
            proc = subprocess.run(
                [sys.executable, __file__, "--one", str(r1), str(r2), prec]
                + (["fused"] if fused else []),
                capture_output=True, text=True, timeout=1200)
            line = proc.stdout.strip().splitlines()[-1] \
                if proc.stdout.strip() else ""
            if proc.returncode != 0 or not line.startswith("{"):
                print(f"# ({r1},{r2},{prec},{fused}) failed rc={proc.returncode}: "
                      f"{proc.stderr[-200:]}", file=sys.stderr)
                continue
            row = json.loads(line)
            rows.append(row)
            print(json.dumps(row), flush=True)
    if rows:
        best = max((r for r in rows if "edges_per_s" in r),
                   key=lambda r: r["edges_per_s"])
        print("# best:", json.dumps(best))


if __name__ == "__main__":
    main()
