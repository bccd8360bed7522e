"""Timing-only ablation run of the v3 kernel (results wrong under ablation)."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from fpmatch_tpu.core.build_graphs import build_edges
from fpmatch_tpu.kernels.assoc_univ_v3 import (plan_univ_v3, build_kep,
                                               assoc_matvec_univ_v3)
DT = jnp.bfloat16 if os.environ.get("FPMATCH_UNIV3_DT") == "bf16" else jnp.float32
rng = np.random.default_rng(0)
n, c = 600, 16
pts1 = rng.uniform(size=(n,2)).astype(np.float32)*[400,300]
pts2 = rng.uniform(size=(n,2)).astype(np.float32)*[400,300]
_, s1, d1 = build_edges(pts1, stg="tri")
_, s2, d2 = build_edges(pts2, stg="tri")
X = jnp.asarray(rng.normal(size=(n,n,c)).astype(np.float32))
Kp = jnp.asarray(rng.normal(size=(n,n)).astype(np.float32))
Ke = jnp.asarray(rng.normal(size=(len(s1),len(s2))).astype(np.float32))
nnz = len(s1)*len(s2) + n*n
plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=True)
KeP = jax.block_until_ready(jax.jit(lambda k: build_kep(k, plan, dtype=DT))(Ke))

def make_chain(steps):
    @jax.jit
    def chain(x, kep):
        def body(_, acc):
            y = assoc_matvec_univ_v3(acc, Kp, Ke, plan, kep, compute_dtype=DT)
            return y / jnp.maximum(jnp.abs(y).max(), 1.0)
        return jax.lax.fori_loop(0, steps, body, x)
    return lambda: chain(X, KeP)

def chained_slope(lo=2, hi=12, repeats=3):
    f_lo, f_hi = make_chain(lo), make_chain(hi)
    jax.block_until_ready(f_lo()); jax.block_until_ready(f_hi())
    bl = bh = float("inf")
    for _ in range(repeats):
        for f_, w in ((f_lo,"lo"),(f_hi,"hi")):
            ts=[]
            for _ in range(5):
                t0=time.perf_counter(); jax.block_until_ready(f_()); ts.append(time.perf_counter()-t0)
            m=float(np.median(ts))
            if w=="lo": bl=min(bl,m)
            else: bh=min(bh,m)
    return max((bh-bl)/(hi-lo),1e-9)

secs = chained_slope()
ab = os.environ.get("FPMATCH_UNIV3_ABLATE", "") or "none"
if os.environ.get("FPMATCH_UNIV3_NOGROUP"):
    ab += "+nogroup"
print(f"dt={os.environ.get('FPMATCH_UNIV3_DT','f32')} ablate={ab}: {nnz/secs:.3e} edges/s ({secs*1e3:.2f} ms)", flush=True)
