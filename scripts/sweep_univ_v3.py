"""Cap sweep for the v3 kernel's padded-degree planes (raw chained path)."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from fpmatch_tpu.core.build_graphs import build_edges
from fpmatch_tpu.kernels.assoc_univ_v3 import (
    plan_univ_v3, build_kep, assoc_matvec_univ_v3_raw, univ_v3_prep,
    univ_v3_prep_kp, univ_v3_unprep)
from fpmatch_tpu.ops.assoc import assoc_matvec_chunked

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
want = jax.block_until_ready(jax.jit(lambda x: assoc_matvec_chunked(
    x, Kp, Ke, jnp.asarray(s1), jnp.asarray(d1), jnp.asarray(s2),
    jnp.asarray(d2), transpose=True))(X))
scale = np.abs(np.asarray(want)).max()

def slope(make, lo=2, hi=12, repeats=3):
    f_lo, f_hi = make(lo), make(hi)
    jax.block_until_ready(f_lo()); jax.block_until_ready(f_hi())
    bl = bh = float("inf")
    for _ in range(repeats):
        for f_, w in ((f_lo,"lo"),(f_hi,"hi")):
            ts=[]
            for _ in range(5):
                t0=time.perf_counter(); jax.block_until_ready(f_()); ts.append(time.perf_counter()-t0)
            m=float(np.median(ts))
            bl, bh = (min(bl,m), bh) if w=="lo" else (bl, min(bh,m))
    return max((bh-bl)/(hi-lo),1e-9)

for cap in (int(v) for v in sys.argv[1:]):
    plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=True,
                        s1_cap=cap, s2_cap=cap)
    KePb = jax.block_until_ready(jax.jit(
        lambda k: build_kep(k, plan, dtype=jnp.bfloat16))(Ke))
    Kpt = univ_v3_prep_kp(Kp, plan)
    got = univ_v3_unprep(assoc_matvec_univ_v3_raw(
        univ_v3_prep(X, plan, jnp.bfloat16), Kpt, Ke, plan, KePb), plan)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()/scale
    def make(steps, plan=plan, kep=KePb, Kpt=Kpt):
        @jax.jit
        def chain(x, kp_t, k):
            xt = univ_v3_prep(x, plan, jnp.bfloat16)
            def body(_, acc):
                y = assoc_matvec_univ_v3_raw(acc.astype(jnp.bfloat16),
                                             kp_t, Ke, plan, k)
                return y / jnp.maximum(jnp.abs(y).max(), 1.0)
            return univ_v3_unprep(
                jax.lax.fori_loop(0, steps, body, xt.astype(jnp.float32)),
                plan)
        return lambda: chain(X, Kpt, kep)
    secs = slope(make)
    print(f"cap={cap}: s1={plan.s1} s2={plan.s2} "
          f"spill={len(plan.spill1)}+{len(plan.spill2)} rel_err={err:.1e} "
          f"{nnz/secs:.3e} edges/s ({secs*1e3:.2f} ms)", flush=True)
