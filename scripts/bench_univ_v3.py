"""v3 kernel on the real chip: correctness vs chunked XLA + chained-slope timing."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from fpmatch_tpu.core.build_graphs import build_edges
from fpmatch_tpu.ops.assoc import assoc_matvec_chunked
from fpmatch_tpu.kernels.assoc_univ_v3 import (plan_univ_v3, build_kep,
                                               assoc_matvec_univ_v3)

def note(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

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
note(f"e1={len(s1)} e2={len(s2)} nnz={nnz/1e6:.1f}M")

plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=True)
note(f"plan s1={plan.s1} s2={plan.s2} spill={len(plan.spill1)}+{len(plan.spill2)}")
KeP = jax.block_until_ready(jax.jit(lambda k: build_kep(k, plan))(Ke))
note(f"KeP {KeP.shape} {KeP.nbytes/1e6:.0f}MB")

f = jax.jit(lambda x, kp, ke, kep: assoc_matvec_univ_v3(x, kp, ke, plan, kep))
t0 = time.perf_counter()
got = jax.block_until_ready(f(X, Kp, Ke, KeP))
note(f"kernel compile+run {time.perf_counter()-t0:.1f}s")

want = jax.block_until_ready(jax.jit(lambda x: assoc_matvec_chunked(
    x, Kp, Ke, jnp.asarray(s1), jnp.asarray(d1), jnp.asarray(s2),
    jnp.asarray(d2), transpose=True))(X))
err = np.abs(np.asarray(got) - np.asarray(want)).max()
scale = np.abs(np.asarray(want)).max()
note(f"max abs err {err:.2e} rel {err/scale:.2e}")
assert err/scale < 1e-4, "MISMATCH on chip"

# chained-slope timing
def make_chain(steps):
    @jax.jit
    def chain(x, kep):
        def body(_, acc):
            y = assoc_matvec_univ_v3(acc, Kp, Ke, plan, kep)
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
note(f"v3 kernel: {nnz/secs:.3e} edges/s ({secs*1e3:.2f} ms/matvec)")
