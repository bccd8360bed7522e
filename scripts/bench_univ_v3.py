"""v3 kernel on the real chip: correctness vs chunked XLA + chained-slope timing."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
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

# ---- bf16 compute path ----------------------------------------------------
KePb = jax.block_until_ready(jax.jit(
    lambda k: build_kep(k, plan, dtype=jnp.bfloat16))(Ke))

fb = jax.jit(lambda x, kp, ke, kep: assoc_matvec_univ_v3(
    x, kp, ke, plan, kep, compute_dtype=jnp.bfloat16))
got_b = jax.block_until_ready(fb(X, Kp, Ke, KePb))
err_b = np.abs(np.asarray(got_b) - np.asarray(want)).max()
note(f"bf16 max abs err {err_b:.2e} rel {err_b/scale:.2e}")

def make_chain_b(steps):
    @jax.jit
    def chain(x, kep):
        def body(_, acc):
            y = assoc_matvec_univ_v3(acc, Kp, Ke, plan, kep,
                                     compute_dtype=jnp.bfloat16)
            return y / jnp.maximum(jnp.abs(y).max(), 1.0)
        return jax.lax.fori_loop(0, steps, body, x)
    return lambda: chain(X, KePb)

def chained_slope_g(make, lo=2, hi=12, repeats=3):
    f_lo, f_hi = make(lo), make(hi)
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

secs_b = chained_slope_g(make_chain_b)
note(f"v3 kernel bf16: {nnz/secs_b:.3e} edges/s ({secs_b*1e3:.2f} ms/matvec)")

# ---- raw (in-layout) chained path: the multi-layer production regime ------
from fpmatch_tpu.kernels.assoc_univ_v3 import (assoc_matvec_univ_v3_raw,
                                               univ_v3_prep, univ_v3_prep_kp,
                                               univ_v3_unprep)

for name, dt, kep in (("f32", jnp.float32, KeP), ("bf16", jnp.bfloat16, KePb)):
    Kpt = univ_v3_prep_kp(Kp, plan)

    def make_chain_raw(steps, dt=dt, kep=kep, Kpt=Kpt):
        @jax.jit
        def chain(x, kp_t, k):
            xt = univ_v3_prep(x, plan, dt)
            def body(_, acc):
                y = assoc_matvec_univ_v3_raw(acc.astype(dt), kp_t, Ke, plan, k)
                return y / jnp.maximum(jnp.abs(y).max(), 1.0)
            yt = jax.lax.fori_loop(0, steps, body, xt.astype(jnp.float32))
            return univ_v3_unprep(yt, plan)
        return lambda: chain(X, Kpt, kep)

    # correctness of one raw application
    got_r = univ_v3_unprep(assoc_matvec_univ_v3_raw(
        univ_v3_prep(X, plan, dt), Kpt, Ke, plan, kep), plan)
    err_r = np.abs(np.asarray(got_r) - np.asarray(want)).max()
    note(f"raw {name} max abs err {err_r:.2e} rel {err_r/scale:.2e}")
    secs_r = chained_slope_g(make_chain_raw)
    note(f"v3 raw chained {name}: {nnz/secs_r:.3e} edges/s ({secs_r*1e3:.2f} ms/matvec)")
