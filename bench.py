"""Headline benchmark: end-to-end matched pairs/s of the flagship NGM matcher
on one chip, plus the association-graph SpMM edges/s microbenchmark.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
BASELINE.json's target is ">=2x reference matched-pairs/s on one chip".
Measurement chain (no invented numbers):
  1. scripts/bench_reference_full.py runs the reference's FULL `Net.forward`
     (src/model/ngm.py:204-491, its own code; FLOP-faithful pure-torch
     stand-ins only for the absent torchvision/torch_geometric/torch_sparse)
     eager on this host's CPU: **5.13 pairs/s** (batch 8, n=50, inference,
     median of 5; 2026-08-19).
  2. We credit the reference a 20x end-to-end A100 speedup over this CPU —
     generous, because its hot section is an eager per-sample Python loop
     (per-sample SparseTensor assembly + 3 GNN layers + per-layer Sinkhorn,
     ngm.py:326-449) plus the data-dependent soft-topk overshoot loop:
     kernel-launch/sync-bound on GPU, not FLOP-bound. (Per-op floor from
     scripts/bench_reference_cpu.py agrees: hot ops alone ~19 ms/pair CPU.)
  → reference ≈ 5.13 × 20 ≈ 100 pairs/s on its own hardware, and
     vs_baseline = pairs_per_s / (2 * 100.0) so that 1.0 == the 2x target.
Extra fields beyond the required four give the full picture.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

# Persistent compilation cache: verified working on the axon backend
# (probe 2026-08-20: 1.7s cold -> 0.17s warm). The driver's capture window
# is the scarce resource (BENCH_r01-r03 all rc!=0 on wall-clock); local runs
# populate the cache in-repo so the driver's run hits warm compiles.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_bench_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
    pass

# chained-slope cross-checks double the number of compiled programs; they
# validated the drain protocol in round 3 (the two agree, logs/
# bench_tapform.log) and now run only under BENCH_CHAIN=1 to keep the
# driver-path model stage to TWO compiles (forward drain + train drain).
BENCH_CHAIN = os.environ.get("BENCH_CHAIN", "") == "1"


def note(msg):
    """Progress + health markers on stderr (stdout carries only the JSON)."""
    print(f"# {msg}", file=sys.stderr, flush=True)


def steady_seconds(fn, *args, iters=20, repeats=3):
    """Best median-of-iters over several repeats — the tunnel-attached TPU
    shows large transient stalls, so a single mean is unusable."""
    jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        best = min(best, float(np.median(ts)))
    return best


def drain_seconds(step_fn, n=20, repeats=3):
    """Steady-state per-invocation seconds by enqueue-N-then-drain: call
    `step_fn()` n times WITHOUT syncing (the tunnel pipelines execution),
    then block on everything; total/n is the true device throughput.

    This is the production regime (training loops and serving enqueue
    without per-step syncs) and the only honest per-call protocol on the
    axon tunnel: a per-call block_until_ready adds a ~25-35 ms sync quantum
    for multi-ms programs (measured 2026-08-19: synced forward 37 ms vs
    12.5 ms/call drained), and in earlier tunnel builds returned WITHOUT
    syncing — the source of round-1/2's physically impossible 11-12k
    pairs/s forward captures (>100 TFLOP/s f32 implied on a v5e)."""
    jax.block_until_ready(step_fn())  # compile + settle
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [step_fn() for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best

# measured-CPU (5.13 pairs/s, scripts/bench_reference_full.py) x generous
# 20x A100 credit — see module docstring for the chain. The 20x is the one
# unmeasured number, so the JSON also carries a 10x/50x sensitivity range
# (vs_baseline_cred10x / vs_baseline_cred50x).
REF_CPU_PAIRS_PER_S = 5.13
A100_CREDIT = 20.0
REF_PAIRS_PER_S_ESTIMATE = REF_CPU_PAIRS_PER_S * A100_CREDIT  # ≈ 100
TARGET_MULTIPLIER = 2.0
DISPATCH_HEALTHY_MS = 5.0

# total wall-clock budget for main(): the driver's capture window killed the
# round-1..3 benches (BENCH_r03.json rc=124 lost every field). Stages run
# most-important-first and the cumulative JSON is re-printed after EVERY
# stage, so a timeout anywhere keeps everything already measured.
TOTAL_BUDGET_S = 540.0
MIN_STAGE_S = 60.0


def dispatch_ms():
    """Median dispatch latency of a trivial jitted op. The axon tunnel has a
    degraded ~33 ms/dispatch mode (chip/tunnel state, not workload); stages
    report this so main() can retry a capture taken in the bad mode."""
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def bench_forward(cfg, model, variables, batch):
    """Forward throughput. History: round-1/2 captures printed 11-12k
    pairs/s from one-call-per-dispatch timing whose block_until_ready did
    not actually sync through the tunnel (enqueue rate, physically
    impossible compute rate); the honest steady-state number on this chip
    is ~640 pairs/s (12.5 ms/batch-of-8), measured identically by the
    on-device chain below and by drain_seconds.

    The loop body must DEPEND on the carry, or XLA hoists the (otherwise
    loop-invariant) forward out of the loop and the slope measures an empty
    loop: the carry perturbs the input images by a ~1e-20-scaled function of
    the previous output (unfoldable, numerically nil, one fused add).

    Reported number: drain_seconds (the production enqueue-without-sync
    regime); the chained-slope figure (BENCH_CHAIN=1 only — it costs two
    extra big compiles in the driver window) is printed to stderr as a
    cross-check — the two read the same steady-state throughput."""
    import jax.numpy as jnp

    if BENCH_CHAIN:
        def make_chain(steps):
            @jax.jit
            def chain(v):
                def body(_, carry):
                    acc, bias = carry
                    b = batch._replace(
                        images=batch.images + bias.astype(batch.images.dtype))
                    out = model.apply(v, b, train=False)
                    s = out["cls_prob"].sum()
                    return (acc + s, s * 1e-20)
                z = jnp.zeros(())
                return jax.lax.fori_loop(0, steps, body, (z, z))[0]
            return lambda: chain(variables)

        chain_secs = chained_slope_seconds(make_chain, lo=1, hi=5, repeats=2)
        note(f"forward chained-slope: {batch.batch_size / chain_secs:.1f} "
             f"pairs/s ({chain_secs * 1e3:.2f} ms)")

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["cls_prob"])
    drain = drain_seconds(lambda: fwd(variables, batch))
    note(f"forward drained: {batch.batch_size / drain:.1f} pairs/s "
         f"({drain * 1e3:.2f} ms)")
    return batch.batch_size / drain


def bench_spmm(cfg, batch, iters=50):
    """edges/s through the factorized assoc-graph aggregation (the hot SpMM)."""
    import jax.numpy as jnp
    from fpmatch_tpu.ops.assoc import assoc_aggregate_mean

    B = batch.batch_size
    N = cfg.shapes.n_max
    rng = np.random.default_rng(0)
    C = 16
    X = jnp.asarray(rng.normal(size=(B, N, N, C)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    E = cfg.shapes.e_max
    Ke = jnp.asarray(rng.normal(size=(B, E, E)).astype(np.float32))
    e1m = jnp.arange(E)[None] < batch.n_edges[:, 0][:, None]
    e2m = jnp.arange(E)[None] < batch.n_edges[:, 1][:, None]
    kp_present = jnp.ones((B, N, N), jnp.float32)

    # NOTE: every operand must be vmap-mapped — a closure-captured (unmapped)
    # array forces XLA to lower the batched scatter to a serialized form,
    # ~300x slower (measured 27 ms vs 0.1 ms).
    f = jax.jit(jax.vmap(assoc_aggregate_mean))
    args = (X, Kp, Ke, batch.src[:, 0], batch.dst[:, 0], batch.src[:, 1],
            batch.dst[:, 1], kp_present, e1m, e2m)
    dt = steady_seconds(f, *args, iters=iters)
    # association edges processed per call: per pair e1*e2 + n1*n2 diag
    e1 = np.asarray(batch.n_edges[:, 0], np.int64)
    e2 = np.asarray(batch.n_edges[:, 1], np.int64)
    n1 = np.asarray(batch.n_nodes[:, 0], np.int64)
    n2 = np.asarray(batch.n_nodes[:, 1], np.int64)
    nnz = int((e1 * e2 + n1 * n2).sum())
    return nnz / dt


def bench_train_step(cfg, model, variables, batch):
    """Chained-slope timing of the train step. The raw (un-donated) step is
    embedded in a fori_loop that threads the TrainState, so (a) the loop is
    donation-safe — the round-2 model stage crashed because the jitted step
    donates its input state and steady_seconds re-called it with the same
    (deleted) buffers — and (b) per-dispatch tunnel cost cancels in the
    slope, like the kernel benches."""
    from fpmatch_tpu.core.config import default_stages
    from fpmatch_tpu.train.state import create_state
    from fpmatch_tpu.train.step import make_train_step

    stage = default_stages()[2]  # all partitions training
    secs = float("inf")
    if BENCH_CHAIN:
        state = create_state(variables, stage)
        raw_step = make_train_step(model, stage, jit=False)

        def make_chain(steps):
            @jax.jit
            def chain(s):
                def body(_, carry):
                    ns, _ = raw_step(carry, batch)
                    return ns
                return jax.lax.fori_loop(0, steps, body, s)
            return lambda: chain(state)

        secs = chained_slope_seconds(make_chain, lo=1, hi=4, repeats=2)
        note(f"train chained-slope: {batch.batch_size / secs:.1f} pairs/s "
             f"({secs * 1e3:.2f} ms)")

    # the production regime: the donating jitted step, dependent calls
    # enqueued without per-step sync
    step = make_train_step(model, stage)
    st = create_state(variables, stage)
    box = [st]

    def one():
        ns, m = step(box[0], batch)
        box[0] = ns
        return m["total_loss"]

    drain = drain_seconds(one, n=15)
    note(f"train drained (donating): {batch.batch_size / drain:.1f} pairs/s "
         f"({drain * 1e3:.2f} ms)")
    return batch.batch_size / min(secs, drain)


def bench_pallas_spmm(cfg, batch, iters=50, precision="highest"):
    """Pallas fused kernel edges/s (same contract as bench_spmm).

    MUST run before any scatter-containing XLA program executes in this
    process (see kernels/assoc_pallas.py module docstring: first-Pallas-
    compile-after-scatter permanently slows every pallas_call ~350x on the
    axon runtime — this was the round-1 driver-bench collapse)."""
    import jax.numpy as jnp
    from fpmatch_tpu.kernels.assoc_pallas import assoc_matvec_pallas

    B = batch.batch_size
    N = cfg.shapes.n_max
    E = cfg.shapes.e_max
    rng = np.random.default_rng(0)
    C = 16
    X = jnp.asarray(rng.normal(size=(B, N, N, C)).astype(np.float32))
    Kp = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    Ke = jnp.asarray(rng.normal(size=(B, E, E)).astype(np.float32))

    # single-step E1 grid: under vmap, multi-step grids re-fetch the
    # X/Kp blocks per (batch, step) and collapse throughput ~600x
    f = jax.jit(jax.vmap(lambda x, kp, ke, s1, d1, s2, d2:
                         assoc_matvec_pallas(x, kp, ke, s1, d1, s2, d2,
                                             transpose=True, block_e1=E,
                                             precision=precision)))
    args = (X, Kp, Ke, batch.src[:, 0], batch.dst[:, 0], batch.src[:, 1],
            batch.dst[:, 1])
    try:
        dt = steady_seconds(f, *args, iters=iters)
    except Exception as e:  # noqa: BLE001 — Pallas path is optional
        print(f"# pallas kernel unavailable: {type(e).__name__}", flush=True)
        return None
    e1 = np.asarray(batch.n_edges[:, 0], np.int64)
    e2 = np.asarray(batch.n_edges[:, 1], np.int64)
    n1 = np.asarray(batch.n_nodes[:, 0], np.int64)
    n2 = np.asarray(batch.n_nodes[:, 1], np.int64)
    nnz = int((e1 * e2 + n1 * n2).sum())
    return nnz / dt


def _univ_problem():
    import jax.numpy as jnp
    from fpmatch_tpu.core.build_graphs import build_edges

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
    return pts1, pts2, s1, d1, s2, d2, X, Kp, Ke, nnz


def chained_slope_seconds(make_fn, lo=2, hi=12, repeats=3):
    """Per-invocation seconds of a chained computation, by slope.

    The axon tunnel has a large, state-dependent per-DISPATCH cost (up to
    ~33 ms in the Mosaic/XLA mixed-program mode) that swamps millisecond
    kernels when timed one dispatch per call. Timing a jitted chain of
    `hi` sequentially-dependent invocations against a chain of `lo` and
    taking (t_hi - t_lo)/(hi - lo) cancels the dispatch cost exactly and
    measures the steady-state per-invocation time — which is what the
    kernel costs inside a real model step, where it is one op among many
    in a single program."""
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    jax.block_until_ready(f_lo())
    jax.block_until_ready(f_hi())
    best_lo = best_hi = float("inf")
    for _ in range(repeats):
        for f, which in ((f_lo, "lo"), (f_hi, "hi")):
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
    return max((best_hi - best_lo) / (hi - lo), 1e-9)


def bench_univ():
    """UNIV-scale (n=600, e≈3600, ~13M assoc edges/pair) single-pair matvec
    through the v3 padded-degree Pallas kernel (kernels/assoc_univ_v3.py;
    replaced the v2 blocked one-hot kernel in round 4 — v2's best was
    0.53G, v3 measures 2.3G f32-exact / 2.7G bf16). Chained-slope timing
    (see chained_slope_seconds). Runs in its own subprocess stage."""
    import jax.numpy as jnp
    from fpmatch_tpu.kernels.assoc_univ_v3 import (assoc_matvec_univ_v3,
                                                   build_kep, plan_univ_v3)

    pts1, pts2, s1, d1, s2, d2, X, Kp, Ke, nnz = _univ_problem()
    plan = plan_univ_v3(pts2, s1, d1, s2, d2, transpose=True)
    note(f"univ v3 plan: s1={plan.s1} s2={plan.s2} "
         f"spill={len(plan.spill1)}+{len(plan.spill2)}")

    out = {}
    # two numbers: the one-shot wrapper in exact f32 (drop-in op), and the
    # in-layout raw chain in bf16 (the multi-layer production regime: prep
    # once, chain the kernel, unprep once — per-layer permute/transposes
    # and the wrapper's layout glue disappear)
    from fpmatch_tpu.kernels.assoc_univ_v3 import (
        assoc_matvec_univ_v3_raw, univ_v3_prep, univ_v3_prep_kp,
        univ_v3_unprep)

    for name, dt, raw in (("f32", jnp.float32, False),
                          ("raw_bf16", jnp.bfloat16, True)):
        KeP = jax.block_until_ready(
            jax.jit(lambda k, dt=dt: build_kep(k, plan, dtype=dt))(Ke))
        Kpt = univ_v3_prep_kp(Kp, plan)

        def make_chain(steps, dt=dt, KeP=KeP, raw=raw, Kpt=Kpt):
            @jax.jit
            def chain(x, kep):
                if raw:
                    xt = univ_v3_prep(x, plan, dt)

                    def body(_, acc):
                        y = assoc_matvec_univ_v3_raw(acc.astype(dt), Kpt,
                                                     Ke, plan, kep)
                        return y / jnp.maximum(jnp.abs(y).max(), 1.0)
                    yt = jax.lax.fori_loop(0, steps, body,
                                           xt.astype(jnp.float32))
                    return univ_v3_unprep(yt, plan)

                def body(_, acc):
                    y = assoc_matvec_univ_v3(acc, Kp, Ke, plan, kep,
                                             compute_dtype=dt)
                    # renormalize so the chain stays finite; negligible next
                    # to the 13M-edge contraction, identical across paths
                    return y / jnp.maximum(jnp.abs(y).max(), 1.0)
                return jax.lax.fori_loop(0, steps, body, x)
            return lambda: chain(X, KeP)

        try:
            secs = chained_slope_seconds(make_chain)
            out[f"univ_pallas_v3_{name}_edges_per_s"] = round(nnz / secs, 0)
            note(f"univ pallas v3 {name}: {nnz / secs:.3e} edges/s "
                 f"({secs * 1e3:.2f} ms/invocation)")
        except Exception as e:  # noqa: BLE001
            note(f"univ pallas v3 {name} failed: {type(e).__name__}")
            out[f"univ_pallas_v3_{name}_edges_per_s"] = None

    return out


def bench_univ_xla():
    """UNIV-scale XLA paths, same chained-slope protocol as bench_univ (kept
    in the XLA-family stage — running after a Mosaic program would hit the
    process-poison mode): the fused einsum and the chunked gather/scatter
    (minimal-FLOP, bounded-memory; ops/assoc.assoc_matvec_chunked)."""
    import functools

    import jax.numpy as jnp
    from fpmatch_tpu.ops.assoc import assoc_matvec_chunked, assoc_matvec_fused

    pts1, pts2, s1, d1, s2, d2, X, Kp, Ke, nnz = _univ_problem()
    out = {}

    # round-4 budget trim: only the dispatch-default winner (chunked, 256 —
    # tuned in logs/tune_chunk*.log) runs in the driver path; the fused
    # einsum and other chunk sizes are in logs/bench_tapform.log.
    variants = {}
    for chunk in (256,):
        variants[f"univ_xla_chunked{chunk}_edges_per_s"] = functools.partial(
            assoc_matvec_chunked, chunk=chunk)

    for name, op in variants.items():
        def make_chain(steps, op=op):
            @jax.jit
            def chain(x):
                def body(_, acc):
                    y = op(acc, Kp, Ke, s1, d1, s2, d2, transpose=True)
                    return y / jnp.maximum(jnp.abs(y).max(), 1.0)
                return jax.lax.fori_loop(0, steps, body, x)
            return lambda: chain(X)

        secs = chained_slope_seconds(make_chain)
        out[name] = round(nnz / secs, 0)
        note(f"{name}: {nnz / secs:.3e} edges/s "
             f"({secs * 1e3:.2f} ms/invocation)")
    return out


def run_stage(stage: str) -> dict:
    """Run one bench family and return its fields.

    Stages exist to be run in SEPARATE PROCESSES: on the axon tunnel
    runtime, mixing Mosaic (Pallas) and large XLA programs in one process
    flips the process into a permanent ~33 ms/dispatch synchronous mode —
    whichever family runs second collapses ~300x (this is what produced
    the bogus 16.6M pallas number in BENCH_r01.json, and a bogus 204
    pairs/s forward when the order was flipped). Subprocess isolation
    makes the numbers order-independent.
    """
    from fpmatch_tpu.core.config import Config
    from fpmatch_tpu.models.ngm import NGMNet
    from fpmatch_tpu.data.synthetic import synthetic_pair_batch

    cfg = Config()
    batch = synthetic_pair_batch(cfg, batch_size=8, genuine_ratio=0.5, seed=0)

    health = {"dispatch_ms": round(dispatch_ms(), 2)}
    note(f"stage {stage}: dispatch {health['dispatch_ms']} ms")

    if stage == "pallas":
        v = bench_pallas_spmm(cfg, batch, precision="highest")
        note(f"pallas f32: {v:.3e}")
        return {"assoc_spmm_pallas_edges_per_s": round(v, 0) if v else None,
                **health}
    if stage == "univ":
        return {**bench_univ(), **health}
    if stage == "spmm":
        v = bench_spmm(cfg, batch)
        note(f"xla spmm: {v:.3e}")
        return {"assoc_spmm_edges_per_s": round(v, 0),
                **bench_univ_xla(), **health}
    if stage == "model":
        model = NGMNet(cfg)
        # init on host CPU (on the tunnel-attached TPU eager init is minutes
        # of per-dispatch latency). Even on CPU, EAGER init is ~4 min of
        # op-by-op dispatch (measured 2026-08-20) — far over the driver
        # window — so the init params are cached on disk (deterministic:
        # PRNGKey(0) + the fixed flagship config) and rebuilt via a jitted
        # init on a miss.
        import flax.serialization as fser
        params_cache = os.path.join(_CACHE_DIR, "model_stage_init.msgpack")
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            batch_cpu = jax.device_put(batch, cpu)
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), batch_cpu,
                                   train=False))
            variables = None
            if os.path.exists(params_cache):
                try:
                    with open(params_cache, "rb") as f:
                        variables = fser.from_bytes(shapes, f.read())
                    note("init params loaded from cache")
                except Exception as e:  # noqa: BLE001 — cache never fatal
                    note(f"init cache unreadable: {type(e).__name__}")
                    variables = None
            if variables is None:
                t0 = time.perf_counter()
                variables = jax.jit(
                    lambda: model.init(jax.random.PRNGKey(0), batch_cpu,
                                       train=False))()
                jax.block_until_ready(variables)
                note(f"jitted init: {time.perf_counter() - t0:.1f}s")
                os.makedirs(_CACHE_DIR, exist_ok=True)
                with open(params_cache, "wb") as f:
                    f.write(fser.to_bytes(variables))
        variables = jax.device_put(variables, jax.devices()[0])
        # HEADLINE: the end-to-end bf16 mixed-precision path (round 5,
        # NGMConfig.compute_dtype — f32 master params, f32 reductions;
        # trained-model EER parity evidence in RESULTS.md round 5). The
        # param tree is IDENTICAL to f32 (dtype is compute-only), so the
        # same cached init serves both variants. f32 numbers stay in the
        # record as secondary fields.
        import dataclasses
        cfg16 = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16"),
            ngm=dataclasses.replace(cfg.ngm, compute_dtype="bfloat16"))
        model16 = NGMNet(cfg16)
        pairs_per_s = bench_forward(cfg16, model16, variables, batch)
        note(f"forward bf16: {pairs_per_s:.1f}")
        train_pairs_per_s = bench_train_step(cfg16, model16, variables, batch)
        note(f"train bf16: {train_pairs_per_s:.1f}")
        f32_fwd = bench_forward(cfg, model, variables, batch)
        note(f"forward f32: {f32_fwd:.1f}")
        f32_train = bench_train_step(cfg, model, variables, batch)
        note(f"train f32: {f32_train:.1f}")
        denom = TARGET_MULTIPLIER * REF_CPU_PAIRS_PER_S
        return {
            **health,
            "metric": "matched pairs/s (end-to-end NGM forward, bf16 "
                      "mixed precision, 1 chip)",
            "value": round(pairs_per_s, 2),
            "unit": "pairs/s",
            "vs_baseline": round(pairs_per_s / (denom * A100_CREDIT), 2),
            "vs_baseline_cred10x": round(pairs_per_s / (denom * 10.0), 2),
            "vs_baseline_cred50x": round(pairs_per_s / (denom * 50.0), 2),
            "train_step_pairs_per_s": round(train_pairs_per_s, 2),
            "forward_f32_pairs_per_s": round(f32_fwd, 2),
            "train_step_f32_pairs_per_s": round(f32_train, 2),
            "vs_baseline_f32": round(f32_fwd / (denom * A100_CREDIT), 2),
            "batch_size": int(batch.batch_size),
            "device": str(jax.devices()[0]),
        }
    raise SystemExit(f"unknown stage {stage!r}")


def main():
    """Drive the stage subprocesses under a hard wall-clock budget.

    Scoreboard lessons (BENCH_r01-r03 all lost the headline):
    - The HEADLINE stage runs FIRST (model: pairs/s + vs_baseline), then the
      stages in decreasing importance. Round 3 ran model last "for freshest
      chip state" and a degraded-tunnel pallas stage ate the whole window.
    - The cumulative JSON is printed after EVERY stage (the driver takes the
      last stdout line), so a timeout anywhere keeps what's measured.
    - Each subprocess gets only the REMAINING budget; stages are skipped
      outright once the budget is too thin to finish one.
    """
    import subprocess

    t_start = time.perf_counter()
    result: dict = {}
    for stage in ("model", "spmm", "pallas", "univ"):
        elapsed = time.perf_counter() - t_start
        remaining = TOTAL_BUDGET_S - elapsed
        if remaining < MIN_STAGE_S:
            note(f"budget exhausted ({elapsed:.0f}s) — skipping {stage}+")
            break
        fields = None
        degraded = None
        for attempt in range(2):
            elapsed = time.perf_counter() - t_start
            remaining = TOTAL_BUDGET_S - elapsed
            if remaining < MIN_STAGE_S:
                break
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--stage", stage],
                    capture_output=True, text=True, timeout=remaining)
            except subprocess.TimeoutExpired as e:
                sys.stderr.write((e.stderr or b"").decode()
                                 if isinstance(e.stderr, bytes)
                                 else (e.stderr or ""))
                note(f"stage {stage} attempt {attempt} timed out "
                     f"({remaining:.0f}s budget)")
                continue
            sys.stderr.write(proc.stderr)
            line = proc.stdout.strip().splitlines()[-1] \
                if proc.stdout.strip() else ""
            if proc.returncode != 0 or not line.startswith("{"):
                note(f"stage {stage} attempt {attempt} failed "
                     f"(rc={proc.returncode})")
                continue
            parsed = json.loads(line)
            dms = parsed.get("dispatch_ms")
            if dms is not None and dms > DISPATCH_HEALTHY_MS:
                note(f"stage {stage} attempt {attempt}: degraded dispatch "
                     f"({dms} ms > {DISPATCH_HEALTHY_MS}) — retrying")
                # keep a degraded capture as fallback, flagged as such
                degraded = parsed
                continue
            fields = parsed
            break
        if fields is None and degraded is not None:
            degraded[f"degraded_dispatch_{stage}"] = True
            fields = degraded
        if fields is None:
            note(f"stage {stage} failed all attempts")
        else:
            fields[f"dispatch_ms_{stage}"] = fields.pop("dispatch_ms", None)
            result.update(fields)
        # re-print the cumulative record after every stage: the driver takes
        # the LAST stdout line, so later timeouts can't lose earlier fields
        print(json.dumps(result), flush=True)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        print(json.dumps(run_stage(sys.argv[2])))
    else:
        main()
