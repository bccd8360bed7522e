"""Profiling / tracing utilities (SURVEY.md §5: the reference has none; the
TPU build treats observability as a subsystem).

- `trace(dir)` context manager around jax.profiler for TensorBoard traces;
- `roofline_report` for the association aggregation: achieved vs light-speed
  edges/s from the op's memory traffic on the target chip;
- `time_fn` for robust steady-state timing of jitted callables.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

# v5e (TPU v5 lite) per-chip specs; override for other generations
HBM_BYTES_PER_S = 819e9
BF16_FLOPS = 394e12
F32_FLOPS = 98.5e12


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> float:
    """Median steady-state seconds per call (blocks on the output pytree)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@dataclass
class AssocRoofline:
    seconds: float
    nnz: int
    bytes_moved: int
    achieved_edges_per_s: float
    lightspeed_edges_per_s: float
    efficiency: float


def assoc_roofline(seconds: float, batch: int, n1: int, n2: int, e1: int,
                   e2: int, channels: int, dtype_bytes: int = 4,
                   hbm_bytes_per_s: float = HBM_BYTES_PER_S) -> AssocRoofline:
    """Roofline for the factorized aggregation: the op must at minimum read
    Ke (E1·E2), read X and write Y (N1·N2·C each); edges/s light-speed
    follows from that traffic at HBM bandwidth."""
    nnz = batch * (e1 * e2 + n1 * n2)
    traffic = batch * dtype_bytes * (e1 * e2 + 2 * n1 * n2 * channels)
    t_light = traffic / hbm_bytes_per_s
    return AssocRoofline(
        seconds=seconds,
        nnz=nnz,
        bytes_moved=traffic,
        achieved_edges_per_s=nnz / seconds,
        lightspeed_edges_per_s=nnz / t_light,
        efficiency=t_light / seconds,
    )


def dispatch_health_ms(n: int = 10) -> float:
    """Median dispatch latency (ms) of a trivial jitted op on the default
    device. The axon tunnel runtime has a degraded ~33 ms/dispatch mode —
    triggered by mixing Mosaic (Pallas) and large XLA programs in one
    process, and occasionally by bad chip/tunnel state (RESULTS.md,
    "axon process poison"). Healthy is well under 5 ms."""
    import time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def warn_if_degraded_dispatch(log_fn=print, threshold_ms: float = 5.0):
    """Probe dispatch latency and warn when the process is in the degraded
    mode — long-running drivers (cli.train / cli.evaluate) call this up
    front so a poisoned process is visible immediately instead of as a
    silently 10-100x slower run."""
    ms = dispatch_health_ms()
    if ms > threshold_ms:
        # in-flight async work (e.g. a large device_put still streaming
        # through the tunnel) inflates synced probe calls — settle and
        # re-probe once before crying wolf
        import time as _time
        _time.sleep(2.0)
        ms = min(ms, dispatch_health_ms())
    if ms > threshold_ms:
        log_fn(f"WARNING: degraded device dispatch ({ms:.1f} ms/op > "
               f"{threshold_ms} ms) — tunnel/process is in the slow "
               "synchronous mode; restart the process (and avoid mixing "
               "Pallas and large XLA programs in it). Proceeding anyway.")
    else:
        log_fn(f"device dispatch healthy: {ms:.2f} ms/op")
    return ms
