"""Train-step decomposition on the real chip: forward / backward / optimizer
split plus per-family timings, to locate the fwd-vs-train throughput gap
(driver r1: forward 11.2k pairs/s vs train 924).

Run chip-free: python scripts/profile_train_step.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def steady(fn, *args, iters=10, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        best = min(best, float(np.median(ts)))
    return best


def main():
    from fpmatch_tpu.core.config import Config, default_stages
    from fpmatch_tpu.data.synthetic import synthetic_pair_batch
    from fpmatch_tpu.models.ngm import NGMNet
    from fpmatch_tpu.train.state import create_state
    from fpmatch_tpu.train.step import loss_and_metrics, make_train_step

    cfg = Config()
    batch = synthetic_pair_batch(cfg, batch_size=8, genuine_ratio=0.5, seed=0)
    model = NGMNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    stage = default_stages()[2]
    state = create_state(variables, stage)
    B = int(batch.batch_size)

    fwd = jax.jit(lambda p, b: loss_and_metrics(
        model, p, state.batch_stats, b, stage, train=True)[0])
    t = steady(fwd, state.params, batch)
    print(f"forward(train-mode) : {t*1e3:8.2f} ms  {B/t:9.1f} pairs/s")

    grad = jax.jit(jax.grad(lambda p, b: loss_and_metrics(
        model, p, state.batch_stats, b, stage, train=True)[0]))
    t = steady(grad, state.params, batch)
    print(f"forward+backward    : {t*1e3:8.2f} ms  {B/t:9.1f} pairs/s")

    step = make_train_step(model, stage)
    # non-donating copy for repeat timing
    st = state
    jax.block_until_ready(step(create_state(variables, stage), batch))
    ts = []
    for _ in range(10):
        st2 = create_state(variables, stage)
        t0 = time.perf_counter()
        jax.block_until_ready(step(st2, batch))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"full train step     : {t*1e3:8.2f} ms  {B/t:9.1f} pairs/s")

    # profiler trace for op-level attribution
    import glob
    with jax.profiler.trace("/tmp/jax_trace_train"):
        st3 = create_state(variables, stage)
        jax.block_until_ready(step(st3, batch))
    print("trace written to /tmp/jax_trace_train")


if __name__ == "__main__":
    main()
