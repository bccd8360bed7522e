"""Train-step decomposition on the real chip — locate the forward-vs-train
throughput gap (round-2 capture: eval forward 11.2k pairs/s vs train 924).

Protocol: chained-slope timing (bench.chained_slope_seconds) of
  * eval forward / train forward / forward+backward / full train step
  * full train step under component ABLATIONS (each re-inits on host CPU):
      - remat_sinkhorn off        (recompute-vs-store for the Sinkhorn unroll)
      - sk_iter 20→5              (final Sinkhorn + soft-topk unroll length)
      - sk_layer_iter 20→5        (per-GNN-layer embedded Sinkhorn)
      - regression off            (AFA-U k head removed)
      - backbone bf16             (MXU/HBM savings in the CNN)
The deltas attribute the gap; RESULTS.md records the table.

Run: python scripts/profile_train_step.py  (TPU; ~8 compiles, several min)
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _init_cpu(model, batch, seed=0):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(seed),
                               jax.device_put(batch, cpu), train=False)
    return jax.device_put(variables, jax.devices()[0])


def time_train_step(cfg, batch, label, results):
    import bench
    from fpmatch_tpu.core.config import default_stages
    from fpmatch_tpu.models.ngm import NGMNet
    from fpmatch_tpu.train.state import create_state
    from fpmatch_tpu.train.step import make_train_step

    model = NGMNet(cfg)
    variables = _init_cpu(model, batch)
    stage = default_stages()[2]
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

    secs = bench.chained_slope_seconds(make_chain, lo=1, hi=4, repeats=2)
    pps = batch.batch_size / secs
    results[label] = round(pps, 1)
    print(f"# {label:34s}: {secs*1e3:8.2f} ms  {pps:9.1f} pairs/s",
          flush=True)
    return model, variables, state


def main():
    sys.path.insert(0, os.getcwd())
    import bench
    from fpmatch_tpu.core.config import Config, default_stages
    from fpmatch_tpu.data.synthetic import synthetic_pair_batch
    from fpmatch_tpu.train.step import loss_and_metrics

    cfg = Config()
    batch = synthetic_pair_batch(cfg, batch_size=8, genuine_ratio=0.5, seed=0)
    results = {"dispatch_ms": round(bench.dispatch_ms(), 2)}
    print(f"# dispatch: {results['dispatch_ms']} ms", flush=True)

    model, variables, state = time_train_step(cfg, batch,
                                              "full train step", results)
    stage = default_stages()[2]

    # forward variants on the same params. The body must depend on the
    # carry or XLA hoists the loop-invariant forward out of the fori_loop
    # and the slope measures an empty loop — fn takes (params, batch) and
    # the carry perturbs the images by a numerically-nil scaled output.
    def chain_of(fn):
        def make_chain(steps):
            @jax.jit
            def chain(v):
                def body(_, carry):
                    acc, bias = carry
                    b = batch._replace(
                        images=batch.images
                        + bias.astype(batch.images.dtype))
                    s = fn(v, b)
                    return (acc + s, s * 1e-20)
                z = jnp.zeros(())
                return jax.lax.fori_loop(0, steps, body, (z, z))[0]
            return lambda: chain(state.params)
        return make_chain

    evfwd = lambda p, b: model.apply(  # noqa: E731
        {"params": p, "batch_stats": state.batch_stats}, b,
        train=False)["cls_prob"].sum()
    secs = bench.chained_slope_seconds(chain_of(evfwd), lo=1, hi=5, repeats=2)
    results["forward_eval"] = round(batch.batch_size / secs, 1)
    print(f"# {'forward (eval mode)':34s}: {secs*1e3:8.2f} ms  "
          f"{batch.batch_size/secs:9.1f} pairs/s", flush=True)

    trfwd = lambda p, b: loss_and_metrics(  # noqa: E731
        model, p, state.batch_stats, b, stage, train=True)[0]
    secs = bench.chained_slope_seconds(chain_of(trfwd), lo=1, hi=5, repeats=2)
    results["forward_train"] = round(batch.batch_size / secs, 1)
    print(f"# {'forward (train mode)':34s}: {secs*1e3:8.2f} ms  "
          f"{batch.batch_size/secs:9.1f} pairs/s", flush=True)

    gradfn = jax.grad(trfwd)
    gsum = lambda p, b: sum(jnp.sum(g) for g in  # noqa: E731
                            jax.tree_util.tree_leaves(gradfn(p, b)))
    secs = bench.chained_slope_seconds(chain_of(gsum), lo=1, hi=4, repeats=2)
    results["forward_backward"] = round(batch.batch_size / secs, 1)
    print(f"# {'forward+backward':34s}: {secs*1e3:8.2f} ms  "
          f"{batch.batch_size/secs:9.1f} pairs/s", flush=True)

    # ablations (fresh inits; param trees may differ — that is the point)
    ab = {
        "no remat_sinkhorn": dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, remat_sinkhorn=False)),
        "sk_iter 20->5": dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, sk_iter=5)),
        "sk_layer_iter ->5": dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, sk_layer_iter=5)),
        "topk_extra_iter ->2": dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, topk_extra_iter=2)),
        "no AFA-U (regression off)": dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, regression=False)),
        "backbone bf16": dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              dtype="bfloat16")),
    }
    for label, acfg in ab.items():
        try:
            time_train_step(acfg, batch, f"train step [{label}]", results)
        except Exception as e:  # noqa: BLE001
            print(f"# train step [{label}] failed: {type(e).__name__}",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
