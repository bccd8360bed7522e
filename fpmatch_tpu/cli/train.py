"""Training CLI — the framework's `python train.py` equivalent.

Usage:
  python -m fpmatch_tpu.cli.train --data-root dataset/Synthetic \
      --stages 1,2,3,4,5,6 --epochs 10
  python -m fpmatch_tpu.cli.train --smoke      # tiny synthetic end-to-end run
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np


def build_loaders(cfg, data_root: str, dataset_name: str, length=None,
                  test_length=None, device_put_fn=None, host_batch_hook=None):
    """train: augmented, shuffled; val: deterministic + sample-cached (it is
    re-iterated every epoch); test: a seeded subsample for the periodic
    in-training eval (the full protocol belongs to cli/evaluate.py — at
    loader speed 10k+ pairs would stall training for most of an hour)."""
    import numpy as np
    from ..data.benchmark import make_benchmark
    from ..data.pipeline import DataLoader, PairDataset

    loaders = {}
    for sets in ("train", "val", "test"):
        bench = make_benchmark(dataset_name, sets, root=data_root,
                               task="classify")
        pd = PairDataset(bench, cfg, length=length)
        if sets == "test" and test_length and len(pd.pairs) > test_length:
            keep = np.random.default_rng(0).choice(
                len(pd.pairs), size=test_length, replace=False)
            pd.pairs = [pd.pairs[i] for i in sorted(keep)]
        loaders[sets] = DataLoader(pd, cfg, shuffle=(sets == "train"),
                                   drop_last=True, cache=(sets != "train"),
                                   device_prefetch=True,
                                   device_put_fn=device_put_fn,
                                   host_batch_hook=host_batch_hook)
    return loaders


def parse_mesh_spec(mesh_arg: str, n_devices: int):
    """'dp' → (n_devices, 1) with 0/1 = single device and -1 = all visible
    devices; 'DxE' → (D, E) data × edge."""
    if "x" in mesh_arg:
        d_data, d_edge = (int(v) for v in mesh_arg.lower().split("x"))
        return d_data, d_edge
    if mesh_arg != "dp":
        raise ValueError(f"--mesh must be 'dp' or 'DxE', got {mesh_arg!r}")
    if n_devices < 0:
        return len(jax.devices()), 1
    return max(n_devices, 1), 1


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train the TPU NGM matcher")
    ap.add_argument("--data-root", default="dataset/Synthetic")
    ap.add_argument("--dataset", default="Synthetic",
                    choices=["Synthetic", "L3SFV2Augmented", "PolyUDBII",
                             "PolyUDBI", "L3SF"])
    ap.add_argument("--stages", default="1,2,3,4,5,6",
                    help="comma-separated stage numbers to run")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override epochs per stage")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--length", type=int, default=None,
                    help="cap training pairs per epoch")
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--log-dir", default=None,
                    help="write per-epoch metrics to <dir>/metrics.jsonl "
                         "and TensorBoard event files (the reference logs "
                         "TB scalars every iteration, train.py:62,339-347)")
    ap.add_argument("--init-from", default=None,
                    help="dir:name of a checkpoint to warm-start params from "
                         "(e.g. checkpoints/run1:stage6_last)")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--n-max", type=int, default=64)
    ap.add_argument("--e-max", type=int, default=384)
    ap.add_argument("--univ", type=int, default=600)
    ap.add_argument("--node-taps", default="layer3",
                    help="comma-separated backbone node taps, e.g. "
                         "layer2,layer3 for stride-8+16 features")
    ap.add_argument("--passes", type=int, default=3,
                    help="loader passes per epoch (reference uses 3)")
    ap.add_argument("--numbered-checkpoints", action="store_true",
                    help="also save a numbered per-epoch snapshot "
                         "(reference training_loop.py params_epoch_N)")
    ap.add_argument("--smoke", action="store_true",
                    help="generate a tiny synthetic dataset and run 1 epoch "
                         "of stages 1+6 end-to-end")
    ap.add_argument("--test-length", type=int, default=1024,
                    help="seeded test-pair subsample for the periodic "
                         "in-training eval (full protocol: cli/evaluate.py)")
    ap.add_argument("--thread-workers", action="store_true",
                    help="use thread workers instead of worker processes")
    ap.add_argument("--n-devices", type=int, default=0,
                    help="train data-parallel over this many devices "
                         "(0/1 = single device, the default; -1 = all "
                         "visible devices). Equivalent to --mesh Nx1")
    ap.add_argument("--mesh", default="dp",
                    help="mesh spec: 'dp' (1-D data mesh of --n-devices) or "
                         "'DxE' for hybrid data x edge sharding, e.g. 2x4 — "
                         "the 3 assoc-GNN layers row-shard over the edge "
                         "axis (requires n-max divisible by E)")
    ap.add_argument("--cls-k-features", action="store_true",
                    help="feed [k_prob, matched fraction, mean matched "
                         "similarity] into the match classifier (trains the "
                         "cls*k fusion; new-checkpoint shapes)")
    ap.add_argument("--hyperedge", action="store_true",
                    help="enable the third-order (triangle hyperedge) "
                         "association term — machinery the reference builds "
                         "but never turns on (its ngm.py:255)")
    ap.add_argument("--bf16", action="store_true",
                    help="end-to-end bfloat16 mixed precision: backbone + "
                         "graph-side hot path compute in bf16 with f32 "
                         "master params and f32 reductions (Sinkhorn/"
                         "soft-top-k/AFA-U/losses stay f32). No loss "
                         "scaling needed — bf16 keeps f32's exponent range")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s",
                        stream=sys.stdout)
    log = logging.getLogger("fpmatch_tpu.cli").info

    from ..core.config import Config, ShapeConfig, default_stages
    from ..models.ngm import NGMNet
    from ..train.loop import run_curriculum, evaluate_verification
    from ..train.state import create_state

    shapes = ShapeConfig(n_max=args.n_max, e_max=args.e_max,
                         univ_size=args.univ)
    cfg = Config(shapes=shapes)
    from . import TAP_CHANNELS
    taps = tuple(args.node_taps.split(","))
    if taps != ("layer3",):
        feat = sum(TAP_CHANNELS[t] for t in taps) + 512
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, node_taps=taps),
            ngm=dataclasses.replace(cfg.ngm, node_feature_dim=feat))
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          batch_size=args.batch_size))
    if not args.thread_workers:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, worker_processes=True))
    if args.cls_k_features:
        cfg = dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, cls_k_features=True))
    if args.hyperedge:
        cfg = dataclasses.replace(
            cfg, ngm=dataclasses.replace(cfg.ngm, hyperedge=True))
    if args.bf16:
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16"),
            ngm=dataclasses.replace(cfg.ngm, compute_dtype="bfloat16"))
    # fingerprint scans are grayscale: ship luma only (3x less H2D)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, image_channels=1))

    if args.smoke:
        import tempfile
        from ..data.generator import generate_synthetic_dataset
        root = tempfile.mkdtemp(prefix="fpm_smoke_") + "/Synthetic"
        generate_synthetic_dataset(root, fingers_per_split=(6, 3, 2),
                                   n_pores=60, seed=0, size=(320, 280))
        args.data_root = root
        if args.checkpoint_dir == "checkpoints":  # default → keep smoke out
            args.checkpoint_dir = root + "-ckpt"
        args.length = 8
        args.epochs = 1
        args.passes = 1
        args.stages = "1,6"
        shapes = ShapeConfig(n_max=32, e_max=192, t_max=96, univ_size=64)
        cfg = dataclasses.replace(
            cfg, shapes=shapes,
            data=dataclasses.replace(cfg.data, batch_size=4, num_workers=2))
        log(f"smoke dataset at {root}")

    stage_nums = [int(s) for s in args.stages.split(",")]
    stages = []
    for num in stage_nums:
        st = default_stages()[num - 1]
        if args.epochs:
            st = dataclasses.replace(st, num_epochs=args.epochs)
        stages.append(st)

    # probe BEFORE any DataLoader exists: the loaders' background
    # device_put prefetch threads stream H2D batches continuously, which
    # inflates a synced dispatch probe into a false "degraded mode" alarm
    # (observed 24-34 ms with prefetch active vs 0.1 ms fresh-process)
    from ..utils.profiling import warn_if_degraded_dispatch
    warn_if_degraded_dispatch(log)

    # --- device mesh (replaces the reference's commented-out DataParallel,
    # src/parallel/data_parallel.py:6-18 / train.py:148, with GSPMD:
    # batch axis sharded over "data", params replicated, XLA inserts the
    # gradient all-reduce; 'DxE' additionally row-shards the assoc-GNN
    # layers over "edge" via the v3 halo-exchange path) -------------------
    d_data, d_edge = parse_mesh_spec(args.mesh, args.n_devices)
    use_mesh = d_data * d_edge > 1
    mesh = None
    device_put_fn = None
    host_batch_hook = None
    if use_mesh:
        from ..parallel.distributed import make_hybrid_mesh
        from ..parallel.edge_partition import plan_batch_rows
        from ..parallel.mesh import make_mesh, replicate_state, shard_batch
        n_dev = d_data * d_edge
        avail = len(jax.devices())
        if n_dev > avail:
            raise SystemExit(f"--mesh {d_data}x{d_edge} needs {n_dev} "
                             f"devices, only {avail} visible")
        if cfg.data.batch_size % d_data:
            raise SystemExit(f"batch size {cfg.data.batch_size} not "
                             f"divisible by data axis {d_data}")
        if d_edge > 1:
            if cfg.shapes.n_max % d_edge:
                raise SystemExit(f"--n-max {cfg.shapes.n_max} not divisible "
                                 f"by edge axis {d_edge}")
            mesh = make_hybrid_mesh(d_data, d_edge)

            def host_batch_hook(b, _d=d_edge, _n=cfg.shapes.n_max):
                plan = plan_batch_rows(_n, np.asarray(b.src[:, 0]),
                                       np.asarray(b.dst[:, 0]), _d,
                                       transpose=True)
                return b._replace(row_plan=plan)
        else:
            mesh = make_mesh(d_data)
        device_put_fn = lambda b: shard_batch(b, mesh)  # noqa: E731
        log(f"mesh: data={d_data} x edge={d_edge} over "
            f"{[str(d) for d in mesh.devices.flat]}")

    loaders = build_loaders(cfg, args.data_root, args.dataset,
                            length=args.length,
                            test_length=args.test_length,
                            device_put_fn=device_put_fn,
                            host_batch_hook=host_batch_hook)

    if mesh is not None and d_edge > 1:
        model = NGMNet(cfg, mesh=mesh, edge_axis="edge", batch_axis="data")
    else:
        model = NGMNet(cfg)
    example = next(iter(loaders["val"]))
    log("initializing model…")
    # Flax init executes eagerly op-by-op; on the tunnel-attached TPU each
    # dispatch costs milliseconds, turning init into many minutes. Initialize
    # on host CPU (seconds) and ship the finished pytree in one transfer.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # init path: single-device model (params are identical — the edge-
        # sharded aggregation is an implementation detail, not a parameter
        # change), so strip any row_plan the loader hook attached.
        # Build the init example as host ZEROS of the example's spec: the
        # loader H2D-prefetches, and reading a device batch back
        # (np.asarray -> D2H) intermittently deadlocks against the
        # prefetch threads on the tunneled TPU (same hang as
        # cli/evaluate.py; stack in logs/run6_evals2_hung.log). Init only
        # consumes shapes.
        init_example = example._replace(row_plan=None)
        init_example = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype) if hasattr(a, "shape")
            else a, init_example)
        init_model = NGMNet(cfg)
        variables = init_model.init(jax.random.PRNGKey(args.seed),
                                    init_example, train=False)
    if mesh is not None:
        variables = replicate_state(variables, mesh)
    else:
        variables = jax.device_put(variables, jax.devices()[0])
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables["params"]))
    log(f"model ready: {n_params / 1e6:.1f}M params, "
        f"devices={jax.devices()}")
    if args.init_from:
        from ..train.checkpoints import restore_loose, warm_start
        ckpt_dir, _, name = args.init_from.partition(":")
        restored = restore_loose(ckpt_dir, name or "stage6_last")
        before = jax.tree_util.tree_leaves(variables["params"])
        variables = {
            "params": warm_start(variables["params"], restored["params"]),
            "batch_stats": warm_start(variables["batch_stats"],
                                      restored["batch_stats"])}
        after = jax.tree_util.tree_leaves(variables["params"])
        kept = sum(a is not b for a, b in zip(after, before))
        log(f"warm-started from {args.init_from}: "
            f"{kept}/{len(after)} param tensors restored "
            f"(shape-mismatched tensors keep their fresh init)")

    metrics_logger = None
    if args.log_dir:
        from ..utils.logging import MetricsLogger
        metrics_logger = MetricsLogger(args.log_dir)
        log(f"metrics → {args.log_dir}/metrics.jsonl (+ TensorBoard)")
    try:
        state, history = run_curriculum(
            model, variables, stages, loaders["train"], loaders["val"],
            test_loader=loaders["test"], checkpoint_dir=args.checkpoint_dir,
            passes_per_epoch=args.passes, log_fn=log,
            metrics_logger=metrics_logger,
            numbered_checkpoints=args.numbered_checkpoints)
    finally:
        if metrics_logger is not None:
            metrics_logger.close()

    report = evaluate_verification(model, state, stages[-1],
                                   loaders["test"])
    log(f"final test report: { {k: round(v, 4) for k, v in report.items()} }")
    return report


if __name__ == "__main__":
    main()
