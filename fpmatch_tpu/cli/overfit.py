"""Overfit-one-sample debug driver (parity with train_single_image.py):
trains the full model on a single pair until matching accuracy saturates —
the quickest sanity check that the whole gradient path works.
"""
from __future__ import annotations

import argparse
import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--n-max", type=int, default=32)
    ap.add_argument("--univ", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..core.config import Config, ShapeConfig, StageConfig
    from ..data.synthetic import synthetic_pair_batch
    from ..models.ngm import NGMNet
    from ..train.state import create_state
    from ..train.step import make_train_step

    cfg = Config(shapes=ShapeConfig(n_max=args.n_max, e_max=args.n_max * 6,
                                    univ_size=args.univ))
    batch = synthetic_pair_batch(cfg, batch_size=1, seed=args.seed,
                                 n_range=(args.n_max - 8, args.n_max - 2),
                                 image_hw=(128, 160))
    model = NGMNet(cfg)
    variables = model.init(jax.random.PRNGKey(args.seed), batch, train=False)
    stage = StageConfig(name="overfit", lr=args.lr, backbone_lr=args.lr / 10,
                        k_lr=args.lr, cls_lr=args.lr, train_main=True,
                        train_k=True, train_cls=True, warmup_epochs=0)
    state = create_state(variables, stage)
    step = make_train_step(model, stage)
    for i in range(args.steps):
        state, metrics = step(state, batch)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(metrics['loss']):.4f} "
                  f"acc={float(metrics['accuracy']):.4f} "
                  f"ks={float(metrics['ks_error']):.3f}")
    acc = float(metrics["accuracy"])
    print(f"final accuracy: {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
