"""Environment smoke check (parity with pore-detection/verify_setup.py):
devices, imports, native toolchain, dataset presence, tiny compile."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="dataset/Synthetic")
    args = ap.parse_args(argv)
    checks = []

    def check(name, fn):
        try:
            detail = fn()
            checks.append((name, True, detail))
        except Exception as e:  # noqa: BLE001 — report, don't crash
            checks.append((name, False, f"{type(e).__name__}: {e}"))

    def _devices():
        import jax
        return str(jax.devices())

    def _imports():
        import flax, optax, orbax.checkpoint, chex  # noqa: F401
        import cv2, scipy  # noqa: F401
        return "flax/optax/orbax/chex/cv2/scipy"

    def _native():
        from .. import native
        assert native.available()
        return "C++ LAPJV/NMS built"

    def _dataset():
        import os
        n = sum(len(files) for _, _, files in os.walk(args.data_root))
        assert n > 0, f"no files under {args.data_root}"
        return f"{n} files"

    def _compile():
        import jax, jax.numpy as jnp
        from ..ops.sinkhorn import sinkhorn
        out = sinkhorn(jnp.zeros((4, 4)), 3, 3, tau=0.5, max_iter=4)
        assert jnp.isfinite(out).all()
        return "sinkhorn jit ok"

    check("devices", _devices)
    check("imports", _imports)
    check("native", _native)
    check("dataset", _dataset)
    check("compile", _compile)
    width = max(len(n) for n, _, _ in checks)
    ok_all = True
    for name, ok, detail in checks:
        print(f"{'PASS' if ok else 'FAIL'}  {name:{width}s}  {detail}")
        ok_all &= ok
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
