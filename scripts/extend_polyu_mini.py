"""Extend tests/fixtures/PolyU-mini/DBII/val with a second finger (f6) so the
val split's balanced session-pair protocol is non-empty (one finger gives
genuine pairs but no impostors, and _balance truncates to the smaller half).
Same format as the committed fixture: 96x96 grayscale PNG + TSV id/x/y."""
from pathlib import Path

import numpy as np
from PIL import Image

import sys
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from fpmatch_tpu.data.generator import render_impression

OUT = Path(__file__).resolve().parent.parent / "tests/fixtures/PolyU-mini/DBII/val"

for s in (1, 2):
    for t in (1, 2):
        img, pores, ids = render_impression(
            600_017, s * 1000 + t, out_size=(96, 96), n_pores=12)
        Image.fromarray(img, mode="L").save(OUT / f"f6_{s}_{t}.png")
        with open(OUT / f"f6_{s}_{t}.tsv", "w") as f:
            f.write("id\tx\ty\n")
            for (x, y), i in zip(pores, ids):
                f.write(f"{int(i)}\t{x:.2f}\t{y:.2f}\n")
        print(f"f6_{s}_{t}: {len(pores)} pores")
