#!/usr/bin/env bash
# Reproduce the run3 flagship model and its evaluation artifacts end-to-end.
# Checkpoints and the dataset are .gitignored (too large for git); this
# script + the seeded generator are their persistence story. ~70 min on one
# v5e chip via the axon tunnel (tested 2026-08-18).
set -euo pipefail
cd "$(dirname "$0")/.."

[ -d dataset/SyntheticV2/R1 ] || scripts/make_synthetic_v2.sh

python -m fpmatch_tpu.cli.train --data-root dataset/SyntheticV2 \
    --stages 1,2,3,4,5,6 --epochs 6 --checkpoint-dir checkpoints/run3

python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir checkpoints/run3 --score fused \
    --output-dir results/bc-v2-run3
python scripts/hard_impostor_report.py results/bc-v2-run3/scores.csv

# reference-design score (classifier only), for the parity row in RESULTS.md
python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir checkpoints/run3 --score cls \
    --output-dir results/bc-v2-run3-cls
python scripts/hard_impostor_report.py results/bc-v2-run3-cls/scores.csv
