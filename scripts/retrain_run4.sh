#!/usr/bin/env bash
# Reproduce run4: the stride-8 multi-tap flagship (--node-taps layer2,layer3)
# on the hard SyntheticV2 benchmark, plus its evaluation artifacts.
#
# This is the quality lever for the residual 5% sibling-impostor EER
# (RESULTS.md): pore spacing >=8 px fits stride-8 feature cells but aliases
# at stride 16. Budget ~80 min on one v5e chip via the axon tunnel (the
# stride-8 model is ~1.3x the stride-16 run3 cost; epoch 0 measured 267s
# incl. compile, later epochs less).
set -euo pipefail
cd "$(dirname "$0")/.."

[ -d dataset/SyntheticV2/R1 ] || scripts/make_synthetic_v2.sh

python -m fpmatch_tpu.cli.train --data-root dataset/SyntheticV2 \
    --stages 1,2,3,4,5,6 --epochs 6 --node-taps layer2,layer3 \
    --checkpoint-dir checkpoints/run4
# short of wall clock? a compact schedule that still trains every partition:
#   --stages 1,2,3,6 --epochs 2

python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir checkpoints/run4 --node-taps layer2,layer3 \
    --score fused --output-dir results/bc-v2-run4
python scripts/hard_impostor_report.py results/bc-v2-run4/scores.csv
