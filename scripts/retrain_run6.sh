#!/usr/bin/env bash
# Round-5 flagship retrain ("run6"): run4's exact recipe (stride-8 multi-tap,
# full 6-stage curriculum) on the regenerated SyntheticV2 — checkpoints were
# wiped with the environment, and every round-5 A/B (bf16 eval, hungarian
# discretization, fixture transfer) needs a trained f32 checkpoint.
# Budget ~80-100 min on one v5e chip via the axon tunnel.
set -euo pipefail
cd "$(dirname "$0")/.."

[ -d dataset/SyntheticV2/R1 ] || scripts/make_synthetic_v2.sh

python -m fpmatch_tpu.cli.train --data-root dataset/SyntheticV2 \
    --stages 1,2,3,4,5,6 --epochs 6 --node-taps layer2,layer3 \
    --checkpoint-dir checkpoints/run6 --log-dir logs/tb-run6
