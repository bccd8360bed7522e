#!/usr/bin/env bash
# Round-5 evidence battery, part 2 (after the f32 eval landed in
# results/bc-v2-run6/f32). Each eval runs under a watchdog: the axon
# tunnel intermittently hangs a fresh process inside host-CPU model init
# (zero CPU, futex wait — logs/run6_evals_hung1.log) when device
# processes start back-to-back, so give each command a grace sleep, a
# 20-min timeout, and one retry.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONFAULTHANDLER=1

CKPT=checkpoints/run6
TAPS=layer2,layer3
FIX=tests/fixtures/PolyU-mini/DBII

run() {                       # run <sentinel-file> <cmd...>
  local sentinel=$1; shift
  for attempt in 1 2; do
    echo "### attempt $attempt: $*"
    sleep 20                  # tunnel grace period between device processes
    timeout 1200 "$@"
    local rc=$?
    echo "### rc=$rc $*"
    [ -e "$sentinel" ] && return 0
    echo "### sentinel $sentinel missing after attempt $attempt"
  done
  return 1
}

run results/bc-v2-run6/bf16/metrics.csv \
    python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir "$CKPT" --node-taps "$TAPS" --score fused --bf16 \
    --output-dir results/bc-v2-run6/bf16

run results/bc-v2-run6/hungarian/metrics.csv \
    python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir "$CKPT" --node-taps "$TAPS" --score fused \
    --discretize hungarian --output-dir results/bc-v2-run6/hungarian

run results/polyu-mini/zero-shot/metrics.csv \
    python -m fpmatch_tpu.cli.evaluate --data-root "$FIX" \
    --dataset PolyUDBII --checkpoint-dir "$CKPT" --node-taps "$TAPS" \
    --score fused --output-dir results/polyu-mini/zero-shot

run checkpoints/polyu-warm/checkpoint.json \
    python -m fpmatch_tpu.cli.train --data-root "$FIX" --dataset PolyUDBII \
    --stages 6 --epochs 4 --node-taps "$TAPS" \
    --init-from "$CKPT:stage6_last" \
    --checkpoint-dir checkpoints/polyu-warm --length 32 --test-length 16

run results/polyu-mini/warmstart/metrics.csv \
    python -m fpmatch_tpu.cli.evaluate --data-root "$FIX" \
    --dataset PolyUDBII --checkpoint-dir checkpoints/polyu-warm \
    --node-taps "$TAPS" --score fused \
    --output-dir results/polyu-mini/warmstart

echo "ALL EVALS DONE"
