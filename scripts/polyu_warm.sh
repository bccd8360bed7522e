#!/usr/bin/env bash
# Fixture warm-start: fine-tune the run6 flagship briefly on PolyU-mini
# (batch 2 — the fixture val split has too few pairs for batch 8) and
# evaluate. Part of the round-5 evidence battery (run6_evals2.sh).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONFAULTHANDLER=1
FIX=tests/fixtures/PolyU-mini/DBII
TAPS=layer2,layer3
sleep 15
timeout 1500 python -m fpmatch_tpu.cli.train --data-root "$FIX" \
    --dataset PolyUDBII --stages 6 --epochs 4 --node-taps "$TAPS" \
    --init-from checkpoints/run6:stage6_last --batch-size 2 \
    --checkpoint-dir checkpoints/polyu-warm --length 32 --test-length 16
echo "### train rc=$?"
sleep 15
timeout 1200 python -m fpmatch_tpu.cli.evaluate --data-root "$FIX" \
    --dataset PolyUDBII --checkpoint-dir checkpoints/polyu-warm \
    --node-taps "$TAPS" --score fused --batch-size 2 \
    --output-dir results/polyu-mini/warmstart
echo "### eval rc=$?"
echo WARM DONE
