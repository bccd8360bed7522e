#!/usr/bin/env bash
# Round-5 "run6" evidence battery: all evals of the retrained run4-recipe
# flagship checkpoint (checkpoints/run6). Produces:
#   results/bc-v2-run6/f32        greedy, f32       (baseline row)
#   results/bc-v2-run6/bf16       greedy, bf16      (numerics A/B)
#   results/bc-v2-run6/hungarian  hungarian, f32    (discretization A/B)
#   results/polyu-mini/zero-shot  fixture transfer, no fine-tune
#   results/polyu-mini/warmstart  fixture fine-tune from run6 + eval
# Run after scripts/retrain_run6.sh. Budget ~60 min on one v5e via tunnel.
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=checkpoints/run6
TAPS=layer2,layer3
FIX=tests/fixtures/PolyU-mini/DBII

run() { echo "### $*" ; timeout 2400 "$@" ; echo "### rc=$? $*" ; }

run python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir "$CKPT" --node-taps "$TAPS" --score fused \
    --output-dir results/bc-v2-run6/f32
python scripts/hard_impostor_report.py results/bc-v2-run6/f32/scores.csv.gz \
    || python scripts/hard_impostor_report.py results/bc-v2-run6/f32/scores.csv

run python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir "$CKPT" --node-taps "$TAPS" --score fused --bf16 \
    --output-dir results/bc-v2-run6/bf16
python scripts/hard_impostor_report.py results/bc-v2-run6/bf16/scores.csv.gz \
    || python scripts/hard_impostor_report.py results/bc-v2-run6/bf16/scores.csv

run python -m fpmatch_tpu.cli.evaluate --data-root dataset/SyntheticV2 \
    --checkpoint-dir "$CKPT" --node-taps "$TAPS" --score fused \
    --discretize hungarian --output-dir results/bc-v2-run6/hungarian
python scripts/hard_impostor_report.py \
    results/bc-v2-run6/hungarian/scores.csv.gz \
    || python scripts/hard_impostor_report.py \
        results/bc-v2-run6/hungarian/scores.csv

# fixture transfer: zero-shot (SyntheticV2-trained weights, PolyU-mini-format
# protocol; 96x96 renders, so this probes the real-format path + transfer,
# not real skin — see RESULTS.md "Data provenance")
run python -m fpmatch_tpu.cli.evaluate --data-root "$FIX" --dataset PolyUDBII \
    --checkpoint-dir "$CKPT" --node-taps "$TAPS" --score fused \
    --output-dir results/polyu-mini/zero-shot

# warm-started fine-tune: a short stage-6 pass from the run6 weights, then
# the same fixture eval
run python -m fpmatch_tpu.cli.train --data-root "$FIX" --dataset PolyUDBII \
    --stages 6 --epochs 4 --node-taps "$TAPS" \
    --init-from "$CKPT:stage6_last" \
    --checkpoint-dir checkpoints/polyu-warm --length 32 --test-length 16
run python -m fpmatch_tpu.cli.evaluate --data-root "$FIX" --dataset PolyUDBII \
    --checkpoint-dir checkpoints/polyu-warm --node-taps "$TAPS" \
    --score fused --output-dir results/polyu-mini/warmstart

echo "ALL EVALS DONE"
