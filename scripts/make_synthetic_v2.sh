#!/usr/bin/env bash
# Regenerate dataset/SyntheticV2 exactly (the dataset is seeded and
# deterministic; it is .gitignored, so this script is its persistence story).
#
# Layout (multi-impression acquisition model, RESULTS.md "benchmark v2.1"):
#   f0000-f0099  train fingers (R1-R3 round-robin), 2 sessions x 2 stances
#   f0100-f0199  test fingers  (R4)
#   f0200-f0229  val fingers   (R5)
#   f0300-f0329  TEST sibling fingers  (same ridge field as f0100-f0129,
#                independent pores) — the hard-impostor protocol
#   f0400-f0429  TRAIN sibling fingers (partners f0000-f0029)
# Partnerships land in dataset/SyntheticV2/siblings.json; the Benchmark pair
# protocols read it to guarantee sibling hard-impostor pairs are served.
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT=${1:-dataset/SyntheticV2}

python -m fpmatch_tpu.data.generator --root "$ROOT" \
    --train 100 --test 100 --val 30 --sessions 2 --stances 2
python -m fpmatch_tpu.data.generator --root "$ROOT" \
    --extend-partners 100-129 --extend-offset 200 --sessions 2 --stances 2
python -m fpmatch_tpu.data.generator --root "$ROOT" \
    --extend-partners 0-29 --extend-offset 400 --sessions 2 --stances 2
echo "SyntheticV2 regenerated at $ROOT"
