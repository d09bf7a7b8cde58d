#!/bin/bash
# Train fn, fd, and sc to convergence on the TPU (device-synthesized data,
# zero per-step tunnel traffic) and publish best checkpoints to
# out/release/. Designed to run unattended:
#   bash scripts/train_all_tpu.sh > /tmp/train_all.log 2>&1 &
# Budgets: fn ~20k its (~40 min), fd ~26k its (~60 min), sc ~40k its
# (~25 min) at round-2 measured step times; early stopping may end sooner.
set -e
cd "$(dirname "$0")/.."

echo "=== sc $(date) ==="
python trainsc.py --out-dir out/sc --no-resume
echo "=== fn $(date) ==="
python trainfn.py --config configs/fn_synth.yaml --out-dir out/fn --no-resume
echo "=== fd $(date) ==="
python trainfd.py --config configs/fd_synth.yaml --out-dir out/fd --no-resume

echo "=== publish $(date) ==="
for m in fn fd sc; do
  mkdir -p out/release/$m
  cp out/$m/model_best.pt out/release/$m/model_best.pt
done
ls -la out/release/*/

echo "=== quality vs analytic GT $(date) ==="
python scripts/eval_synth_quality.py --weights out/release \
  --json-out out/metrics/synth_quality.json

echo "=== fast/sc quality gate (trained weights) $(date) ==="
FX_MODES=fast,sc FX_WEIGHTS=out/release \
  python scripts/eval_fast_vs_exact.py | tee out/metrics/fast_gate.jsonl

echo "=== done $(date) ==="
