#!/bin/bash
# Round-3 follow-up: after the fn chain (train_rest_r3.sh) finishes,
# retrain the sc model with the new PCA-prior head (old checkpoints are
# architecture-incompatible), republish, and rerun the quality evals.
#   setsid nohup bash scripts/train_sc_r3b.sh <wait_pid> > /tmp/train_sc_r3b.log 2>&1 &
cd "$(dirname "$0")/.."

WAIT_PID="$1"
if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pipeline (pid $WAIT_PID) $(date) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== sc (PCA-prior head) $(date) ==="
python trainsc.py --out-dir out/sc --no-resume

echo "=== republish $(date) ==="
for m in fn fd sc; do
  mkdir -p out/release/$m
  cp out/$m/model_best.pt out/release/$m/model_best.pt
done

mkdir -p out/metrics
echo "=== quality vs analytic GT $(date) ==="
python scripts/eval_synth_quality.py --weights out/release \
  --json-out out/metrics/synth_quality.json

echo "=== fast/sc quality gate (trained weights) $(date) ==="
FX_MODES=fast,sc FX_WEIGHTS=out/release \
  python scripts/eval_fast_vs_exact.py | tee out/metrics/fast_gate.jsonl

echo "=== done $(date) ==="
