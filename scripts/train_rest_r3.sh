#!/bin/bash
# Round-3 resume of the unattended TPU training pipeline: sc finished
# earlier (out/sc/model_best.pt); fd is running detached. This script
# waits for the fd process to exit, then trains fn (with the round-3
# gradient-saturation fix), publishes best checkpoints, and runs the
# quality evals. Launch detached:
#   setsid nohup bash scripts/train_rest_r3.sh > /tmp/train_rest_r3.log 2>&1 &
cd "$(dirname "$0")/.."

if [ -f /tmp/train_fd.pid ]; then
  FD_PID=$(cat /tmp/train_fd.pid)
  echo "=== waiting for fd (pid $FD_PID) $(date) ==="
  while kill -0 "$FD_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== fd done $(date) ==="
tail -2 out/fd/log.txt

echo "=== fn $(date) ==="
python trainfn.py --config configs/fn_synth.yaml --out-dir out/fn --no-resume

echo "=== publish $(date) ==="
for m in fn fd sc; do
  mkdir -p out/release/$m
  cp out/$m/model_best.pt out/release/$m/model_best.pt
done
ls -la out/release/*/

mkdir -p out/metrics
echo "=== quality vs analytic GT $(date) ==="
python scripts/eval_synth_quality.py --weights out/release \
  --json-out out/metrics/synth_quality.json

echo "=== fast/sc quality gate (trained weights) $(date) ==="
FX_MODES=fast,sc FX_WEIGHTS=out/release \
  python scripts/eval_fast_vs_exact.py | tee out/metrics/fast_gate.jsonl

echo "=== done $(date) ==="
