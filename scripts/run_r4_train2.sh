#!/bin/bash
# Round-4 sc retrain with analytic labels (follows run_r4_train.sh's fn
# continuation; sc is the flagship serving mode — its normal/distance
# head sets serving quality and the refine_steps Newton accuracy).
# Launch detached:
#   setsid nohup bash scripts/run_r4_train2.sh > /tmp/r4_train2.log 2>&1 &
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_train2.pid

for gate in /tmp/r4_quality2.pid /tmp/r4_train.pid; do
    if [ -f "$gate" ]; then
        while kill -0 "$(cat "$gate")" 2>/dev/null; do
            echo "waiting for $(basename "$gate" .pid) ($(date))"; sleep 60
        done
    fi
done

echo "=== [1/2] sc continuation, analytic labels $(date) ==="
mkdir -p out/sc_r4
[ -f out/sc_r4/model_best.pt ] || cp out/release/sc/model_best.pt out/sc_r4/
timeout 10800 python trainsc.py --config configs/sc.yaml \
    --out-dir out/sc_r4 --max-iterations 52000

echo "=== [2/2] synth quality eval $(date) ==="
mkdir -p out/r4w/sc
cp out/sc_r4/model_best.pt out/r4w/sc/
timeout 3600 python scripts/eval_synth_quality.py --models sc \
    --weights out/r4w --json-out out/metrics/synth_quality_sc_r4.json

echo "=== done $(date) ==="
