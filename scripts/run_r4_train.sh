#!/bin/bash
# Round-4 fn continuation (VERDICT r3 next #4: ship a defensible fn).
# Waits for the quality chain to release the device, then:
#   1. warm-start fn from the release checkpoint (it=18000, pseudo-label
#      flagship, 42.4 deg vs truth) and continue with label_source=true
#      (configs/fn_synth.yaml) — the pseudo-normal estimator's own noise
#      is ~30 deg mean at the training offsets, so the pseudo-label run
#      was converging to its label ceiling;
#   2. score the result vs analytic truth (eval_synth_quality).
# Launch detached:
#   setsid nohup bash scripts/run_r4_train.sh > /tmp/r4_train.log 2>&1 &
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_train.pid   # the launcher's $! is the setsid wrapper,
                              # which exits at once — self-record instead

if [ -f /tmp/r4_quality2.pid ]; then
    while kill -0 "$(cat /tmp/r4_quality2.pid)" 2>/dev/null; do
        echo "waiting for quality chain ($(date))"; sleep 60
    done
fi

echo "=== [1/2] fn continuation, analytic labels $(date) ==="
mkdir -p out/fn_r4
[ -f out/fn_r4/model_best.pt ] || cp out/release/fn/model_best.pt out/fn_r4/
timeout 10800 python trainfn.py --config configs/fn_synth.yaml \
    --out-dir out/fn_r4 --device-synthetic --max-iterations 48000

echo "=== [2/2] synth quality eval $(date) ==="
mkdir -p out/r4w/fn
cp out/fn_r4/model_best.pt out/r4w/fn/
timeout 3600 python scripts/eval_synth_quality.py --models fn \
    --weights out/r4w --json-out out/metrics/synth_quality_fn_r4.json

echo "=== done $(date) ==="
