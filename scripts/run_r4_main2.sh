#!/bin/bash
# Round-4 main chain, take 2: the first client after the box restart hit
# a transient `FAILED_PRECONDITION: TPU backend error` on its first
# device pull (15-min hang, then the error; the NEXT client worked fine
# — the remote worker recovers). This chain retries the failed stage 1
# (plain sc sweep, retrained ckpt), then gate -> fn continuation ->
# truth eval -> exact-floor profile, same deadlines as run_r4_main.sh.
# Launch detached AFTER the in-flight stage-2 sweep exits:
#   R4_TRAIN_DEADLINE=<epoch> R4_HARD_STOP=<epoch> R4_WAIT_PID=<pid> \
#     setsid nohup bash scripts/run_r4_main2.sh > /tmp/r4_main2.log 2>&1 &
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_main2.pid

DEADLINE=${R4_TRAIN_DEADLINE:?set to epoch seconds}
HARD_STOP=${R4_HARD_STOP:?set to epoch seconds}

if [ -n "$R4_WAIT_PID" ]; then
    while kill -0 "$R4_WAIT_PID" 2>/dev/null; do
        echo "waiting for pid $R4_WAIT_PID ($(date))"; sleep 30
    done
fi

echo "=== [1/5] sc in-family sweep retry, retrained ckpt $(date) ==="
timeout 2700 python scripts/quality_sweep.py --mode sc \
    --json-out out/metrics/quality_sc.json

echo "=== [2/5] quality gate $(date) ==="
timeout 300 python scripts/quality_gate.py

echo "=== [3/5] fn continuation, analytic labels $(date) ==="
mkdir -p out/fn_r4
[ -f out/fn_r4/model_best.pt ] || cp out/release/fn/model_best.pt out/fn_r4/
NOW=$(date +%s); WINDOW=$((DEADLINE - NOW))
if [ "$WINDOW" -gt 900 ]; then
    # SIGINT (not TERM): the loop's KeyboardInterrupt handler flushes the
    # throttled best snapshot; kill-after covers the checkpoint pull.
    timeout -s INT -k 900 "$WINDOW" python trainfn.py \
        --config configs/fn_synth.yaml --out-dir out/fn_r4 \
        --device-synthetic --max-iterations 48000
    echo "trainfn rc=$?"
else
    echo "skip train: window ${WINDOW}s"
fi

echo "=== [4/5] fn truth eval $(date) ==="
if [ -f out/fn_r4/model_best.pt ]; then
    mkdir -p out/r4w/fn
    cp out/fn_r4/model_best.pt out/r4w/fn/
    timeout 2400 python scripts/eval_synth_quality.py --models fn \
        --weights out/r4w --json-out out/metrics/synth_quality_fn_r4.json
fi

echo "=== [5/5] exact-floor profile (optional) $(date) ==="
NOW=$(date +%s); REMAIN=$((HARD_STOP - NOW))
if [ "$REMAIN" -gt 900 ]; then
    timeout "$REMAIN" python scripts/prof/_prof_exact_floor.py
else
    echo "skip prof: ${REMAIN}s to hard stop"
fi

echo "=== done $(date) ==="
