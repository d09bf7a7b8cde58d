#!/bin/bash
# Round-4 main device chain (final session): refresh the in-family sc
# sweeps + quality gate with the RETRAINED sc checkpoint (8.4 deg mean,
# commit ede0e4d — the committed sweep JSONs were measured with the old
# 12.4-deg weights), then the fn analytic-label continuation (VERDICT r3
# next #4), then the fn truth eval, then (if the window allows) the
# exact-path floor profile (VERDICT r3 next #9).
#
# One TPU client at a time; stages are strictly serial (the 1-core host
# wedges live tunnel clients if anything CPU-heavy runs beside them —
# CLAUDE.md). Launch detached:
#   R4_TRAIN_DEADLINE=<epoch> R4_HARD_STOP=<epoch> \
#     setsid nohup bash scripts/run_r4_main.sh > /tmp/r4_main.log 2>&1 &
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_main.pid   # the launcher's $! is the setsid wrapper

DEADLINE=${R4_TRAIN_DEADLINE:?set to epoch seconds}  # fn train stops here
HARD_STOP=${R4_HARD_STOP:?set to epoch seconds}      # chain must be dead

echo "=== [1/6] sc in-family sweep, retrained ckpt $(date) ==="
timeout 2700 python scripts/quality_sweep.py --mode sc \
    --json-out out/metrics/quality_sc.json

echo "=== [2/6] sc refine_steps=2 in-family $(date) ==="
timeout 2700 python scripts/quality_sweep.py --mode sc --refine-steps 2 \
    --json-out out/metrics/quality_sc_it2.json

echo "=== [3/6] quality gate $(date) ==="
timeout 300 python scripts/quality_gate.py

echo "=== [4/6] fn continuation, analytic labels $(date) ==="
mkdir -p out/fn_r4
[ -f out/fn_r4/model_best.pt ] || cp out/release/fn/model_best.pt out/fn_r4/
NOW=$(date +%s); WINDOW=$((DEADLINE - NOW))
if [ "$WINDOW" -gt 900 ]; then
    # SIGINT (not TERM): the loop's KeyboardInterrupt handler flushes the
    # throttled best snapshot + model_interrupt.pt; the kill-after covers
    # the final ~27 MB checkpoint pull over the stdio tunnel.
    timeout -s INT -k 900 "$WINDOW" python trainfn.py \
        --config configs/fn_synth.yaml --out-dir out/fn_r4 \
        --device-synthetic --max-iterations 48000
    echo "trainfn rc=$?"
else
    echo "skip train: window ${WINDOW}s"
fi

echo "=== [5/6] fn truth eval $(date) ==="
if [ -f out/fn_r4/model_best.pt ]; then
    mkdir -p out/r4w/fn
    cp out/fn_r4/model_best.pt out/r4w/fn/
    timeout 2400 python scripts/eval_synth_quality.py --models fn \
        --weights out/r4w --json-out out/metrics/synth_quality_fn_r4.json
fi

echo "=== [6/6] exact-floor profile (optional) $(date) ==="
NOW=$(date +%s); REMAIN=$((HARD_STOP - NOW))
if [ "$REMAIN" -gt 900 ]; then
    timeout "$REMAIN" python scripts/prof/_prof_exact_floor.py
else
    echo "skip prof: ${REMAIN}s to hard stop"
fi

echo "=== done $(date) ==="
