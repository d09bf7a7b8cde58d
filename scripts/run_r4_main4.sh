#!/bin/bash
# Round-4 main chain, take 4 (post VM-restart continuation). Take 3 got
# the fn continuation to it=22.9k / val 39.0 deg before the restart
# killed it; the val curve was flattening at constant base lr. This take
# resumes with the decayed-lr recipe (configs/fn_synth_ft.yaml), then
# runs the tail stages in value order for the time that remains:
# truth eval -> promote (on a clear win) -> quality gate refresh ->
# exact-floor prof. Same hung-client watchdog + per-stage retries as
# take 3 (fresh clients can hang on their first device RPC and recover
# on the next attempt — CLAUDE.md round-4 facts).
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_main4.pid

DEADLINE=${R4_TRAIN_DEADLINE:?epoch seconds}
HARD_STOP=${R4_HARD_STOP:?epoch seconds}

train_once() {
    local start_ts=$(date +%s)
    python trainfn.py --config configs/fn_synth_ft.yaml --out-dir out/fn_r4 \
        --device-synthetic --max-iterations 48000 &
    local tp=$!
    while kill -0 "$tp" 2>/dev/null; do
        sleep 60
        local now=$(date +%s)
        if [ "$now" -ge "$DEADLINE" ]; then
            echo "deadline reached: SIGINT trainer (flushes best snapshot)"
            kill -INT "$tp"
            for _ in $(seq 15); do
                kill -0 "$tp" 2>/dev/null || break; sleep 60
            done
            kill -9 "$tp" 2>/dev/null
            return 0
        fi
        local ref=$start_ts
        [ -f out/fn_r4/log.txt ] && ref=$(stat -c %Y out/fn_r4/log.txt)
        if [ $((now - ref)) -gt 900 ]; then
            echo "watchdog: trainer silent $((now - ref))s — kill + retry"
            kill -9 "$tp" 2>/dev/null; sleep 10
            return 9
        fi
    done
    wait "$tp" 2>/dev/null
    local rc=$?
    echo "trainer exited rc=$rc"
    # propagate a crashed client's rc so the attempt loop retries it
    # (e.g. the documented fast FAILED_PRECONDITION death) instead of
    # treating the crash as success and proceeding on a stale checkpoint
    return $rc
}

echo "=== [1/6] fn continuation, decayed lr $(date) ==="
for attempt in 1 2 3 4; do
    NOW=$(date +%s)
    [ $((DEADLINE - NOW)) -lt 900 ] && { echo "window too small"; break; }
    echo "--- trainer attempt $attempt $(date) ---"
    train_once && break
done

echo "=== [2/6] fn truth eval $(date) ==="
mkdir -p out/r4w/fn
cp out/fn_r4/model_best.pt out/r4w/fn/
for attempt in 1 2; do
    timeout 1500 python scripts/eval_synth_quality.py --models fn \
        --weights out/r4w --json-out out/metrics/synth_quality_fn_r4.json \
        && break
    echo "--- eval retry $(date) ---"
done

echo "=== [3/6] promote on a clear win $(date) ==="
WIN=$(python - <<'EOF'
import json, sys
try:
    new = json.load(open("out/metrics/synth_quality_fn_r4.json"))
    old = json.load(open("out/metrics/synth_quality.json"))
    n = new["summary"]["fn"]["angular_error_deg_vs_true_mean"]
    o = old["summary"]["fn"]["angular_error_deg_vs_true_mean"]
    print("yes" if n < o - 1.0 else "no")
    print(f"fn mean angular: old {o:.2f} -> new {n:.2f}", file=sys.stderr)
except Exception as e:
    print("no"); print(f"promote check failed: {e}", file=sys.stderr)
EOF
)
if [ "$WIN" = "yes" ]; then
    cp out/fn_r4/model_best.pt out/release/fn/model_best.pt
    echo "promoted out/fn_r4/model_best.pt -> out/release/fn"
else
    echo "no clear win — release fn unchanged"
fi

echo "=== [4/6] sc in-family sweep refresh (retrained ckpt) $(date) ==="
NOW=$(date +%s); REMAIN=$((HARD_STOP - NOW))
if [ "$REMAIN" -gt 600 ]; then
    for attempt in 1 2; do
        NOW=$(date +%s); REMAIN=$((HARD_STOP - NOW))
        [ "$REMAIN" -lt 300 ] && break
        timeout $((REMAIN - 120)) python scripts/quality_sweep.py --mode sc \
            --json-out out/metrics/quality_sc.json && break
        echo "--- sweep retry $(date) ---"
    done
else
    echo "skip sweep: ${REMAIN}s to hard stop"
fi

echo "=== [5/6] quality gate $(date) ==="
timeout 120 python scripts/quality_gate.py

echo "=== [6/6] exact partial re-sweep with promoted fn (optional) $(date) ==="
NOW=$(date +%s); REMAIN=$((HARD_STOP - NOW))
if [ "$WIN" = "yes" ] && [ "$REMAIN" -gt 600 ]; then
    timeout $((REMAIN - 60)) python scripts/quality_sweep.py --mode exact \
        --sizes 256,512 --work out/quality_fnr4 \
        --json-out out/metrics/quality_exact_fnr4_partial.json
else
    echo "skip: win=$WIN remain=${REMAIN}s"
fi

echo "=== done $(date) ==="
