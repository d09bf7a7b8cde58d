#!/bin/bash
# Round-4 main chain, take 3. Client inits against the tunnel are FLAKY
# this session: a fresh client sometimes hangs on its first device RPC
# (sleeping on futex, relay idle) and either dies 15 min later with
# FAILED_PRECONDITION or never returns, while the NEXT client works.
# So: (a) the scarce-window stage (fn continuation) runs FIRST, under a
# log-mtime watchdog that kills and retries a hung trainer; (b) every
# other stage gets one retry. Order: train -> fn truth eval -> sc sweep
# retry -> gate -> exact-floor prof (time permitting).
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_main3.pid

DEADLINE=${R4_TRAIN_DEADLINE:?epoch seconds}
HARD_STOP=${R4_HARD_STOP:?epoch seconds}

train_once() {
    local start_ts=$(date +%s)
    python trainfn.py --config configs/fn_synth.yaml --out-dir out/fn_r4 \
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
    echo "trainer exited rc=$?"
    return 0
}

echo "=== [1/5] fn continuation, analytic labels $(date) ==="
mkdir -p out/fn_r4
[ -f out/fn_r4/model_best.pt ] || cp out/release/fn/model_best.pt out/fn_r4/
for attempt in 1 2 3 4; do
    NOW=$(date +%s)
    [ $((DEADLINE - NOW)) -lt 900 ] && { echo "window too small"; break; }
    echo "--- trainer attempt $attempt $(date) ---"
    train_once && break
done

echo "=== [2/5] fn truth eval $(date) ==="
mkdir -p out/r4w/fn
cp out/fn_r4/model_best.pt out/r4w/fn/
for attempt in 1 2; do
    timeout 1800 python scripts/eval_synth_quality.py --models fn \
        --weights out/r4w --json-out out/metrics/synth_quality_fn_r4.json \
        && break
    echo "--- eval retry $(date) ---"
done

echo "=== [3/5] sc in-family sweep retry $(date) ==="
for attempt in 1 2; do
    timeout 2400 python scripts/quality_sweep.py --mode sc \
        --json-out out/metrics/quality_sc.json && break
    echo "--- sweep retry $(date) ---"
done

echo "=== [4/5] quality gate $(date) ==="
timeout 300 python scripts/quality_gate.py

echo "=== [5/5] exact-floor profile (optional) $(date) ==="
NOW=$(date +%s); REMAIN=$((HARD_STOP - NOW))
if [ "$REMAIN" -gt 900 ]; then
    timeout "$REMAIN" python scripts/prof/_prof_exact_floor.py
else
    echo "skip prof: ${REMAIN}s to hard stop"
fi

echo "=== done $(date) ==="
