#!/bin/bash
# Round-5 main device chain. Serialized TPU work (1 host core — never run
# CPU-heavy jobs beside a live TPU client, CLAUDE.md), value-ordered per
# VERDICT r4:
#   [1] exact-floor profile (lost its window twice — runs FIRST)
#   [2] fn_r5 training: PCA-prior residual arch + per-iteration cosine
#   [3] fn truth eval (new + old release on the SAME new family) + promote
#   [4] sc_r5 retrain on the sharp-feature family (warm start) + promote
#   [5] gate-critical sweeps: in-family sc it1/it2 + product + gate
#   [6] OOF refresh (sc it2, product) + exact partial re-gate if fn moved
#   [7] second-generation OOF set + scan-robustness sweep
#   [8] exact OOF at sparse sizes (per-file, crash-tolerant)
# Same watchdog/retry machinery as run_r4_main4.sh: trainers get SIGINT
# at their deadline (flushes the best snapshot), silent clients are
# killed and retried (post-restart FAILED_PRECONDITION trap).
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_main.pid

HARD_STOP=${R5_HARD_STOP:?epoch seconds}
FN_DEADLINE=${R5_FN_DEADLINE:?epoch seconds}
SC_DEADLINE=${R5_SC_DEADLINE:?epoch seconds}

remain() { echo $((HARD_STOP - $(date +%s))); }

# train_boxed <deadline> <outdir> <trainer.py> <config> [extra args...]
train_boxed() {
    local deadline=$1 outdir=$2 trainer=$3 config=$4; shift 4
    python "$trainer" --config "$config" --out-dir "$outdir" "$@" &
    local tp=$! start_ts=$(date +%s)
    while kill -0 "$tp" 2>/dev/null; do
        sleep 60
        local now=$(date +%s)
        if [ "$now" -ge "$deadline" ]; then
            echo "deadline: SIGINT trainer (flushes best snapshot)"
            kill -INT "$tp"
            for _ in $(seq 15); do
                kill -0 "$tp" 2>/dev/null || break; sleep 60
            done
            kill -9 "$tp" 2>/dev/null
            return 0
        fi
        local ref=$start_ts
        [ -f "$outdir/log.txt" ] && ref=$(stat -c %Y "$outdir/log.txt")
        if [ $((now - ref)) -gt 900 ]; then
            echo "watchdog: trainer silent $((now - ref))s — kill + retry"
            kill -9 "$tp" 2>/dev/null; sleep 10
            return 9
        fi
    done
    wait "$tp" 2>/dev/null
    local rc=$?
    echo "trainer exited rc=$rc"
    return $rc
}

echo "=== [1/8] exact-floor profile $(date) ==="
if [ ! -f out/metrics/exact_floor.json ]; then
    for attempt in 1 2; do
        timeout 2400 python scripts/prof/_prof_exact_floor.py && break
        echo "--- floor prof retry $(date) ---"
    done
else
    echo "exact_floor.json exists — skip"
fi

echo "=== [2/8] fn_r5 training (PCA prior + cosine_it) $(date) ==="
mkdir -p out/fn_r5
for attempt in 1 2 3 4; do
    NOW=$(date +%s)
    [ $((FN_DEADLINE - NOW)) -lt 900 ] && { echo "fn window too small"; break; }
    echo "--- fn trainer attempt $attempt $(date) ---"
    # fresh arch: never resume from r2-r4 checkpoints; attempt >1 resumes
    # the partial r5 run in out/fn_r5 (default resume behavior)
    train_boxed "$FN_DEADLINE" out/fn_r5 trainfn.py configs/fn_synth_r5.yaml \
        --device-synthetic --max-iterations 16000 && break
done

echo "=== [3/8] fn truth eval + promote $(date) ==="
mkdir -p out/r5w/fn
if [ -f out/fn_r5/model_best.pt ]; then
    cp out/fn_r5/model_best.pt out/r5w/fn/
    for attempt in 1 2; do
        timeout 1500 python scripts/eval_synth_quality.py --models fn \
            --weights out/r5w \
            --json-out out/metrics/synth_quality_fn_r5.json && break
        echo "--- fn eval retry $(date) ---"
    done
    # the training family changed this round (sharp primitives): score the
    # CURRENT release fn on the same new family so the comparison is fair
    for attempt in 1 2; do
        timeout 1500 python scripts/eval_synth_quality.py --models fn \
            --weights out/release \
            --json-out out/metrics/synth_quality_fn_release_r5family.json \
            && break
        echo "--- fn release-eval retry $(date) ---"
    done
    FNWIN=$(python - <<'EOF'
import json
try:
    new = json.load(open("out/metrics/synth_quality_fn_r5.json"))
    old = json.load(open("out/metrics/synth_quality_fn_release_r5family.json"))
    n = new["summary"]["fn"]["angular_error_deg_vs_true_mean"]
    o = old["summary"]["fn"]["angular_error_deg_vs_true_mean"]
    import sys
    print(f"fn mean angular (same family): old {o:.2f} -> new {n:.2f}",
          file=sys.stderr)
    print("yes" if (n <= 25.0 or n < o - 1.0) else "no")
except Exception as e:
    import sys
    print(f"promote check failed: {e}", file=sys.stderr)
    print("no")
EOF
)
else
    echo "no fn_r5 checkpoint — skip eval"
    FNWIN=no
fi
if [ "$FNWIN" = "yes" ]; then
    cp out/fn_r5/model_best.pt out/release/fn/model_best.pt
    echo "PROMOTED out/fn_r5 -> out/release/fn"
else
    echo "no fn promotion (FNWIN=$FNWIN)"
fi

echo "=== [4/8] sc_r5 retrain (sharp family, warm start) $(date) ==="
mkdir -p out/sc_r5
[ -f out/sc_r5/model_best.pt ] || cp out/release/sc/model_best.pt out/sc_r5/
for attempt in 1 2 3 4; do
    NOW=$(date +%s)
    [ $((SC_DEADLINE - NOW)) -lt 900 ] && { echo "sc window too small"; break; }
    echo "--- sc trainer attempt $attempt $(date) ---"
    train_boxed "$SC_DEADLINE" out/sc_r5 trainsc.py configs/sc_r5.yaml \
        --max-iterations 16000 && break
done

echo "=== [4b] sc eval + promote $(date) ==="
mkdir -p out/r5w/sc
if [ -f out/sc_r5/model_best.pt ]; then
    cp out/sc_r5/model_best.pt out/r5w/sc/
    for attempt in 1 2; do
        timeout 1500 python scripts/eval_synth_quality.py --models sc \
            --weights out/r5w \
            --json-out out/metrics/synth_quality_sc_r5.json && break
        echo "--- sc eval retry $(date) ---"
    done
    for attempt in 1 2; do
        timeout 1500 python scripts/eval_synth_quality.py --models sc \
            --weights out/release \
            --json-out out/metrics/synth_quality_sc_release_r5family.json \
            && break
        echo "--- sc release-eval retry $(date) ---"
    done
    # promotion needs the candidate's OOF behavior (the r4 weakness):
    # a quick N=256,512 OOF sweep with the candidate weights
    mkdir -p out/r5w/fn out/r5w/fd
    cp out/release/fn/model_best.pt out/r5w/fn/ 2>/dev/null
    cp out/release/fd/model_best.pt out/r5w/fd/ 2>/dev/null
    timeout 2400 python scripts/quality_sweep.py \
        --meshes out/oof/meshes/oof --n-meshes 8 --mode sc \
        --refine-steps 2 --sizes 256,512 --weights out/r5w \
        --work out/oof/qual_r5promo \
        --json-out out/metrics/quality_oof_scr5_promo.json
    SCWIN=$(python - <<'EOF'
import json, sys
try:
    cand = json.load(open("out/metrics/quality_oof_scr5_promo.json"))
    prev = json.load(open("out/metrics/quality_oof_sc_it2.json"))
    nc = cand["per_size"]["256"]
    np_ = prev["per_size"]["256"]
    c_p2m = nc["p2m"]["mean"]
    p_p2m = np_["p2m"]["mean"]
    c_fs = nc["upsampled"]["fscore@1e-2"]
    p_fs = np_["upsampled"]["fscore@1e-2"]
    new = json.load(open("out/metrics/synth_quality_sc_r5.json"))
    old = json.load(open("out/metrics/synth_quality_sc_release_r5family.json"))
    na = new["summary"]["sc"]["angular_error_deg_vs_true_mean"]
    oa = old["summary"]["sc"]["angular_error_deg_vs_true_mean"]
    print(f"OOF256 p2m {p_p2m:.4f}->{c_p2m:.4f}  fscore {p_fs:.4f}->{c_fs:.4f}"
          f"  in-family ang {oa:.2f}->{na:.2f}", file=sys.stderr)
    ok = (c_p2m < p_p2m) and (c_fs >= p_fs) and (na < oa + 1.5)
    print("yes" if ok else "no")
except Exception as e:
    print(f"sc promote check failed: {e}", file=sys.stderr)
    print("no")
EOF
)
else
    echo "no sc_r5 checkpoint — skip eval"
    SCWIN=no
fi
if [ "$SCWIN" = "yes" ]; then
    cp out/sc_r5/model_best.pt out/release/sc/model_best.pt
    echo "PROMOTED out/sc_r5 -> out/release/sc"
else
    echo "no sc promotion (SCWIN=$SCWIN)"
fi

echo "=== [5/8] gate-critical in-family sweeps $(date) ==="
[ "$(remain)" -gt 1200 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --mode sc --refine-steps 2 \
    --json-out out/metrics/quality_sc_it2.json
[ "$(remain)" -gt 1200 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --mode sc \
    --json-out out/metrics/quality_sc.json
[ "$(remain)" -gt 1200 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --mode product --refine-steps 2 \
    --json-out out/metrics/quality_product_it2.json
[ "$(remain)" -gt 1200 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --mode fast \
    --json-out out/metrics/quality_fast.json
echo "--- gate ---"
timeout 120 python scripts/quality_gate.py --modes sc,sc_it2,fast,product_it2 \
    || echo "GATE FAILED (see quality_gate.json)"

echo "=== [6/8] OOF refresh + exact partial re-gate $(date) ==="
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --meshes out/oof/meshes/oof \
    --n-meshes 8 --mode sc --refine-steps 2 --work out/oof/quality \
    --json-out out/metrics/quality_oof_sc_it2.json
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --meshes out/oof/meshes/oof \
    --n-meshes 8 --mode product --refine-steps 2 --work out/oof/quality \
    --json-out out/metrics/quality_oof_product.json
if [ "$FNWIN" = "yes" ] && [ "$(remain)" -gt 2400 ]; then
    timeout $(($(remain) - 600)) python scripts/quality_sweep.py \
        --mode exact --sizes 256,512 --work out/quality_fnr5 \
        --json-out out/metrics/quality_exact_fnr5_partial.json
fi

echo "=== [7/8] oof2 + scan-robustness $(date) ==="
python scripts/make_oof_meshes.py --gen 2 --out out/oof/meshes/oof2
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --meshes out/oof/meshes/oof2 \
    --n-meshes 8 --mode sc --refine-steps 2 --work out/oof2/quality \
    --json-out out/metrics/quality_oof2_sc_it2.json
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --mode sc --refine-steps 2 \
    --perturb scan --work out/scan/quality \
    --json-out out/metrics/quality_scan_sc_it2.json

echo "=== [8/8] exact OOF at sparse sizes $(date) ==="
for SZ in 256 512 1024; do
    [ "$(remain)" -lt 1800 ] && { echo "skip exact OOF $SZ"; break; }
    OOF_SIZE=$SZ bash scripts/run_oof_exact_perfile.sh
done
python scripts/merge_oof_exact.py 2>/dev/null || true

echo "=== chain done $(date), $(remain)s to hard stop ==="
