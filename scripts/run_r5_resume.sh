#!/bin/bash
# Round-5 RESUME chain: the VM restart at ~00:53 killed run_r5_main.sh
# mid-stage-4 (sc_r5 trainer SIGTERM'd at it=11.2k; best flushed).
# Stages 1-3 are done (exact_floor.json committed; fn_r5 trained,
# evaluated 23.1 deg, PROMOTED to out/release/fn). This chain:
#   [4a] finish sc_r5: one more warm-start cosine (cheap, ~10 min)
#   [4b] sc eval (new + release on the SAME r5 sharp family) + promote
#   [5]  gate-critical in-family sweeps (sc it1/it2, product it2, fast) + gate
#   [6]  OOF refresh (sc it2, product) + exact partial re-gate (fn moved)
#   [7]  gen-2 OOF meshes + scan-corruption robustness sweep
#   [8]  exact OOF at 256/512/1024 (per-file, crash-tolerant)
#   [9]  post: fn floor diagnostic + bench x2 (warms it2/product programs)
# Single TPU client at a time (1-core host, CLAUDE.md). Post-restart
# FAILED_PRECONDITION trap: every stage has timeout+retry.
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_resume.pid

HARD_STOP=${R5_HARD_STOP:?epoch seconds}
SC_DEADLINE=${R5_SC_DEADLINE:?epoch seconds}

remain() { echo $((HARD_STOP - $(date +%s))); }

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

echo "=== [4a] sc_r5 finish (fresh cosine over interrupted best) $(date) ==="
for attempt in 1 2 3; do
    NOW=$(date +%s)
    [ $((SC_DEADLINE - NOW)) -lt 600 ] && { echo "sc window too small"; break; }
    echo "--- sc trainer attempt $attempt $(date) ---"
    train_boxed "$SC_DEADLINE" out/sc_r5 trainsc.py configs/sc_r5.yaml \
        --max-iterations 16000 && break
done

echo "=== [4b] sc eval + promote $(date) ==="
mkdir -p out/r5w/sc out/r5w/fn out/r5w/fd
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
    cp out/release/fn/model_best.pt out/r5w/fn/ 2>/dev/null
    cp out/release/fd/model_best.pt out/r5w/fd/ 2>/dev/null
    for attempt in 1 2; do
        timeout 2400 python scripts/quality_sweep.py \
            --meshes out/oof/meshes/oof --n-meshes 8 --mode sc \
            --refine-steps 2 --sizes 256,512 --weights out/r5w \
            --work out/oof/qual_r5promo \
            --json-out out/metrics/quality_oof_scr5_promo.json && break
        echo "--- promo OOF sweep retry $(date) ---"
    done
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

echo "=== [5] gate-critical in-family sweeps $(date) ==="
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

echo "=== [6] OOF refresh + exact partial re-gate $(date) ==="
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --meshes out/oof/meshes/oof \
    --n-meshes 8 --mode sc --refine-steps 2 --work out/oof/quality \
    --json-out out/metrics/quality_oof_sc_it2.json
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --meshes out/oof/meshes/oof \
    --n-meshes 8 --mode product --refine-steps 2 --work out/oof/quality \
    --json-out out/metrics/quality_oof_product.json
# fn WAS promoted (stage 3 of run_r5_main.sh) — run the partial exact re-gate
if [ "$(remain)" -gt 2400 ]; then
    timeout $(($(remain) - 600)) python scripts/quality_sweep.py \
        --mode exact --sizes 256,512 --work out/quality_fnr5 \
        --json-out out/metrics/quality_exact_fnr5_partial.json
fi

echo "=== [7] oof2 + scan-robustness $(date) ==="
python scripts/make_oof_meshes.py --gen 2 --out out/oof/meshes/oof2
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --meshes out/oof/meshes/oof2 \
    --n-meshes 8 --mode sc --refine-steps 2 --work out/oof2/quality \
    --json-out out/metrics/quality_oof2_sc_it2.json
[ "$(remain)" -gt 2400 ] && timeout $(($(remain) - 600)) \
    python scripts/quality_sweep.py --mode sc --refine-steps 2 \
    --perturb scan --work out/scan/quality \
    --json-out out/metrics/quality_scan_sc_it2.json

echo "=== [8] exact OOF at sparse sizes $(date) ==="
for SZ in 256 512 1024; do
    [ "$(remain)" -lt 1800 ] && { echo "skip exact OOF $SZ"; break; }
    OOF_SIZE=$SZ bash scripts/run_oof_exact_perfile.sh
done
python scripts/merge_oof_exact.py 2>/dev/null || true

echo "=== [9] post: fn floor diagnostic + bench warm $(date) ==="
[ "$(remain)" -gt 2100 ] && timeout 1800 python scripts/eval_fn_floor.py \
    || echo "fn floor diagnostic skipped/failed"
[ "$(remain)" -gt 1000 ] && timeout 900 python bench.py | tee /tmp/bench_r5_a.json
[ "$(remain)" -gt 1000 ] && timeout 900 python bench.py | tee /tmp/bench_r5_b.json

echo "=== resume chain done $(date), $(remain)s to hard stop ==="
