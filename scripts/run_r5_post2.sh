#!/bin/bash
# Round-5 post-chain window #2 (after run_r5_resume.sh): the triangle-fan
# product seeding landed mid-chain (commit 458194e), so stage 5's
# in-family product sweep + gate measured the OLD chord seeding. Re-run
# them, then the diagnostics and bench the resume chain's guards may have
# skipped. Value-ordered; single TPU client at a time (CLAUDE.md).
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_post2.pid

HARD_STOP=${R5_HARD_STOP:?epoch seconds}
remain() { echo $((HARD_STOP - $(date +%s))); }

echo "=== [1] in-family product_it2 re-sweep (triangle seeding) $(date) ==="
for attempt in 1 2; do
    timeout 2400 python scripts/quality_sweep.py --mode product \
        --refine-steps 2 --json-out out/metrics/quality_product_it2.json \
        && break
    echo "--- product sweep retry $(date) ---"
done

echo "=== [2] gate $(date) ==="
timeout 120 python scripts/quality_gate.py \
    --modes sc,sc_it2,fast,product_it2 \
    || echo "GATE FAILED (see quality_gate.json)"

echo "=== [3] bench x2 (warms product-batch; verify cache_new=0) $(date) ==="
[ "$(remain)" -gt 1200 ] && timeout 1100 python bench.py \
    | tee /tmp/bench_r5_a.json
[ "$(remain)" -gt 700 ] && timeout 600 python bench.py \
    | tee /tmp/bench_r5_b.json

echo "=== [4] fn information-floor diagnostic $(date) ==="
[ "$(remain)" -gt 1300 ] && timeout 1200 python scripts/eval_fn_floor.py \
    || echo "fn floor skipped/failed"

echo "=== [5] exact OOF 2048 rerun with the promoted fn $(date) ==="
# the r4 out_2048_exact outputs were generated with the r2 fn; clear so
# the per-file runner re-generates and the merged JSON is single-fn
if [ "$(remain)" -gt 2400 ]; then
    rm -rf out/oof/quality/out_2048_exact out/oof/quality/cd_2048_exact.json \
        out/oof/quality/p2m_2048_exact.json
    OOF_SIZE=2048 bash scripts/run_oof_exact_perfile.sh
    python scripts/merge_oof_exact.py
fi

echo "=== post2 done $(date), $(remain)s to hard stop ==="
