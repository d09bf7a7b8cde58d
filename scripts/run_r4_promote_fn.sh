#!/bin/bash
# Promote the round-4 analytic-label fn continuation to out/release and
# partially re-gate exact mode (fn normals rotate the fd patches, so a
# new fn changes exact/fast serving — VERDICT r3 next #4 "exact re-gated").
# Full exact re-sweep is ~230 s/cloud at N=2048 (weak #6); the partial
# re-gate covers the sparse sizes where normal quality matters most and
# finishes inside a session tail window. Run AFTER inspecting
# out/metrics/synth_quality_fn_r4.json (promote only on a clear win).
set -e
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_promote.pid

cp out/fn_r4/model_best.pt out/release/fn/model_best.pt
echo "promoted out/fn_r4/model_best.pt -> out/release/fn"

echo "=== exact partial re-sweep (N=256,512) with the new fn $(date) ==="
timeout 2400 python scripts/quality_sweep.py --mode exact --sizes 256,512 \
    --work out/quality_fnr4 \
    --json-out out/metrics/quality_exact_fnr4_partial.json

python - <<'EOF'
import json
new = json.load(open("out/metrics/quality_exact_fnr4_partial.json"))
old = json.load(open("out/metrics/quality_exact.json"))
for n in ("256", "512"):
    o, w = old["per_size"][n], new["per_size"][n]
    print(f"N={n}: exact CD old={o['upsampled']['cd']:.6f} "
          f"new={w['upsampled']['cd']:.6f}  "
          f"p2m old={o['p2m']['mean']:.6f} new={w['p2m']['mean']:.6f}")
EOF
echo "=== done $(date) ==="
