#!/bin/bash
# Crash-tolerant exact OOF run: one generate.py subprocess PER MESH so a
# TPU worker fault (seen once at N=2048 exact on the OOF set) costs one
# file, not the sweep. Metrics afterwards on CPU, then a merged JSON.
# OOF_SIZE selects the input size (default 2048); round 5 runs 256/512/
# 1024 too (VERDICT r4 next #8 — sc-vs-exact OOF deltas at the sparse
# sizes where sc is weakest). Merge all sizes into
# out/metrics/quality_oof_exact.json with scripts/merge_oof_exact.py.
# Usage: OOF_SIZE=512 bash scripts/run_oof_exact_perfile.sh
cd "$(dirname "$0")/.."
SZ=${OOF_SIZE:-2048}
IN=out/oof/quality/in_$SZ
GT=out/oof/quality/gt_$SZ
OUT=out/oof/quality/out_${SZ}_exact
mkdir -p "$OUT"

for f in "$IN"/*.xyz; do
    base=$(basename "$f")
    if [ -s "$OUT/$base" ]; then echo "skip $base (exists)"; continue; fi
    echo "=== exact N=$SZ $base $(date) ==="
    timeout 1200 python generate.py --input "$f" --output "$OUT/$base" \
        --ratio 4 --mode exact --batch-size 1024 --compute-dtype bfloat16 \
        --refine-steps 1 \
        --fn-config configs/fn_synth.yaml --fd-config configs/fd_synth.yaml \
        --sc-config configs/sc.yaml \
        --fn-dir out/release/fn --fd-dir out/release/fd --sc-dir out/release/sc \
        || echo "FAILED $base (continuing)"
done

echo "=== metrics N=$SZ $(date) ==="
JAX_PLATFORMS=cpu python scripts/evaluation_cd.py --pre_path "$OUT" \
    --gt_path "$GT" --json-out out/oof/quality/cd_${SZ}_exact.json --emd
JAX_PLATFORMS=cpu python scripts/evaluation_p2m.py --pred-dir "$OUT" \
    --mesh-dir out/oof/meshes/oof \
    --json-out out/oof/quality/p2m_${SZ}_exact.json
echo "=== done N=$SZ $(date) ==="
