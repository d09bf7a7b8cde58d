#!/bin/bash
# Crash-tolerant exact OOF run: one generate.py subprocess PER MESH so a
# TPU worker fault (seen once at N=2048 exact on the OOF set) costs one
# file, not the sweep. Metrics afterwards on CPU, then a merged JSON.
# Usage: bash scripts/run_oof_exact_perfile.sh
cd "$(dirname "$0")/.."
IN=out/oof/quality/in_2048
GT=out/oof/quality/gt_2048
OUT=out/oof/quality/out_2048_exact
mkdir -p "$OUT"

for f in "$IN"/*.xyz; do
    base=$(basename "$f")
    if [ -s "$OUT/$base" ]; then echo "skip $base (exists)"; continue; fi
    echo "=== exact $base $(date) ==="
    timeout 1200 python generate.py --input "$f" --output "$OUT/$base" \
        --ratio 4 --mode exact --batch-size 1024 --compute-dtype bfloat16 \
        --fn-config configs/fn_synth.yaml --fd-config configs/fd_synth.yaml \
        --sc-config configs/sc.yaml \
        --fn-dir out/release/fn --fd-dir out/release/fd --sc-dir out/release/sc \
        || echo "FAILED $base (continuing)"
done

echo "=== metrics $(date) ==="
JAX_PLATFORMS=cpu python scripts/evaluation_cd.py --pre_path "$OUT" \
    --gt_path "$GT" --json-out out/oof/quality/cd_2048_exact.json --emd
JAX_PLATFORMS=cpu python scripts/evaluation_p2m.py --pred-dir "$OUT" \
    --mesh-dir out/oof/meshes/oof \
    --json-out out/oof/quality/p2m_2048_exact.json
echo "=== done $(date) ==="
