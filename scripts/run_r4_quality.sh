#!/bin/bash
# Round-4 quality evidence chain (VERDICT r3 missing #1 / next #2, #3):
#   1. sparse-input multipass eval (sc, passes=2, N=256/512, in-family)
#   2. out-of-family sweeps: sc + fast over 8 hard meshes x 4 sizes
#   3. out-of-family exact at the flagship density (N=2048)
# Each stage alternates a TPU generate subprocess with CPU metric
# subprocesses (never concurrently — the 1-core host wedges live TPU
# clients, CLAUDE.md). Launch detached:
#   setsid nohup bash scripts/run_r4_quality.sh > /tmp/r4_quality.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

echo "=== [1/5] sc multipass sparse (in-family) $(date) ==="
python scripts/quality_sweep.py --mode sc --passes 2 --sizes 256,512 \
    --json-out out/metrics/quality_sc_p2.json

echo "=== [2/5] sc single-pass OOF $(date) ==="
python scripts/quality_sweep.py --meshes out/oof/meshes/oof --n-meshes 8 \
    --mode sc --work out/oof/quality \
    --json-out out/metrics/quality_oof_sc.json

echo "=== [3/5] fast OOF $(date) ==="
python scripts/quality_sweep.py --meshes out/oof/meshes/oof --n-meshes 8 \
    --mode fast --work out/oof/quality \
    --json-out out/metrics/quality_oof_fast.json

echo "=== [4/5] sc multipass sparse OOF $(date) ==="
python scripts/quality_sweep.py --meshes out/oof/meshes/oof --n-meshes 8 \
    --mode sc --passes 2 --sizes 256,512 --work out/oof/quality \
    --json-out out/metrics/quality_oof_sc_p2.json

echo "=== [5/5] exact OOF at N=2048 $(date) ==="
python scripts/quality_sweep.py --meshes out/oof/meshes/oof --n-meshes 8 \
    --mode exact --sizes 2048 --work out/oof/quality \
    --json-out out/metrics/quality_oof_exact.json

echo "=== done $(date) ==="
