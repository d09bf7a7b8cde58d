#!/bin/bash
# Round-4 quality chain, part 2 (after the iterated-distance-step
# commit): measure refine_steps=2 in- and out-of-family, then rerun the
# exact OOF stage that died with a TPU worker crash mid-run.
# Stages alternate one TPU generate subprocess with CPU metric
# subprocesses (never concurrently — 1-core host wedges live TPU
# clients, CLAUDE.md). Launch detached:
#   setsid nohup bash scripts/run_r4_quality2.sh > /tmp/r4_quality2.log 2>&1 &
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_quality2.pid   # self-record: the launcher's $! is the
                                 # setsid wrapper, which exits at once

echo "=== [1/3] sc refine_steps=2 in-family, all sizes $(date) ==="
python scripts/quality_sweep.py --mode sc --refine-steps 2 \
    --json-out out/metrics/quality_sc_it2.json

echo "=== [2/3] sc refine_steps=2 OOF, all sizes $(date) ==="
python scripts/quality_sweep.py --meshes out/oof/meshes/oof --n-meshes 8 \
    --mode sc --refine-steps 2 --work out/oof/quality \
    --json-out out/metrics/quality_oof_sc_it2.json

echo "=== [3/3] exact OOF at N=2048 (crash rerun) $(date) ==="
python scripts/quality_sweep.py --meshes out/oof/meshes/oof --n-meshes 8 \
    --mode exact --sizes 2048 --work out/oof/quality \
    --json-out out/metrics/quality_oof_exact.json

echo "=== done $(date) ==="
