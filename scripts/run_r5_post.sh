#!/bin/bash
# Round-5 post-chain device window: floor diagnostic + bench warm + verify.
# Serialized single TPU client at a time (CLAUDE.md: 1-core host).
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_post.pid

echo "=== [1/3] fn information-floor diagnostic $(date) ==="
timeout 1800 python scripts/eval_fn_floor.py \
    || echo "fn floor diagnostic failed"

echo "=== [2/3] bench (warms committed cache with it2+product programs) $(date) ==="
timeout 900 python bench.py | tee /tmp/bench_r5_a.json

echo "=== [3/3] bench verify (expect cache_new_programs=0, warm warmup) $(date) ==="
timeout 900 python bench.py | tee /tmp/bench_r5_b.json

echo "=== post chain done $(date) ==="
