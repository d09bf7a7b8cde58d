#!/usr/bin/env python
"""Benchmark: upsampled points/sec at 4x scale on one chip.

Runs the full inference pipeline (seed generation + fused
patch->fn->rotate->fd->move refine + outlier filter) on a 2048-point cloud
with the flagship (effective-hyperparameter) models and random weights
(same FLOPs as trained weights), then reports steady-state throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the per-chip share of the north-star
target (10M pts/s on v5e-8 -> 1.25M pts/s/chip, BASELINE.json).
Refine-only throughput goes to stderr so round deltas are attributable.

Env: BENCH_BATCH (default 1024 — the tuned refine chunk), BENCH_DTYPE
(default bfloat16), BENCH_REPS, BENCH_MODE (exact|fast).
"""
import json
import sys
import time

import numpy as np

BASELINE_PER_CHIP = 10e6 / 8  # north-star 10M pts/s on v5e-8


def main():
    import jax

    from sapcu_tpu.generate import Upsampler
    from sapcu_tpu.utils import load_config, get_model

    fn_bundle = get_model(load_config("configs/fn.yaml"), "fn")
    fd_bundle = get_model(load_config("configs/fd.yaml"), "fd")

    import os
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    mode = os.environ.get("BENCH_MODE", "fast")
    up = Upsampler(fn_bundle, fd_bundle, batch_size=batch,
                   compute_dtype=dtype, mode=mode)

    rng = np.random.default_rng(0)
    v = rng.normal(size=(2048, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cloud = (v * 0.42).astype(np.float32)

    # warmup: compiles seed kernel, refine chunk, outlier kernel. The
    # pipeline is device-resident; only point COUNTS cross the (slow stdio-
    # relayed) tunnel, so timings measure device throughput.
    t0 = time.time()
    pts, n = up.upsample_device(cloud)
    pts.block_until_ready()
    warm = time.time() - t0
    print(f"# warmup: {n} pts in {warm:.1f}s", file=sys.stderr)

    # refine-only throughput (seeds held fixed, the dominant stage)
    import jax.numpy as jnp
    from sapcu_tpu.ops import seeds as seeds_mod
    seed_pts, n_seeds = seeds_mod.generate_seeds_device(cloud, cell=0.004)
    t0 = time.time()
    rpts, rn = up.refine_device(cloud, seed_pts, n_seeds)
    rpts.block_until_ready()
    t_refine = time.time() - t0
    print(f"# refine-only: {n_seeds} seeds in {t_refine:.2f}s = "
          f"{n_seeds / t_refine:.0f} seeds/s", file=sys.stderr)

    # steady state: time full pipeline end-to-end (seeds + refine + filter).
    # Reps rotate the SAME cloud (fixed seed-count bucket -> no recompiles;
    # rotation shifts the voxel grid so the work is not cached).
    reps = int(os.environ.get("BENCH_REPS", 1))
    t0 = time.time()
    n_out = 0
    for i in range(1, reps + 1):
        rot = np.float32([[np.cos(i), -np.sin(i), 0],
                          [np.sin(i), np.cos(i), 0], [0, 0, 1]])
        pts, n = up.upsample_device(cloud @ rot.T)
        pts.block_until_ready()
        n_out += n
    dt = time.time() - t0
    pts_per_sec = n_out / dt

    print(json.dumps({
        "metric": "upsampled_points_per_sec_per_chip_4x",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
