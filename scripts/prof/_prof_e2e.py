#!/usr/bin/env python
"""Varied-input per-stage profile of the sc serving pipeline.

Rotates the cloud each rep (identical pure calls may be memoized
server-side under the axon tunnel — CLAUDE.md), syncs each stage by
pulling a 4-byte scalar, and mirrors refine_device's actual code path
(Morton-window outlier, compaction, host scalar pulls) so the stage sum
matches the bench e2e number.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np


def main():
    from sapcu_tpu.utils import apply_platform_env, load_config, get_model
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.generate import Upsampler
    from sapcu_tpu.ops import seeds as seeds_mod

    fn_b = get_model(load_config("configs/fn.yaml"), "fn")
    fd_b = get_model(load_config("configs/fd.yaml"), "fd")
    sc_b = get_model(load_config("configs/sc.yaml"), "sc")
    from sapcu_tpu.utils.checkpoint import load_model_weights
    if os.path.exists("out/release/fn/model_best.pt"):
        fn_b = load_model_weights(fn_b, "out/release", "fn")
        fd_b = load_model_weights(fd_b, "out/release", "fd")
        sc_b = load_model_weights(sc_b, "out/release", "sc")

    up = Upsampler(fn_b, fd_b, batch_size=1024, compute_dtype="bfloat16",
                   mode="sc", sc_bundle=sc_b)

    rng = np.random.default_rng(0)
    v = rng.normal(size=(2048, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    base = (v * 0.42).astype(np.float32)

    # warmup (cache-warm anyway)
    pts, n = up.upsample_device(base)
    pts.block_until_ready()
    float(jnp.sum(pts[:4]))
    print(f"# warm: n={n}", flush=True)

    reps = int(os.environ.get("PROF_REPS", 4))
    acc = {}
    for i in range(1, reps + 1):
        rot = np.float32([[np.cos(i), -np.sin(i), 0],
                          [np.sin(i), np.cos(i), 0], [0, 0, 1]])
        cloud = base @ rot.T

        t0 = time.time()
        cloud_j = jnp.asarray(cloud, jnp.float32)
        seed_pts, n_seeds = seeds_mod.generate_seeds_device(
            cloud_j, cell=up.dense_spacing, chunk=up.seed_chunk)
        n_host = int(n_seeds)  # the host sync the real pipeline pays
        t_seeds = time.time() - t0

        t0 = time.time()
        moved = up._sc_moved(cloud_j, seed_pts, n_host)
        float(jnp.sum(moved.ravel()[:4]))
        t_ref = time.time() - t0

        t0 = time.time()
        cap = pl._bucket(n_host)
        if moved.shape[0] < cap:
            moved2 = jnp.pad(moved, ((0, cap - moved.shape[0]), (0, 0)))
        else:
            moved2 = moved[:cap]
        valid = jnp.arange(cap) < n_host
        gran = max(8192, cap // 8)
        rcap = min(cap, -(-n_host // gran) * gran)
        keep = pl._outlier_mask_window(moved2[:rcap], valid[:rcap],
                                       up.outlier_threshold,
                                       4.0 * up.dense_spacing)
        if rcap < cap:
            keep = jnp.pad(keep, (0, cap - rcap))
        float(jnp.sum(keep.ravel()[:4]))
        t_out = time.time() - t0

        t0 = time.time()
        out, n_keep = pl._compact(moved2, keep, cap)
        nk = int(n_keep)  # host pull, as in refine_device
        t_cmp = time.time() - t0

        tot = t_seeds + t_ref + t_out + t_cmp
        print(f"rep{i}: seeds={t_seeds*1e3:6.1f}ms refine={t_ref*1e3:6.1f}ms "
              f"outlier={t_out*1e3:6.1f}ms compact+pull={t_cmp*1e3:6.1f}ms "
              f"tot={tot*1e3:6.1f}ms -> {nk/tot:8.0f} pts/s (n={nk})",
              flush=True)
        for k, val in (("seeds", t_seeds), ("refine", t_ref),
                       ("outlier", t_out), ("compact", t_cmp)):
            acc.setdefault(k, []).append(val)

    for k, vals in acc.items():
        print(f"# {k}: min={min(vals)*1e3:.1f}ms "
              f"med={sorted(vals)[len(vals)//2]*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
