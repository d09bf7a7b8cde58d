#!/usr/bin/env python
"""Per-stage inference timing: where do the seconds go?

Times each pipeline stage independently on the current backend (TPU under
axon, CPU with JAX_PLATFORMS=cpu): seed generation, fn forward, fd forward,
the fused refine_mega dispatch, outlier mask, compaction, FPS. Prints one
line per stage (compile time and steady-state time separated) so
round-over-round perf deltas are attributable.

Env: STAGE_BATCH (chunk, default 1024), STAGE_DTYPE (default bfloat16),
STAGE_REPS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(label, fn, reps):
    t0 = time.time()
    out = fn()
    jax_block(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax_block(out)
    steady = (time.time() - t0) / reps
    print(f"{label:28s} compile+1st={compile_s:8.2f}s  steady={steady * 1e3:10.1f}ms",
          flush=True)
    return out, steady


def jax_block(out):
    import jax
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.models import fn_model as fnm
    from sapcu_tpu.models import fd_model as fdm
    from sapcu_tpu.ops import seeds as seeds_mod
    from sapcu_tpu.utils import load_config, get_model

    batch = int(os.environ.get("STAGE_BATCH", 1024))
    dtype = os.environ.get("STAGE_DTYPE", "bfloat16")
    reps = int(os.environ.get("STAGE_REPS", 3))
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    print(f"# backend={jax.default_backend()} batch={batch} dtype={dtype}",
          flush=True)

    fn_params, fn_state, fn_cfg = get_model(load_config("configs/fn.yaml"), "fn")
    fd_params, fd_state, fd_cfg = get_model(load_config("configs/fd.yaml"), "fd")
    fn_cfg_s = tuple(sorted(fn_cfg.items()))
    fd_cfg_s = tuple(sorted(fd_cfg.items()))

    rng = np.random.default_rng(0)
    v = rng.normal(size=(2048, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cloud = jnp.asarray((v * 0.42).astype(np.float32))

    # --- stage 1: seed generation
    (seeds_pts, n_seeds), _ = timeit(
        "seeds", lambda: seeds_mod.generate_seeds_device(cloud, cell=0.004),
        reps)
    print(f"# seeds: {int(n_seeds)} (cap {seeds_pts.shape[0]})", flush=True)

    tile = seeds_pts[:batch]

    # --- patch extract (knn + gather)
    def patches():
        d = np.inf
        import sapcu_tpu.ops as ops
        d = ops.pairwise_sqdist(tile, cloud)
        _, idx = jax.lax.top_k(-d, 100)
        return cloud[idx] - tile[:, None, :]
    patch, _ = timeit("patch_extract", jax.jit(patches), reps)

    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, tree)

    fn_p, fn_s = (cast(fn_params), cast(fn_state)) if dtype == "bfloat16" \
        else (fn_params, fn_state)
    fd_p, fd_s = (cast(fd_params), cast(fd_state)) if dtype == "bfloat16" \
        else (fd_params, fd_state)
    patch_c = patch.astype(cdt)

    # --- fn forward alone
    @jax.jit
    def fn_fwd(p, s, x):
        out, _ = fnm.fn_apply(p, s, x, fn_cfg, training=False)
        return out
    normals, t_fn = timeit("fn_apply", lambda: fn_fwd(fn_p, fn_s, patch_c),
                           reps)

    # --- fd forward alone
    @jax.jit
    def fd_fwd(p, s, x):
        out, _, _ = fdm.fd_apply(p, s, x, fd_cfg, training=False)
        return out
    _, t_fd = timeit("fd_apply", lambda: fd_fwd(fd_p, fd_s, patch_c), reps)

    # --- fused refine chunk (one batch tile)
    def refine():
        return pl.refine_chunk(fn_params, fn_state, fd_params, fd_state,
                               cloud, tile, fn_cfg_s, fd_cfg_s, 100, dtype)
    _, t_refine = timeit("refine_chunk", refine, reps)

    # --- outlier + compact + fps on a bucket
    cap = 1 << 18
    pts = jnp.asarray(rng.normal(size=(cap, 3)).astype(np.float32) * 0.4)
    valid = jnp.arange(cap) < (cap - 1000)
    mask, _ = timeit(
        "outlier_mask",
        lambda: pl._outlier_mask(pts, valid, jnp.float32(1.5)), reps)
    timeit("compact", lambda: pl._compact(pts, mask, cap), reps)
    timeit("fps_8192",
           lambda: pl._fps_select(pts, jnp.int32(cap - 1000), 8192), reps)

    print(f"# fn: {batch / t_fn:.0f} seeds/s  fd: {batch / t_fd:.0f} seeds/s"
          f"  refine: {batch / t_refine:.0f} seeds/s", flush=True)


if __name__ == "__main__":
    main()
