#!/usr/bin/env python
"""Per-stage timing for the sc (shared-cloud) serving mode.

Where do the seconds of an sc-mode cloud go? Times: seed generation,
sc_encode (once per cloud), one head tile, the full sc_refine dispatch
(pad tiles skipped via n_valid), outlier mask, compaction — each synced
by pulling a 4-byte scalar (block_until_ready is a no-op under the axon
tunnel, CLAUDE.md).

Env: STAGE_DTYPE (default bfloat16), STAGE_REPS (default 3),
STAGE_WEIGHTS (default out/release).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from sapcu_tpu.utils import apply_platform_env, load_config, get_model
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.models import sc_model as scm
    from sapcu_tpu.ops import seeds as seeds_mod

    dtype = os.environ.get("STAGE_DTYPE", "bfloat16")
    reps = int(os.environ.get("STAGE_REPS", 3))
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    print(f"# backend={jax.default_backend()} dtype={dtype}", flush=True)

    def sync(out):
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:4]))

    def timeit(label, fn):
        t0 = time.time()
        out = fn()
        sync(out)
        first = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        sync(out)
        steady = (time.time() - t0) / reps
        print(f"{label:24s} first={first:8.2f}s steady={steady * 1e3:9.1f}ms",
              flush=True)
        return out, steady

    sc_bundle = get_model(load_config("configs/sc.yaml"), "sc")
    weights = os.environ.get("STAGE_WEIGHTS", "out/release")
    if os.path.exists(os.path.join(weights, "sc", "model_best.pt")):
        from sapcu_tpu.utils.checkpoint import load_model_weights
        sc_bundle = load_model_weights(sc_bundle, weights, "sc")
        print(f"# weights: trained ({weights})", flush=True)
    sc_params, sc_state, sc_cfg = sc_bundle
    cfg_s = tuple(sorted(sc_cfg.items()))

    rng = np.random.default_rng(0)
    v = rng.normal(size=(2048, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cloud = jnp.asarray((v * 0.42).astype(np.float32))

    (seed_pts, n_seeds), t_seeds = timeit(
        "seeds", lambda: seeds_mod.generate_seeds_device(cloud, cell=0.004))
    n = int(n_seeds)
    cap = seed_pts.shape[0]
    print(f"# seeds: {n} (cap {cap})", flush=True)

    # encode once
    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, tree)
    p_c, s_c = (cast(sc_params), cast(sc_state)) if dtype == "bfloat16" \
        else (sc_params, sc_state)

    @jax.jit
    def enc(p, s, c):
        f, _ = scm.sc_encode(p, s, c, sc_cfg, training=False)
        return f
    feats, t_enc = timeit("sc_encode",
                          lambda: enc(p_c, s_c, cloud[None].astype(cdt)))

    # one head tile [8192 seeds]
    tile = seed_pts[:8192]

    @jax.jit
    def head(p, f, c, t):
        nrm, d = scm.sc_head(p, f, c, t[None].astype(cdt), sc_cfg,
                             training=False)
        return t + nrm[0] * d[0][:, None]
    _, t_tile = timeit("sc_head_tile_8192",
                       lambda: head(p_c, feats, cloud[None].astype(cdt),
                                    tile))

    # full sc_refine (pad tiles skipped)
    _, t_ref = timeit(
        "sc_refine_full",
        lambda: pl.sc_refine(sc_params, sc_state, cloud, seed_pts,
                             jnp.int32(n), cfg_s, min(8192, cap), dtype))
    # and with pads force-evaluated, to measure the skip's win
    _, t_ref_pad = timeit(
        "sc_refine_all_tiles",
        lambda: pl.sc_refine(sc_params, sc_state, cloud, seed_pts,
                             jnp.int32(cap), cfg_s, min(8192, cap), dtype))

    valid = jnp.arange(cap) < n
    moved = jnp.where(valid[:, None], seed_pts, 1e3)
    _, t_out = timeit(
        "outlier_mask(approx)",
        lambda: pl._outlier_mask(moved, valid, jnp.float32(1.5),
                                 approx=True))
    mask = pl._outlier_mask(moved, valid, jnp.float32(1.5), approx=True)
    _, t_cmp = timeit("compact", lambda: pl._compact(moved, mask, cap))

    total = t_seeds + t_ref + t_out + t_cmp
    print(f"# e2e-modelled: seeds {t_seeds:.2f} + refine {t_ref:.2f} + "
          f"outlier {t_out:.2f} + compact {t_cmp:.2f} = {total:.2f}s "
          f"-> {n / total:.0f} pts/s", flush=True)
    print(f"# head tiles used {-(-n // 8192)}/{cap // 8192}; "
          f"tile rate {8192 / t_tile:.0f} seeds/s", flush=True)


if __name__ == "__main__":
    main()
