import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))  # repo root
"""Per-stage sc-mode profile on the real chip (scalar-pull syncing)."""
import time
import numpy as np

from sapcu_tpu.utils import apply_platform_env, load_config, get_model
apply_platform_env()
import jax
import jax.numpy as jnp

def sync(x):
    return float(jnp.sum(x if x.dtype != jnp.bool_ else x.astype(jnp.int32)))

from sapcu_tpu.generate import pipeline as P
from sapcu_tpu.ops import seeds as seeds_mod
from sapcu_tpu.utils.checkpoint import load_model_weights

fn_b = load_model_weights(get_model(load_config("configs/fn.yaml"), "fn"), "out/release", "fn")
fd_b = load_model_weights(get_model(load_config("configs/fd.yaml"), "fd"), "out/release", "fd")
sc_b = load_model_weights(get_model(load_config("configs/sc.yaml"), "sc"), "out/release", "sc")

up = P.Upsampler(fn_b, fd_b, batch_size=1024, compute_dtype="bfloat16",
                 mode="sc", sc_bundle=sc_b)

rng = np.random.default_rng(0)
v = rng.normal(size=(2048, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
cloud = jnp.asarray((v * 0.42).astype(np.float32))

# warm everything once
t0 = time.time()
pts, n = up.upsample_device(cloud)
sync(pts)
print(f"warm e2e (incl compile/load): {time.time()-t0:.1f}s n={n}", flush=True)

for rep in range(2):
    rot_a = 1.0 + rep
    rot = jnp.asarray(np.float32([[np.cos(rot_a), -np.sin(rot_a), 0],
                                  [np.sin(rot_a), np.cos(rot_a), 0], [0, 0, 1]]))
    c = cloud @ rot.T
    t0 = time.time()
    seed_pts, n_seeds = seeds_mod.generate_seeds_device(c, cell=0.004, chunk=8192)
    sync(seed_pts)
    t_seeds = time.time() - t0
    print(f"[rep {rep}] seeds: {t_seeds:.3f}s n_seeds={n_seeds} cap={seed_pts.shape[0]}", flush=True)

    t0 = time.time()
    moved = up._sc_moved(c, seed_pts, n_seeds)
    sync(moved)
    t_sc = time.time() - t0
    print(f"[rep {rep}] sc_refine: {t_sc:.3f}s", flush=True)

    cap = P._bucket(n_seeds)
    if moved.shape[0] < cap:
        moved = jnp.pad(moved, ((0, cap - moved.shape[0]), (0, 0)))
    else:
        moved = moved[:cap]
    valid = jnp.arange(cap) < n_seeds
    t0 = time.time()
    keep = P._outlier_mask_window(moved, valid, 1.5, 4.0 * up.dense_spacing)
    sync(keep)
    t_out = time.time() - t0
    print(f"[rep {rep}] outlier(window): {t_out:.3f}s cap={cap}", flush=True)

    t0 = time.time()
    out, n_keep = P._compact(moved, keep, cap)
    nk = int(n_keep)
    sync(out)
    t_cmp = time.time() - t0
    tot = t_seeds + t_sc + t_out + t_cmp
    print(f"[rep {rep}] compact: {t_cmp:.3f}s n_keep={nk}", flush=True)
    print(f"[rep {rep}] TOTAL {tot:.3f}s -> {nk/tot:.0f} pts/s", flush=True)
