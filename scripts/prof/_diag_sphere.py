import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))  # repo root
"""Which serving mode is off-surface? (scratch diagnostic)

Gate sphere-2048: all input points lie exactly on a sphere, so the
TRUE surface residual of each mode's output is | ||p|| - r |.
"""
import time
import numpy as np

from sapcu_tpu.utils import apply_platform_env, load_config, get_model
apply_platform_env()
import jax.numpy as jnp

from sapcu_tpu.generate import Upsampler
from sapcu_tpu.utils.checkpoint import load_model_weights


def make_sphere(n, rng):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v - v.mean(axis=0)
    pts = pts / (2.0 * np.abs(pts).max()) * 0.84
    return pts.astype(np.float32)


rng = np.random.default_rng(0)
cloud = make_sphere(2048, rng)
center = cloud.mean(axis=0)
r = float(np.linalg.norm(cloud - center, axis=1).mean())
print(f"r_true={r:.6f}", flush=True)

fn_b = load_model_weights(get_model(load_config("configs/fn.yaml"), "fn"),
                          "out/release", "fn")
fd_b = load_model_weights(get_model(load_config("configs/fd.yaml"), "fd"),
                          "out/release", "fd")
sc_b = load_model_weights(get_model(load_config("configs/sc.yaml"), "sc"),
                          "out/release", "sc")

kw = dict(batch_size=1024, compute_dtype="bfloat16")
ups = {
    "sc": Upsampler(fn_b, fd_b, mode="sc", sc_bundle=sc_b, **kw),
    "fast": Upsampler(fn_b, fd_b, mode="fast", probe_factor=8.0, **kw),
    "exact": Upsampler(fn_b, fd_b, **kw),
}

cj = jnp.asarray(center)
for mode, up in ups.items():
    t0 = time.time()
    pts, nv = up.upsample_device(cloud)
    res = jnp.abs(jnp.linalg.norm(pts[:nv] - cj, axis=1) - r)
    mean = float(jnp.mean(res))
    p95 = float(jnp.quantile(res, 0.95))
    p999 = float(jnp.quantile(res, 0.999))
    mx = float(jnp.max(res))
    print(f"{mode}: n={nv} mean={mean:.6f} p95={p95:.6f} "
          f"p99.9={p999:.6f} max={mx:.6f} ({time.time()-t0:.1f}s)",
          flush=True)

# raw seed residuals for scale (band is 0.011-0.015)
from sapcu_tpu.ops import seeds as S
sp, ns = S.generate_seeds_device(cloud, cell=0.004)
res = jnp.abs(jnp.linalg.norm(sp[:ns] - cj, axis=1) - r)
print(f"seeds: n={ns} mean={float(jnp.mean(res)):.6f} "
      f"max={float(jnp.max(res)):.6f}", flush=True)
