import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np, time
from sapcu_tpu.utils import apply_platform_env, load_config, get_model
apply_platform_env()
import jax, jax.numpy as jnp
from sapcu_tpu.utils.checkpoint import load_model_weights
from sapcu_tpu.generate import Upsampler
from sapcu_tpu.ops import seeds as seeds_mod

fn = load_model_weights(get_model(load_config("configs/fn.yaml"), "fn"), "out/release", "fn")
fd = load_model_weights(get_model(load_config("configs/fd.yaml"), "fd"), "out/release", "fd")
sc = load_model_weights(get_model(load_config("configs/sc.yaml"), "sc"), "out/release", "sc")
up = Upsampler(fn, fd, batch_size=1024, compute_dtype="bfloat16", mode="sc", sc_bundle=sc)

for N in (256, 512):
    rng = np.random.default_rng(3)
    v = rng.normal(size=(N,3)); v /= np.linalg.norm(v,axis=1,keepdims=True)
    cloud = jnp.asarray((v*0.42).astype(np.float32))
    seed_pts, n = seeds_mod.generate_seeds_device(cloud, cell=up.dense_spacing, chunk=up.seed_chunk)
    cap = seed_pts.shape[0]
    valid = jnp.arange(cap) < n

    def resid(pts):
        r = jnp.abs(jnp.linalg.norm(pts.astype(jnp.float32), axis=-1) - 0.42)
        return float(jnp.sum(jnp.where(valid, r, 0.0)) / n), float(jnp.max(jnp.where(valid, r, 0.0)))

    print(f"N={N} seeds={n} seed_resid mean/max:", *["%.5f"%x for x in resid(seed_pts)])
    pts = seed_pts
    for step in range(1, 4):
        t0=time.time()
        pts = up._sc_moved(cloud, pts, n)
        m, mx = resid(pts)
        print(f"  step {step}: resid mean {m:.5f} max {mx:.5f}  ({time.time()-t0:.1f}s)")
