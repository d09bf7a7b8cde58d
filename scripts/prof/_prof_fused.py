import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))  # repo root
#!/usr/bin/env python
"""Fused vs classic sc serving path: wall time + output equality."""
import os
import time

import numpy as np

from sapcu_tpu.utils import apply_platform_env, load_config, get_model
apply_platform_env()
import jax.numpy as jnp
from sapcu_tpu.generate import Upsampler
from sapcu_tpu.utils.checkpoint import load_model_weights

fn_b = load_model_weights(get_model(load_config("configs/fn.yaml"), "fn"),
                          "out/release", "fn")
fd_b = load_model_weights(get_model(load_config("configs/fd.yaml"), "fd"),
                          "out/release", "fd")
sc_b = load_model_weights(get_model(load_config("configs/sc.yaml"), "sc"),
                          "out/release", "sc")
up = Upsampler(fn_b, fd_b, batch_size=1024, compute_dtype="bfloat16",
               mode="sc", sc_bundle=sc_b)

rng = np.random.default_rng(0)
v = rng.normal(size=(2048, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
base = (v * 0.42).astype(np.float32)

# warm both paths
os.environ["SAPCU_FUSED_PIPE"] = "1"
pts_f, n_f = up.upsample_device(base)
os.environ["SAPCU_FUSED_PIPE"] = "0"
pts_c, n_c = up.upsample_device(base)
same = bool(jnp.all(pts_f[:n_f] == pts_c[:n_c])) and n_f == n_c
print(f"# warm: fused n={n_f} classic n={n_c} identical={same}", flush=True)

for name, flag in (("classic", "0"), ("fused", "1"),
                   ("classic", "0"), ("fused", "1")):
    os.environ["SAPCU_FUSED_PIPE"] = flag
    ts = []
    for i in range(3):
        a = 1.0 + i + (7 if flag == "1" else 0)
        rot = np.float32([[np.cos(a), -np.sin(a), 0],
                          [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        t0 = time.time()
        pts, n = up.upsample_device(base @ rot.T)
        float(jnp.sum(pts.ravel()[:4]))
        ts.append((time.time() - t0, n))
    best = min(t for t, _ in ts)
    print(f"{name:8s} best={best*1e3:6.1f}ms -> {ts[-1][1]/best:9.0f} pts/s "
          f"(all: {[f'{t*1e3:.0f}' for t, _ in ts]})", flush=True)
