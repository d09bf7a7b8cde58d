#!/usr/bin/env python
"""Fast-mode quality gate: Chamfer proximity of fast vs exact outputs.

Runs the production Upsampler in both modes on synthetic PU1K-style
clouds (unit-sphere-normalized shapes at PU1K input sizes) with the
flagship models, and reports, per cloud:

- cd_fast_exact: symmetric Chamfer-L2 between the fast and exact outputs
- cd_exact_cloud: Chamfer-L2 between the exact output and the input
  cloud (the scale of real signal in the output)
- ratio = cd_fast_exact / cd_exact_cloud — the VERDICT r1 quality bar
  asks for fast within 1% of exact; tests/test_pipeline.py pins the
  same structure at tiny dims, this script measures it at flagship dims
  on real hardware.

Prints one JSON line per cloud plus a summary line. Env: FX_MODES
(default "exact,fast"), FX_PROBE_FACTOR (default 8.0), FX_SIZES
(default "2048"), FX_DTYPE (default bfloat16), FX_BATCH (default 1024).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_cloud(kind: str, n: int, rng) -> np.ndarray:
    if kind == "sphere":
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v
    elif kind == "torus":
        u = rng.uniform(0, 2 * np.pi, n)
        w = rng.uniform(0, 2 * np.pi, n)
        r, rr = 1.0, 0.4
        pts = np.stack([(r + rr * np.cos(w)) * np.cos(u),
                        (r + rr * np.cos(w)) * np.sin(u),
                        rr * np.sin(w)], axis=1)
    elif kind == "bumpy":
        # high-curvature probe-spacing stress: r = 1 + 0.1 sin6t sin6p
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        th = np.arccos(np.clip(v[:, 2], -1, 1))
        ph = np.arctan2(v[:, 1], v[:, 0])
        pts = v * (1.0 + 0.1 * np.sin(6 * th) * np.sin(6 * ph))[:, None]
    else:
        raise ValueError(kind)
    # bbox-normalize like generate.py:43-53 (fit in the unit box, margin)
    pts = pts - pts.mean(axis=0)
    pts = pts / (2.0 * np.abs(pts).max()) * 0.84
    return pts.astype(np.float32)


def main():
    import jax.numpy as jnp

    from sapcu_tpu.generate import Upsampler
    from sapcu_tpu.ops import metrics  # noqa: F401 (threshold variants)
    from sapcu_tpu.utils import load_config, get_model

    batch = int(os.environ.get("FX_BATCH", 1024))
    dtype = os.environ.get("FX_DTYPE", "bfloat16")
    pf = float(os.environ.get("FX_PROBE_FACTOR", 8.0))
    sizes = [int(s) for s in os.environ.get("FX_SIZES", "2048").split(",")]

    fn_bundle = get_model(load_config("configs/fn.yaml"), "fn")
    fd_bundle = get_model(load_config("configs/fd.yaml"), "fd")
    kw = dict(batch_size=batch, compute_dtype=dtype)
    ups = {
        "exact": Upsampler(fn_bundle, fd_bundle, **kw),
        "fast": Upsampler(fn_bundle, fd_bundle, mode="fast",
                          probe_factor=pf, **kw),
    }

    rng = np.random.default_rng(0)
    ratios = []
    for kind in ["sphere", "torus", "bumpy"]:
        for n in sizes:
            cloud = make_cloud(kind, n, rng)
            outs, times = {}, {}
            for mode, up in ups.items():
                t0 = time.time()
                pts, nv = up.upsample_device(cloud)
                pts = np.asarray(pts[:nv])
                times[mode] = time.time() - t0
                outs[mode] = pts
            from sapcu_tpu import ops as _ops

            def chamfer_big(a, b):
                # tiled 1-NN both ways: the outputs are 100k+ points, a
                # full pairwise matrix would need >100 GB
                ab, _ = _ops.knn_tiled(a, b, k=1, chunk=4096)
                ba, _ = _ops.knn_tiled(b, a, k=1, chunk=4096)
                return float(0.5 * jnp.mean(jnp.maximum(ab, 0.0))
                             + 0.5 * jnp.mean(jnp.maximum(ba, 0.0)))

            e = jnp.asarray(outs["exact"])
            f = jnp.asarray(outs["fast"])
            c = jnp.asarray(cloud)
            cd_fe = chamfer_big(f, e)
            cd_ec = chamfer_big(e, c)
            ratio = cd_fe / max(cd_ec, 1e-12)
            ratios.append(ratio)
            print(json.dumps({
                "cloud": f"{kind}-{n}", "n_exact": len(outs["exact"]),
                "n_fast": len(outs["fast"]), "cd_fast_exact": cd_fe,
                "cd_exact_cloud": cd_ec, "ratio": ratio,
                "t_exact_s": round(times["exact"], 2),
                "t_fast_s": round(times["fast"], 2),
            }), flush=True)
    print(json.dumps({"summary": "fast_vs_exact",
                      "probe_factor": pf,
                      "max_ratio": max(ratios),
                      "pass_1pct": max(ratios) <= 0.01}), flush=True)


if __name__ == "__main__":
    main()
