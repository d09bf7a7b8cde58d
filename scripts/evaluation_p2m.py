#!/usr/bin/env python
"""Point-to-mesh distance evaluation (CGAL evaluation.cpp replacement).

Rebuild of the vendored CGAL evaluator
(external/Meta-PU_evaluation/evaluation_code/evaluation.cpp:120-283 and the
SPU-PMD 40-thread variant): for each predicted point, the exact distance to
the closest triangle of the ground-truth mesh — computed as a tiled dense
closest-point-on-triangle pass on the accelerator instead of an AABB tree
with pthreads. Reports mean/std/max per cloud and aggregate, plus the
distance-threshold percentages the CGAL tool prints.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.data.mesh import load_off  # noqa: E402
from sapcu_tpu.ops import point_triangle_closest  # noqa: E402


@functools.partial(jax.jit, static_argnames=("chunk",))
def point_to_mesh(points, v0, v1, v2, chunk: int = 512):
    """[Q, 3] points vs [F, 3] triangle vertices -> [Q] distances."""
    q = points.shape[0]
    pad = (-q) % chunk
    p = jnp.pad(points, ((0, pad), (0, 0)))

    def one(tile):
        cp = point_triangle_closest(v0[None], v1[None], v2[None],
                                    tile[:, None, :])
        d = jnp.sum((cp - tile[:, None, :]) ** 2, axis=-1)
        return jnp.sqrt(jnp.maximum(jnp.min(d, axis=-1), 0.0))

    return jax.lax.map(one, p.reshape(-1, chunk, 3)).reshape(-1)[:q]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True, help=".xyz predictions")
    p.add_argument("--mesh-dir", required=True, help=".off GT meshes")
    p.add_argument("--json-out", default="out/metrics/p2m.json")
    args = p.parse_args()

    files = sorted(f for f in os.listdir(args.pred_dir) if f.endswith(".xyz"))
    per_file, all_d = {}, []
    for f in files:
        mesh_path = os.path.join(args.mesh_dir,
                                 os.path.splitext(f)[0] + ".off")
        if not os.path.exists(mesh_path):
            print(f"skip {f}: no mesh")
            continue
        pts = np.loadtxt(os.path.join(args.pred_dir, f))[:, :3].astype(np.float32)
        verts, faces = load_off(mesh_path)
        d = np.asarray(point_to_mesh(
            jnp.asarray(pts), jnp.asarray(verts[faces[:, 0]]),
            jnp.asarray(verts[faces[:, 1]]), jnp.asarray(verts[faces[:, 2]])))
        per_file[f] = {"mean": float(d.mean()), "std": float(d.std()),
                       "max": float(d.max())}
        all_d.append(d)
        print(f"{f}: mean={d.mean():.6f} std={d.std():.6f} max={d.max():.6f}")

    if not all_d:
        print("nothing evaluated")
        return
    all_d = np.hstack(all_d)
    summary = {"mean": float(all_d.mean()), "std": float(all_d.std()),
               "max": float(all_d.max())}
    for tau in (5e-3, 1e-2, 2e-2):
        summary[f"pct_within_{tau}"] = float(np.mean(all_d <= tau))
    print("summary:", summary)
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as fh:
        json.dump({"summary": summary, "per_file": per_file}, fh, indent=2)


if __name__ == "__main__":
    main()
