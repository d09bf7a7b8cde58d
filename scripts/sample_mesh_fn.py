#!/usr/bin/env python
"""fn ground-truth sampler: self-supervised pseudo-normal labels.

Rebuild of scripts/sample_mesh-fn.py:95-173: per mesh —
1. sample ``n_surface`` even surface points;
2. build query points near the surface: coarse voxel centers (step
   ``coarse``) refined on a fine grid (step ``fine``) around occupied
   coarse cells, plus jitter noise;
3. keep queries whose 1-NN surface distance lies in [d_lo, d_hi];
4. pseudo-normal label = normalize(mean(10-NN) - query) — the
   self-supervised normal (no mesh normals needed);
5. save {points, pointing} npz per mesh.

The heavy kNN runs on the accelerator (sapcu_tpu.ops.knn_tiled).
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.data.mesh import load_off, sample_surface  # noqa: E402
from sapcu_tpu.ops import knn_tiled  # noqa: E402


def candidate_queries(points, coarse=0.05, fine=0.005, noise=0.002, rng=None):
    """Two-level voxel candidates around the surface."""
    rng = rng or np.random.default_rng(0)
    occ = np.unique(np.floor(points / coarse).astype(np.int64), axis=0)
    sub = np.stack(np.meshgrid(*([np.arange(int(coarse / fine))] * 3),
                               indexing="ij"), -1).reshape(-1, 3)
    centers = (occ[:, None, :] * coarse + (sub[None, :, :] + 0.5) * fine)
    centers = centers.reshape(-1, 3).astype(np.float32)
    return centers + rng.normal(0, noise, centers.shape).astype(np.float32)


def process_mesh(path, out_dir, n_surface, d_lo, d_hi, rng,
                 coarse=0.05, fine=0.005):
    verts, faces = load_off(path)
    verts = verts - verts.mean(axis=0)
    scale = np.abs(verts).max()
    if scale > 0:
        verts = verts / (2 * scale)  # fit in [-0.5, 0.5]^3
    surf, _ = sample_surface(verts, faces, n_surface, rng)

    queries = candidate_queries(surf, coarse=coarse, fine=fine, rng=rng)
    d, _ = knn_tiled(jnp.asarray(queries), jnp.asarray(surf), k=1, chunk=8192)
    d = np.sqrt(np.maximum(np.asarray(d)[:, 0], 0))
    keep = (d >= d_lo) & (d <= d_hi)
    queries = queries[keep]
    if queries.shape[0] == 0:
        return 0

    _, idx = knn_tiled(jnp.asarray(queries), jnp.asarray(surf), k=10,
                       chunk=8192)
    nbr_mean = surf[np.asarray(idx)].mean(axis=1)
    pointing = nbr_mean - queries
    pointing /= np.maximum(np.linalg.norm(pointing, axis=1, keepdims=True),
                           1e-12)

    name = os.path.splitext(os.path.basename(path))[0]
    np.savez(os.path.join(out_dir, f"{name}_fn.npz"),
             points=queries.astype(np.float32),
             pointing=pointing.astype(np.float32))
    return queries.shape[0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh-dir", required=True, help="dir of .off meshes")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-surface", type=int, default=800000)
    p.add_argument("--d-lo", type=float, default=0.003)
    p.add_argument("--d-hi", type=float, default=0.03)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--coarse", type=float, default=0.05,
                   help="coarse voxel step (sample_mesh-fn.py: 0.05)")
    p.add_argument("--fine", type=float, default=0.005,
                   help="fine voxel step (reference: 0.005); coarser = "
                        "fewer candidates, e.g. 0.01 for quick runs")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    files = sorted(glob.glob(os.path.join(args.mesh_dir, "**", "*.off"),
                             recursive=True))
    for i, f in enumerate(files):
        n = process_mesh(f, args.out_dir, args.n_surface, args.d_lo,
                         args.d_hi, rng, coarse=args.coarse, fine=args.fine)
        print(f"[{i + 1}/{len(files)}] {os.path.basename(f)}: {n} labels")


if __name__ == "__main__":
    main()
