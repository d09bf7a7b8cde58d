#!/usr/bin/env python
"""PCA ground-truth normals for .xyz clouds.

Rebuild of scripts/generate_gt_normals.py:33-51: per cloud, the normal is
the smallest-eigenvalue eigenvector of each point's kNN covariance —
computed as ONE batched eigh on the accelerator (sapcu_tpu.ops.pca_normals)
instead of a per-point Python loop. Saves <name>.npz {points, normals}.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.ops import pca_normals  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--k", type=int, default=30)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(args.input_dir)
                   if f.endswith(".xyz"))
    for i, f in enumerate(files):
        pts = np.loadtxt(os.path.join(args.input_dir, f))[:, :3]
        pts = pts.astype(np.float32)
        normals = np.asarray(pca_normals(jnp.asarray(pts), k=args.k))
        name = os.path.splitext(f)[0]
        np.savez(os.path.join(args.output_dir, f"{name}.npz"),
                 points=pts, normals=normals)
        print(f"[{i + 1}/{len(files)}] {f}: {pts.shape[0]} normals")


if __name__ == "__main__":
    main()
