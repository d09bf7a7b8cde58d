#!/usr/bin/env python
"""NN-distance-colored 3D renders of upsampled clouds vs GT.

Rebuild of scripts/visualize_results.py:30-63: for each prediction, color
points by their 1-NN distance to the ground truth and save a matplotlib
3D scatter PNG (plus an optional side-by-side input/pred/gt panel).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import jax.numpy as jnp  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.ops import knn_tiled  # noqa: E402


def render(pred, gt, out_path, title=""):
    d, _ = knn_tiled(jnp.asarray(pred), jnp.asarray(gt), k=1)
    err = np.sqrt(np.maximum(np.asarray(d)[:, 0], 0))
    fig = plt.figure(figsize=(12, 5))
    ax1 = fig.add_subplot(121, projection="3d")
    sc = ax1.scatter(pred[:, 0], pred[:, 1], pred[:, 2], c=err, s=1,
                     cmap="turbo")
    ax1.set_title(f"{title} pred (NN error)")
    fig.colorbar(sc, ax=ax1, shrink=0.6)
    ax2 = fig.add_subplot(122, projection="3d")
    ax2.scatter(gt[:, 0], gt[:, 1], gt[:, 2], s=1, c="gray")
    ax2.set_title("ground truth")
    for ax in (ax1, ax2):
        ax.set_box_aspect((1, 1, 1))
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return float(err.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--out-dir", default="out/vis")
    p.add_argument("--limit", type=int, default=20)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(args.pred_dir)
                   if f.endswith(".xyz"))[:args.limit]
    for f in files:
        pred = np.loadtxt(os.path.join(args.pred_dir, f))[:, :3].astype(np.float32)
        gt_path = os.path.join(args.gt_dir, f)
        if not os.path.exists(gt_path):
            print(f"skip {f}: no GT")
            continue
        gt = np.loadtxt(gt_path)[:, :3].astype(np.float32)
        out = os.path.join(args.out_dir, os.path.splitext(f)[0] + ".png")
        mean_err = render(pred, gt, out, title=f)
        print(f"{f}: mean NN error {mean_err:.5f} -> {out}")


if __name__ == "__main__":
    main()
