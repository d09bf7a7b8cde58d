#!/usr/bin/env python
"""Per-cloud normal angular error vs ground truth with NN matching.

Rebuild of scripts/old_metrics/eval_normals.py:62-173: for each predicted
cloud+normals, match each point to the nearest GT point, compute the
(unoriented) angular error, and report per-cloud + aggregate stats with a
histogram. Inputs are .xyz (points) + .npz (normals) or 6-column .xyz.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.ops import knn_tiled  # noqa: E402


def load_cloud_normals(path):
    arr = np.loadtxt(path).astype(np.float32)
    if arr.shape[1] >= 6:
        return arr[:, :3], arr[:, 3:6]
    npz = os.path.splitext(path)[0] + ".npz"
    if os.path.exists(npz):
        d = np.load(npz)
        return arr[:, :3], d[[k for k in ("normals", "pointing")
                              if k in d][0]].astype(np.float32)
    raise ValueError(f"no normals for {path}")


def angular_errors(pred_pts, pred_n, gt_pts, gt_n, oriented=False):
    _, idx = knn_tiled(jnp.asarray(pred_pts), jnp.asarray(gt_pts), k=1)
    matched = gt_n[np.asarray(idx)[:, 0]]
    pn = pred_n / np.maximum(np.linalg.norm(pred_n, axis=1, keepdims=True), 1e-12)
    gn = matched / np.maximum(np.linalg.norm(matched, axis=1, keepdims=True), 1e-12)
    cos = np.sum(pn * gn, axis=1)
    if not oriented:
        cos = np.abs(cos)
    return np.degrees(np.arccos(np.clip(cos, -1 + 1e-7, 1 - 1e-7)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--oriented", action="store_true")
    p.add_argument("--json-out", default="out/metrics/normals.json")
    args = p.parse_args()

    files = sorted(f for f in os.listdir(args.pred_dir) if f.endswith(".xyz"))
    per_cloud, all_err = {}, []
    for f in files:
        try:
            pp, pn = load_cloud_normals(os.path.join(args.pred_dir, f))
            gp, gn = load_cloud_normals(os.path.join(args.gt_dir, f))
        except (ValueError, OSError) as e:
            print(f"skip {f}: {e}")
            continue
        err = angular_errors(pp, pn, gp, gn, args.oriented)
        per_cloud[f] = {"mean_deg": float(err.mean()),
                        "median_deg": float(np.median(err)),
                        "rmse_deg": float(np.sqrt((err ** 2).mean())),
                        "p90_deg": float(np.percentile(err, 90))}
        all_err.append(err)
        print(f"{f}: mean={err.mean():.3f} deg median={np.median(err):.3f}")

    if not all_err:
        print("no evaluable clouds")
        return
    all_err = np.hstack(all_err)
    hist, edges = np.histogram(all_err, bins=18, range=(0, 90))
    summary = {"mean_deg": float(all_err.mean()),
               "median_deg": float(np.median(all_err)),
               "rmse_deg": float(np.sqrt((all_err ** 2).mean())),
               "histogram": {"counts": hist.tolist(),
                             "edges_deg": edges.tolist()}}
    print(f"ALL: mean={summary['mean_deg']:.3f} deg "
          f"median={summary['median_deg']:.3f} deg")
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as fh:
        json.dump({"summary": summary, "per_cloud": per_cloud}, fh, indent=2)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
