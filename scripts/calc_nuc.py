#!/usr/bin/env python
"""Normalized uniformity coefficient + distance stats over a result dir.

Rebuild of external/3D_Processing/calc_NUC.py + calc_Distance.py: NUC via
disk-density statistics (sapcu_tpu.ops.metrics.nuc — Euclidean disks, the
documented approximation of the CGAL geodesic disks) and, when a GT dir is
given, mean/std of point-to-GT NN distance.
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
from sapcu_tpu.ops.metrics import nuc  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", default=None)
    p.add_argument("--disk-frac", type=float, default=0.01)
    p.add_argument("--json-out", default="out/metrics/nuc.json")
    args = p.parse_args()

    files = sorted(f for f in os.listdir(args.pred_dir) if f.endswith(".xyz"))
    per_file, nucs, dmeans = {}, [], []
    for f in files:
        pred = np.loadtxt(os.path.join(args.pred_dir, f))[:, :3].astype(np.float32)
        val = float(nuc(jnp.asarray(pred), disk_radius_frac=args.disk_frac))
        entry = {"nuc": val}
        nucs.append(val)
        if args.gt_dir:
            gt_path = os.path.join(args.gt_dir, f)
            if os.path.exists(gt_path):
                gt = np.loadtxt(gt_path)[:, :3].astype(np.float32)
                d, _ = knn_tiled(jnp.asarray(pred), jnp.asarray(gt), k=1)
                d = np.sqrt(np.maximum(np.asarray(d)[:, 0], 0))
                entry.update({"dist_mean": float(d.mean()),
                              "dist_std": float(d.std())})
                dmeans.append(d.mean())
        per_file[f] = entry
        print(f"{f}: {entry}")

    summary = {"nuc_mean": float(np.mean(nucs)) if nucs else None,
               "dist_mean": float(np.mean(dmeans)) if dmeans else None}
    print(f"summary: {summary}")
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as fh:
        json.dump({"summary": summary, "per_file": per_file}, fh, indent=2)


if __name__ == "__main__":
    main()
