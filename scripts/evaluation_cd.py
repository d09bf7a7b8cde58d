#!/usr/bin/env python
"""Chamfer / Hausdorff / F-score / EMD evaluation over prediction dirs.

Rebuild of the vendored Meta-PU harness
(external/Meta-PU_evaluation/evaluation_code/evaluation_cd.py:10-51) with
the same printed statistics, running the NN distances on the accelerator
and using the Sinkhorn approximation for the EMD column. Also writes a
metrics JSON (the out/metrics/*.json convention of README.md:689-723).
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

from sapcu_tpu.ops import metrics as M  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pre_path", required=True)
    p.add_argument("--gt_path", required=True)
    p.add_argument("--emd", action="store_true",
                   help="also compute Sinkhorn EMD (slower)")
    p.add_argument("--emd-max-points", type=int, default=4096,
                   help="FPS-downsample both clouds to at most this many "
                        "points for the EMD column (the [N, M] Sinkhorn "
                        "kernel is quadratic; 4096^2 keeps it tractable "
                        "on CPU). CD/HD/F-score always use full clouds.")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    files = sorted(f for f in os.listdir(args.gt_path) if f.endswith(".xyz"))
    gt2pre, pre2gt, emds, per_file = [], [], [], {}
    for f in files:
        gt = np.loadtxt(os.path.join(args.gt_path, f))[:, :3].astype(np.float32)
        pre = np.loadtxt(os.path.join(args.pre_path, f))[:, :3].astype(np.float32)
        g2p_sq, p2g_sq = M.nn_distances(jnp.asarray(gt), jnp.asarray(pre))
        g2p = np.sqrt(np.maximum(np.asarray(g2p_sq), 0))
        p2g = np.sqrt(np.maximum(np.asarray(p2g_sq), 0))
        gt2pre.append(g2p)
        pre2gt.append(p2g)
        per_file[f] = {"cd": float(0.5 * (g2p.mean() + p2g.mean())),
                       "hausdorff": float(max(g2p.max(), p2g.max()))}
        if args.emd:
            from sapcu_tpu.ops.pointops import farthest_point_sample
            cap = args.emd_max_points
            gt_e, pre_e = gt, pre
            if gt_e.shape[0] > cap:
                gt_e = gt_e[np.asarray(farthest_point_sample(
                    jnp.asarray(gt_e), cap))]
            if pre_e.shape[0] > cap:
                pre_e = pre_e[np.asarray(farthest_point_sample(
                    jnp.asarray(pre_e), cap))]
            e = float(M.sinkhorn_emd(jnp.asarray(gt_e), jnp.asarray(pre_e)))
            emds.append(e)
            per_file[f]["emd_sinkhorn"] = e

    gt2pre = np.hstack(gt2pre)
    pre2gt = np.hstack(pre2gt)
    print("GT  --> PRE")
    print(f"\tMean     : {np.mean(gt2pre)}")
    print(f"\tStd      : {np.std(gt2pre)}")
    print(f"\tRecall   : {np.mean(gt2pre <= 1e-2)}")
    print(f"\tRecall   : {np.mean(gt2pre <= 2e-2)}")
    print("PRE --> GT")
    print(f"\tMean     : {np.mean(pre2gt)}")
    print(f"\tStd      : {np.std(pre2gt)}")
    print(f"\tPrecision: {np.mean(pre2gt <= 1e-2)}")
    print(f"\tPrecision: {np.mean(pre2gt <= 2e-2)}")
    cd = 0.5 * (np.mean(gt2pre) + np.mean(pre2gt))
    print(f"CD:\n\t{cd}")
    f1 = 2 / (1 / max(np.mean(gt2pre <= 1e-2), 1e-12)
              + 1 / max(np.mean(pre2gt <= 1e-2), 1e-12))
    f2 = 2 / (1 / max(np.mean(gt2pre <= 2e-2), 1e-12)
              + 1 / max(np.mean(pre2gt <= 2e-2), 1e-12))
    print(f"F-score:\n\t{f1}\n\t{f2}")
    if emds:
        print(f"EMD:\n\t{np.mean(emds)}")

    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as fh:
            json.dump({"summary": {"cd": float(cd),
                                   "fscore@1e-2": float(f1),
                                   "fscore@2e-2": float(f2),
                                   "emd_sinkhorn": (float(np.mean(emds))
                                                    if emds else None)},
                       "per_file": per_file}, fh, indent=2)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
