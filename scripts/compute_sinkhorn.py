#!/usr/bin/env python
"""Sinkhorn-EMD metrics over prediction/GT directories.

The reference README references scripts/compute_sinkhorn.py
(README.md:694-718) but the file is absent from its tree; this provides
the documented surface: per-file entropy-regularised EMD + JSON output
under out/metrics/.
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

from sapcu_tpu.ops.metrics import sinkhorn_emd  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pre_path", required=True)
    p.add_argument("--gt_path", required=True)
    p.add_argument("--epsilon", type=float, default=0.01)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--json-out", default="out/metrics/sinkhorn.json")
    args = p.parse_args()

    files = sorted(f for f in os.listdir(args.gt_path) if f.endswith(".xyz"))
    per_file = {}
    for i, f in enumerate(files):
        gt = np.loadtxt(os.path.join(args.gt_path, f))[:, :3].astype(np.float32)
        pre = np.loadtxt(os.path.join(args.pre_path, f))[:, :3].astype(np.float32)
        e = float(sinkhorn_emd(jnp.asarray(gt), jnp.asarray(pre),
                               epsilon=args.epsilon, iters=args.iters))
        per_file[f] = e
        print(f"[{i + 1}/{len(files)}] {f}: {e:.6f}")

    summary = {"mean": float(np.mean(list(per_file.values()))),
               "epsilon": args.epsilon, "iters": args.iters}
    print(f"mean Sinkhorn-EMD: {summary['mean']:.6f}")
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as fh:
        json.dump({"summary": summary, "per_file": per_file}, fh, indent=2)


if __name__ == "__main__":
    main()
