#!/usr/bin/env python
"""npz key auditor (scripts/old_metrics/scan_gt_normals.py analog).

Walks a directory, reports each .npz's keys/shapes/dtypes and flags files
missing the expected normal keys or containing NaN/Inf.
"""
import argparse
import glob
import os

import numpy as np

EXPECTED_ANY = ("normals", "pointing")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    args = p.parse_args()

    files = sorted(glob.glob(os.path.join(args.dir, "**", "*.npz"),
                             recursive=True))
    bad = 0
    for f in files:
        try:
            d = np.load(f)
        except Exception as e:
            print(f"UNREADABLE {f}: {e}")
            bad += 1
            continue
        keys = list(d.keys())
        desc = ", ".join(f"{k}:{d[k].shape}{d[k].dtype}" for k in keys)
        flags = []
        if not any(k in d for k in EXPECTED_ANY):
            flags.append("NO-NORMALS-KEY")
        for k in keys:
            arr = d[k]
            if np.issubdtype(arr.dtype, np.floating) and \
                    not np.all(np.isfinite(arr)):
                flags.append(f"NONFINITE:{k}")
        if flags:
            bad += 1
        print(f"{f}: {desc}" + (f"  [{' '.join(flags)}]" if flags else ""))
    print(f"\n{len(files)} files, {bad} flagged")


if __name__ == "__main__":
    main()
