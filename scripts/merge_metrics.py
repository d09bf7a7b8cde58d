#!/usr/bin/env python
"""Merge per-run metric JSONs into one table.

The reference README references scripts/merge_metrics.py
(README.md:694-718) but the file is absent from its tree; this provides
the documented surface: collects the JSONs written by evaluation_cd.py /
compute_sinkhorn.py / eval_normals.py / calc_nuc.py under out/metrics/
and emits a combined JSON + aligned text table.
"""
import argparse
import glob
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metrics-dir", default="out/metrics")
    p.add_argument("--out", default="out/metrics/merged.json")
    args = p.parse_args()

    merged = {}
    for f in sorted(glob.glob(os.path.join(args.metrics_dir, "*.json"))):
        if os.path.abspath(f) == os.path.abspath(args.out):
            continue
        name = os.path.splitext(os.path.basename(f))[0]
        try:
            with open(f) as fh:
                data = json.load(fh)
        except Exception as e:
            print(f"skip {f}: {e}")
            continue
        merged[name] = data.get("summary", data)

    with open(args.out, "w") as fh:
        json.dump(merged, fh, indent=2)

    width = max((len(k) for k in merged), default=10) + 2
    for name, summary in merged.items():
        if isinstance(summary, dict):
            flat = {k: v for k, v in summary.items()
                    if isinstance(v, (int, float)) and v is not None}
            row = "  ".join(f"{k}={v:.6g}" for k, v in flat.items())
        else:
            row = str(summary)
        print(f"{name:<{width}}{row}")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
