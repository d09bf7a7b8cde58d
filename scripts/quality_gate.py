#!/usr/bin/env python
"""Normative serving-mode quality gate: GT-based Chamfer parity.

Reads the quality_sweep outputs (out/metrics/quality_{exact,fast,sc}.json
— CD / F-score of each serving mode against DENSE GT samplings of
held-out meshes) and asks, per approximate mode:

  aggregate CD_mode  <=  (1 + tol) * aggregate CD_exact

i.e. the approximation must be as good as the reference's exact
semantics on ground truth, within ``tol`` (default 1%). This is the
meaning behind BASELINE.md's "Chamfer-L2 within 1% of the PyTorch
reference" — quality parity, not point-identity with the exact output
(two samplings of the same surface always differ at sampling-resolution
scale; see scripts/eval_fast_vs_exact.py for that diagnostic and the
round-3 history of why proximity-to-exact was re-based).

Writes out/metrics/quality_gate.json and exits nonzero on failure.
"""
import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def agg_cd(report: dict) -> float:
    per = report["per_size"]
    return sum(v["upsampled"]["cd"] for v in per.values()) / len(per)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metrics-dir", default="out/metrics")
    p.add_argument("--modes", default="sc,fast")
    p.add_argument("--tol", type=float, default=0.01)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    mdir = os.path.join(REPO, args.metrics_dir) \
        if not os.path.isabs(args.metrics_dir) else args.metrics_dir

    with open(os.path.join(mdir, "quality_exact.json")) as f:
        exact = json.load(f)
    cd_exact = agg_cd(exact)

    out = {"cd_exact": cd_exact, "tol": args.tol, "modes": {}}
    ok = True
    for mode in args.modes.split(","):
        with open(os.path.join(mdir, f"quality_{mode}.json")) as f:
            rep = json.load(f)
        cd = agg_cd(rep)
        rel = cd / cd_exact - 1.0
        passed = cd <= (1.0 + args.tol) * cd_exact
        ok &= passed
        out["modes"][mode] = {"cd": cd, "rel_vs_exact": rel,
                              "pass": passed}
        print(json.dumps({"mode": mode, "cd": cd, "cd_exact": cd_exact,
                          "rel_vs_exact": rel, "pass": passed}),
              flush=True)
    out["pass"] = ok

    dst = args.json_out or os.path.join(mdir, "quality_gate.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"summary": "quality_gate", "pass": ok,
                      "out": dst}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
