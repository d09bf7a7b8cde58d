#!/usr/bin/env python
"""Merge the per-size exact OOF runs (run_oof_exact_perfile.sh, one
crash-tolerant run per size) into out/metrics/quality_oof_exact.json in
the quality_sweep report shape, so sc-vs-exact OOF deltas exist at every
size the reference sweep spans (/root/reference/generate.py:31-36;
VERDICT r4 next #8)."""
import json
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
Q = os.path.join(REPO, "out/oof/quality")


def main():
    report = {"mode": "exact", "weights": "out/release", "ratio": 4,
              "refine_steps": 1,
              "meshes": sorted(os.listdir(os.path.join(Q, "in_2048"))),
              "per_size": {}}
    for sz in (256, 512, 1024, 2048):
        cd_f = os.path.join(Q, f"cd_{sz}_exact.json")
        if not os.path.exists(cd_f):
            continue
        with open(cd_f) as f:
            entry = {"upsampled": json.load(f)["summary"]}
        in_f = os.path.join(Q, f"cd_input_{sz}.json")
        if os.path.exists(in_f):
            with open(in_f) as f:
                entry["input_baseline"] = json.load(f)["summary"]
            cd_up = entry["upsampled"].get("cd")
            cd_in = entry["input_baseline"].get("cd")
            if cd_up and cd_in:
                entry["cd_vs_input"] = cd_up / cd_in
        p2m_f = os.path.join(Q, f"p2m_{sz}_exact.json")
        if os.path.exists(p2m_f):
            with open(p2m_f) as f:
                entry["p2m"] = json.load(f)["summary"]
        report["per_size"][str(sz)] = entry
    cds = [v["upsampled"].get("cd") for v in report["per_size"].values()
           if v["upsampled"].get("cd") is not None]
    report["mean_cd"] = sum(cds) / max(len(cds), 1)
    out = os.path.join(REPO, "out/metrics/quality_oof_exact.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}: sizes {sorted(report['per_size'])}")


if __name__ == "__main__":
    main()
