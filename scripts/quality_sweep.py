#!/usr/bin/env python
"""Arbitrary-scale quality sweep with trained weights (the PU1K-sweep
analog of /root/reference/README.md:689-723, runnable without the PU1K
release files).

For each held-out synthetic mesh and each input size N in --sizes:
  sparse N-point sampling -> generate.py (ratio x) -> upsampled cloud,
  evaluated against a dense GT sampling of the SAME mesh with
  scripts/evaluation_cd.py (CD / Hausdorff / F-score).

Two baselines calibrate the numbers (the reference publishes no absolute
CD values in-tree, SURVEY.md §6):
  - input: CD(sparse input, dense GT) — upsampling must IMPROVE on this;
  - the same sweep with --random-weights gives the untrained floor.

Writes one JSON with per-size and aggregate metrics. Typical use:

  python scripts/quality_sweep.py --weights out/release \
      --mode exact --sizes 256,512 --json-out out/metrics/quality_exact.json
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def perturb_scan(pts, rng):
    """Scanned-input corruption (VERDICT r4 missing #1): the clean
    procedural samplings never exercise what real scans do to the input —
    anisotropic sensor noise, holes, and one-sided occlusion. GT stays
    clean; the input baseline then measures the corrupted input's CD and
    the upsampler must improve on it (complete + denoise).

    - anisotropic noise: sigma 0.004 along one random direction (a scan
      line-of-sight) + 0.0015 isotropic;
    - holes: 2 spherical cutouts of radius 0.07 centered on random kept
      points (missing patches);
    - occlusion: drop everything past the 0.88 quantile along a random
      axis (self-occlusion crop).
    Counts drop (~15-30%) — serving takes arbitrary sizes by design."""
    n = pts.shape[0]
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    pts = (pts + rng.normal(size=(n, 1)) * 0.004 * d
           + rng.normal(size=(n, 3)) * 0.0015)
    keep = np.ones(n, bool)
    for _ in range(2):
        c = pts[rng.integers(0, n)]
        keep &= np.linalg.norm(pts - c, axis=1) > 0.07
    ax = rng.integers(0, 3)
    keep &= pts[:, ax] <= np.quantile(pts[:, ax], 0.88)
    out = pts[keep]
    return out if len(out) >= 32 else pts[:32]


def run(cmd, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meshes", default="out/rehearsal/meshes/synth",
                   help="directory of .off meshes (dress_rehearsal builds "
                        "them); the LAST two alphabetically are the "
                        "rehearsal's val meshes")
    p.add_argument("--n-meshes", type=int, default=4)
    p.add_argument("--weights", default="out/release")
    p.add_argument("--fn-config", default="configs/fn_synth.yaml")
    p.add_argument("--fd-config", default="configs/fd_synth.yaml")
    p.add_argument("--sc-config", default="configs/sc.yaml")
    p.add_argument("--mode", default="exact",
                   choices=["exact", "fast", "sc", "product"])
    p.add_argument("--sizes", default="256,512,1024,2048")
    p.add_argument("--ratio", type=int, default=4)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--passes", type=int, default=1,
                   help="multi-pass upsampling (generate.py --passes)")
    p.add_argument("--refine-steps", type=int, default=1,
                   help="iterated distance steps (generate.py "
                        "--refine-steps)")
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--work", default="out/quality")
    p.add_argument("--json-out", default=None)
    p.add_argument("--perturb", default="none", choices=["none", "scan"],
                   help="corrupt the sparse INPUT (scan = anisotropic "
                        "noise + holes + occlusion crop; GT stays clean) "
                        "— use a dedicated --work dir")
    args = p.parse_args()

    from sapcu_tpu.data.mesh import load_off, sample_surface

    meshes = sorted(
        os.path.join(args.meshes, f) for f in os.listdir(args.meshes)
        if f.endswith(".off"))[-args.n_meshes:]
    if not meshes:
        sys.exit(f"no .off meshes under {args.meshes} — run "
                 "scripts/dress_rehearsal.py first (stage 1 builds them)")
    sizes = [int(s) for s in args.sizes.split(",")]
    work = os.path.abspath(os.path.join(REPO, args.work))
    rng = np.random.default_rng(7)

    report = {"mode": args.mode,
              "weights": "random" if args.random_weights else args.weights,
              "ratio": args.ratio, "passes": args.passes,
              "refine_steps": args.refine_steps,
              "perturb": args.perturb,
              "meshes": [os.path.basename(m) for m in meshes],
              "per_size": {}}

    tag = args.mode + (f"_p{args.passes}" if args.passes > 1 else "") \
        + (f"_it{args.refine_steps}" if args.refine_steps > 1 else "")
    for n in sizes:
        in_dir = os.path.join(work, f"in_{n}")
        gt_dir = os.path.join(work, f"gt_{n}")
        out_dir = os.path.join(work, f"out_{n}_{tag}")
        for d in (in_dir, gt_dir, out_dir):
            os.makedirs(d, exist_ok=True)
        for m in meshes:
            name = os.path.splitext(os.path.basename(m))[0] + ".xyz"
            verts, faces = load_off(m)
            sparse, _ = sample_surface(verts, faces, n, rng)
            dense, _ = sample_surface(verts, faces, n * args.ratio, rng)
            if args.perturb == "scan":
                sparse = perturb_scan(sparse, rng)
            np.savetxt(os.path.join(in_dir, name), sparse, fmt="%.6f")
            np.savetxt(os.path.join(gt_dir, name), dense, fmt="%.6f")

        cmd = [sys.executable, "generate.py", "--input-dir", in_dir,
               "--output-dir", out_dir, "--ratio", str(args.ratio),
               "--fn-config", args.fn_config, "--fd-config", args.fd_config,
               "--sc-config", args.sc_config, "--mode", args.mode,
               "--batch-size", str(args.batch_size),
               "--compute-dtype", args.compute_dtype,
               "--passes", str(args.passes),
               "--refine-steps", str(args.refine_steps)]
        if args.random_weights:
            cmd.append("--random-weights")
        else:
            cmd += ["--fn-dir", os.path.join(args.weights, "fn"),
                    "--fd-dir", os.path.join(args.weights, "fd"),
                    "--sc-dir", os.path.join(args.weights, "sc")]
        run(cmd)

        cd_json = os.path.join(work, f"cd_{n}_{tag}.json")
        run([sys.executable, "scripts/evaluation_cd.py", "--pre_path",
             out_dir, "--gt_path", gt_dir, "--json-out", cd_json, "--emd"],
            env_extra={"JAX_PLATFORMS": "cpu"})
        in_json = os.path.join(work, f"cd_input_{n}.json")
        run([sys.executable, "scripts/evaluation_cd.py", "--pre_path",
             in_dir, "--gt_path", gt_dir, "--json-out", in_json],
            env_extra={"JAX_PLATFORMS": "cpu"})
        # point-to-mesh: noise-free quality (CD's floor is the GT
        # sampling density; distance to the true surface is not)
        p2m_json = os.path.join(work, f"p2m_{n}_{tag}.json")
        p2m_in_json = os.path.join(work, f"p2m_input_{n}.json")
        run([sys.executable, "scripts/evaluation_p2m.py", "--pred-dir",
             out_dir, "--mesh-dir", args.meshes, "--json-out", p2m_json],
            env_extra={"JAX_PLATFORMS": "cpu"})
        run([sys.executable, "scripts/evaluation_p2m.py", "--pred-dir",
             in_dir, "--mesh-dir", args.meshes, "--json-out", p2m_in_json],
            env_extra={"JAX_PLATFORMS": "cpu"})
        with open(cd_json) as f:
            up = json.load(f)["summary"]
        with open(in_json) as f:
            base = json.load(f)["summary"]
        report["per_size"][n] = {
            "upsampled": up,
            "input_baseline": base,
        }
        with open(p2m_json) as f:
            report["per_size"][n]["p2m"] = json.load(f)["summary"]
        with open(p2m_in_json) as f:
            report["per_size"][n]["p2m_input"] = json.load(f)["summary"]
        cd_up = report["per_size"][n]["upsampled"].get("cd")
        cd_in = report["per_size"][n]["input_baseline"].get("cd")
        if cd_up and cd_in:
            report["per_size"][n]["cd_vs_input"] = cd_up / cd_in
        print(f"[size {n}] CD up={cd_up} input={cd_in}")

    cds = [v["upsampled"].get("cd") for v in report["per_size"].values()]
    report["mean_cd"] = float(np.mean([c for c in cds if c is not None]))
    out = args.json_out or os.path.join(work, f"quality_{tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
