#!/usr/bin/env python
"""One-command dress rehearsal: the full reference workflow, CPU-runnable.

Replays the manual pipeline of /root/reference/README.md:480-491,689-723
end-to-end on a small procedural mesh set, exercising every stage through
the SAME scripts/CLIs a user would run:

  1. build .off meshes (icospheres/ellipsoids/tori, PU1KMeshDataset layout)
  2. scripts/sample_mesh_fn.py + sample_mesh_rd.py  (GT samplers, R25/R26)
  3. trainfn.py on the mesh dataset (tiny dims, few iterations)
  4. build a PU1K-style H5 (poisson_256/poisson_1024) + trainfd.py on it
  5. generate.py (sparse .xyz -> 4x upsampled) with the trained tiny models
  6. scripts/evaluation_cd.py vs dense GT samplings
  7. scripts/merge_metrics.py -> one merged metrics JSON

Model dims are tiny (this rehearses the PLUMBING, it is a regression
harness, not a quality run); the real quality numbers come from the TPU
training runs recorded in STATUS.md. Runs in a few minutes on 1 CPU core.

Usage: python scripts/dress_rehearsal.py [--work out/rehearsal] [--iters 30]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------- meshes
def icosphere(subdiv: int = 2, radii=(1.0, 1.0, 1.0)):
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = list(verts)
    for _ in range(subdiv):
        cache, nf = {}, []

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                m /= np.linalg.norm(m)
                verts.append(m)
                cache[key] = len(verts) - 1
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = nf
    v = np.asarray(verts) * np.asarray(radii)
    return v, np.asarray(faces, np.int64)


def torus_mesh(R=1.0, r=0.4, nu=24, nv=16):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.stack([(R + r * np.cos(vv)) * np.cos(uu),
                      (R + r * np.cos(vv)) * np.sin(uu),
                      r * np.sin(vv)], -1).reshape(-1, 3)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [(a, b, c), (a, c, d)]
    return verts, np.asarray(faces, np.int64)


def write_off(path, verts, faces):
    with open(path, "w") as f:
        f.write(f"OFF\n{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n")


def build_meshes(mesh_dir, rng):
    cat = os.path.join(mesh_dir, "synth")
    os.makedirs(cat, exist_ok=True)
    specs = []
    for i in range(10):  # >= 10 meshes so the 90/10 val split holds a
        radii = rng.uniform(0.6, 1.0, 3)  # full batch (loop drop_last)
        specs.append((f"ellipsoid_{i}", icosphere(2, radii)))
    specs.append(("torus_0", torus_mesh(1.0, 0.4)))
    specs.append(("torus_1", torus_mesh(1.0, 0.25)))
    for name, (v, f) in specs:
        write_off(os.path.join(cat, f"{name}.off"), v, f)
    return [os.path.join(cat, f"{n}.off") for n, _ in specs]


PLATFORM = "cpu"


def run(cmd, env=None):
    print(f"\n$ {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = PLATFORM  # forced: the image presets axon (TPU)
    if env:
        e.update(env)
    subprocess.run(cmd, check=True, cwd=REPO, env=e)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="out/rehearsal")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--platform", default="cpu",
                   help="JAX platform for every stage (default cpu)")
    args = p.parse_args()
    global PLATFORM
    PLATFORM = args.platform
    os.environ["JAX_PLATFORMS"] = PLATFORM  # for in-process imports too
    work = os.path.abspath(os.path.join(REPO, args.work))
    os.makedirs(work, exist_ok=True)
    rng = np.random.default_rng(0)

    # 1. meshes
    mesh_dir = os.path.join(work, "meshes")
    meshes = build_meshes(mesh_dir, rng)
    print(f"built {len(meshes)} meshes under {mesh_dir}")

    # 2. GT samplers (the R25/R26 scripts, small sampling budgets)
    run([sys.executable, "scripts/sample_mesh_fn.py", "--mesh-dir",
         os.path.join(mesh_dir, "synth"), "--out-dir",
         os.path.join(work, "gt_fn"), "--n-surface", "4000",
         "--fine", "0.01"])
    run([sys.executable, "scripts/sample_mesh_rd.py", "--mesh-dir",
         os.path.join(mesh_dir, "synth"), "--out-dir",
         os.path.join(work, "gt_rd"), "--n-samples", "1000"])

    # 3. tiny fn training on the mesh dataset
    from sapcu_tpu.data.mesh import load_off, sample_surface
    fn_cfg = os.path.join(work, "fn_tiny.yaml")
    with open(fn_cfg, "w") as f:
        f.write(f"""inherit_from: {REPO}/configs/fn.yaml
data:
  mesh_folder: {mesh_dir}
  pointcloud_n: 256
  patch_n: 16
model:
  k_values: [6, 6, 4]
  emb_dims: 32
  time_steps_enc: 2
  snn_mode: rate   # trainable wiring (see configs/fn_synth.yaml NOTE)
training:
  use_amp: false
  validate_every: {args.iters}
  checkpoint_every: {args.iters}
  print_every: 10
""")
    run([sys.executable, "trainfn.py", "--config", fn_cfg, "--batch_size",
         "2", "--max-iterations", str(args.iters), "--out-dir",
         os.path.join(work, "fn"), "--no-resume"])

    # 4. PU1K-style H5 from the meshes + tiny fd training
    import h5py
    h5_path = os.path.join(work, "rehearsal_256_1024.h5")
    inp, gt = [], []
    for m in meshes:
        verts, faces = load_off(m)
        verts = verts - verts.mean(0)
        verts /= 2 * np.abs(verts).max()
        for _ in range(4):  # 4 croppings per mesh
            pts, _ = sample_surface(verts, faces, 1024, rng)
            sub, _ = sample_surface(verts, faces, 256, rng)
            gt.append(pts)
            inp.append(sub)
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("poisson_256", data=np.stack(inp))
        f.create_dataset("poisson_1024", data=np.stack(gt))
    fd_cfg = os.path.join(work, "fd_tiny.yaml")
    with open(fd_cfg, "w") as f:
        f.write(f"""inherit_from: {REPO}/configs/fd.yaml
data:
  hdf5_paths:
    pugan: {h5_path}
    pu1k_train: null
model:
  k: 8
  emb_dims: 48
  time_steps_enc: 2
  k_scales: [4, 8]
  num_heads: 4
training:
  use_amp: false
  validate_every: {args.iters}
  checkpoint_every: {args.iters}
  print_every: 10
""")
    run([sys.executable, "trainfd.py", "--config", fd_cfg, "--batch_size",
         "2", "--max-iterations", str(args.iters), "--out-dir",
         os.path.join(work, "fd"), "--no-resume"])

    # 5. generate: sparse 256-pt samplings -> 4x, with the trained models
    in_dir = os.path.join(work, "sparse")
    gt_dir = os.path.join(work, "dense_gt")
    out_dir = os.path.join(work, "upsampled")
    for d in (in_dir, gt_dir, out_dir):
        os.makedirs(d, exist_ok=True)
    for m in meshes[-2:]:  # the 90/10 split's val meshes
        name = os.path.splitext(os.path.basename(m))[0] + ".xyz"
        verts, faces = load_off(m)
        pts, _ = sample_surface(verts, faces, 256, rng)
        np.savetxt(os.path.join(in_dir, name), pts, fmt="%.6f")
        dense, _ = sample_surface(verts, faces, 1024, rng)
        np.savetxt(os.path.join(gt_dir, name), dense, fmt="%.6f")
    run([sys.executable, "generate.py", "--input-dir", in_dir,
         "--output-dir", out_dir, "--ratio", "4",
         "--fn-config", fn_cfg, "--fd-config", fd_cfg,
         "--fn-dir", os.path.join(work, "fn"),
         "--fd-dir", os.path.join(work, "fd"),
         "--checkpoint", "model_best.pt",
         "--batch-size", "64", "--k-neighbors", "16",
         "--dense-spacing", "0.02"])

    # 6-7. evaluation + merge
    metrics_dir = os.path.join(work, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    run([sys.executable, "scripts/evaluation_cd.py", "--pre_path", out_dir,
         "--gt_path", gt_dir, "--json-out",
         os.path.join(metrics_dir, "cd.json")])
    run([sys.executable, "scripts/merge_metrics.py", "--metrics-dir",
         metrics_dir, "--out", os.path.join(metrics_dir, "merged.json")])

    with open(os.path.join(metrics_dir, "merged.json")) as f:
        print("\nREHEARSAL COMPLETE:", json.dumps(json.load(f), indent=2))


if __name__ == "__main__":
    main()
