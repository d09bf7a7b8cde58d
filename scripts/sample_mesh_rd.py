#!/usr/bin/env python
"""fd ground-truth sampler: self-supervised distance labels.

Rebuild of scripts/sample_mesh-rd.py:99-151: per mesh —
1. sample surface points with face normals;
2. offset each along a random unit direction by a random length in
   [d_lo, d_hi];
3. reject offsets whose ray back toward the surface (-normal direction)
   first hits a DIFFERENT face, or whose incidence angle >= 1 rad (the
   occlusion / grazing filter the reference does with pyembree);
4. save {points, normals, lens} npz.

Ray casting runs on the accelerator (sapcu_tpu.ops.rays.first_hit,
dense Moller-Trumbore) instead of an embree BVH.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.data.mesh import face_normals_areas, load_off  # noqa: E402
from sapcu_tpu.ops.rays import first_hit  # noqa: E402


def process_mesh(path, out_dir, n_samples, d_lo, d_hi, rng):
    verts, faces = load_off(path)
    verts = verts - verts.mean(axis=0)
    scale = np.abs(verts).max()
    if scale > 0:
        verts = verts / (2 * scale)
    fnormals, areas = face_normals_areas(verts, faces)

    probs = areas / (areas.sum() + 1e-8)
    fi = rng.choice(len(faces), size=n_samples, p=probs)
    r1 = np.sqrt(rng.random(n_samples, dtype=np.float32))
    r2 = rng.random(n_samples, dtype=np.float32)
    u, v, w = 1 - r1, r1 * (1 - r2), r1 * r2
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    surf = (u[:, None] * v0[fi] + v[:, None] * v1[fi] + w[:, None] * v2[fi])

    dirs = rng.normal(size=(n_samples, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lens = rng.uniform(d_lo, d_hi, size=n_samples).astype(np.float32)
    offset = surf + dirs * lens[:, None]

    # incidence filter: angle between the offset direction and the source
    # face normal must be < 1 rad (grazing labels rejected)
    src_n = fnormals[fi]
    cos = np.abs(np.sum(dirs * src_n, axis=1))
    ok_angle = np.arccos(np.clip(cos, -1, 1)) < 1.0

    # occlusion filter: the ray back along -dirs must first hit the source
    # face at distance ~len
    t, hit_face = first_hit(jnp.asarray(offset.astype(np.float32)),
                            jnp.asarray(-dirs), jnp.asarray(v0),
                            jnp.asarray(v1), jnp.asarray(v2))
    t = np.asarray(t)
    hit_face = np.asarray(hit_face)
    ok_hit = (hit_face == fi) & np.isfinite(t) & (np.abs(t - lens) < 1e-3)

    keep = ok_angle & ok_hit
    name = os.path.splitext(os.path.basename(path))[0]
    np.savez(os.path.join(out_dir, f"{name}_fd.npz"),
             points=offset[keep].astype(np.float32),
             normals=dirs[keep].astype(np.float32),
             lens=lens[keep].astype(np.float32))
    return int(keep.sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-samples", type=int, default=100000)
    p.add_argument("--d-lo", type=float, default=0.003)
    p.add_argument("--d-hi", type=float, default=0.03)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    files = sorted(glob.glob(os.path.join(args.mesh_dir, "**", "*.off"),
                             recursive=True))
    for i, f in enumerate(files):
        n = process_mesh(f, args.out_dir, args.n_samples, args.d_lo,
                         args.d_hi, rng)
        print(f"[{i + 1}/{len(files)}] {os.path.basename(f)}: {n} labels")


if __name__ == "__main__":
    main()
