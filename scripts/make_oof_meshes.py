#!/usr/bin/env python
"""Author hard OUT-OF-FAMILY held-out meshes for the quality gate.

The training data (data/device_synth.py) and the round-3 quality story
(quality_sweep / quality_gate / dress_rehearsal) all live in the same
smooth composite-SDF family: ellipsoid/torus/capsule/roundbox unions with
low-frequency bumps. VERDICT r3 missing #1: nothing outside that family
was ever evaluated, mirroring the varied test classes the reference runs
(/root/reference/generate.py:22-36, /root/reference/fn/datacore.py:40-68).

This script writes procedural .off meshes that are deliberately OUTSIDE
the family:
  - box_sharp      — hard 90-degree edges and corners (roundbox radius->0)
  - cone           — apex singularity + sharp base rim
  - plate_thin     — a plate 0.04 thick: two near-parallel sheets
  - plates_stack   — TWO parallel thin plates with a 0.06 gap: the
                     Morton/Z-order adversarial case (interleaved sheets)
  - wedge          — sharp dihedral crease (tent)
  - lbracket       — creased union: L-shaped prism, concave edge
  - pyramid        — four sharp faces meeting at an apex
  - box_union      — two boxes overlapping at 45 degrees (creased union)

All meshes are closed triangle surfaces at the unit scale the sweep's
sampler expects (bbox within ~[-1, 1]). Layout matches
PU1KMeshDataset (category dir of .off), so quality_sweep --meshes works
unchanged:

  python scripts/make_oof_meshes.py --out out/oof/meshes/oof
  python scripts/quality_sweep.py --meshes out/oof/meshes/oof \
      --n-meshes 8 --mode sc --json-out out/metrics/quality_oof_sc.json
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _quads_to_tris(quads):
    tris = []
    for a, b, c, d in quads:
        tris += [(a, b, c), (a, c, d)]
    return tris


def box_mesh(sx=1.0, sy=1.0, sz=1.0, center=(0.0, 0.0, 0.0)):
    """Closed axis-aligned box with sharp edges (12 triangles)."""
    hx, hy, hz = sx / 2, sy / 2, sz / 2
    cx, cy, cz = center
    v = np.array([[x, y, z] for x in (-hx, hx) for y in (-hy, hy)
                  for z in (-hz, hz)], float) + (cx, cy, cz)
    # vertex order: bit2=x, bit1=y, bit0=z
    quads = [(0, 1, 3, 2), (4, 6, 7, 5),   # x- , x+
             (0, 4, 5, 1), (2, 3, 7, 6),   # y- , y+
             (0, 2, 6, 4), (1, 5, 7, 3)]   # z- , z+
    return v, np.asarray(_quads_to_tris(quads), np.int64)


def cone_mesh(r=0.8, h=1.4, n=48):
    """Closed cone: apex singularity + sharp base rim."""
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rim = np.stack([r * np.cos(t), r * np.sin(t),
                    np.full(n, -h / 2)], -1)
    v = np.vstack([rim, [[0, 0, h / 2]], [[0, 0, -h / 2]]])
    apex, base_c = n, n + 1
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces.append((i, j, apex))          # side
        faces.append((j, i, base_c))        # base disk
    return v, np.asarray(faces, np.int64)


def pyramid_mesh(s=1.2, h=1.1):
    """Square pyramid: 4 sharp lateral edges + 4 base edges + apex."""
    hs = s / 2
    v = np.array([[-hs, -hs, -h / 2], [hs, -hs, -h / 2],
                  [hs, hs, -h / 2], [-hs, hs, -h / 2], [0, 0, h / 2]],
                 float)
    faces = [(0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4),
             (1, 0, 2), (2, 0, 3)]
    return v, np.asarray(faces, np.int64)


def wedge_mesh(sx=1.4, sy=1.0, h=0.9):
    """Triangular prism lying on its rectangular face: a sharp ridge
    (tent) plus two vertical sharp gables."""
    hx, hy = sx / 2, sy / 2
    v = np.array([[-hx, -hy, -h / 2], [hx, -hy, -h / 2],
                  [hx, hy, -h / 2], [-hx, hy, -h / 2],
                  [-hx, 0.0, h / 2], [hx, 0.0, h / 2]], float)
    faces = [(0, 1, 5), (0, 5, 4),          # -y roof
             (2, 3, 4), (2, 4, 5),          # +y roof
             (1, 0, 2), (2, 0, 3),          # floor
             (0, 4, 3), (1, 2, 5)]          # gables
    return v, np.asarray(faces, np.int64)


def lbracket_mesh(s=1.4, t=0.5, depth=1.0):
    """L-shaped prism: a creased CONCAVE edge the smooth family never
    produces. Cross-section is an L in the xy plane, extruded in z."""
    # L outline (counterclockwise)
    xy = np.array([[0, 0], [s, 0], [s, t], [t, t], [t, s], [0, s]], float)
    xy -= xy.mean(0)
    n = len(xy)
    lo, hi = -depth / 2, depth / 2
    v = np.vstack([np.column_stack([xy, np.full(n, lo)]),
                   np.column_stack([xy, np.full(n, hi)])])
    faces = []
    for i in range(n):                      # side walls
        j = (i + 1) % n
        faces += [(i, j, n + j), (i, n + j, n + i)]
    # caps: fan triangulation of the L (split into two rectangles)
    for base, flip in ((0, True), (n, False)):
        quads = [(0, 1, 2, 3), (0, 3, 4, 5)]
        for a, b, c, d in quads:
            tri = [(base + a, base + b, base + c),
                   (base + a, base + c, base + d)]
            if flip:
                tri = [(x, z, y) for x, y, z in tri]
            faces += tri
    return v, np.asarray(faces, np.int64)


def plates_stack_mesh(s=1.4, t=0.05, gap=0.12, n_plates=2):
    """n thin plates stacked in z with small gaps — nearby parallel
    sheets whose points interleave along a Z-order curve (the documented
    adversarial case for the Morton-window outlier rule)."""
    vs, fs = [], []
    z0 = -((n_plates - 1) * (t + gap)) / 2
    off = 0
    for i in range(n_plates):
        v, f = box_mesh(s, s, t, center=(0, 0, z0 + i * (t + gap)))
        vs.append(v)
        fs.append(f + off)
        off += len(v)
    return np.vstack(vs), np.vstack(fs)


def box_union_mesh(s=1.0):
    """Two boxes overlapping at 45 degrees: non-smooth union creases.
    (Triangle soup of both shells; sampling-based evals treat the union
    surface correctly up to the hidden interior parts, which the
    point-to-mesh metric also sees as near-zero distance.)"""
    v1, f1 = box_mesh(s, s, s)
    v2, f2 = box_mesh(s, s, s)
    c, sn = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]])
    v2 = v2 @ rot.T + np.array([0.35, 0.2, 0.25])
    return np.vstack([v1, v2]), np.vstack([f1, f2 + len(v1)])


# ---------------------------------------------------------------- gen 2
# Round 5 moved cones/wedges/sharp boxes/thin plates INTO the training
# family (data/device_synth.py, VERDICT r4 #5), which makes the gen-1 set
# above near-family. These stay genuinely outside the r5 family:
# curved-swept tubes, genus-1 topology, repeated concave steps, star
# creases, thin curved shells, and non-axis-aligned platonic corners.


def octahedron_mesh(s=0.85):
    v = s * np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], float)
    faces = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
             (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
    return v, np.asarray(faces, np.int64)


def tetra_mesh(s=1.05):
    v = s / np.sqrt(3.0) * np.array(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], float)
    faces = [(0, 1, 2), (0, 3, 1), (0, 2, 3), (1, 3, 2)]
    return v, np.asarray(faces, np.int64)


def _grid_faces(nu, nv, wrap_u=False, wrap_v=True, off=0):
    faces = []
    ru = nu if wrap_u else nu - 1
    rv = nv if wrap_v else nv - 1
    for i in range(ru):
        for j in range(rv):
            a = off + i * nv + j
            b = off + ((i + 1) % nu) * nv + j
            c = off + ((i + 1) % nu) * nv + (j + 1) % nv
            d = off + i * nv + (j + 1) % nv
            faces += [(a, b, c), (a, c, d)]
    return faces


def helix_tube_mesh(R=0.5, pitch=0.75, turns=1.5, r=0.15, nu=96, nv=16):
    """Tube swept along a helix: smoothly curved, torsioned — nothing in
    the composite-SDF family sweeps a profile along a space curve."""
    u = np.linspace(0, 2 * np.pi * turns, nu)
    c = np.stack([R * np.cos(u), R * np.sin(u),
                  pitch * u / (2 * np.pi) - pitch * turns / 2], -1)
    t = np.gradient(c, axis=0)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    n1 = np.cross(t, up)
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    n2 = np.cross(t, n1)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    ring = (np.cos(v)[None, :, None] * n1[:, None, :]
            + np.sin(v)[None, :, None] * n2[:, None, :])
    verts = (c[:, None, :] + r * ring).reshape(-1, 3)
    faces = _grid_faces(nu, nv, wrap_u=False, wrap_v=True)
    # end caps: fan from the two helix end centers
    verts = np.vstack([verts, c[[0]], c[[-1]]])
    c0, c1 = len(verts) - 2, len(verts) - 1
    for j in range(nv):
        faces.append((c0, (j + 1) % nv, j))
        faces.append((c1, (nu - 1) * nv + j, (nu - 1) * nv + (j + 1) % nv))
    return verts, np.asarray(faces, np.int64)


def tube_mesh(R=0.65, r=0.4, h=0.7, n=64):
    """Hollow cylinder (genus 1): inner concave wall + four sharp rims —
    the first held-out shape with a hole through it."""
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    co, si = np.cos(t), np.sin(t)
    rings = []
    for rad, z in ((R, -h / 2), (R, h / 2), (r, h / 2), (r, -h / 2)):
        rings.append(np.stack([rad * co, rad * si, np.full(n, z)], -1))
    v = np.vstack(rings)
    faces = []
    for a in range(4):          # outer wall, top annulus, inner wall, bottom
        b = (a + 1) % 4
        for i in range(n):
            j = (i + 1) % n
            faces += [(a * n + i, a * n + j, b * n + j),
                      (a * n + i, b * n + j, b * n + i)]
    return v, np.asarray(faces, np.int64)


def stairs_mesh(steps=3, w=1.3, d=0.42, t=0.3):
    """Staircase: repeated convex+CONCAVE 90-degree creases (box soup)."""
    vs, fs, off = [], [], 0
    for i in range(steps):
        v, f = box_mesh(w, d, (i + 1) * t,
                        center=(0, -((steps - 1) / 2 - i) * d,
                                (i + 1) * t / 2 - steps * t / 2))
        vs.append(v)
        fs.append(f + off)
        off += len(v)
    return np.vstack(vs), np.vstack(fs)


def cross_prism_mesh(s=1.35, a=0.42, h=0.5):
    """Plus-shaped prism (two crossing boxes): 8 concave vertical edges."""
    v1, f1 = box_mesh(s, a, h)
    v2, f2 = box_mesh(a, s, h)
    return np.vstack([v1, v2]), np.vstack([f1, f2 + len(v1)])


def star_prism_mesh(n=5, R=0.8, r=0.35, h=0.4):
    """5-point star extrusion: alternating sharp convex/concave creases."""
    t = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + np.pi / 2
    rad = np.where(np.arange(2 * n) % 2 == 0, R, r)
    xy = np.stack([rad * np.cos(t), rad * np.sin(t)], -1)
    m = 2 * n
    v = np.vstack([np.column_stack([xy, np.full(m, -h / 2)]),
                   np.column_stack([xy, np.full(m, h / 2)]),
                   [[0, 0, -h / 2], [0, 0, h / 2]]])
    cb, ct = 2 * m, 2 * m + 1
    faces = []
    for i in range(m):
        j = (i + 1) % m
        faces += [(i, j, m + j), (i, m + j, m + i)]        # walls
        faces += [(cb, j, i), (ct, m + i, m + j)]          # caps (star-shaped)
    return v, np.asarray(faces, np.int64)


def bowl_mesh(R=0.75, t=0.12, n=48, m=14):
    """Hemispherical shell opening upward: a thin doubly-curved sheet
    with a circular rim (the family has no shells at all)."""
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ph = np.linspace(np.pi / 2, np.pi, m)                  # equator -> pole
    vs = []
    for rad in (R, R - t):
        grid = np.stack([rad * np.sin(ph)[:, None] * np.cos(th)[None, :],
                         rad * np.sin(ph)[:, None] * np.sin(th)[None, :],
                         rad * np.cos(ph)[:, None] * np.ones_like(th)[None, :]],
                        -1).reshape(-1, 3)
        vs.append(grid)
    v = np.vstack(vs)
    faces = _grid_faces(m, n, wrap_u=False, wrap_v=True, off=0)
    faces += _grid_faces(m, n, wrap_u=False, wrap_v=True, off=m * n)
    for i in range(n):                                     # rim annulus
        j = (i + 1) % n
        faces += [(i, j, m * n + j), (i, m * n + j, m * n + i)]
    return v, np.asarray(faces, np.int64)


SPECS2 = [
    ("octahedron", octahedron_mesh),
    ("tetra", tetra_mesh),
    ("helix_tube", helix_tube_mesh),
    ("tube", tube_mesh),
    ("stairs", stairs_mesh),
    ("cross_prism", cross_prism_mesh),
    ("star_prism", star_prism_mesh),
    ("bowl", bowl_mesh),
]


def write_off(path, verts, faces):
    with open(path, "w") as f:
        f.write(f"OFF\n{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n")


SPECS = [
    ("box_sharp", lambda: box_mesh(1.2, 0.9, 0.7)),
    ("cone", cone_mesh),
    ("plate_thin", lambda: box_mesh(1.4, 1.1, 0.05)),
    ("plates_stack", plates_stack_mesh),
    ("wedge", wedge_mesh),
    ("lbracket", lbracket_mesh),
    ("pyramid", pyramid_mesh),
    ("box_union", box_union_mesh),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="out/oof/meshes/oof")
    p.add_argument("--gen", type=int, default=1, choices=[1, 2],
                   help="1 = sharp primitives (near-family since the r5 "
                        "training data gained creases); 2 = the round-5 "
                        "held-out set (swept tubes, genus-1, stairs, "
                        "star creases, shells, platonic corners)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    specs = SPECS if args.gen == 1 else SPECS2
    for name, fn in specs:
        v, f = fn()
        write_off(os.path.join(args.out, f"{name}.off"), v, f)
        print(f"{name}: {len(v)} verts, {len(f)} faces, "
              f"bbox {v.min(0).round(2)}..{v.max(0).round(2)}")
    print(f"wrote {len(specs)} meshes to {args.out}")


if __name__ == "__main__":
    main()
