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
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name, fn in SPECS:
        v, f = fn()
        write_off(os.path.join(args.out, f"{name}.off"), v, f)
        print(f"{name}: {len(v)} verts, {len(f)} faces, "
              f"bbox {v.min(0).round(2)}..{v.max(0).round(2)}")
    print(f"wrote {len(SPECS)} meshes to {args.out}")


if __name__ == "__main__":
    main()
