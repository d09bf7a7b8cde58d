"""Mesh utilities + PU1K mesh dataset (fn training data).

Host-side data pipeline replacing ``fn/datacore.py:13-258``
(PU1KMeshDataset): OFF parsing with fan triangulation, area-weighted
barycentric surface sampling with face normals, train-time augmentation
(z-rotation, scale 0.8-1.2, jitter sigma 0.002), unit-sphere
normalization, and kNN patch extraction (64 random centers x k=12).

Vectorised numpy throughout (the reference parses OFF line-by-line in
Python); patches use scipy cKDTree like the reference.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from scipy.spatial import cKDTree


def load_off(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse an OFF mesh -> (vertices [V,3] f32, faces [F,3] i32).

    Handles 'OFF' on its own line or prefixed to the counts line, and fan-
    triangulates polygons (fn/datacore.py:73-120 semantics).
    """
    with open(path) as f:
        tokens = f.read().split()
    i = 0
    if tokens[0].upper().startswith("OFF"):
        rest = tokens[0][3:]
        tokens = ([rest] if rest else []) + tokens[1:]
    nv, nf = int(tokens[0]), int(tokens[1])
    i = 3  # skip edge count
    verts = np.array(tokens[i:i + 3 * nv], dtype=np.float32).reshape(nv, 3)
    i += 3 * nv
    faces = []
    for _ in range(nf):
        n = int(tokens[i])
        idxs = [int(t) for t in tokens[i + 1:i + 1 + n]]
        i += 1 + n
        for j in range(1, n - 1):
            faces.append([idxs[0], idxs[j], idxs[j + 1]])
    return verts, np.asarray(faces, dtype=np.int32)


def face_normals_areas(verts: np.ndarray, faces: np.ndarray):
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    cross = np.cross(v1 - v0, v2 - v0)
    norm = np.linalg.norm(cross, axis=1, keepdims=True)
    normals = cross / np.maximum(norm, 1e-8)
    areas = 0.5 * norm[:, 0]
    return normals.astype(np.float32), areas.astype(np.float32)


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   rng: np.random.Generator):
    """Area-weighted barycentric sampling -> (points [n,3], normals [n,3])."""
    normals, areas = face_normals_areas(verts, faces)
    probs = areas / (areas.sum() + 1e-8)
    fi = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.random(n, dtype=np.float32))
    r2 = rng.random(n, dtype=np.float32)
    u, v, w = 1 - r1, r1 * (1 - r2), r1 * r2
    v0, v1, v2 = (verts[faces[fi, i]] for i in range(3))
    pts = u[:, None] * v0 + v[:, None] * v1 + w[:, None] * v2
    return pts.astype(np.float32), normals[fi]


def z_rotation(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)


def unit_sphere_normalize(points: np.ndarray) -> np.ndarray:
    points = points - points.mean(axis=0)
    r = np.sqrt((points ** 2).sum(axis=1)).max()
    return points / r if r > 0 else points


class PU1KMeshDataset:
    """fn training samples from .off meshes (fn/datacore.py:13-258).

    __getitem__ -> {'input': [P, k, 3], 'normal': [P, 3], 'cloud': [N, 3],
    'all_normals': [N, 3]} numpy float32.
    """

    def __init__(self, mesh_folder: str, split: str = "train",
                 num_points: int = 512, num_patches: int = 64,
                 k_neighbors: int = 12, seed: int | None = None):
        self.num_points = num_points
        self.num_patches = num_patches
        self.k_neighbors = k_neighbors
        self.split = split
        self.rng = np.random.default_rng(seed)

        files = []
        cats = [d for d in sorted(os.listdir(mesh_folder))
                if os.path.isdir(os.path.join(mesh_folder, d))]
        if cats:
            for c in cats:
                files.extend(glob.glob(os.path.join(mesh_folder, c, "*.off")))
        else:
            files = glob.glob(os.path.join(mesh_folder, "*.off"))
        if not files:
            raise ValueError(f"No .off files found in {mesh_folder}")
        files.sort()
        cut = int(len(files) * 0.9)  # 90/10 split by sorted order
        self.mesh_files = files[:cut] if split == "train" else files[cut:]

    def __len__(self):
        return len(self.mesh_files)

    def __getitem__(self, idx: int) -> dict:
        verts, faces = load_off(self.mesh_files[idx])
        points, normals = sample_surface(verts, faces, self.num_points, self.rng)

        if self.split == "train":
            rot = z_rotation(self.rng.uniform(0, 2 * np.pi))
            points = points @ rot.T
            normals = normals @ rot.T
            points = points * self.rng.uniform(0.8, 1.2)
            points = points + self.rng.normal(0, 0.002, points.shape).astype(np.float32)

        points = unit_sphere_normalize(points).astype(np.float32)
        normals = normals / (np.linalg.norm(normals, axis=1, keepdims=True) + 1e-8)

        tree = cKDTree(points)
        if len(points) > self.num_patches:
            centers = self.rng.choice(len(points), self.num_patches,
                                      replace=False)
        else:
            centers = np.arange(len(points))
        _, nbr = tree.query(points[centers], k=self.k_neighbors)
        return {
            "input": points[nbr].astype(np.float32),
            "normal": normals[centers].astype(np.float32),
            "cloud": points,
            "all_normals": normals.astype(np.float32),
        }
