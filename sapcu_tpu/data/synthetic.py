"""Synthetic datasets for smoke training and tests.

Generates analytic surfaces (spheres / ellipsoids / planes+bumps) whose
ground-truth normals and distance fields are exact, producing the same
sample dicts as the real PU1K datasets. Used by the --synthetic CLI flag
and the test suite so the full training loops can run end-to-end without
the (absent) PU1K download.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def _ellipsoid(n, radii, rng):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * radii
    # exact ellipsoid normal: grad(x^2/a^2 + ...) normalized
    nrm = pts / (np.asarray(radii) ** 2)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts.astype(np.float32), nrm.astype(np.float32)


class SyntheticFnDataset:
    """fn-style samples: {'input' [P,k,3], 'normal' [P,3], 'cloud' [N,3]}."""

    def __init__(self, length: int = 32, num_points: int = 256,
                 num_patches: int = 16, k_neighbors: int = 12,
                 seed: int = 0):
        self.length = length
        self.num_points = num_points
        self.num_patches = num_patches
        self.k = k_neighbors
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        radii = rng.uniform(0.25, 0.48, size=3)
        pts, nrm = _ellipsoid(self.num_points, radii, rng)
        centers = rng.choice(len(pts), self.num_patches, replace=False)
        _, nbr = cKDTree(pts).query(pts[centers], k=self.k)
        return {"input": pts[nbr], "normal": nrm[centers], "cloud": pts,
                "all_normals": nrm}


class SyntheticFdDataset:
    """fd-style samples: {'input' [N,M,3], 'len' [N], 'cloud', 'points'}."""

    def __init__(self, length: int = 32, num_input_points: int = 64,
                 num_gt_points: int = 256, k_neighbors: int = 16,
                 seed: int = 0):
        self.length = length
        self.n_in = num_input_points
        self.n_gt = num_gt_points
        self.k = k_neighbors
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 99991 + idx)
        radii = rng.uniform(0.25, 0.48, size=3)
        gt, _ = _ellipsoid(self.n_gt, radii, rng)
        inp, _ = _ellipsoid(self.n_in, radii, rng)
        inp = inp + rng.normal(0, 0.01, inp.shape).astype(np.float32)
        dists, _ = cKDTree(gt).query(inp, k=1)
        m = min(self.k, len(inp))
        _, nbr = cKDTree(inp).query(inp, k=m)
        return {"input": inp[nbr].astype(np.float32),
                "len": dists.astype(np.float32),
                "cloud": inp.astype(np.float32),
                "points": gt.astype(np.float32)}
