"""HDF5 PU1K/PUGAN dataset (fd training data).

Replaces ``fd/datacore.py:13-178`` (PU1KDataset / CombinedPU1KDataset):
loads whole poisson_256/poisson_1024 arrays into host RAM, 90/10
train/val split by order, per-item augmentation (shared z-rot/scale for
input+GT, jitter on input only), input-centroid normalization applied to
both clouds, 1-NN distance-field ground truth from input to GT, and
self-kNN patches of the input (k = model k, NOT normal-rotated —
fd/datacore.py:131-136 quirk preserved).
"""
from __future__ import annotations

import os

import numpy as np
from scipy.spatial import cKDTree

from sapcu_tpu.data.mesh import z_rotation


class PU1KDataset:
    def __init__(self, h5_paths, split: str = "train",
                 input_key: str = "poisson_256",
                 gt_key: str = "poisson_1024",
                 num_input_points: int = 256, num_gt_points: int = 1024,
                 k_neighbors: int = 20, seed: int | None = None):
        import h5py

        if isinstance(h5_paths, str):
            h5_paths = [h5_paths]
        self.k_neighbors = k_neighbors
        self.split = split
        self.rng = np.random.default_rng(seed)

        inputs, gts = [], []
        for path in h5_paths:
            if not os.path.exists(path):
                continue
            with h5py.File(path, "r") as f:
                inp, gt = f[input_key][:], f[gt_key][:]
            if inp.ndim == 3 and gt.ndim == 3:
                inputs.append(inp)
                gts.append(gt)
        if not inputs:
            raise ValueError("No valid HDF5 data loaded")
        self.inputs = np.concatenate(inputs, axis=0).astype(np.float32)
        self.gt = np.concatenate(gts, axis=0).astype(np.float32)

        cut = int(len(self.inputs) * 0.9)
        sl = slice(None, cut) if split == "train" else slice(cut, None)
        self.inputs, self.gt = self.inputs[sl], self.gt[sl]

    def __len__(self):
        return len(self.inputs)

    def __getitem__(self, idx: int) -> dict:
        inp = self.inputs[idx].copy()
        gt = self.gt[idx].copy()

        if self.split == "train":
            rot = z_rotation(self.rng.uniform(0, 2 * np.pi))
            inp, gt = inp @ rot.T, gt @ rot.T
            scale = self.rng.uniform(0.8, 1.2)
            inp, gt = inp * scale, gt * scale
            inp = inp + self.rng.normal(0, 0.002, inp.shape).astype(np.float32)

        centroid = inp.mean(axis=0)
        inp -= centroid
        gt -= centroid
        r = np.sqrt((inp ** 2).sum(axis=1)).max()
        if r > 0:
            inp /= r
            gt /= r

        dists, _ = cKDTree(gt).query(inp, k=1)       # 1-NN distance GT

        m = min(self.k_neighbors, len(inp))
        _, nbr = cKDTree(inp).query(inp, k=m)
        return {
            "input": inp[nbr].astype(np.float32),     # [N, M, 3]
            "len": dists.astype(np.float32),           # [N]
            "cloud": inp.astype(np.float32),
            "points": gt.astype(np.float32),
        }


class CombinedPU1KDataset(PU1KDataset):
    """PUGAN + PU1K concatenation (fd/datacore.py:152-178)."""

    def __init__(self, pugan_path=None, pu1k_path=None, split="train",
                 **kwargs):
        paths = [p for p in (pugan_path, pu1k_path)
                 if p and os.path.exists(p)]
        if not paths:
            raise ValueError("At least one valid HDF5 path must be provided")
        super().__init__(paths, split=split, **kwargs)
