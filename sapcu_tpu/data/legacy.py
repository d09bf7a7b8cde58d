"""Legacy ShapeNet .lst/npz dataset path (fn/fd datacore + field + transform).

Replaces ``Shapes3dDataset`` (fn/datacore.py:260-356, fd/datacore.py:180-276)
with its per-model npz fields (fn/field.py, fd/field.py) and the GdataKNN
transforms:
- fn (fn/transform.py:39-58): subsample cloud to 1024, pick 8 GT samples,
  patches = 64-NN of each sample from the cloud, centered;
- fd (fd/transform.py:38-66): subsample to 2048, pick 16 GT samples,
  patches = 100-NN centered AND rotated so the GT normal aligns with +x.
"""
from __future__ import annotations

import os

import numpy as np
import yaml
from scipy.spatial import cKDTree

from sapcu_tpu.ops.pointops import rotation_to_target
import jax.numpy as jnp


def _rotate_to_x(normals: np.ndarray, patches: np.ndarray) -> np.ndarray:
    """Batched numpy wrapper over the vmapped Rodrigues op."""
    rots = np.asarray(rotation_to_target(jnp.asarray(normals),
                                         jnp.asarray([1.0, 0.0, 0.0])))
    return np.einsum("nij,nkj->nki", rots, patches)


def gdata_knn_fn(data: dict, n_cloud: int = 1024, n_patches: int = 8,
                 k: int = 64, rng=None) -> dict:
    rng = rng or np.random.default_rng()
    cloud = data["cloud"]
    cloud = cloud[rng.integers(0, cloud.shape[0], size=n_cloud)]
    sel = rng.integers(0, data["input"].shape[0], size=n_patches)
    centers = data["input"][sel]
    normal = data["normal"][sel]
    _, idx = cKDTree(cloud).query(centers, k=k)
    patches = cloud[idx] - centers[:, None, :]
    return {"input": patches.astype(np.float32),
            "normal": normal.astype(np.float32),
            "cloud": cloud.astype(np.float32)}


def gdata_knn_fd(data: dict, n_cloud: int = 2048, n_patches: int = 16,
                 k: int = 100, rng=None) -> dict:
    rng = rng or np.random.default_rng()
    cloud = data["cloud"]
    repl = cloud.shape[0] < n_cloud
    sel_c = (rng.integers(0, cloud.shape[0], size=n_cloud) if repl
             else rng.choice(cloud.shape[0], size=n_cloud, replace=False))
    cloud = cloud[sel_c]
    sel = rng.integers(0, data["input"].shape[0], size=n_patches)
    centers = data["input"][sel]
    normals = data["normal"][sel]
    lens = data["len"][sel]
    if lens.ndim == 2:
        lens = lens[:, 0]
    _, idx = cKDTree(cloud).query(centers, k=k)
    patches = cloud[idx] - centers[:, None, :]
    patches = _rotate_to_x(normals, patches)   # GT-normal alignment
    return {"input": patches.astype(np.float32),
            "len": lens.astype(np.float32),
            "cloud": cloud.astype(np.float32)}


def load_pointcloud_field(model_path: str, file_name: str) -> dict:
    d = np.load(os.path.join(model_path, file_name))
    return {"cloud": d["points"].astype(np.float32)}


def load_fn_field(model_path: str) -> dict:
    d = np.load(os.path.join(model_path, "fn.npz"))
    return {"input": d["points"].astype(np.float32),
            "normal": d["normals"].astype(np.float32)}


def load_fd_field(model_path: str) -> dict:
    d = np.load(os.path.join(model_path, "fd.npz"))
    return {"input": d["points"].astype(np.float32),
            "normal": d["normals"].astype(np.float32),
            "len": d["lens"].astype(np.float32)}


class Shapes3dDataset:
    """Category-dir + {split}.lst dataset (empty-line filtering preserved,
    fn/datacore.py:314-315)."""

    def __init__(self, dataset_folder: str, kind: str, split: str = "train",
                 categories=None, pointcloud_file: str = "pointcloud.npz",
                 seed: int | None = None):
        assert kind in ("fn", "fd")
        self.dataset_folder = dataset_folder
        self.kind = kind
        self.pointcloud_file = pointcloud_file
        self.rng = np.random.default_rng(seed)

        if categories is None:
            categories = sorted(
                c for c in os.listdir(dataset_folder)
                if os.path.isdir(os.path.join(dataset_folder, c)))

        meta_file = os.path.join(dataset_folder, "metadata.yaml")
        self.metadata = {}
        if os.path.exists(meta_file):
            with open(meta_file) as f:
                self.metadata = yaml.safe_load(f) or {}

        self.models = []
        for c in categories:
            lst = os.path.join(dataset_folder, c, f"{split}.lst")
            with open(lst) as f:
                names = [m for m in f.read().split("\n") if m.strip()]
            self.models += [{"category": c, "model": m} for m in names]

    def __len__(self):
        return len(self.models)

    def __getitem__(self, idx: int) -> dict:
        entry = self.models[idx]
        path = os.path.join(self.dataset_folder, entry["category"],
                            entry["model"])
        data = load_pointcloud_field(path, self.pointcloud_file)
        if self.kind == "fn":
            data.update(load_fn_field(path))
            return gdata_knn_fn(data, rng=self.rng)
        data.update(load_fd_field(path))
        return gdata_knn_fd(data, rng=self.rng)
