"""Dataset pipeline tests: HDF5, mesh, legacy npz tree, loader."""
import os

import numpy as np
import pytest

from sapcu_tpu import data as data_mod
from sapcu_tpu.data.mesh import load_off, sample_surface, PU1KMeshDataset


def _write_sphere_off(path, nu=16, nv=12, r=0.4):
    verts, faces = [], []
    for i in range(nv + 1):
        th = np.pi * i / nv
        for j in range(nu):
            ph = 2 * np.pi * j / nu
            verts.append([r * np.sin(th) * np.cos(ph),
                          r * np.sin(th) * np.sin(ph), r * np.cos(th)])

    def vid(i, j):
        return i * nu + (j % nu)

    for i in range(nv):
        for j in range(nu):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    with open(path, "w") as f:
        f.write(f"OFF\n{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write("%f %f %f\n" % tuple(v))
        for fc in faces:
            f.write("3 %d %d %d\n" % tuple(fc))


def test_load_off_and_sampling(tmp_path):
    p = tmp_path / "s.off"
    _write_sphere_off(p)
    verts, faces = load_off(str(p))
    assert verts.shape[1] == 3 and faces.shape[1] == 3
    pts, normals = sample_surface(verts, faces, 500, np.random.default_rng(0))
    r = np.linalg.norm(pts, axis=1)
    assert 0.3 < r.mean() < 0.45          # on the sphere surface
    # normals roughly radial
    cos = np.abs(np.sum(normals * pts / r[:, None], axis=1))
    assert cos.mean() > 0.9


def test_mesh_dataset(tmp_path):
    for i in range(4):
        _write_sphere_off(tmp_path / f"m{i}.off")
    ds = PU1KMeshDataset(str(tmp_path), split="train", num_points=128,
                         num_patches=8, k_neighbors=6, seed=0)
    assert len(ds) == 3                    # 90/10 split of 4 files
    item = ds[0]
    assert item["input"].shape == (8, 6, 3)
    assert item["normal"].shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(item["normal"], axis=1), 1.0,
                               atol=1e-5)
    # unit-sphere normalization
    assert abs(np.linalg.norm(item["cloud"], axis=1).max() - 1.0) < 1e-5


def test_h5_dataset(tmp_path):
    import h5py
    rng = np.random.default_rng(0)
    path = str(tmp_path / "d.h5")
    with h5py.File(path, "w") as f:
        f["poisson_256"] = rng.normal(size=(20, 64, 3)).astype(np.float32)
        f["poisson_1024"] = rng.normal(size=(20, 256, 3)).astype(np.float32)
    ds = data_mod.PU1KDataset(path, split="train", num_input_points=64,
                              num_gt_points=256, k_neighbors=8, seed=0)
    assert len(ds) == 18                  # 90% of 20
    item = ds[0]
    assert item["input"].shape == (64, 8, 3)
    assert item["len"].shape == (64,)
    assert np.all(item["len"] >= 0)
    val = data_mod.PU1KDataset(path, split="val", num_input_points=64,
                               num_gt_points=256, k_neighbors=8)
    assert len(val) == 2

    comb = data_mod.CombinedPU1KDataset(pugan_path=path, pu1k_path=path,
                                        split="train", num_input_points=64,
                                        num_gt_points=256, k_neighbors=8)
    assert len(comb) == 36                # both files concatenated


def test_legacy_dataset(tmp_path):
    rng = np.random.default_rng(0)
    cat = tmp_path / "02691156"
    model = cat / "model_0"
    os.makedirs(model)
    cloud = rng.normal(size=(3000, 3)).astype(np.float32)
    np.savez(model / "pointcloud.npz", points=cloud)
    np.savez(model / "fn.npz", points=cloud[:50],
             normals=rng.normal(size=(50, 3)).astype(np.float32))
    np.savez(model / "fd.npz", points=cloud[:50],
             normals=rng.normal(size=(50, 3)).astype(np.float32),
             lens=np.abs(rng.normal(size=(50, 1))).astype(np.float32))
    with open(cat / "train.lst", "w") as f:
        f.write("model_0\n\n")             # empty-line filtering

    fn_ds = data_mod.Shapes3dDataset(str(tmp_path), "fn", split="train")
    assert len(fn_ds) == 1
    item = fn_ds[0]
    assert item["input"].shape == (8, 64, 3)
    assert item["normal"].shape == (8, 3)

    fd_ds = data_mod.Shapes3dDataset(str(tmp_path), "fd", split="train")
    item = fd_ds[0]
    assert item["input"].shape == (16, 100, 3)
    assert item["len"].shape == (16,)


def test_loader_batching_and_prefetch():
    ds = data_mod.SyntheticFdDataset(length=7, num_input_points=16,
                                     num_gt_points=32, k_neighbors=4)
    loader = data_mod.DataLoader(ds, batch_size=2, shuffle=True,
                                 drop_last=True, prefetch=2)
    batches = list(loader)
    assert len(batches) == 3              # 7 // 2 with drop_last
    assert batches[0]["input"].shape == (2, 16, 4, 3)
    # a second epoch reshuffles but yields the same count
    assert len(list(loader)) == 3
