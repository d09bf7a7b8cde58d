from sapcu_tpu.data.mesh import PU1KMeshDataset, load_off, sample_surface
from sapcu_tpu.data.h5 import PU1KDataset, CombinedPU1KDataset
from sapcu_tpu.data.legacy import Shapes3dDataset, gdata_knn_fn, gdata_knn_fd
from sapcu_tpu.data.synthetic import SyntheticFnDataset, SyntheticFdDataset
from sapcu_tpu.data.loader import DataLoader, collate

__all__ = [
    "PU1KMeshDataset", "load_off", "sample_surface", "PU1KDataset",
    "CombinedPU1KDataset", "Shapes3dDataset", "gdata_knn_fn", "gdata_knn_fd",
    "SyntheticFnDataset", "SyntheticFdDataset", "DataLoader", "collate",
]


def get_dataset(mode: str, cfg: dict, kind: str):
    """Config-driven dataset factory (fn/config.py:134-181,
    fd/config.py:32-87), with a synthetic fallback when the configured
    data is absent and cfg['data']['synthetic'] is set."""
    data_cfg = cfg.get("data", {})
    if data_cfg.get("synthetic"):
        if kind == "fn":
            return SyntheticFnDataset(
                length=data_cfg.get("synthetic_length", 32),
                num_patches=data_cfg.get("patch_n", 16),
                k_neighbors=data_cfg.get("patch_k", 12),
                seed=0 if mode == "train" else 1)
        return SyntheticFdDataset(
            length=data_cfg.get("synthetic_length", 32),
            k_neighbors=cfg.get("model", {}).get("k", 16),
            seed=0 if mode == "train" else 1)

    if kind == "fn" and data_cfg.get("use_mesh"):
        split = {"train": "train", "val": "val", "test": "val"}[mode]
        return PU1KMeshDataset(
            mesh_folder=data_cfg["mesh_folder"], split=split,
            num_points=data_cfg.get("pointcloud_n", 512),
            num_patches=data_cfg.get("patch_n", 64),
            k_neighbors=data_cfg.get("patch_k", 12))

    if kind == "fd" and data_cfg.get("use_hdf5"):
        paths = data_cfg.get("hdf5_paths", {})
        split = "train" if mode == "train" else "val"
        return CombinedPU1KDataset(
            pugan_path=paths.get("pugan"),
            pu1k_path=paths.get("pu1k_train"),
            split=split,
            input_key=data_cfg.get("hdf5_input_key", "poisson_256"),
            gt_key=data_cfg.get("hdf5_gt_key", "poisson_1024"),
            num_input_points=data_cfg.get("num_input_points", 256),
            num_gt_points=data_cfg.get("num_gt_points", 1024),
            k_neighbors=cfg.get("model", {}).get("k", 20))

    split = {"train": data_cfg.get("train_split", "train"),
             "val": data_cfg.get("val_split", "val"),
             "test": data_cfg.get("test_split", "test")}[mode]
    return Shapes3dDataset(data_cfg["path"], kind, split=split,
                           pointcloud_file=data_cfg.get("pointcloud_file",
                                                        "pointcloud.npz"))
