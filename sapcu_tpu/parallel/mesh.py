"""Device-mesh helpers: data-parallel training + seed-sharded inference.

The reference's only distributed mechanism is single-process
``torch.nn.DataParallel`` (trainfn.py:96-99, trainfd.py:139-142). The
TPU-native equivalent is GSPMD over a ``jax.sharding.Mesh``: parameters
replicated, the batch axis sharded over 'dp', and XLA inserting the
gradient all-reduce over ICI — no NCCL-style code, just shardings.

For inference, the arbitrary-scale axis (millions of seed points) shards
the same way (SURVEY.md §2.2 "TPU-native plan"): seeds split over 'dp',
the input cloud replicated.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / seed) axis over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis to a multiple (for even dp sharding); returns (arr, n_valid)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths), n
