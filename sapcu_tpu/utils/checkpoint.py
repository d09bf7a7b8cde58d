"""Checkpoint I/O for parameter/optimizer pytrees.

Functional analog of the reference ``CheckpointIO`` (fn/checkpoints.py:7-102,
fd/checkpoints.py:7-107): a directory-scoped saver/loader with the same
logical payload — ``{"model": ..., "optimizer": ..., <scalar kwargs>}`` —
and the same filenames (model.pt / model_best.pt / model_latest.pt /
model_interrupt.pt / model_crash.pt), so tooling built around the
reference's checkpoint cadence maps 1:1.

Format: a pickle of numpy-ified pytrees (device arrays are pulled to host
once, no per-leaf transfers on save). ``load`` restores jnp arrays and
returns the leftover scalars (epoch_it, it, loss_val_best), matching
fd/checkpoints.py:88-107. Missing files raise FileNotFoundError like the
fd variant (fd/checkpoints.py:51-58).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x)
                        if isinstance(x, (jax.Array, np.ndarray)) else x, tree)


def _to_device(tree):
    return jax.tree.map(lambda x: jnp.asarray(x)
                        if isinstance(x, np.ndarray) else x, tree)


class CheckpointIO:
    """Saves/loads named pytrees plus scalar metadata.

    >>> ckpt = CheckpointIO('out/fd', model=params, optimizer=opt_state)
    >>> ckpt.save('model.pt', epoch_it=3, it=1000, loss_val_best=0.1)
    >>> scalars = ckpt.load('model_best.pt')   # mutates registered trees? no:
    >>> params = ckpt.trees['model']           # retrieve restored trees
    """

    def __init__(self, checkpoint_dir: str = "./chkpts", **trees: Any):
        self.checkpoint_dir = checkpoint_dir
        self.trees = dict(trees)
        os.makedirs(checkpoint_dir, exist_ok=True)

    def register(self, **trees: Any) -> None:
        self.trees.update(trees)

    def save(self, filename: str, **scalars: Any) -> str:
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        payload = dict(scalars)
        for name, tree in self.trees.items():
            payload[name] = _to_host(tree)
        tmp = filename + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, filename)  # atomic: no torn checkpoints on crash
        return filename

    def load(self, filename: str) -> dict:
        """Restore registered trees in-place; return leftover scalars."""
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        if not os.path.exists(filename):
            raise FileNotFoundError(f"Checkpoint not found: {filename}")
        with open(filename, "rb") as f:
            payload = pickle.load(f)
        scalars = {}
        for k, v in payload.items():
            if k in self.trees:
                self.trees[k] = _to_device(v)
            else:
                scalars[k] = v
        return scalars

    def exists(self, filename: str) -> bool:
        return os.path.exists(os.path.join(self.checkpoint_dir, filename))


def load_model_weights(bundle, base_dir: str, kind: str,
                       filename: str = "model_best.pt"):
    """Swap a (params, state, cfg) model bundle's weights for the ones in
    ``<base_dir>/<kind>/<filename>`` (the train loop's checkpoint layout).

    Convenience for inference/bench CLIs that build models via get_model
    and then want trained weights — the analog of the reference's
    CheckpointIO.load('model_best.pt') at generate.py:119-128.
    """
    params, state, cfg = bundle
    ckpt = CheckpointIO(os.path.join(base_dir, kind),
                        model=params, model_state=state)
    scalars = ckpt.load(filename)
    # Checkpoints written by the train loop are self-describing: honor the
    # stored architecture hyperparameters (e.g. snn_mode) over the ones the
    # caller's config happened to build with.
    stored = scalars.get("model_cfg")
    if isinstance(stored, dict):
        cfg = {**cfg, **stored}
    return ckpt.trees["model"], ckpt.trees["model_state"], cfg
