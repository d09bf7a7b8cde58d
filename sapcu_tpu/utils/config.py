"""YAML config system.

Mirrors the reference's two config loaders (fn/config.py:10-132,
fd/config.py:6-30): YAML + recursive merge + ``inherit_from`` chaining,
with the fn-side programmatic defaults layer. One loader serves both
models here.

The factories reproduce the reference's *effective* values, including its
documented quirks (SURVEY.md §5.6): fd training reads
``training.learning_rate`` (absent from YAML -> 1e-4, the YAML ``lr`` is
ignored), StepLR(10000, 0.5) from absent ``training.step_size``/``gamma``,
and the model constructors hardcode decoder hidden dims.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import yaml


def load_config(path: str, default_path: str | None = None) -> dict:
    if not os.path.exists(path):
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        if not os.path.isabs(inherit_from):
            inherit_from = os.path.join(os.path.dirname(path), inherit_from)
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path) as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    set_default_config_values(cfg)
    return cfg


def update_recursive(dict1: dict, dict2: dict) -> dict:
    for k, v in dict2.items():
        if isinstance(v, dict):
            node = dict1.setdefault(k, {})
            if isinstance(node, dict):
                update_recursive(node, v)
            else:
                dict1[k] = v
        else:
            dict1[k] = v
    return dict1


_DATA_DEFAULTS = {
    "pointcloud_n": 2048, "patch_n": 100, "patch_k": 16,
    "pointcloud_noise": 0.005, "pointcloud_file": "pointcloud.npz",
    "normalize_points": True, "normalize_scale": 1.0,
    "use_cache": False, "cache_size": 1000,
}
_MODEL_DEFAULTS = {
    "k_values": [20, 20, 16], "emb_dims": 1024, "time_steps_enc": 8,
    "time_steps_dec": 12, "num_heads": 4, "d_model": 512, "dropout": 0.1,
    "decoder_hidden_dims": [1024, 512, 256],
    "snn_params": {
        "membrane_decay_init": 0.9, "threshold_adapt_init": 0.01,
        "refractory_decay_init": 0.5, "grad_width": 10.0,
    },
}
_TRAINING_DEFAULTS = {
    "batch_size": 8, "num_workers": 4, "lr": 0.001, "lr_policy": "none",
    "lr_decay": 0.95, "lr_decay_step": 2000, "min_lr": 1e-5,
    "warmup_steps": 0, "warmup_factor": 0.1, "optimizer": "adam",
    "weight_decay": 0.0, "betas": [0.9, 0.999], "eps": 1e-8,
    "grad_clip": None, "grad_clip_type": "norm", "gradient_accumulation": 1,
    "max_iterations": 300000, "max_epochs": 500, "print_every": 50,
    "visualize_every": 1000, "checkpoint_every": 1000,
    "validate_every": 2000, "backup_every": 50000, "early_stopping": False,
    "patience": 20000, "min_delta": 0.0001, "use_amp": False,
    "snn_training": {"spike_rate_target": 0.1, "spike_rate_weight": 0.01,
                     "state_reset_freq": 100},
}
_LOSS_DEFAULTS = {
    "temperature": 0.1, "alpha": 0.1, "consistency_weight": 0.15,
    "k_neighbors": 8, "beta": 0.1, "reduction": "mean",
}


def set_default_config_values(cfg: dict) -> None:
    for section, defaults in [("data", _DATA_DEFAULTS),
                              ("model", _MODEL_DEFAULTS),
                              ("training", _TRAINING_DEFAULTS),
                              ("loss", _LOSS_DEFAULTS)]:
        node = cfg.setdefault(section, {})
        for k, v in defaults.items():
            node.setdefault(k, v)


def get_model(cfg: dict, kind: str, seed: int | None = None):
    """Build (params, state, model_cfg) for kind in {'fn', 'fd'}.

    Reproduces the effective constructor arguments of fn/config.py:183-231
    and fd/config.py:89-155.
    """
    from sapcu_tpu import models

    mc = cfg["model"]
    if seed is None:
        seed = cfg.get("hardware", {}).get("seed", 42)
    key = jax.random.PRNGKey(seed)
    if kind == "fn":
        return models.init_fn_model(
            key,
            k_values=tuple(mc.get("k_values", [20, 20, 16])),
            emb_dims=mc.get("emb_dims", 1024),
            time_steps_enc=mc.get("time_steps_enc", 8),
            num_heads=mc.get("num_heads", 4),
            dropout=mc.get("dropout", 0.1),
            decoder_dropout=mc.get("decoder_dropout", 0.1),
            snn_mode=mc.get("snn_mode", "feedback"),
            pca_prior=mc.get("pca_prior", False),
        )
    if kind == "sc":
        return models.init_sc_model(
            key,
            k=mc.get("k", 16),
            feat_dims=mc.get("feat_dims", 256),
            m_neighbors=mc.get("m_neighbors", 8),
            head_hidden=mc.get("head_hidden", 128),
            time_steps=mc.get("time_steps_enc", 4),
            dropout=mc.get("dropout", 0.0),
        )
    if kind == "fd":
        eif = mc.get("eif_params", {})
        return models.init_fd_model(
            key,
            k=mc.get("k", 20),
            emb_dims=mc.get("emb_dims", 512),
            time_steps=mc.get("time_steps_enc", 5),
            k_scales=tuple(mc.get("k_scales", [10, 20, 40])),
            num_heads=mc.get("num_heads", 4),
            dropout=mc.get("dropout", 0.1),
            eif_delta_t=eif.get("delta_T_init", 1.0),
            eif_theta_rh=eif.get("theta_rh_init", 0.8),
        )
    raise ValueError(f"unknown model kind: {kind}")


def effective_fd_training(cfg: dict) -> dict:
    """The values trainfd.py actually uses (trainfd.py:78-84), which differ
    from the YAML: learning_rate 1e-4 (not lr=2e-4), StepLR(10000, 0.5)
    (not the scheduler: block), weight decay from YAML."""
    t = cfg["training"]
    return {
        "learning_rate": float(t.get("learning_rate", 1e-4)),
        "weight_decay": float(t.get("weight_decay", 0.0)),
        "batch_size": int(t.get("batch_size", 4)),
        "step_size": int(t.get("step_size", 10000)),
        "gamma": float(t.get("gamma", 0.5)),
        "max_epochs": int(t.get("max_epochs", 200)),
        "max_iterations": int(t.get("max_iterations", 120000)),
        "grad_clip": float(t.get("grad_clip", 0.2)),
        "optimizer": t.get("optimizer", "adam"),
    }


def get_optimizer(params, cfg: dict, kind: str = "fn"):
    """Factory-name parity with fn/config.py:233-298 / fd get_optimizer:
    returns an optax transform with the reference's effective grouping
    (fn: SNN params at 0.5x lr via the grouped update in train.steps;
    fd: plain AdamW). The learning rate itself is applied per-step from
    get_scheduler's output."""
    from sapcu_tpu.train.optim import make_tx

    t = cfg["training"]
    if kind == "fn":
        return make_tx(params, optimizer=t.get("optimizer", "adamw"),
                       betas=tuple(t.get("betas", (0.9, 0.999))),
                       eps=float(t.get("eps", 1e-8)),
                       weight_decay=float(t.get("weight_decay", 0.0)),
                       grad_clip=t.get("grad_clip"),
                       grad_clip_type=t.get("grad_clip_type", "norm"),
                       snn_groups=True)
    eff = effective_fd_training(cfg)
    return make_tx(params, optimizer=eff["optimizer"],
                   betas=tuple(t.get("betas", (0.9, 0.999))),
                   eps=float(t.get("eps", 1e-8)),
                   weight_decay=eff["weight_decay"],
                   grad_clip=eff["grad_clip"], snn_groups=False)


def get_scheduler(cfg: dict, kind: str = "fn", steps_per_epoch: int = 1):
    """(it, epoch) -> (lr, snn_lr) matching the reference's effective
    schedules incl. quirks (fn/config.py:300-338 + trainfn.py:387-389;
    trainfd.py:398-412)."""
    from sapcu_tpu.train.optim import fd_schedule, fn_schedule

    if kind == "fn":
        return fn_schedule(cfg)
    return fd_schedule(effective_fd_training(cfg), steps_per_epoch)


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even though the image pre-imports jax.

    The runtime's sitecustomize imports jax before user code runs, so the
    env var alone is ignored; re-applying it through jax.config before the
    backend initialises makes ``JAX_PLATFORMS=cpu python trainfd.py ...``
    behave as expected. Call first thing in every CLI.

    Also enables the persistent compilation cache: on this runtime TPU
    compiles go through a slow AOT service (40s for a kernel, minutes for
    the flagship models; a cold e2e warmup measured 443s), so without a
    cross-process cache every CLI invocation pays the full compile bill.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialised; keep whatever it picked
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache.

    Verified to work across processes on the axon TPU backend (second
    process compile+run of the probe kernel: 1.52s -> 0.29s). Opt out with
    SAPCU_NO_CACHE=1; override the location with SAPCU_CACHE_DIR.
    """
    if os.environ.get("SAPCU_NO_CACHE") == "1":
        return None
    if path is None:
        path = os.environ.get("SAPCU_CACHE_DIR")
    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the flagship compiles are minutes; anything >2s is worth keeping
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None
    return path


def setup_seed(cfg: dict) -> int:
    seed = cfg.get("hardware", {}).get("seed", 42)
    import numpy as np
    np.random.seed(seed)
    return seed
