"""Optimizers, schedules, and SNN parameter-group handling (optax).

Reproduces the reference's *effective* optimization behaviour, quirks
included (SURVEY.md §2.1 #17-19):

fn (fn/config.py:233-298 + trainfn.py):
- AdamW; SNN params (names containing membrane_decay / threshold /
  refractory — which catches threshold_base but NOT the EIF delta_T /
  theta_rh) at 0.5x lr and 0.1x weight decay
- linear warmup writes the SAME lr into every group for it < warmup_steps
  (trainfn.py:264-267 overrides the group ratio — quirk preserved)
- the scheduler is stepped once per VALIDATION, not per iteration
  (trainfn.py:387-389), so cosine decay uses count = it // validate_every

fd (trainfd.py:78-84, fd/config.py:173-241):
- plain AdamW(lr=1e-4, wd from YAML), no SNN groups
  (use_snn_aware_optimizer defaults False)
- StepLR(step_size=10000, gamma=0.5) stepped per iteration AND per epoch
  (trainfd.py:398-412): decay count = it + epoch
- post-step clamps on membrane_decay / threshold_adapt / refractory_decay
  (trainfd.py:306-313)

Both: global-norm gradient clipping before the update.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

SNN_KEYS = ("membrane_decay", "threshold", "refractory")
CLAMPS = {
    "membrane_decay": (0.1, 0.99),
    "threshold_adapt": (0.001, 0.1),
    "refractory_decay": (0.1, 0.95),
}


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def snn_label_tree(params):
    """'snn' / 'main' label per leaf, reference name-matching semantics."""
    def label(path, _):
        s = _path_str(path)
        return "snn" if any(k in s for k in SNN_KEYS) else "main"
    return jax.tree_util.tree_map_with_path(label, params)


def clamp_snn_params(params):
    """Post-update clamps (trainfd.py:306-313)."""
    def clamp(path, leaf):
        s = _path_str(path)
        for key, (lo, hi) in CLAMPS.items():
            if key in s:
                return jnp.clip(leaf, lo, hi)
        return leaf
    return jax.tree_util.tree_map_with_path(clamp, params)


class TxBundle(NamedTuple):
    tx: optax.GradientTransformation
    lr_fn: Callable[[int, int], tuple[float, float]]  # (it, epoch)->(lr, snn_lr)


def _adam_core(name: str, betas, eps) -> optax.GradientTransformation:
    b1, b2 = betas
    if name in ("adam", "adamw"):
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
    if name == "sgd":
        return optax.trace(decay=0.9)
    raise ValueError(f"Unsupported optimizer: {name}")


def make_tx(params, optimizer: str = "adamw", betas=(0.9, 0.999),
            eps: float = 1e-8, weight_decay: float = 0.0,
            grad_clip: float | None = None, grad_clip_type: str = "norm",
            snn_groups: bool = True, snn_wd_scale: float = 0.1
            ) -> optax.GradientTransformation:
    """Gradient transform WITHOUT the final lr scaling: the train step
    applies (lr, snn_lr) scalars per group itself so schedules never force
    recompilation."""
    chain = []
    if grad_clip is not None and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip)
                     if grad_clip_type == "norm" else optax.clip(grad_clip))
    chain.append(_adam_core(optimizer, betas, eps))
    if weight_decay and optimizer == "adamw":
        if snn_groups:
            labels = snn_label_tree(params)
            chain.append(optax.multi_transform(
                {"main": optax.add_decayed_weights(weight_decay),
                 "snn": optax.add_decayed_weights(weight_decay * snn_wd_scale)},
                labels))
        else:
            chain.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*chain)


def apply_updates_grouped(params, updates, lr, snn_lr):
    """params - lr_group * update, with the snn group at snn_lr."""
    labels = snn_label_tree(params)
    return jax.tree.map(
        lambda p, u, lab: p - (snn_lr if lab == "snn" else lr) * u,
        params, updates, labels)


# --------------------------------------------------------------- schedules
def fn_schedule(cfg: dict) -> Callable[[int, int], tuple[float, float]]:
    t = cfg["training"]
    base = float(t.get("lr", 1e-3))
    policy = t.get("lr_policy", "none")
    warmup = int(t.get("warmup_steps", 0))
    wf = float(t.get("warmup_factor", 0.1))
    validate_every = int(t.get("validate_every", 2000))
    t_max = int(t.get("max_iterations", 300000))
    decay = float(t.get("lr_decay", 0.95))
    decay_step = int(t.get("lr_decay_step", 2000))
    min_lr = float(t.get("min_lr", 0.0))

    def sched(it: int, epoch: int) -> tuple[float, float]:
        if warmup > 0 and it < warmup:
            lr = base * (wf + (1 - wf) * it / warmup)
            return lr, lr  # warmup overrides the snn group ratio (quirk)
        count = it // max(validate_every, 1)  # stepped per validation
        if policy == "cosine":
            lr = base * 0.5 * (1 + math.cos(math.pi * min(count, t_max) / t_max))
        elif policy == "cosine_it":
            # per-ITERATION cosine to min_lr — the synth-recipe fix for
            # the reference's per-validation stepping quirk, under which
            # count = it // validate_every stays ~0 relative to t_max and
            # lr never leaves base (fn r4: flat 39 deg plateau over a
            # whole 31k-it run, configs/fn_synth_ft.yaml history)
            frac = min(max(it - warmup, 0) / max(t_max - warmup, 1), 1.0)
            lr = min_lr + (base - min_lr) * 0.5 * (1 + math.cos(math.pi * frac))
        elif policy == "step":
            lr = base * decay ** (count // max(decay_step, 1))
        else:
            lr = base
        return lr, lr * 0.5

    return sched


def sc_schedule(cfg: dict) -> Callable[[int, int], tuple[float, float]]:
    """Clean warmup+cosine for the sc model (a new model family — no
    reference quirks to preserve)."""
    t = cfg["training"]
    base = float(t.get("lr", 1e-3))
    warmup = int(t.get("warmup_steps", 500))
    t_max = int(t.get("max_iterations", 50000))
    min_lr = float(t.get("min_lr", 1e-5))

    def sched(it: int, epoch: int) -> tuple[float, float]:
        if warmup > 0 and it < warmup:
            lr = base * it / warmup
        else:
            frac = min(max(it - warmup, 0) / max(t_max - warmup, 1), 1.0)
            lr = min_lr + (base - min_lr) * 0.5 * (1 + math.cos(math.pi * frac))
        return lr, lr

    return sched


def fd_schedule(eff: dict, steps_per_epoch: int
                ) -> Callable[[int, int], tuple[float, float]]:
    base = eff["learning_rate"]
    step_size = eff["step_size"]
    gamma = eff["gamma"]

    def sched(it: int, epoch: int) -> tuple[float, float]:
        count = it + epoch  # double-step quirk (trainfd.py:398-412)
        lr = base * gamma ** (count // max(step_size, 1))
        return lr, lr  # fd uses no snn group

    return sched
