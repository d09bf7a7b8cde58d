"""Surrogate-gradient spike function.

Reference semantics (fn/snn_coder.py:135-153, fd/snn_coder.py:143-155):

- soft value: ``0.5 * N(clip(x,±10); 0, 1) + 0.5 * sigmoid(w * clip(x,±10))``
  (N is the *gaussian pdf value*, not its integral — quirk preserved)
- training forward: hard Heaviside ``(x > 0)`` via straight-through
  (``soft + (hard - soft).detach()``) → forward value is hard, gradient is
  d(soft)/dx with the clamp zeroing gradients outside |x| <= 10
- eval forward: the soft mixture itself (NOT binary spikes — documented
  divergence quirk of the reference, SURVEY.md §2.1 #10)
- default ``grad_width`` is 10.0 (the constructor default; YAML values are
  never plumbed through — SURVEY.md §2.1 #10)

Implemented with ``jax.custom_vjp`` so it is correct under vmap/scan/jit.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_CLAMP = 10.0


def soft_spike(x: jax.Array, grad_width: float = 10.0) -> jax.Array:
    """Differentiable soft spike mixture (eval-mode forward value)."""
    xc = jnp.clip(x, -_CLAMP, _CLAMP)
    gaussian = jnp.exp(-0.5 * xc * xc) * _INV_SQRT_2PI
    sigmoid = jax.nn.sigmoid(grad_width * xc)
    return 0.5 * gaussian + 0.5 * sigmoid


def surrogate_grad(x: jax.Array, grad_width: float = 10.0) -> jax.Array:
    """d(soft_spike)/dx, with the clamp's zero-gradient outside |x|<=10."""
    xc = jnp.clip(x, -_CLAMP, _CLAMP)
    gauss_term = 0.5 * (-xc) * jnp.exp(-0.5 * xc * xc) * _INV_SQRT_2PI
    sig = jax.nn.sigmoid(grad_width * xc)
    sig_term = 0.5 * grad_width * sig * (1.0 - sig)
    inside = (x >= -_CLAMP) & (x <= _CLAMP)
    return jnp.where(inside, gauss_term + sig_term, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def hard_spike_ste(x: jax.Array, grad_width: float = 10.0) -> jax.Array:
    """Hard Heaviside forward with the surrogate mixture gradient."""
    return (x > 0).astype(x.dtype)


def _hard_fwd(x, grad_width):
    return (x > 0).astype(x.dtype), x


def _hard_bwd(grad_width, x, g):
    return (g * surrogate_grad(x, grad_width),)


hard_spike_ste.defvjp(_hard_fwd, _hard_bwd)


def spike(x: jax.Array, *, training: bool, grad_width: float = 10.0) -> jax.Array:
    """Spike nonlinearity with the reference's train/eval asymmetry."""
    if training:
        return hard_spike_ste(x, grad_width)
    return soft_spike(x, grad_width)
