"""Minimal functional layer library (params/state as pytrees).

The reference models are built from 1x1 convolutions (= dense layers on a
channels-last layout), BatchNorm, LayerNorm, GELU/LeakyReLU/Softplus and
dropout. We hand-roll them as pure functions so that SNN neuron states and
BatchNorm running statistics can be threaded explicitly through
``lax.scan`` time loops — something the reference does imperatively with
mutable modules (e.g. BN applied once per SNN timestep,
fd/snn_coder.py:408-480).

Layout convention: channels LAST everywhere (TPU lanes), so a torch
``Conv1d(C_in, C_out, 1)`` on [B, C, N] becomes ``dense`` on [B, N, C] and a
``Conv2d`` 1x1 on [B, C, N, k] becomes ``dense`` on [B, N, k, C] — both are
plain MXU matmuls under XLA.

Initialisation matches torch defaults for Linear/Conv (kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for weight and bias) so
randomly-initialised forwards have the same activation scale as the
reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
               dtype=jnp.float32) -> dict:
    """Torch-default init: U(±1/sqrt(fan_in)) for kernel and bias."""
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    params = {"kernel": _uniform(kkey, (in_dim, out_dim), bound, dtype)}
    if use_bias:
        params["bias"] = _uniform(bkey, (out_dim,), bound, dtype)
    return params


def dense(params: dict, x: jax.Array) -> jax.Array:
    # mixed-precision safe: inputs may be bf16, accumulation stays f32 on
    # the MXU, output returns to the compute dtype
    kernel = params["kernel"].astype(x.dtype)
    y = jnp.matmul(x, kernel, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def bn_init(dim: int, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (params, state): affine scale/bias + running mean/var."""
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def bn_apply(params: dict, state: dict, x: jax.Array, *, training: bool,
             momentum: float = 0.1, eps: float = 1e-5) -> tuple[jax.Array, dict]:
    """BatchNorm over all axes except the last (torch BatchNorm1d/2d analog).

    In training, normalises with biased batch statistics and updates running
    stats with the unbiased variance (torch semantics); in eval, uses the
    running statistics.
    """
    axes = tuple(range(x.ndim - 1))
    if training:
        # statistics always in f32 (torch autocast keeps BN in fp32 too)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": ((1 - momentum) * state["mean"].astype(jnp.float32)
                     + momentum * mean).astype(state["mean"].dtype),
            "var": ((1 - momentum) * state["var"].astype(jnp.float32)
                    + momentum * unbiased).astype(state["var"].dtype),
        }
    else:
        mean, var = (state["mean"].astype(jnp.float32),
                     state["var"].astype(jnp.float32))
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = ((x.astype(jnp.float32) - mean) * inv).astype(x.dtype) \
        * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)
    return y, new_state


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]


def gelu(x: jax.Array) -> jax.Array:
    """Exact erf GELU (torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope)


def softplus_beta(x: jax.Array, beta: float = 5.0) -> jax.Array:
    """torch nn.Softplus(beta): log(1 + exp(beta x)) / beta, stable."""
    return jax.nn.softplus(beta * x) / beta


def dropout(rng, x: jax.Array, rate: float, training: bool) -> jax.Array:
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
