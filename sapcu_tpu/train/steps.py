"""Jitted train / eval steps for fn and fd.

One compiled step per (model, batch shape); the learning rate enters as a
traced scalar so schedules never recompile. Data-parallel execution needs
no separate code path: batches arrive sharded over the mesh's 'dp' axis
(sapcu_tpu.parallel) and GSPMD inserts the gradient psum.

Guards mirror the reference trainers:
- fn: NaN/Inf in loss or any gradient skips the whole update
  (fn/trainer.py:77-116) — expressed as a jnp.where select, so the guard
  costs one fused reduction instead of a host sync;
- fd: post-step SNN parameter clamps (trainfd.py:306-313);
- fd resets SNN carry state every train step (fd/trainer.py:29-31), so
  the carry is simply not threaded here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from sapcu_tpu.models import (fd_apply, fd_loss, fn_apply, fn_loss,
                              angular_error_deg, sc_apply, sc_loss)
from sapcu_tpu.train.optim import apply_updates_grouped, clamp_snn_params


def _all_finite(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


# Elementwise gradient saturation bound, applied before clipping/Adam.
#
# Why (round-3 finding): at init the SNN feedback loops collapse to
# all-zero spike maps (structural — the reference has the same dynamics,
# fn/snn_coder.py:319-335: t=1 spikers turn refractory, non-spikers get a
# zero input), so ~20 chained BatchNorms normalise zero-variance inputs
# and each multiplies backward signals by rsqrt(eps)~316. The product
# overflows f32 -> optax.clip_by_global_norm(inf) zeroes EVERY update and
# fn training silently reduces to weight decay. The reference hits the
# identical wall: torch clip_grad_norm_ with an inf total norm also scales
# all grads to zero (clip_coef = max_norm/inf), so its early fn steps were
# no-ops too. Saturating elementwise keeps the update direction (sign
# structure) of the exploding component, keeps the global norm finite so
# norm clipping works, and is a no-op for healthy gradients; NaNs still
# propagate (clip(nan)=nan) so the _all_finite skip-guard catches genuine
# numerical failure. Documented divergence: strictly more functional than
# the reference's zero-step in the same regime.
_GRAD_SAT = 1e4


def _saturate(grads):
    return jax.tree.map(lambda g: jnp.clip(g, -_GRAD_SAT, _GRAD_SAT), grads)


def _select(ok, new, old):
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)


def _amp_cast(tree, dtype):
    """Cast float32 leaves for bf16 compute; grads flow back as f32 through
    the cast (d/dx astype == astype back). The TPU analog of torch autocast
    (trainfd.py use_amp) — f32 matmuls on v5e run ~16x slower than bf16."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)


def make_fd_train_step(tx, cfg: dict, beta: float = 0.1,
                       clamp_after_step: bool = True,
                       use_amp: bool = False, accum_steps: int = 1):
    """fd train step. With accum_steps > 1 the batch (size accum*micro) is
    split into micro-batches whose gradients are averaged in a lax.scan
    before the single optimizer update. NOTE (parity): the reference fd
    loop never accumulates — its YAML sets gradient_accumulation: 2 but
    fd/trainer.py:24-36 ignores it — so configs/fd.yaml pins 1; the knob
    is honored here so setting it is no longer silently dead."""
    cdt = jnp.bfloat16 if use_amp else jnp.float32

    @jax.jit
    def step(params, opt_state, model_state, batch_input, batch_len,
             lr, rng):
        def loss_fn(p, ms, x, ln, r):
            # model_state (BatchNorm running stats) stays f32 even under
            # AMP — torch autocast keeps BN buffers fp32 too, and bn_apply
            # computes statistics in f32 regardless of activation dtype.
            if use_amp:
                p = _amp_cast(p, cdt)
                x = x.astype(cdt)
            pred, new_state, _ = fd_apply(p, ms, x, cfg,
                                          training=True, rng=r)
            return fd_loss(pred.astype(jnp.float32), ln, beta), new_state

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps > 1:
            b = batch_input.shape[0]
            micro = b // accum_steps
            assert micro * accum_steps == b, (
                f"batch {b} not divisible by gradient_accumulation "
                f"{accum_steps}")
            xs = batch_input.reshape((accum_steps, micro)
                                     + batch_input.shape[1:])
            lns = batch_len.reshape((accum_steps, micro)
                                    + batch_len.shape[1:])
            rngs = (jax.random.split(rng, accum_steps)
                    if rng is not None else None)

            def body(carry, inp):
                ms, gacc = carry
                x, ln, r = inp
                (l, ms2), g = grad_fn(params, ms, x, ln, r)
                return (ms2, jax.tree.map(jnp.add, gacc, g)), l

            zeros = jax.tree.map(jnp.zeros_like, params)
            (new_state, gsum), ls = jax.lax.scan(
                body, (model_state, zeros), (xs, lns, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            loss = jnp.mean(ls)
        else:
            (loss, new_state), grads = grad_fn(
                params, model_state, batch_input, batch_len, rng)
        grads = _saturate(grads)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = apply_updates_grouped(params, updates, lr, lr)
        if clamp_after_step:
            new_params = clamp_snn_params(new_params)

        ok = _all_finite(grads) & jnp.isfinite(loss)
        params_out = _select(ok, new_params, params)
        opt_out = _select(ok, new_opt, opt_state)
        state_out = _select(ok, new_state, model_state)
        return params_out, opt_out, state_out, loss, grad_norm, ok

    return step


def make_fd_eval_step(cfg: dict, beta: float = 0.1):
    @jax.jit
    def step(params, model_state, batch_input, batch_len, carry):
        pred, _, new_carry = fd_apply(params, model_state, batch_input, cfg,
                                      training=False, carry=carry)
        loss = fd_loss(pred, batch_len, beta)
        mae = jnp.mean(jnp.abs(pred - batch_len))
        mse = jnp.mean((pred - batch_len) ** 2)
        rel = jnp.mean(jnp.abs(pred - batch_len) / (batch_len + 1e-8))
        return {"loss": loss, "mae": mae, "mse": mse,
                "relative_error": rel}, new_carry

    return step


def make_fn_train_step(tx, cfg: dict, consistency_weight: float = 0.15,
                       k_neighbors: int = 8, use_amp: bool = False,
                       accum_steps: int = 1):
    """fn train step; with accum_steps > 1 the batch (size accum*micro) is
    split into micro-batches and gradients are accumulated in a lax.scan
    before the single optimizer update — the reference's grad-accum
    semantics (fn/trainer.py:81-126: loss / gradient_accumulation summed
    over micro-batches, clip + step every accum batches). BN batch stats
    are computed per micro-batch, as the reference's forwards do."""
    cdt = jnp.bfloat16 if use_amp else jnp.float32

    @jax.jit
    def step(params, opt_state, model_state, batch_input, batch_normal,
             lr, snn_lr, rng):
        def loss_fn(p, ms, x, n, r):
            gt = n / jnp.maximum(
                jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            # BN running stats stay f32 under AMP (see make_fd_train_step)
            xc = x.astype(cdt) if use_amp else x
            pred, new_state = fn_apply(_amp_cast(p, cdt) if use_amp else p,
                                       ms, xc, cfg, training=True, rng=r)
            pred = pred.astype(jnp.float32)
            pred = pred / jnp.maximum(
                jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
            loss, conf = fn_loss(pred, gt, x,
                                 consistency_weight=consistency_weight,
                                 k_neighbors=k_neighbors)
            return loss, (new_state, conf)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps > 1:
            b = batch_input.shape[0]
            micro = b // accum_steps
            assert micro * accum_steps == b, (
                f"batch {b} not divisible by gradient_accumulation "
                f"{accum_steps}")
            xs = batch_input.reshape((accum_steps, micro)
                                     + batch_input.shape[1:])
            ns = batch_normal.reshape((accum_steps, micro)
                                      + batch_normal.shape[1:])
            rngs = (jax.random.split(rng, accum_steps)
                    if rng is not None else None)

            def body(carry, inp):
                ms, gacc = carry
                x, n, r = inp
                (l, (ms2, c)), g = grad_fn(params, ms, x, n, r)
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (ms2, gacc), (l, c)

            zeros = jax.tree.map(jnp.zeros_like, params)
            (new_state, gsum), (ls, cs) = jax.lax.scan(
                body, (model_state, zeros), (xs, ns, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            loss, conf = jnp.mean(ls), jnp.mean(cs)
        else:
            (loss, (new_state, conf)), grads = grad_fn(
                params, model_state, batch_input, batch_normal, rng)
        grads = _saturate(grads)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = apply_updates_grouped(params, updates, lr, snn_lr)
        new_params = clamp_snn_params(new_params)

        ok = _all_finite(grads) & jnp.isfinite(loss)
        params_out = _select(ok, new_params, params)
        opt_out = _select(ok, new_opt, opt_state)
        state_out = _select(ok, new_state, model_state)
        return params_out, opt_out, state_out, loss, conf, grad_norm, ok

    return step


def make_sc_train_step(tx, cfg: dict, use_amp: bool = False,
                       disp_weight: float = 100.0):
    """Shared-cloud-encoder step (models/sc_model.py): batch =
    {'cloud', 'query', 'normal', 'len'} from data/device_synth.py."""
    cdt = jnp.bfloat16 if use_amp else jnp.float32

    @jax.jit
    def step(params, opt_state, model_state, cloud, query, gt_normal,
             gt_len, lr, rng):
        def loss_fn(p):
            if use_amp:
                p = _amp_cast(p, cdt)
                c = cloud.astype(cdt)
            else:
                c = cloud
            normal, dist, new_state = sc_apply(p, model_state, c, query,
                                               cfg, training=True, rng=rng)
            return sc_loss(normal, dist, gt_normal, gt_len,
                           disp_weight=disp_weight), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = _saturate(grads)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = apply_updates_grouped(params, updates, lr, lr)
        new_params = clamp_snn_params(new_params)

        ok = _all_finite(grads) & jnp.isfinite(loss)
        params_out = _select(ok, new_params, params)
        opt_out = _select(ok, new_opt, opt_state)
        state_out = _select(ok, new_state, model_state)
        return params_out, opt_out, state_out, loss, grad_norm, ok

    return step


def make_sc_eval_step(cfg: dict, disp_weight: float = 100.0):
    @jax.jit
    def step(params, model_state, cloud, query, gt_normal, gt_len):
        normal, dist, _ = sc_apply(params, model_state, cloud, query, cfg,
                                   training=False)
        loss = sc_loss(normal, dist, gt_normal, gt_len,
                       disp_weight=disp_weight)
        mae = jnp.mean(jnp.abs(dist - gt_len))
        mse = jnp.mean((dist - gt_len) ** 2)
        ang = angular_error_deg(normal, gt_normal)
        return {"loss": loss, "mae": mae, "mse": mse,
                "angular_error_deg": ang}

    return step


def make_fn_eval_step(cfg: dict, consistency_weight: float = 0.15,
                      k_neighbors: int = 8):
    @jax.jit
    def step(params, model_state, batch_input, batch_normal):
        gt = batch_normal / jnp.maximum(
            jnp.linalg.norm(batch_normal, axis=-1, keepdims=True), 1e-12)
        pred, _ = fn_apply(params, model_state, batch_input, cfg,
                           training=False)
        pred = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
        loss, conf = fn_loss(pred, gt, batch_input,
                             consistency_weight=consistency_weight,
                             k_neighbors=k_neighbors)
        ang = angular_error_deg(pred, gt)
        return {"loss": loss, "confidence": conf, "angular_error_deg": ang}

    return step
