"""Functional LIF / EIF neurons with learnable adaptive parameters.

Pure ``(params, state, x) -> (spikes, state)`` cells mirroring the dynamics
of the reference's ``MultiTimeConstantLIFNeuron`` (fn/snn_coder.py:87-133,
fd/snn_coder.py:94-141) and ``MultiTimeConstantEIFNeuron``
(fd/snn_coder.py:198-261):

    x        <- x * (refractory <= 0)                  # refractory gating
    V        <- V * decay * (1 - refractory) + x [+ exp-term for EIF]
    spikes   <- STE(V - threshold)                     # surrogate gradient
    V        <- V * (1 - spikes)                       # soft reset
    refr     <- refr * refr_decay + spikes
    thresh   <- thresh + adapt * spikes
    thresh   <- base + (thresh - base) * 0.95          # decay toward base

Per-channel learnable parameters live on the LAST axis (TPU lanes), so
broadcasting against ``[..., C]`` activations is free — no expand_param
reshuffling like the torch version needs for its channels-second layout.

Parameter clamps (decay in [0.1, 0.99], adapt in [0.001, 0.1], refractory
decay in [0.1, 0.95], EIF delta_T in [0.1, 5.0], theta_rh in [0.1, 2.0])
are applied inside the cell exactly like the reference; the training loop
additionally clamps the raw parameters after each optimizer step
(trainfd.py:306-313 analog in sapcu_tpu.train.optim).

Time-loop helpers:
- ``multi_step``: the fn-style loop where the *spike output feeds back as
  the next step's input* and state threads WITH gradients
  (fn/snn_coder.py:319-335).
- For the fd encoder's per-timestep detach (fd/snn_coder.py:438-442), use
  ``detach_state`` between scan steps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sapcu_tpu.snn.surrogate import spike


class NeuronState(NamedTuple):
    membrane: jax.Array
    threshold: jax.Array
    refractory: jax.Array


def lif_init(dim: int, membrane_decay_init: float = 0.9,
             threshold_adapt_init: float = 0.01,
             refractory_decay_init: float = 0.5,
             dtype=jnp.float32) -> dict:
    return {
        "membrane_decay": jnp.full((dim,), membrane_decay_init, dtype),
        "threshold_adapt": jnp.full((dim,), threshold_adapt_init, dtype),
        "refractory_decay": jnp.full((dim,), refractory_decay_init, dtype),
        "threshold_base": jnp.ones((dim,), dtype),
    }


def eif_init(dim: int, membrane_decay_init: float = 0.9,
             threshold_adapt_init: float = 0.01,
             refractory_decay_init: float = 0.5,
             delta_t_init: float = 1.0, theta_rh_init: float = 0.8,
             dtype=jnp.float32) -> dict:
    p = lif_init(dim, membrane_decay_init, threshold_adapt_init,
                 refractory_decay_init, dtype)
    p["delta_t"] = jnp.full((dim,), delta_t_init, dtype)
    p["theta_rh"] = jnp.full((dim,), theta_rh_init, dtype)
    return p


def init_state(params: dict, x: jax.Array) -> NeuronState:
    """Fresh state for an input shaped [..., C]: V=0, thresh=base, refr=0."""
    base = jnp.broadcast_to(params["threshold_base"], x.shape).astype(x.dtype)
    return NeuronState(jnp.zeros_like(x), base, jnp.zeros_like(x))


def detach_state(state: NeuronState) -> NeuronState:
    """Per-timestep truncation (torch .detach() at fd/snn_coder.py:438-442)."""
    return NeuronState(*[jax.lax.stop_gradient(s) for s in state])


def _clamped(params: dict) -> dict:
    c = {
        "membrane_decay": jnp.clip(params["membrane_decay"], 0.1, 0.99),
        "threshold_adapt": jnp.clip(params["threshold_adapt"], 0.001, 0.1),
        "refractory_decay": jnp.clip(params["refractory_decay"], 0.1, 0.95),
        "threshold_base": params["threshold_base"],
    }
    if "delta_t" in params:
        c["delta_t"] = jnp.clip(params["delta_t"], 0.1, 5.0)
        c["theta_rh"] = jnp.clip(params["theta_rh"], 0.1, 2.0)
    return c


def lif_step(params: dict, state: NeuronState, x: jax.Array, *,
             training: bool, grad_width: float = 10.0,
             hard: bool | None = None
             ) -> tuple[jax.Array, NeuronState]:
    """``hard`` overrides the spike forward kind: None = reference
    train/eval asymmetry (hard STE in training, soft mixture in eval);
    True forces hard Heaviside spikes in eval too. The soft mixture
    saturates at 0.5 for firing neurons (gaussian term -> 0, sigmoid -> 1,
    both halved), so eval activations run at HALF the scale the BN running
    statistics were collected at and the soft values feed the reset /
    refractory dynamics — deep stacks (fn's 3x6 SNN layers) decorrelate
    entirely under it. Rate-mode models opt into hard=True at eval."""
    p = _clamped(params)
    m, th, r = state
    x = x * (r <= 0).astype(x.dtype)
    m = m * p["membrane_decay"] * (1.0 - r) + x
    s = spike(m - th, training=training if hard is None else hard,
              grad_width=grad_width)
    m = m * (1.0 - s)
    r = r * p["refractory_decay"] + s
    th = th + p["threshold_adapt"] * s
    th = p["threshold_base"] + (th - p["threshold_base"]) * 0.95
    return s, NeuronState(m, th, r)


def eif_step(params: dict, state: NeuronState, x: jax.Array, *,
             training: bool, grad_width: float = 10.0,
             hard: bool | None = None
             ) -> tuple[jax.Array, NeuronState]:
    """EIF: adds delta_T * exp((V_prev - theta_rh)/delta_T) computed from the
    PRE-update membrane (fd/snn_coder.py:244-252). ``hard`` as in lif_step."""
    p = _clamped(params)
    m, th, r = state
    exp_arg = jnp.clip((m - p["theta_rh"]) / (p["delta_t"] + 1e-6), -5.0, 5.0)
    exp_term = p["delta_t"] * jnp.exp(exp_arg)
    x = x * (r <= 0).astype(x.dtype)
    m = m * p["membrane_decay"] * (1.0 - r) + x + exp_term
    s = spike(m - th, training=training if hard is None else hard,
              grad_width=grad_width)
    m = m * (1.0 - s)
    r = r * p["refractory_decay"] + s
    th = th + p["threshold_adapt"] * s
    th = p["threshold_base"] + (th - p["threshold_base"]) * 0.95
    return s, NeuronState(m, th, r)


def multi_step(params: dict, x: jax.Array, time_steps: int, *,
               training: bool, grad_width: float = 10.0,
               kind: str = "lif", remat: bool = False,
               input_mode: str = "feedback",
               out: str = "last",
               eval_spikes: str = "soft") -> jax.Array:
    """fn-style iteration: ``for t in T: x, state = cell(x, state)``.

    input_mode="feedback" (default, reference parity): the spike output of
    step t is the INPUT of step t+1 and state threads with gradients
    (fn/snn_coder.py:319-335). NOTE this wiring is structurally degenerate:
    a neuron that fires is refractory-gated for the rest of the loop
    (refractory decays geometrically and the gate is ``r <= 0``), and a
    neuron that never fires receives its own zero spike as input — so for
    T >= 3 the final spike map is ~all-zero regardless of input. The
    reference's own fn training plateaus at the sign-symmetric acos loss
    value of pi/2 (Observations.md:13-15 "final validation loss
    1.577-1.612") for exactly this reason.

    input_mode="constant" (rate coding, the fd-encoder wiring that DOES
    train, fd/snn_coder.py:408-474): every step receives the ORIGINAL
    input x; only neuron state evolves. Combine with out="mean" (mean
    spike map over T, standard rate decoding) for a trainable fn encoder.

    out: "last" returns the final spike map (reference), "mean" the mean
    over all T steps.

    eval_spikes: "soft" (default, reference parity) keeps the reference's
    train/eval asymmetry — eval forwards emit the soft surrogate mixture,
    which saturates at 0.5 for firing neurons and evolves different
    reset/refractory dynamics than the hard spikes the BN running
    statistics were collected under. "hard" uses Heaviside spikes at eval
    too (train/eval-consistent, deterministic); rate-mode models use it —
    measured on the flagship fn: soft-eval val angular error stays at the
    ~90 deg uncorrelated plateau while train-mode loss converges, hard
    eval tracks training.

    Inference on TPU can dispatch to the fused Pallas multi-step kernel
    (ops/pallas_kernels.lif_multistep_pallas): the whole T-step loop runs
    in VMEM per tile instead of a scan carry round-tripping HBM. Training
    keeps the XLA scan (the surrogate-gradient custom VJP differentiates
    through it).
    """
    # Opt-in (SAPCU_PALLAS_SNN=1): the fused kernel is numerically exact
    # but Mosaic compile time for the unrolled T-step body is minutes per
    # (shape, T) variant, so the default stays on the XLA scan which
    # fuses the elementwise body anyway. Feedback wiring only.
    import os
    if (not training and input_mode == "feedback" and out == "last"
            and os.environ.get("SAPCU_PALLAS_SNN") == "1"):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu and x.ndim >= 2:
            from sapcu_tpu.ops.pallas_kernels import lif_multistep_pallas
            flat = x.reshape(-1, x.shape[-1])
            out = lif_multistep_pallas(params, flat, time_steps, kind=kind,
                                       hard=False, grad_width=grad_width)
            return out.reshape(x.shape)

    step = lif_step if kind == "lif" else eif_step
    feedback = input_mode == "feedback"

    if not training:
        # Eval: unroll the T-step loop in Python. The unrolled chain is
        # one pure elementwise DAG that XLA fuses into a single pass
        # (read x once, write spikes once) — the lax.scan alternative
        # round-trips the (x, V, th, r) carry through HBM ~8 tensor
        # passes per step, which dominates inference on the [B, N, k, d]
        # branch tensors (HBM-bound, not FLOP-bound).
        hard = True if eval_spikes == "hard" else None
        st = init_state(params, x)
        cur, acc = x, 0.0
        for _ in range(time_steps):
            s_, st = step(params, st, cur, training=False,
                          grad_width=grad_width, hard=hard)
            if feedback:
                cur = s_
            acc = acc + s_
        return acc / time_steps if out == "mean" else s_

    mean = out == "mean"

    def body(carry, _):
        xc, acc, st = carry
        s, st = step(params, st, xc if feedback else x, training=training,
                     grad_width=grad_width)
        return (s if feedback else xc, acc + s if mean else s, st), None

    if remat:
        # recompute each step's elementwise chain in backward instead of
        # storing T per-step activation maps (fn blocks at training batch
        # sizes otherwise exceed a 16G chip)
        body = jax.checkpoint(body)
    (_, acc, _), _ = jax.lax.scan(
        body, (x, jnp.zeros_like(x), init_state(params, x)), None,
        length=time_steps)
    return acc / time_steps if mean else acc
