"""Parity tests for SNN neurons + layers vs independent torch-autograd oracles.

The oracles re-state the reference dynamics (fn/snn_coder.py:87-153,
fd/snn_coder.py:198-275) directly from the equations in torch, so JAX
custom_vjp gradients are checked against a completely independent autodiff
path.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sapcu_tpu import nn as fnn
from sapcu_tpu import snn


# ----------------------------------------------------------------- oracles
def torch_soft_spike(x, w=10.0):
    xc = torch.clamp(x, -10.0, 10.0)
    gaussian = torch.exp(-(xc ** 2) / 2) / math.sqrt(2 * math.pi)
    sigmoid = torch.sigmoid(w * xc)
    return 0.5 * gaussian + 0.5 * sigmoid


def torch_spike(x, w=10.0, training=True):
    s = torch_soft_spike(x, w)
    if training:
        hard = (x > 0).float()
        s = s + (hard - s).detach()
    return s


def torch_lif_step(p, state, x, training=True, eif=False):
    md = torch.clamp(p["membrane_decay"], 0.1, 0.99)
    ta = torch.clamp(p["threshold_adapt"], 0.001, 0.1)
    rd = torch.clamp(p["refractory_decay"], 0.1, 0.95)
    base = p["threshold_base"]
    m, th, r = state
    if eif:
        dt = torch.clamp(p["delta_t"], 0.1, 5.0)
        trh = torch.clamp(p["theta_rh"], 0.1, 2.0)
        exp_term = dt * torch.exp(torch.clamp((m - trh) / (dt + 1e-6), -5.0, 5.0))
    x = x * (r <= 0).float()
    m = m * md * (1 - r) + x
    if eif:
        m = m + exp_term
    s = torch_spike(m - th, training=training)
    m = m * (1 - s)
    r = r * rd + s
    th = th + ta * s
    th = base + (th - base) * 0.95
    return s, (m, th, r)


def make_params(rng, c, eif=False):
    p = {
        "membrane_decay": rng.uniform(0.3, 0.95, c).astype(np.float32),
        "threshold_adapt": rng.uniform(0.005, 0.05, c).astype(np.float32),
        "refractory_decay": rng.uniform(0.2, 0.9, c).astype(np.float32),
        "threshold_base": rng.uniform(0.5, 1.5, c).astype(np.float32),
    }
    if eif:
        p["delta_t"] = rng.uniform(0.5, 2.0, c).astype(np.float32)
        p["theta_rh"] = rng.uniform(0.4, 1.2, c).astype(np.float32)
    return p


# ------------------------------------------------------------------- tests
def test_soft_spike_value_at_zero():
    got = float(snn.soft_spike(jnp.array(0.0)))
    want = 0.5 / math.sqrt(2 * math.pi) + 0.25
    assert abs(got - want) < 1e-6


def test_hard_spike_forward(rng):
    x = rng.normal(size=(100,)).astype(np.float32)
    got = np.asarray(snn.hard_spike_ste(jnp.asarray(x)))
    np.testing.assert_array_equal(got, (x > 0).astype(np.float32))


def test_ste_gradient_matches_torch(rng):
    x = rng.normal(size=(200,)).astype(np.float32) * 4
    x[:5] = [-12.0, 12.0, 0.0, -10.0, 10.0]  # clamp boundary cases

    jg = np.asarray(jax.grad(lambda v: jnp.sum(snn.hard_spike_ste(v, 10.0)))(jnp.asarray(x)))

    xt = torch.tensor(x, requires_grad=True)
    torch_spike(xt, training=True).sum().backward()
    np.testing.assert_allclose(jg, xt.grad.numpy(), atol=1e-5)


def test_eval_spike_is_soft(rng):
    x = rng.normal(size=(50,)).astype(np.float32)
    got = np.asarray(snn.spike(jnp.asarray(x), training=False))
    want = torch_soft_spike(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert not np.all(np.isin(got, [0.0, 1.0]))  # soft, not binary


def _run_parity(kind, rng, steps=3):
    c, b = 6, 4
    eif = kind == "eif"
    praw = make_params(rng, c, eif=eif)
    x0 = (rng.normal(size=(b, c)) * 2).astype(np.float32)

    # jax side: multi_step with spike-feedback semantics
    pj = {k: jnp.asarray(v) for k, v in praw.items()}
    got = np.asarray(snn.multi_step(pj, jnp.asarray(x0), steps, training=True,
                                    kind=kind))

    # torch oracle
    pt = {k: torch.tensor(v) for k, v in praw.items()}
    xt = torch.tensor(x0)
    st = (torch.zeros_like(xt), pt["threshold_base"].expand_as(xt).clone(),
          torch.zeros_like(xt))
    for _ in range(steps):
        xt, st = torch_lif_step(pt, st, xt, training=True, eif=eif)
    np.testing.assert_allclose(got, xt.numpy(), atol=1e-5)


def test_lif_multi_step_parity(rng):
    _run_parity("lif", rng)


def test_eif_multi_step_parity(rng):
    _run_parity("eif", rng)


def test_lif_multi_step_gradient_parity(rng):
    c, b, steps = 5, 3, 4
    praw = make_params(rng, c)
    x0 = (rng.normal(size=(b, c)) * 2).astype(np.float32)

    pj = {k: jnp.asarray(v) for k, v in praw.items()}

    def loss_j(params, x):
        return jnp.sum(snn.multi_step(params, x, steps, training=True) ** 2)

    gx = np.asarray(jax.grad(loss_j, argnums=1)(pj, jnp.asarray(x0)))
    gp = jax.grad(loss_j, argnums=0)(pj, jnp.asarray(x0))

    pt = {k: torch.tensor(v, requires_grad=True) for k, v in praw.items()}
    xt = torch.tensor(x0, requires_grad=True)
    cur = xt
    st = (torch.zeros_like(xt), pt["threshold_base"].expand_as(xt).clone(),
          torch.zeros_like(xt))
    for _ in range(steps):
        cur, st = torch_lif_step(pt, st, cur, training=True)
    (cur ** 2).sum().backward()

    np.testing.assert_allclose(gx, xt.grad.numpy(), atol=1e-4)
    for k in praw:
        np.testing.assert_allclose(np.asarray(gp[k]), pt[k].grad.numpy(),
                                   atol=1e-4, err_msg=k)


def test_detach_state_blocks_gradient(rng):
    c = 4
    praw = make_params(rng, c)
    pj = {k: jnp.asarray(v) for k, v in praw.items()}
    x = jnp.asarray(rng.normal(size=(2, c)).astype(np.float32))

    def two_steps(x, detach):
        st = snn.init_state(pj, x)
        s1, st = snn.lif_step(pj, st, x, training=True)
        if detach:
            st = snn.detach_state(st)
        s2, _ = snn.lif_step(pj, st, x, training=True)
        return jnp.sum(s2)

    g_detached = jax.grad(lambda v: two_steps(v, True))(x)
    g_full = jax.grad(lambda v: two_steps(v, False))(x)
    # with detach, only the direct x->s2 path contributes; they must differ
    assert not np.allclose(np.asarray(g_detached), np.asarray(g_full))
    assert np.all(np.isfinite(np.asarray(g_detached)))


def test_batchnorm_matches_torch(rng):
    c = 8
    x = rng.normal(size=(4, 10, c)).astype(np.float32) * 3 + 1
    params, state = fnn.bn_init(c)
    y, new_state = fnn.bn_apply(params, state, jnp.asarray(x), training=True)

    tbn = torch.nn.BatchNorm1d(c)
    # torch layout [B, C, N]
    ty = tbn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), atol=1e-4)

    # eval mode uses running stats
    tbn.eval()
    y2, _ = fnn.bn_apply(params, new_state, jnp.asarray(x), training=False)
    ty2 = tbn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y2), ty2.detach().numpy(), atol=1e-4)


def test_activations_match_torch(rng):
    x = rng.normal(size=(100,)).astype(np.float32) * 5
    np.testing.assert_allclose(np.asarray(fnn.gelu(jnp.asarray(x))),
                               torch.nn.functional.gelu(torch.tensor(x)).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fnn.leaky_relu(jnp.asarray(x))),
                               torch.nn.functional.leaky_relu(torch.tensor(x), 0.2).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fnn.softplus_beta(jnp.asarray(x), 5.0)),
                               torch.nn.functional.softplus(torch.tensor(x), beta=5.0).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fnn.l2_normalize(jnp.asarray(x.reshape(10, 10)))),
        torch.nn.functional.normalize(torch.tensor(x.reshape(10, 10)), dim=-1).numpy(), atol=1e-6)


def test_rate_mode_multi_step(rng):
    """input_mode="constant" + out="mean": neurons integrate the SAME input
    every step (fd-encoder wiring, fd/snn_coder.py:408-474) and the mean
    spike map is a genuine rate code — unlike the reference fn's feedback
    wiring, whose final spike map is ~all-zero for T >= 3 (the structural
    reason the reference fn plateaus at the pi/2 acos loss,
    Observations.md:13-15)."""
    c = 16
    params = snn.lif_init(c)
    x = jnp.asarray(rng.normal(size=(32, c)).astype(np.float32))

    rate = snn.multi_step(params, x, 6, training=True,
                          input_mode="constant", out="mean")
    # manual loop
    st = snn.init_state(params, x)
    acc = jnp.zeros_like(x)
    for _ in range(6):
        s, st = snn.lif_step(params, st, x, training=True)
        acc = acc + s
    np.testing.assert_allclose(np.asarray(rate), np.asarray(acc) / 6,
                               atol=1e-6)
    # alive: a strong positive input fires within T steps
    assert float(jnp.mean(rate)) > 0.01
    # degenerate reference wiring: final spike map is all-zero at T=6
    dead = snn.multi_step(params, x, 6, training=True)
    assert float(jnp.max(jnp.abs(dead))) == 0.0
    # eval path agrees with the scan path on the hard forward semantics
    rate_eval = snn.multi_step(params, x, 6, training=False,
                               input_mode="constant", out="mean")
    assert rate_eval.shape == x.shape


def test_eval_spikes_hard_matches_training_forward(rng):
    """eval_spikes="hard": the eval forward is EXACTLY the training
    forward (hard Heaviside spikes, same reset/refractory trajectory) —
    the rate-mode train/eval consistency fix. The default soft eval
    saturates firing neurons at 0.5 (gaussian pdf term -> 0, sigmoid -> 1,
    both halved), a ~2x activation-scale shift vs the BN running stats."""
    c = 16
    params = snn.lif_init(c)
    x = jnp.asarray(rng.normal(size=(32, c)).astype(np.float32)) * 2.0

    train_fwd = snn.multi_step(params, x, 6, training=True,
                               input_mode="constant", out="mean")
    eval_hard = snn.multi_step(params, x, 6, training=False,
                               input_mode="constant", out="mean",
                               eval_spikes="hard")
    np.testing.assert_allclose(np.asarray(eval_hard), np.asarray(train_fwd),
                               atol=1e-6)
    # and the soft default is genuinely different (firing neurons halved)
    eval_soft = snn.multi_step(params, x, 6, training=False,
                               input_mode="constant", out="mean")
    assert float(jnp.max(jnp.abs(eval_soft - train_fwd))) > 0.1
    # soft spike value of a strongly-firing neuron saturates at 0.5
    from sapcu_tpu.snn.surrogate import soft_spike
    assert abs(float(soft_spike(jnp.asarray(9.0))) - 0.5) < 1e-3


def test_fn_rate_mode_trains():
    """snn_mode="rate" fn: spikes fire, outputs vary across patches, and
    encoder gradients are finite (the feedback default produces exactly-zero
    spike maps and inf grad norms — the round-3 diagnosis)."""
    from sapcu_tpu.models import fn_model as M

    key = jax.random.PRNGKey(0)
    p, s, cfg = M.init_fn_model(key, k_values=(6, 5, 4), emb_dims=32,
                                time_steps_enc=4, num_heads=2,
                                snn_mode="rate")
    cfg = dict(cfg, remat=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 12, 3)) * 0.05
    gt = jax.random.normal(jax.random.PRNGKey(2), (8, 3))

    def loss_fn(p):
        out, ns = M.fn_apply(p, s, x, cfg, training=True,
                             rng=jax.random.PRNGKey(3))
        l, _ = M.fn_loss(out, gt)
        return l, ns

    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    rates = np.asarray(ns["enc"]["spike_rates"])
    assert rates[0] > 0.01 and rates[-1] > 0.01      # snn_init / snn_final fire
    gn = float(jnp.sqrt(sum(jnp.sum(v ** 2)
                            for v in jax.tree.leaves(g["enc"]))))
    assert np.isfinite(gn) and gn > 0
