"""End-to-end golden parity: fd model vs a torch oracle with shared weights.

The oracle restates the reference fd forward (fd/snn_coder.py:330-893)
in torch from the equations, loads the JAX model's parameters, and the
outputs must match in both eval mode (running BN stats + soft spikes) and
train-forward mode (batch BN stats + hard spikes). This exercises every
layout decision at once: channels-last vs channels-second, kNN ordering,
edge features, EIF/LIF dynamics, temporal integration, head-split
attention, Softplus head.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sapcu_tpu import models

K, EMB, T, KSC, HEADS = 8, 48, 2, (4, 8), 4


def t(x):
    return torch.tensor(np.asarray(x))


def torch_spike(x, training, w=10.0):
    xc = torch.clamp(x, -10.0, 10.0)
    s = (0.5 * torch.exp(-(xc ** 2) / 2) / math.sqrt(2 * math.pi)
         + 0.5 * torch.sigmoid(w * xc))
    if training:
        s = (x > 0).float()
    return s


def torch_neuron_step(p, state, x, training, eif=False):
    md = torch.clamp(t(p["membrane_decay"]), 0.1, 0.99)
    ta = torch.clamp(t(p["threshold_adapt"]), 0.001, 0.1)
    rd = torch.clamp(t(p["refractory_decay"]), 0.1, 0.95)
    tb = t(p["threshold_base"])
    m, th, r = state
    if eif:
        dt = torch.clamp(t(p["delta_t"]), 0.1, 5.0)
        trh = torch.clamp(t(p["theta_rh"]), 0.1, 2.0)
        exp_term = dt * torch.exp(torch.clamp((m - trh) / (dt + 1e-6), -5, 5))
    x = x * (r <= 0).float()
    m = m * md * (1 - r) + x
    if eif:
        m = m + exp_term
    s = torch_spike(m - th, training)
    m = m * (1 - s)
    r = r * rd + s
    th = tb + (th + ta * s - tb) * 0.95
    return s, (m, th, r)


def fresh_state(p, x):
    return (torch.zeros_like(x), t(p["threshold_base"]).expand_as(x).clone(),
            torch.zeros_like(x))


def torch_bn(p, s, x, training, eps=1e-5):
    """x channels-last [..., C]."""
    if training:
        axes = tuple(range(x.dim() - 1))
        mean = x.mean(dim=axes)
        var = x.var(dim=axes, unbiased=False)
    else:
        mean, var = t(s["mean"]), t(s["var"])
    return (x - mean) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])


def torch_dense(p, x):
    y = x @ t(p["kernel"])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def knn_idx(x, k):
    """channels-last [B, M, C] -> [B, M, k] nearest-first (self included)."""
    d = torch.cdist(x, x) ** 2
    return torch.topk(-d, k, dim=-1).indices


def graph_feature(x, k):
    idx = knn_idx(x, k)
    b, m, c = x.shape
    nb = torch.gather(x.unsqueeze(1).expand(b, m, m, c), 2,
                      idx.unsqueeze(-1).expand(b, m, k, c))
    return torch.cat([nb - x.unsqueeze(2), nb], dim=-1)  # [B, M, k, 2C]


def edge_block(p, s, x, k, training):
    g = graph_feature(x, k)
    h = torch_dense(p["fc"], g)
    h = torch_bn(p["bn"], s, h, training)
    h = F.leaky_relu(h, 0.2)
    return h.max(dim=-2).values


def torch_fd_forward(params, state, x_np, training):
    """Replica of fd_apply on [B, M, 3] input, channels-last oracle."""
    ep, es = params["enc"], state["enc"]
    x = t(x_np)
    b, m, _ = x.shape

    # hoisted block 0
    feats0 = []
    for p, s, k in zip(ep["ms_conv"], es["ms_conv"], KSC):
        feats0.append(edge_block(p, s["bn"], x, min(k, m), training))
    fused = torch_dense(ep["scale_fusion"]["fc"], torch.cat(feats0, -1))
    fused = torch_bn(ep["scale_fusion"]["bn"], es["scale_fusion_bn"], fused,
                     training)
    x0 = F.leaky_relu(fused, 0.2)

    states = [None] * 4
    pooled = []
    for _ in range(T):
        sts = states
        s0, st0 = torch_neuron_step(ep["snn"][0],
                                    sts[0] or fresh_state(ep["snn"][0], x0),
                                    x0, training, eif=True)
        states = [tuple(v.detach() for v in st0)]
        feats, cur = [s0], s0
        for i in range(3):
            h = edge_block(ep["conv"][i], es["conv_bn"][i], cur, min(K, m),
                           training)
            eif = i == 0
            sti = sts[i + 1] or fresh_state(ep["snn"][i + 1], h)
            si, sti = torch_neuron_step(ep["snn"][i + 1], sti, h, training,
                                        eif=eif)
            states.append(tuple(v.detach() for v in sti))
            feats.append(si)
            cur = si
        agg = torch_dense(ep["ms_fuse"]["fc"], torch.cat(feats, -1))
        agg = torch_bn(ep["ms_fuse"]["bn"], es["ms_fuse_bn"], agg, training)
        agg = F.leaky_relu(agg, 0.2)
        pooled.append(agg.max(dim=-2).values)

    w = torch.softmax(t(params["enc"]["temporal_w"]), 0)
    feat = torch.einsum("t,tbe->be", w, torch.stack(pooled))
    out, _ = torch_neuron_step(ep["snn_fc"],
                               fresh_state(ep["snn_fc"], feat), feat,
                               training)

    # decoder
    dp, ds = params["dec"], state["dec"]
    h = torch_dense(dp["fc_in"]["fc"], out)
    h = F.gelu(torch_bn(dp["fc_in"]["bn"], ds["fc_in_bn"], h, training))
    for blk, bns in zip(dp["res"], ds["res_bn"]):
        res = h
        y = torch_dense(blk["fc1"], h)
        y = F.gelu(torch_bn(blk["bn1"], bns["bn1"], y, training))
        y = torch_dense(blk["fc2"], y)
        y = torch_bn(blk["bn2"], bns["bn2"], y, training)
        if "res_proj" in blk:
            res = torch_dense(blk["res_proj"], res)
        h = F.gelu(y + res)
    ap = dp["attn"]
    res = h
    q, k_, v = torch_dense(ap["to_qkv"], h).chunk(3, dim=-1)
    bsz, d = h.shape
    hd = d // HEADS
    q = q.view(bsz, HEADS, hd)
    k_ = k_.view(bsz, HEADS, hd)
    v = v.view(bsz, HEADS, hd)
    attn = torch.softmax(torch.einsum("bhd,bhd->bh", q, k_) / hd ** 0.5, -1)
    o = torch.einsum("bh,bhd->bhd", attn, v).reshape(bsz, d)
    o = torch_dense(ap["to_out"], o)
    h = F.layer_norm(o + res, (d,), t(ap["ln"]["scale"]), t(ap["ln"]["bias"]))
    h = torch_dense(dp["fc_hidden"]["fc"], h)
    h = F.gelu(torch_bn(dp["fc_hidden"]["bn"], ds["fc_hidden_bn"], h,
                        training))
    dist = torch_dense(dp["fc_distance"], h)
    return F.softplus(dist, beta=5.0).squeeze(-1)


def _setup(rng):
    params, state, cfg = models.init_fd_model(
        jax.random.PRNGKey(7), k=K, emb_dims=EMB, time_steps=T,
        k_scales=KSC, num_heads=HEADS)
    # randomize BN running stats so eval mode is a real test
    state = jax.tree.map(
        lambda x: x + jnp.asarray(
            np.random.default_rng(3).uniform(0.01, 0.1, x.shape)
            .astype(np.float32)) if x.ndim == 1 else x, state)
    x = (rng.normal(size=(3, 16, 3)) * 0.2).astype(np.float32)
    return params, state, cfg, x


def test_fd_eval_forward_matches_torch_oracle(rng):
    """Eval mode (soft spikes, running BN stats): strict end-to-end parity."""
    params, state, cfg, x = _setup(rng)
    got, _, _ = models.fd_apply(params, state, jnp.asarray(x), cfg,
                                training=False)
    ph = jax.tree.map(np.asarray, params)
    sh = jax.tree.map(np.asarray, state)
    want = torch_fd_forward(ph, sh, x, False).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fd_train_forward_block0_matches_torch_oracle(rng):
    """Training mode emits BINARY spikes; downstream kNN then runs on spike
    features where distance ties are everywhere, and tie-breaking order is
    implementation-defined (ours vs torch.topk vs the reference's CUDA
    topk all differ) — so full-forward training parity is ill-defined.
    Assert the well-defined prefix: hoisted block 0 activations + the
    first EIF spike map must match exactly."""
    from sapcu_tpu import nn as fnn
    from sapcu_tpu import ops, snn

    params, state, cfg, x = _setup(rng)
    ep, es = params["enc"], state["enc"]
    feats = []
    for p, s, kk in zip(ep["ms_conv"], es["ms_conv"], KSC):
        g = ops.graph_feature(jnp.asarray(x), k=min(kk, 16))
        h = fnn.dense(p["fc"], g)
        h, _ = fnn.bn_apply(p["bn"], s["bn"], h, training=True)
        feats.append(jnp.max(fnn.leaky_relu(h, 0.2), axis=-2))
    fused = fnn.dense(ep["scale_fusion"]["fc"], jnp.concatenate(feats, -1))
    fused, _ = fnn.bn_apply(ep["scale_fusion"]["bn"], es["scale_fusion_bn"],
                            fused, training=True)
    x0_j = fnn.leaky_relu(fused, 0.2)
    s0_j, _ = snn.eif_step(ep["snn"][0], snn.init_state(ep["snn"][0], x0_j),
                           x0_j, training=True)

    ph = jax.tree.map(np.asarray, params)
    sh = jax.tree.map(np.asarray, state)
    xt = t(x)
    f0 = [edge_block(p, s["bn"], xt, min(kk, 16), True)
          for p, s, kk in zip(ph["enc"]["ms_conv"], sh["enc"]["ms_conv"], KSC)]
    fu = torch_dense(ph["enc"]["scale_fusion"]["fc"], torch.cat(f0, -1))
    fu = torch_bn(ph["enc"]["scale_fusion"]["bn"],
                  sh["enc"]["scale_fusion_bn"], fu, True)
    x0_t = F.leaky_relu(fu, 0.2)
    s0_t, _ = torch_neuron_step(ph["enc"]["snn"][0],
                                fresh_state(ph["enc"]["snn"][0], x0_t),
                                x0_t, True, eif=True)

    np.testing.assert_allclose(np.asarray(x0_j), x0_t.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s0_j), s0_t.numpy())
