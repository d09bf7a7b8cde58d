"""End-to-end golden parity: fn model vs a torch oracle with shared weights.

Restates the reference fn forward (fn/snn_coder.py:212-553) in torch from
the equations — point-transformer vector attention with 4-step SNN
branches — loads the JAX model's parameters, and compares eval-mode
outputs end to end. fn's kNN runs on raw coordinates (no spike-tie
ambiguity), so strict parity holds in eval mode.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sapcu_tpu import models

KV, EMB, T, HEADS = (6, 6, 4), 32, 2, 4
BLOCK_T = 4


def t(x):
    return torch.tensor(np.asarray(x))


def torch_soft_spike(x, w=10.0):
    xc = torch.clamp(x, -10.0, 10.0)
    return (0.5 * torch.exp(-(xc ** 2) / 2) / math.sqrt(2 * math.pi)
            + 0.5 * torch.sigmoid(w * xc))


def lif_multi(p, x, steps, hard=False):
    md = torch.clamp(t(p["membrane_decay"]), 0.1, 0.99)
    ta = torch.clamp(t(p["threshold_adapt"]), 0.001, 0.1)
    rd = torch.clamp(t(p["refractory_decay"]), 0.1, 0.95)
    tb = t(p["threshold_base"])
    m = torch.zeros_like(x)
    th = tb.expand_as(x).clone()
    r = torch.zeros_like(x)
    cur = x
    for _ in range(steps):
        g = cur * (r <= 0).float()
        m = m * md * (1 - r) + g
        s = (m - th > 0).float() if hard else torch_soft_spike(m - th)
        m = m * (1 - s)
        r = r * rd + s
        th = tb + (th + ta * s - tb) * 0.95
        cur = s
    return cur


def dense(p, x):
    y = x @ t(p["kernel"])
    return y + t(p["bias"]) if "bias" in p else y


TRAIN = False  # module-level mode switch for the oracle


def bn(p, s, x, eps=1e-5):
    if TRAIN:
        axes = tuple(range(x.dim() - 1))
        mean = x.mean(dim=axes)
        var = x.var(dim=axes, unbiased=False)
    else:
        mean, var = t(s["mean"]), t(s["var"])
    return (x - mean) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])


def fc_bn(p, s, x):
    return bn(p["bn"], s, dense(p["fc"], x))


def block(p, s, xyz, feats, k):
    b, n, _ = xyz.shape
    d = torch.cdist(xyz, xyz) ** 2
    idx = torch.topk(-d, k, dim=-1).indices
    knn_xyz = torch.gather(xyz.unsqueeze(1).expand(b, n, n, 3), 2,
                           idx.unsqueeze(-1).expand(b, n, k, 3))
    pos_diff = xyz.unsqueeze(2) - knn_xyz

    pre = feats
    h = lif_multi(p["snn1"], fc_bn(p["fc1"], s["fc1_bn"], feats), BLOCK_T, TRAIN)
    q = lif_multi(p["snn_q"], fc_bn(p["w_qs"], s["w_qs_bn"], h), BLOCK_T, TRAIN)
    kf = lif_multi(p["snn_k"], fc_bn(p["w_ks"], s["w_ks_bn"], h), BLOCK_T, TRAIN)
    v = lif_multi(p["snn_v"], fc_bn(p["w_vs"], s["w_vs_bn"], h), BLOCK_T, TRAIN)

    dm = q.shape[-1]
    kg = torch.gather(kf.unsqueeze(1).expand(b, n, n, dm), 2,
                      idx.unsqueeze(-1).expand(b, n, k, dm))
    vg = torch.gather(v.unsqueeze(1).expand(b, n, n, dm), 2,
                      idx.unsqueeze(-1).expand(b, n, k, dm))

    pe = lif_multi(p["snn_delta"],
                   fc_bn(p["fc_delta"], s["fc_delta_bn"], pos_diff), BLOCK_T,
                   TRAIN)
    pe = lif_multi(p["snn_delta2"],
                   fc_bn(p["fc_delta2"], s["fc_delta2_bn"], pe), BLOCK_T, TRAIN)

    ai = q.unsqueeze(2) - kg + pe
    at = lif_multi(p["snn_gamma"],
                   fc_bn(p["fc_gamma"], s["fc_gamma_bn"], ai), BLOCK_T, TRAIN)
    at = fc_bn(p["fc_gamma2"], s["fc_gamma2_bn"], at)

    hd = dm // HEADS
    at = at.view(b, n, k, HEADS, hd)
    at = torch.softmax(at / math.sqrt(hd), dim=2)
    vwp = (vg + pe).view(b, n, k, HEADS, hd)
    res = torch.einsum("bnkhd,bnkhd->bnhd", at, vwp).reshape(b, n, dm)
    res = fc_bn(p["out_proj"], s["out_proj_bn"], res)
    res = fc_bn(p["fc2"], s["fc2_bn"], res)
    return res + pre


def torch_fn_forward(params, state, x_np):
    ep, es = params["enc"], state["enc"]
    x = t(x_np)
    feats = lif_multi(ep["snn_init"], fc_bn(ep["conv1"], es["conv1_bn"], x), T,
                      TRAIN)
    outs = []
    cur = feats
    for bp, bs, k in zip(ep["blocks"], es["blocks"], KV):
        cur = block(bp, bs, x, cur, k)
        outs.append(cur)
    ms = torch.cat(outs, dim=-1)
    g = lif_multi(ep["snn_final"],
                  fc_bn(ep["conv_final"], es["conv_final_bn"], ms), T, TRAIN)
    g = g.max(dim=-2).values
    feat = dense(ep["fc_out"], g)

    dp, ds = params["dec"], state["dec"]
    h = feat
    for p, s in zip(dp["mlp"], ds["mlp_bn"]):
        h = F.gelu(fc_bn(p, s, h))
    h = dense(dp["fc_out"], h)
    h = F.layer_norm(h, (3,), t(dp["norm_out"]["scale"]),
                     t(dp["norm_out"]["bias"]))
    return F.normalize(h, dim=-1)


import pytest


@pytest.mark.parametrize("training", [False, True])
def test_fn_forward_matches_torch_oracle(training, rng):
    global TRAIN
    TRAIN = training
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(11), k_values=KV, emb_dims=EMB,
        time_steps_enc=T, num_heads=HEADS)
    state = jax.tree.map(
        lambda x: x + jnp.asarray(
            np.random.default_rng(5).uniform(0.01, 0.1, x.shape)
            .astype(np.float32)) if x.ndim == 1 else x, state)

    x = (rng.normal(size=(2, 12, 3)) * 0.3).astype(np.float32)
    got, _ = models.fn_apply(params, state, jnp.asarray(x), cfg,
                             training=training)
    ph = jax.tree.map(np.asarray, params)
    sh = jax.tree.map(np.asarray, state)
    want = torch_fn_forward(ph, sh, x).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
    TRAIN = False
