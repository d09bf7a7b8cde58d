"""Golden parity against the ACTUAL reference torch modules.

Unlike test_golden_fn/fd.py (torch oracles restated from the equations),
these tests import the reference's own ``fn/snn_coder.py`` and
``fd/snn_coder.py`` from /root/reference, load the JAX models' weights into
the real torch modules, and compare eval-mode outputs — a shared
misreading of the reference cannot pass here.

Tiny-dim cases run in the default suite; the flagship-dimension cases
(fn: emb 640 / T 6 / k [24,18,12]; fd: emb 768 / T 7 / k_scales
[8,16,32,48]) compile the full-size models on CPU (minutes) and are
opt-in via SAPCU_SLOW=1.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sapcu_tpu import models

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not present")
if REF not in sys.path:
    sys.path.insert(0, REF)

slow = pytest.mark.skipif(not os.environ.get("SAPCU_SLOW"),
                          reason="flagship dims: set SAPCU_SLOW=1")


def _np(a):
    return np.asarray(a, dtype=np.float32)


def _set(param, value):
    with torch.no_grad():
        t = torch.tensor(_np(value))
        assert param.shape == t.shape, (param.shape, t.shape)
        param.copy_(t)


def _load_conv_bn(seq, p, bn_state, conv_dims: int):
    """Fill Sequential(ConvNd/Linear, BatchNormNd, ...) from a
    {"fc": {kernel, bias?}, "bn": {scale, bias}} params dict + BN state."""
    k = _np(p["fc"]["kernel"]).T  # [out, in]
    w = seq[0].weight
    if conv_dims == 0:
        _set(w, k)
    elif conv_dims == 1:
        _set(w, k[:, :, None])
    else:
        _set(w, k[:, :, None, None])
    if seq[0].bias is not None:
        _set(seq[0].bias, p["fc"]["bias"])
    _set(seq[1].weight, p["bn"]["scale"])
    _set(seq[1].bias, p["bn"]["bias"])
    _set(seq[1].running_mean, bn_state["mean"])
    _set(seq[1].running_var, bn_state["var"])


def _load_linear(mod, p):
    _set(mod.weight, _np(p["kernel"]).T)
    if "bias" in p:
        _set(mod.bias, p["bias"])


def _load_snn(mod, p):
    _set(mod.membrane_decay, p["membrane_decay"])
    _set(mod.threshold_adapt, p["threshold_adapt"])
    _set(mod.refractory_decay, p["refractory_decay"])
    _set(mod.threshold_base, p["threshold_base"])
    if "delta_t" in p:
        _set(mod.delta_T, p["delta_t"])
        _set(mod.theta_rh, p["theta_rh"])


# --------------------------------------------------------------------- fn
def _build_ref_fn(params, state, cfg):
    import fn.snn_coder as ref  # noqa: the reference package

    model = ref.ImprovedSNNNormalEstimation(
        k_values=list(cfg["k_values"]), emb_dims=cfg["emb_dims"],
        time_steps_enc=cfg["time_steps_enc"], num_heads=cfg["num_heads"],
        decoder_dropout=cfg["decoder_dropout"])
    ep, es = params["enc"], state["enc"]
    enc = model.encoder
    _load_conv_bn(enc.conv1, ep["conv1"], es["conv1_bn"], 1)
    _load_snn(enc.snn_init, ep["snn_init"])
    for bp, bs, blk in zip(ep["blocks"], es["blocks"],
                           [enc.trans1, enc.trans2, enc.trans3]):
        for name, dims in [("fc1", 1), ("w_qs", 1), ("w_ks", 1), ("w_vs", 1),
                           ("out_proj", 1), ("fc2", 1), ("fc_delta", 2),
                           ("fc_delta2", 2), ("fc_gamma", 2),
                           ("fc_gamma2", 2)]:
            _load_conv_bn(getattr(blk, name), bp[name], bs[name + "_bn"],
                          dims)
        for name in ["snn1", "snn_q", "snn_k", "snn_v", "snn_delta",
                     "snn_delta2", "snn_gamma"]:
            _load_snn(getattr(blk, name), bp[name])
    _load_conv_bn(enc.conv_final, ep["conv_final"], es["conv_final_bn"], 1)
    _load_snn(enc.snn_final, ep["snn_final"])
    _load_linear(enc.fc_out, ep["fc_out"])

    dp, ds = params["dec"], state["dec"]
    dec = model.decoder
    # decoder.mlp = [Linear, BN, GELU, Dropout] * len(hidden)
    for i, (p, s) in enumerate(zip(dp["mlp"], ds["mlp_bn"])):
        lin, bn = dec.mlp[4 * i], dec.mlp[4 * i + 1]
        _load_linear(lin, p["fc"])
        _set(bn.weight, p["bn"]["scale"])
        _set(bn.bias, p["bn"]["bias"])
        _set(bn.running_mean, s["mean"])
        _set(bn.running_var, s["var"])
    _load_linear(dec.fc_out, dp["fc_out"])
    _set(dec.norm_out.weight, dp["norm_out"]["scale"])
    _set(dec.norm_out.bias, dp["norm_out"]["bias"])
    return model


def _randomized_state(state, seed=5):
    """Perturb BN running stats so eval-mode normalisation is non-trivial."""
    r = np.random.default_rng(seed)
    return jax.tree.map(
        lambda x: x + jnp.asarray(r.uniform(0.01, 0.1, x.shape)
                                  .astype(np.float32))
        if x.ndim == 1 else x, state)


def _run_fn_case(kv, emb, t, heads, batch, m, atol):
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(11), k_values=kv, emb_dims=emb,
        time_steps_enc=t, num_heads=heads)
    state = _randomized_state(state)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(batch, m, 3)) * 0.3).astype(np.float32)

    got, _ = models.fn_apply(params, state, jnp.asarray(x), cfg,
                             training=False)

    ph = jax.tree.map(np.asarray, params)
    sh = jax.tree.map(np.asarray, state)
    model = _build_ref_fn(ph, sh, cfg)
    model.eval()
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=atol)


def test_fn_matches_imported_reference_tiny():
    _run_fn_case((6, 6, 4), 32, 2, 4, batch=2, m=12, atol=5e-4)


@slow
def test_fn_matches_imported_reference_flagship():
    # effective hyperparameters (SURVEY.md §2.1 #4); one small batch of
    # full-size 100-point patches
    _run_fn_case((24, 18, 12), 640, 6, 8, batch=2, m=100, atol=2e-3)


# --------------------------------------------------------------------- fd
def _build_ref_fd(params, state, cfg):
    import fd.snn_coder as ref  # noqa: the reference package

    model = ref.EnhancedSNNDistanceEstimation(
        k=cfg["k"], emb_dims=cfg["emb_dims"],
        time_steps_enc=cfg["time_steps"], num_heads=cfg["num_heads"],
        dropout=cfg["dropout"], k_scales=list(cfg["k_scales"]))
    ep, es = params["enc"], state["enc"]
    enc = model.encoder
    for p, s, seq in zip(ep["ms_conv"], es["ms_conv"],
                         enc.multi_scale_first_conv):
        _load_conv_bn(seq, p, s["bn"], 2)
    _load_conv_bn(enc.scale_fusion, ep["scale_fusion"],
                  es["scale_fusion_bn"], 1)
    for p, mod in zip(ep["snn"], enc.snn_blocks):
        _load_snn(mod, p)
    for p, s, seq in zip(ep["conv"], es["conv_bn"], enc.conv_blocks):
        _load_conv_bn(seq, p, s, 2)
    _load_conv_bn(enc.multi_scale_conv, ep["ms_fuse"], es["ms_fuse_bn"], 1)
    _load_snn(enc.snn_fc, ep["snn_fc"])
    _set(enc.temporal_integration.weights, ep["temporal_w"])

    dp, ds = params["dec"], state["dec"]
    dec = model.distance_decoder
    _load_conv_bn(dec.fc_in, dp["fc_in"], ds["fc_in_bn"], 0)
    for blk, bns, mod in zip(dp["res"], ds["res_bn"], dec.residual_blocks):
        _load_linear(mod.fc[0], blk["fc1"])
        _set(mod.fc[1].weight, blk["bn1"]["scale"])
        _set(mod.fc[1].bias, blk["bn1"]["bias"])
        _set(mod.fc[1].running_mean, bns["bn1"]["mean"])
        _set(mod.fc[1].running_var, bns["bn1"]["var"])
        _load_linear(mod.fc[4], blk["fc2"])
        _set(mod.fc[5].weight, blk["bn2"]["scale"])
        _set(mod.fc[5].bias, blk["bn2"]["bias"])
        _set(mod.fc[5].running_mean, bns["bn2"]["mean"])
        _set(mod.fc[5].running_var, bns["bn2"]["var"])
        if mod.res_proj is not None:
            _load_linear(mod.res_proj, blk["res_proj"])
    _load_linear(dec.attention.to_qkv, dp["attn"]["to_qkv"])
    _load_linear(dec.attention.to_out[0], dp["attn"]["to_out"])
    _set(dec.attention.norm.weight, dp["attn"]["ln"]["scale"])
    _set(dec.attention.norm.bias, dp["attn"]["ln"]["bias"])
    _load_conv_bn(dec.fc_hidden, dp["fc_hidden"], ds["fc_hidden_bn"], 0)
    _load_linear(dec.fc_distance, dp["fc_distance"])
    return model


def _run_fd_case(k, emb, t, k_scales, heads, batch, m, atol):
    params, state, cfg = models.init_fd_model(
        jax.random.PRNGKey(7), k=k, emb_dims=emb, time_steps=t,
        k_scales=k_scales, num_heads=heads)
    state = _randomized_state(state, seed=9)
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(batch, m, 3)) * 0.3).astype(np.float32)

    got, _, _ = models.fd_apply(params, state, jnp.asarray(x), cfg,
                                training=False)

    ph = jax.tree.map(np.asarray, params)
    sh = jax.tree.map(np.asarray, state)
    model = _build_ref_fd(ph, sh, cfg)
    model.eval()
    model.reset_states()
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=atol)


def test_fd_matches_imported_reference_tiny():
    _run_fd_case(8, 48, 2, (4, 8), 4, batch=2, m=16, atol=5e-4)


@slow
def test_fd_matches_imported_reference_flagship():
    # effective hyperparameters (SURVEY.md §2.1 #6)
    _run_fd_case(32, 768, 7, (8, 16, 32, 48), 8, batch=2, m=100, atol=2e-3)
