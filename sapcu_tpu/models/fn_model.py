"""fn model: SNN point-transformer normal estimation (TPU-native rebuild).

Functional re-design of the reference ``ImprovedSNNNormalEstimation``
(fn/snn_coder.py:627-738): ``ImprovedSNNEncoder`` (fn:405-476) with three
``MultiHeadSNNTransformerBlock``s (fn:212-400) and ``StandardNormalDecoder``
(fn:517-553).

Effective hyperparameters from config/fn.yaml + hardcoded values
(SURVEY.md §2.1 #4): k_values=[24,18,12], emb_dims=640, T_enc=6, heads=8,
per-block time_steps=4 (hardcoded at fn:417-419), block d_models
128/256/512, fc_out -> 2048, decoder hidden dims [1024,512,256] (hardcoded,
YAML's decoder_hidden_dims ignored — fn/config.py:183-231).

TPU-first notes:
- channels-last; every projection is an MXU matmul
- each "SNN branch" (fc1/Q/K/V/delta/gamma) is a 4-step ``snn.multi_step``
  scan where spikes feed back as input (fn:319-335) — no detach inside a
  forward
- kNN indices are computed fresh per forward. The reference's ``KNNCache``
  returns stale indices for same-shape batches (fn/snn_coder.py:41-59);
  recomputing is the correct behaviour and is a documented divergence.
- vector attention: softmax over the k-neighbour axis of
  (q - k_gathered + pos_enc) per head (fn:367-389)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from sapcu_tpu import nn as fnn
from sapcu_tpu import ops, snn

Pytree = Any
_BLOCK_T = 4  # hardcoded per-block time steps (fn/snn_coder.py:417-419)


def _fc_bn(key, cin, cout):
    p = {"fc": fnn.dense_init(key, cin, cout)}
    p["bn"], s = fnn.bn_init(cout)
    return p, s


def _init_block(key, d_points, d_model):
    ks = iter(jax.random.split(key, 16))
    p, s = {}, {}
    for name, cin, cout in [
        ("fc1", d_points, d_model), ("w_qs", d_model, d_model),
        ("w_ks", d_model, d_model), ("w_vs", d_model, d_model),
        ("fc_delta", 3, d_model), ("fc_delta2", d_model, d_model),
        ("fc_gamma", d_model, d_model), ("fc_gamma2", d_model, d_model),
        ("out_proj", d_model, d_model), ("fc2", d_model, d_points),
    ]:
        p[name], s[name + "_bn"] = _fc_bn(next(ks), cin, cout)
    for name, dim in [("snn1", d_model), ("snn_q", d_model), ("snn_k", d_model),
                      ("snn_v", d_model), ("snn_delta", d_model),
                      ("snn_gamma", d_model)]:
        p[name] = snn.lif_init(dim)
    p["snn_delta2"] = snn.lif_init(d_model)
    return p, s


def init_fn_model(key, k_values=(24, 18, 12), emb_dims: int = 640,
                  time_steps_enc: int = 6, num_heads: int = 8,
                  dropout: float = 0.1, decoder_dropout: float = 0.1,
                  snn_mode: str = "feedback", pca_prior: bool = False
                  ) -> tuple[Pytree, Pytree, dict]:
    """Build (params, state, config) for the fn model.

    snn_mode: "feedback" = reference parity (spike output of step t is the
    input of step t+1, fn/snn_coder.py:319-335 — structurally degenerate,
    see snn/neuron.py::multi_step); "rate" = constant-input rate coding
    (the fd-encoder wiring that actually trains). The mode is a model
    hyperparameter: checkpoints trained in one mode must be served in it.

    pca_prior=True (fn-r5 recipe, no reference counterpart): the decoder
    predicts a RESIDUAL correction to the analytic oriented local-plane
    normal of the patch (ops.local_plane — the same prior that carried
    the sc head to 8.4 deg mean vs truth while the prior-free fn
    plateaued at 38-42 deg across rounds 2-4). 12 analytic plane/centroid
    features are appended to the decoder input, the output head is
    near-zero-initialised, and the decoder's LayerNorm is skipped so the
    raw residual adds to the prior before L2 normalisation. Default False
    = the reference architecture (golden-parity path).

    pca_prior="ms" (fn-r5b): pca_prior=True plus MULTI-SCALE plane
    features — plane fits at k=16/32/64 sign-aligned to the 8-NN prior
    (12 extra dims), fed both to the decoder MLP and DIRECTLY to the
    output head (skip connection). Rationale: the r5 run showed the
    residual path cannot beat the prior within 16k its because the only
    informative decoder inputs route through random-init MLP mixing
    while the SNN encoder learns on a ~30k-it timescale (r2-r4: 42->37.7
    over 31k its). At creases the small-k fit is right and at noise the
    large-k fit is right; with direct head access, scale BLENDING is a
    linear map the head can learn in O(100) its.
    """
    ms = pca_prior == "ms"
    geo_dims = (24 if ms else 12) if pca_prior else 0
    cfg = dict(k_values=tuple(k_values), emb_dims=emb_dims,
               time_steps_enc=time_steps_enc, num_heads=num_heads,
               dropout=dropout, decoder_dropout=decoder_dropout,
               d_models=(128, 256, 512), snn_mode=snn_mode,
               pca_prior=("ms" if ms else bool(pca_prior)))
    ks = iter(jax.random.split(key, 16))
    params: dict = {"enc": {}, "dec": {}}
    state: dict = {"enc": {}, "dec": {}}
    enc_p, enc_s = params["enc"], state["enc"]

    enc_p["conv1"], enc_s["conv1_bn"] = _fc_bn(next(ks), 3, 64)
    enc_p["snn_init"] = snn.lif_init(64)
    enc_p["blocks"], enc_s["blocks"] = [], []
    for d_model in cfg["d_models"]:
        bp, bs = _init_block(next(ks), 64, d_model)
        enc_p["blocks"].append(bp)
        enc_s["blocks"].append(bs)
    enc_p["conv_final"], enc_s["conv_final_bn"] = _fc_bn(next(ks), 64 * 3, emb_dims)
    enc_p["snn_final"] = snn.lif_init(emb_dims)
    enc_p["fc_out"] = fnn.dense_init(next(ks), emb_dims, 2048)
    # telemetry: [snn_init rate, 3 block-output activities, snn_final rate]
    enc_s["spike_rates"] = jnp.zeros((5,), jnp.float32)

    # StandardNormalDecoder: [1024, 512, 256] hardcoded (fn:523-540)
    dec_p, dec_s = params["dec"], state["dec"]
    hidden = [1024, 512, 256]
    dec_p["mlp"], dec_s["mlp_bn"] = [], []
    cin = 2048 + geo_dims                   # + analytic plane features
    for h in hidden:
        p, s = _fc_bn(next(ks), cin, h)
        dec_p["mlp"].append(p)
        dec_s["mlp_bn"].append(s)
        cin = h
    # "ms": the head also sees the geo features directly (skip connection)
    dec_p["fc_out"] = fnn.dense_init(
        next(ks), hidden[-1] + (geo_dims if ms else 0), 3)
    if pca_prior:
        # near-zero residual head: the model outputs ~the analytic prior
        # at init and only learns the correction (sc_model.py precedent)
        dec_p["fc_out"] = jax.tree.map(lambda a: a * 1e-3, dec_p["fc_out"])
    dec_p["norm_out"] = fnn.layer_norm_init(3)
    return params, state, cfg


def _apply_fc_bn(p, s, x, *, training):
    y = fnn.dense(p["fc"], x)
    return fnn.bn_apply(p["bn"], s, y, training=training)


def _bn_fold(fc, bn, bn_state):
    """Eval BatchNorm folded into dense weights: returns (W', b') with
    BN(x @ W + b) == x @ W' + b'."""
    sc = (bn["scale"].astype(jnp.float32)
          * jax.lax.rsqrt(bn_state["var"].astype(jnp.float32) + 1e-5))
    w = fc["kernel"].astype(jnp.float32) * sc
    bias = fc.get("bias", 0.0)
    b = (bn["bias"].astype(jnp.float32)
         + sc * (bias - bn_state["mean"].astype(jnp.float32)))
    return w, b


def _fused_branch(p, s, xyz, q, kf, v, idx, num_heads):
    """Dispatch the whole eval attention branch (pos-enc + gamma chains +
    softmax-sum) to the fused Pallas kernel (ops/pallas_kernels.py::
    fn_branch_pallas) on TPU for bf16 inference. Returns (res, bn-state
    passthroughs) or None when the kernel does not apply."""
    import os

    if os.environ.get("SAPCU_FUSED_FN") != "1":  # opt-in: measured slower
        return None
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu or q.dtype != jnp.bfloat16:
        return None
    from sapcu_tpu.ops.pallas_kernels import fn_branch_pallas

    d_model = q.shape[-1]
    wd, td = _bn_fold(p["fc_delta"]["fc"], p["fc_delta"]["bn"],
                      s["fc_delta_bn"])
    u = jnp.matmul(xyz, wd.astype(xyz.dtype),
                   preferred_element_type=jnp.float32).astype(q.dtype)
    wd2, bd2 = _bn_fold(p["fc_delta2"]["fc"], p["fc_delta2"]["bn"],
                        s["fc_delta2_bn"])
    wg, bg = _bn_fold(p["fc_gamma"]["fc"], p["fc_gamma"]["bn"],
                      s["fc_gamma_bn"])
    wg2, bg2 = _bn_fold(p["fc_gamma2"]["fc"], p["fc_gamma2"]["bn"],
                        s["fc_gamma2_bn"])

    def stack(sp):
        return jnp.stack([sp["membrane_decay"], sp["threshold_adapt"],
                          sp["refractory_decay"], sp["threshold_base"]]
                         ).astype(jnp.float32)

    res = fn_branch_pallas(
        u, q, kf, v, idx, td.astype(jnp.float32),
        wd2.astype(q.dtype), bd2, wg.astype(q.dtype), bg,
        wg2.astype(q.dtype), bg2,
        stack(p["snn_delta"]), stack(p["snn_delta2"]),
        stack(p["snn_gamma"]), hd=d_model // num_heads)
    new_s = {name + "_bn": s[name + "_bn"]
             for name in ["fc_delta", "fc_delta2", "fc_gamma", "fc_gamma2"]}
    return res, new_s


def _snn_kwargs(snn_mode: str) -> dict:
    """multi_step wiring for the model's snn_mode hyperparameter.

    Rate mode also evaluates with HARD spikes (eval_spikes="hard"):
    the reference's soft-mixture eval forward saturates at 0.5 for
    firing neurons, so every eval activation runs at half the scale the
    BN running statistics saw in training — through fn's ~18 stacked SNN
    layers the eval predictions decorrelate completely (flagship
    measurement: train loss converges while soft-eval val angular error
    stays at the ~90 deg plateau; hard-eval tracks training). The parity
    default (feedback mode) keeps the reference quirk."""
    if snn_mode == "rate":
        return {"input_mode": "constant", "out": "mean",
                "eval_spikes": "hard"}
    return {}


def _block_apply(p, s, xyz, features, k, num_heads, dropout, *, training, rng,
                 remat=False, snn_mode="feedback"):
    """One MultiHeadSNNTransformerBlock (fn/snn_coder.py:294-396).

    xyz: [B, N, 3]; features: [B, N, 64] -> ([B, N, 64], new_state).
    """
    sk = _snn_kwargs(snn_mode)
    b, n, _ = xyz.shape
    k_actual = min(k, n)
    d_model = p["fc1"]["fc"]["kernel"].shape[1]
    hd = d_model // num_heads
    new_s = {}

    idx = ops.knn(xyz, k_actual)                              # [B, N, k]

    pre = features
    x, new_s["fc1_bn"] = _apply_fc_bn(p["fc1"], s["fc1_bn"], features,
                                      training=training)
    x = snn.multi_step(p["snn1"], x, _BLOCK_T, training=training,
                       remat=remat, **sk)

    q, new_s["w_qs_bn"] = _apply_fc_bn(p["w_qs"], s["w_qs_bn"], x, training=training)
    q = snn.multi_step(p["snn_q"], q, _BLOCK_T, training=training,
                       remat=remat, **sk)
    kf, new_s["w_ks_bn"] = _apply_fc_bn(p["w_ks"], s["w_ks_bn"], x, training=training)
    kf = snn.multi_step(p["snn_k"], kf, _BLOCK_T, training=training,
                       remat=remat, **sk)
    v, new_s["w_vs_bn"] = _apply_fc_bn(p["w_vs"], s["w_vs_bn"], x, training=training)
    v = snn.multi_step(p["snn_v"], v, _BLOCK_T, training=training,
                       remat=remat, **sk)

    if not training and snn_mode == "feedback":
        fused = _fused_branch(p, s, xyz, q, kf, v, idx, num_heads)
        if fused is not None:
            res, new_s2 = fused
            new_s.update(new_s2)
            res, new_s["out_proj_bn"] = _apply_fc_bn(
                p["out_proj"], s["out_proj_bn"], res, training=training)
            res, new_s["fc2_bn"] = _apply_fc_bn(p["fc2"], s["fc2_bn"], res,
                                                training=training)
            return res + pre, new_s

    k_g = ops.index_points(kf, idx)                            # [B, N, k, C]
    v_g = ops.index_points(v, idx)

    if not training:
        # delta = BN(W @ (xyz_i - xyz_j) + b) separates: with eval BN the
        # affine s*e+t folds into W, so project xyz ONCE to [B, N, C]
        # (u = xyz @ sW) and gather u on the MXU one-hot path — the C=3
        # xyz gather is a slow TPU dynamic-gather custom call (~10 ms per
        # block at inference tile sizes) and the [B,N,k,3] tensor layout
        # wastes 125/128 lanes.
        dp, ds_ = p["fc_delta"], s["fc_delta_bn"]
        sc = (dp["bn"]["scale"].astype(jnp.float32)
              * jax.lax.rsqrt(ds_["var"].astype(jnp.float32) + 1e-5))
        tc = (dp["bn"]["bias"].astype(jnp.float32)
              + sc * (dp["fc"].get("bias", 0.0)
                      - ds_["mean"].astype(jnp.float32)))
        u = jnp.matmul(xyz, (dp["fc"]["kernel"].astype(jnp.float32)
                             * sc).astype(xyz.dtype),
                       preferred_element_type=jnp.float32).astype(xyz.dtype)
        u_g = ops.index_points(u, idx)                         # [B, N, k, C]
        pos_enc = (u[:, :, None, :].astype(jnp.float32)
                   - u_g.astype(jnp.float32) + tc).astype(xyz.dtype)
        new_s["fc_delta_bn"] = ds_
    else:
        knn_xyz = ops.index_points(xyz, idx)
        pos_diff = xyz[:, :, None, :] - knn_xyz                # [B, N, k, 3]
        pos_enc, new_s["fc_delta_bn"] = _apply_fc_bn(
            p["fc_delta"], s["fc_delta_bn"], pos_diff, training=training)
    pos_enc = snn.multi_step(p["snn_delta"], pos_enc, _BLOCK_T, training=training,
                       remat=remat, **sk)
    pos_enc, new_s["fc_delta2_bn"] = _apply_fc_bn(p["fc_delta2"], s["fc_delta2_bn"],
                                                  pos_enc, training=training)
    pos_enc = snn.multi_step(p["snn_delta2"], pos_enc, _BLOCK_T, training=training,
                       remat=remat, **sk)

    attn_in = q[:, :, None, :] - k_g + pos_enc                 # [B, N, k, C]
    attn, new_s["fc_gamma_bn"] = _apply_fc_bn(p["fc_gamma"], s["fc_gamma_bn"],
                                              attn_in, training=training)
    attn = snn.multi_step(p["snn_gamma"], attn, _BLOCK_T, training=training,
                       remat=remat, **sk)
    attn, new_s["fc_gamma2_bn"] = _apply_fc_bn(p["fc_gamma2"], s["fc_gamma2_bn"],
                                               attn, training=training)

    # The reference reshapes to [b,n,k,heads,hd] here, but the softmax is
    # over the k axis (independent per channel) and the einsum
    # "bnkhd,bnkhd->bnhd" is an elementwise product summed over k — both
    # identical in the flat [b,n,k,d] layout. Staying flat keeps the last
    # dim at d_model (full 128-lane tiles) instead of hd=16/32/64, which
    # would pad lanes up to 8x and force two relayout copies.
    attn = jax.nn.softmax(attn / (hd ** 0.5), axis=2)          # over neighbours
    attn = fnn.dropout(rng, attn, dropout, training)
    res = jnp.sum(attn * (v_g + pos_enc), axis=2)              # [B, N, d]

    res, new_s["out_proj_bn"] = _apply_fc_bn(p["out_proj"], s["out_proj_bn"],
                                             res, training=training)
    res, new_s["fc2_bn"] = _apply_fc_bn(p["fc2"], s["fc2_bn"], res,
                                        training=training)
    return res + pre, new_s


def fn_encoder_apply(params, state, x, cfg, *, training: bool, rng=None):
    """x: [B, M, 3] patch -> (features [B, 2048], new_enc_state)."""
    enc_p, enc_s = params["enc"], state["enc"]
    new_s = {}
    t = cfg["time_steps_enc"]

    feats, new_s["conv1_bn"] = _apply_fc_bn(enc_p["conv1"], enc_s["conv1_bn"],
                                            x, training=training)
    sk = _snn_kwargs(cfg.get("snn_mode", "feedback"))
    feats = snn.multi_step(enc_p["snn_init"], feats, t, training=training,
                           remat=cfg.get("remat", True), **sk)

    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    block_feats, block_states = [], []
    cur = feats
    # fn.yaml sets gradient_checkpointing: true — remat each transformer
    # block so its 6 four-step SNN branches are recomputed in backward
    # rather than stored. Eval has no backward: skip the checkpoint wrapper
    # so it cannot constrain fusion/layout choices.
    remat = training and cfg.get("remat", True)
    for bp, bs, k, r in zip(enc_p["blocks"], enc_s["blocks"], cfg["k_values"], rngs):
        def block_fn(bp_, bs_, xyz_, cur_, _k=k, _r=r):
            return _block_apply(bp_, bs_, xyz_, cur_, _k, cfg["num_heads"],
                                cfg["dropout"], training=training, rng=_r,
                                remat=remat,
                                snn_mode=cfg.get("snn_mode", "feedback"))
        if remat:
            block_fn = jax.checkpoint(block_fn)
        cur, nbs = block_fn(bp, bs, x, cur)
        block_feats.append(cur)
        block_states.append(nbs)
    new_s["blocks"] = block_states

    ms = jnp.concatenate(block_feats, axis=-1)                 # [B, M, 192]
    g, new_s["conv_final_bn"] = _apply_fc_bn(enc_p["conv_final"],
                                             enc_s["conv_final_bn"], ms,
                                             training=training)
    g = snn.multi_step(enc_p["snn_final"], g, t, training=training,
                       remat=cfg.get("remat", True), **sk)
    new_s["spike_rates"] = jax.lax.stop_gradient(jnp.stack(
        [jnp.mean(feats)] + [jnp.mean(f) for f in block_feats]
        + [jnp.mean(g)]).astype(jnp.float32))
    g = jnp.max(g, axis=-2)                                    # [B, emb]
    return fnn.dense(enc_p["fc_out"], g), new_s


def patch_plane_features(rel: jax.Array, multiscale: bool = False
                         ) -> tuple[jax.Array, jax.Array]:
    """Analytic prior features of a query-centered patch (nearest-first).

    rel: [..., M, 3] neighbour offsets -> (oriented 8-NN plane normal
    [..., 3], 12 geometry features [..., 12]) — the same prior block the
    sc head conditions on (sc_model.py::sc_head): 8-NN plane
    (normal, dist), full-patch plane, centroid direction/norm. Always
    f32 (3x3 eigenvectors in bf16 are junk).

    multiscale=True appends plane fits at k=16/32/64 (capped at M),
    sign-ALIGNED to the 8-NN prior so a head blending them never has to
    learn per-scale orientation conventions -> 24 feature dims."""
    rel32 = rel.astype(jnp.float32)
    m = rel.shape[-2]
    n8, d8 = ops.local_plane(rel32[..., :min(8, m), :])
    nm, dm = ops.local_plane(rel32)
    cmean = jnp.mean(rel32, axis=-2)
    cnorm = jnp.sqrt(jnp.maximum(
        jnp.sum(cmean * cmean, axis=-1, keepdims=True), 1e-12))
    cdir = cmean / cnorm
    feats = [n8, d8[..., None] * 32.0, nm, dm[..., None] * 32.0,
             cdir, cnorm * 32.0]
    if multiscale:
        for k in (16, 32, 64):
            nk, dk = ops.local_plane(rel32[..., :min(k, m), :])
            sgn = jnp.sign(jnp.sum(nk * n8, axis=-1, keepdims=True))
            nk = nk * jnp.where(sgn == 0, 1.0, sgn)
            feats += [nk, dk[..., None] * 32.0]
    geo = jnp.concatenate(feats, axis=-1)
    return n8, geo


def fn_decoder_apply(params, state, x, cfg, *, training: bool, rng=None,
                     prior_normal=None, geo=None):
    """StandardNormalDecoder: [B, 2048] -> unit normals [B, 3].

    With cfg["pca_prior"], ``prior_normal`` [B, 3] is required and the
    MLP output is a raw residual added to it (no LayerNorm — a 3-dim
    LayerNorm of a near-zero residual would renormalise it to O(1) and
    destroy the prior at init). With pca_prior "ms", ``geo`` [B, 24] is
    additionally concatenated to the head input (skip connection past
    the MLP: scale blending stays a directly-learnable linear map)."""
    dec_p, dec_s = params["dec"], state["dec"]
    rngs = iter(jax.random.split(rng, 4)) if rng is not None else iter([None] * 4)
    new_bns = []
    h = x
    for p, s in zip(dec_p["mlp"], dec_s["mlp_bn"]):
        h, nb = _apply_fc_bn(p, s, h, training=training)
        h = fnn.gelu(h)
        h = fnn.dropout(next(rngs), h, cfg["decoder_dropout"], training)
        new_bns.append(nb)
    if cfg.get("pca_prior") == "ms":
        h = jnp.concatenate([h, geo.astype(h.dtype)], axis=-1)
    h = fnn.dense(dec_p["fc_out"], h)
    if cfg.get("pca_prior"):
        return (fnn.l2_normalize(prior_normal + h.astype(jnp.float32)),
                {"mlp_bn": new_bns})
    h = fnn.layer_norm(dec_p["norm_out"], h)
    return fnn.l2_normalize(h), {"mlp_bn": new_bns}


def fn_apply(params, state, x, cfg, *, training: bool, rng=None):
    """Full fn forward.

    x: [B, N, M, 3] patch batch (flattened like fn/snn_coder.py:681-694)
       or [B, M, 3].
    Returns (unit normals [B, N, 3] or [B, 3], new_state).
    """
    if x.ndim == 4:
        b, n, m, _ = x.shape
        flat = x.reshape(b * n, m, 3)
    else:
        flat = x
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    feat, new_enc = fn_encoder_apply(params, state, flat, cfg,
                                     training=training, rng=enc_rng)
    prior = geo = None
    if cfg.get("pca_prior"):
        # patches arrive nearest-first (top_k / topk_small order) both in
        # training (device_synth) and serving (pipeline._refine_body)
        n8, geo = patch_plane_features(flat,
                                       multiscale=cfg["pca_prior"] == "ms")
        feat = jnp.concatenate([feat, geo.astype(feat.dtype)], axis=-1)
        prior = n8
    normals, new_dec = fn_decoder_apply(params, state, feat, cfg,
                                        training=training, rng=dec_rng,
                                        prior_normal=prior, geo=geo)
    if x.ndim == 4:
        normals = normals.reshape(b, n, 3)
    return normals, {"enc": new_enc, "dec": new_dec}


# ------------------------------------------------------------------ losses
def _cosine_similarity(a, b, eps=1e-8):
    """torch F.cosine_similarity semantics."""
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    return dot / jnp.maximum(na * nb, eps)


def normal_consistency_loss(pred_normals, xyz, k: int = 8,
                            weight: float = 0.1) -> jax.Array:
    """Neighbouring points should share normals (fn/snn_coder.py:557-584)."""
    b, n, _ = xyz.shape
    k = min(k, n - 1)
    dists = ops.pairwise_sqdist(xyz, xyz)
    idx = jnp.argsort(dists, axis=-1)[:, :, 1:k + 1]
    pred = pred_normals.reshape(b, n, 3)
    neighbor = ops.index_points(pred, idx.astype(jnp.int32))   # [B, N, k, 3]
    cos = _cosine_similarity(pred[:, :, None, :], neighbor)
    return weight * jnp.mean(1.0 - cos)


def fn_loss(pred_normals, gt_normals, xyz=None, temperature: float = 0.1,
            alpha: float = 0.1, consistency_weight: float = 0.15,
            k_neighbors: int = 8):
    """Angular loss with confidence weighting + consistency
    (fn/snn_coder.py:588-624). Effective constants are the call-site
    defaults (temperature 0.1, alpha 0.1, cw 0.15, k 8) — the YAML loss
    block is never plumbed through (SURVEY.md §2.1 #13).

    xyz: [B, N, 3] patch centers or [B, N, M, 3] patches (mean-reduced,
    fn/snn_coder.py:709-711). Returns (loss, confidence_mean).
    """
    pred = pred_normals.reshape(-1, 3)
    gt = gt_normals.reshape(-1, 3)
    cos = _cosine_similarity(pred, gt)
    ang = jnp.arccos(jnp.clip(cos, -1 + 1e-6, 1 - 1e-6))
    conf = jax.nn.sigmoid(jax.lax.stop_gradient(ang) / temperature)
    base = jnp.mean(ang * conf + alpha * (conf - 0.5) ** 2)
    if xyz is not None and consistency_weight > 0:
        if xyz.ndim == 4:
            xyz = jnp.mean(xyz, axis=2)
        base = base + normal_consistency_loss(pred_normals, xyz,
                                              k=k_neighbors,
                                              weight=consistency_weight)
    return base, jnp.mean(conf)


def angular_error_deg(pred, gt):
    """Mean angular error in degrees (fn/trainer.py:268-278)."""
    pred = fnn.l2_normalize(pred.reshape(-1, 3))
    gt = fnn.l2_normalize(gt.reshape(-1, 3))
    cos = jnp.clip(_cosine_similarity(pred, gt), -1 + 1e-6, 1 - 1e-6)
    return jnp.degrees(jnp.mean(jnp.arccos(cos)))
