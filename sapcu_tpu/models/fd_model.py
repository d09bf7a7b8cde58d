"""fd model: SNN-DGCNN distance estimation (TPU-native rebuild).

Functional re-design of the reference ``EnhancedSNNDistanceEstimation``
(fd/snn_coder.py:805-893) with encoder ``EnhancedTemporalSNN_DGCNN_fd``
(fd/snn_coder.py:330-495) and ``StandardDistanceDecoder``
(fd/snn_coder.py:667-798).

Effective hyperparameters reproduced from config/fd.yaml + the model's
hardcoded values (SURVEY.md §2.1 #6): k=32, emb_dims=768, T=7,
k_scales=[8,16,32,48], heads=8, decoder hidden dims [256,128,64] (the
constructor hardcodes these regardless of YAML — fd/snn_coder.py:845-851),
Softplus(beta=5) output head.

TPU-first design decisions:
- channels-last layout; every 1x1 conv is a dense matmul on the MXU
- the temporal loop is a single ``lax.scan`` over T; SNN states are
  stop-gradient'ed between timesteps exactly like the reference's
  per-timestep ``.detach()`` (fd/snn_coder.py:438-442)
- block 0 (multi-scale edge conv over the raw input) is t-invariant, so it
  is hoisted OUT of the time loop and computed once — numerically identical
  activations; its BatchNorm running stats update once per forward instead
  of T times (documented divergence, training-mode normalisation identical)
- BN running stats of the in-loop convs thread through the scan carry, so
  they update T times per forward exactly like the torch modules do
- the final ``snn_fc`` LIF state optionally carries across forwards (the
  only cross-batch state in the reference, fd/snn_coder.py:485-490);
  pass ``carry=None`` for the reset behaviour used at every train step
  (fd/trainer.py:29-31) and inference chunk (generation.py:163-165).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from sapcu_tpu import nn as fnn
from sapcu_tpu import ops, snn

Pytree = Any


def _keys(key, n):
    return list(jax.random.split(key, n))


def init_fd_model(key, k: int = 32, emb_dims: int = 768, time_steps: int = 7,
                  k_scales=(8, 16, 32, 48), num_heads: int = 8,
                  dropout: float = 0.1, eif_delta_t: float = 1.0,
                  eif_theta_rh: float = 0.8) -> tuple[Pytree, Pytree, dict]:
    """Build (params, state, config) pytrees for the fd model."""
    k_scales = tuple(k_scales)
    cfg = dict(k=k, emb_dims=emb_dims, time_steps=time_steps,
               k_scales=k_scales, num_heads=num_heads, dropout=dropout)
    params: dict = {"enc": {}, "dec": {}}
    state: dict = {"enc": {}, "dec": {}}
    enc_p, enc_s = params["enc"], state["enc"]

    ks = iter(_keys(key, 64))

    # ---- encoder -------------------------------------------------------
    # multi-scale first block: Conv2d(6->64) + BN per scale (fd:344-350)
    enc_p["ms_conv"], enc_s["ms_conv"] = [], []
    for _ in k_scales:
        p = {"fc": fnn.dense_init(next(ks), 6, 64, use_bias=False)}
        p["bn"], s = fnn.bn_init(64)
        enc_p["ms_conv"].append(p)
        enc_s["ms_conv"].append({"bn": s})
    enc_p["scale_fusion"] = {"fc": fnn.dense_init(next(ks), 64 * len(k_scales), 64, use_bias=False)}
    enc_p["scale_fusion"]["bn"], enc_s["scale_fusion_bn"] = fnn.bn_init(64)

    # SNN blocks: EIF(64), EIF(128), LIF(256), LIF(512) (fd:358-378)
    enc_p["snn"] = [
        snn.eif_init(64, delta_t_init=eif_delta_t, theta_rh_init=eif_theta_rh),
        snn.eif_init(128, delta_t_init=eif_delta_t, theta_rh_init=eif_theta_rh),
        snn.lif_init(256),
        snn.lif_init(512),
    ]
    # edge convs for blocks 1-3: Conv2d(2*C_in -> C_out) + BN (fd:361-378)
    dims = [(64, 128), (128, 256), (256, 512)]
    enc_p["conv"], enc_s["conv_bn"] = [], []
    for cin, cout in dims:
        p = {"fc": fnn.dense_init(next(ks), 2 * cin, cout, use_bias=False)}
        p["bn"], s = fnn.bn_init(cout)
        enc_p["conv"].append(p)
        enc_s["conv_bn"].append(s)

    # multi-scale concat fuse: Conv1d(960 -> emb) + BN (fd:381-385)
    enc_p["ms_fuse"] = {"fc": fnn.dense_init(next(ks), 64 + 128 + 256 + 512, emb_dims, use_bias=False)}
    enc_p["ms_fuse"]["bn"], enc_s["ms_fuse_bn"] = fnn.bn_init(emb_dims)

    enc_p["snn_fc"] = snn.lif_init(emb_dims)
    enc_p["temporal_w"] = jnp.ones((time_steps,), jnp.float32)
    # live spike-rate telemetry (blocks 0-3 + snn_fc), overwritten each
    # forward — the working version of the reference's dead
    # get_spike_statistics hook (trainfn.py:245-249, fn/trainer.py:280-283)
    enc_s["spike_rates"] = jnp.zeros((5,), jnp.float32)

    # ---- decoder (StandardDistanceDecoder, fd:667-729) ------------------
    dec_p, dec_s = params["dec"], state["dec"]
    hidden = [256, 128, 64]
    dec_p["fc_in"] = {"fc": fnn.dense_init(next(ks), emb_dims, hidden[0])}
    dec_p["fc_in"]["bn"], dec_s["fc_in_bn"] = fnn.bn_init(hidden[0])

    dec_p["res"], dec_s["res_bn"] = [], []
    for cin, cout in zip(hidden[:-1], hidden[1:]):
        blk = {
            "fc1": fnn.dense_init(next(ks), cin, cout),
            "fc2": fnn.dense_init(next(ks), cout, cout),
        }
        blk["bn1"], s1 = fnn.bn_init(cout)
        blk["bn2"], s2 = fnn.bn_init(cout)
        if cin != cout:
            blk["res_proj"] = fnn.dense_init(next(ks), cin, cout)
        dec_p["res"].append(blk)
        dec_s["res_bn"].append({"bn1": s1, "bn2": s2})

    d = hidden[-1]
    dec_p["attn"] = {
        "to_qkv": fnn.dense_init(next(ks), d, 3 * d),
        "to_out": fnn.dense_init(next(ks), d, d),
        "ln": fnn.layer_norm_init(d),
    }
    dec_p["fc_hidden"] = {"fc": fnn.dense_init(next(ks), d, 32)}
    dec_p["fc_hidden"]["bn"], dec_s["fc_hidden_bn"] = fnn.bn_init(32)
    dec_p["fc_distance"] = fnn.dense_init(next(ks), 32, 1)
    return params, state, cfg


def _edge_block(p, bn_state, x, k, *, training, idx=None, dist=None):
    """graph-feature -> 1x1 conv -> BN -> LeakyReLU -> max over k.

    Computed by the factored identity
        W @ [nb - x, nb] = (A + B) @ nb - A @ x,   W = [A; B]
    so the matmuls run on [B, M, C] (k-fold fewer FLOPs than on the
    [B, M, k, 2C] edge tensor) and only cheap gather+elementwise ops touch
    the big intermediate. Exactly the reference edge conv
    (fd/snn_coder.py:52-68 + conv) up to float reassociation.

    Eval mode never materialises the [B, M, k, C] edge tensor at all:
    with pf_j = (A+B)x_j, q_i = A x_i and eval BN an affine s*e + t per
    channel, max_j BN(pf_j - q_i) = maxnbr(s*pf)_i - s*q_i + t, where the
    per-channel BN scale s is folded INTO the projection weights so the
    neighbourhood aggregation is a single masked channel-wise max
    (signed channels come out right automatically: max of s*pf IS
    s>0 ? s*max pf : s*min pf). One B*M*M*C VPU reduction replaces the
    one-hot gather matmul (B*M*k*M*C MACs) plus BN/LeakyReLU passes over
    the edge tensor; LeakyReLU commutes with the max. Identical result
    up to float reassociation.

    ``idx`` lets callers share one kNN across scales (nearest-first order
    means the s-NN list is a prefix of the max-scale list). ``dist`` is an
    optional precomputed (d, neg_topk_d) pair for the eval path.
    """
    from jax.ad_checkpoint import checkpoint_name

    c = x.shape[-1]
    m = x.shape[-2]
    kernel = p["fc"]["kernel"]                           # [2C, C_out]
    a, b = kernel[:c], kernel[c:]

    if not training:
        s = (p["bn"]["scale"].astype(jnp.float32)
             * jax.lax.rsqrt(bn_state["var"].astype(jnp.float32) + 1e-5))
        t = (p["bn"]["bias"].astype(jnp.float32)
             - s * bn_state["mean"].astype(jnp.float32))
        sa = (a.astype(jnp.float32) * s).astype(x.dtype)
        sab = ((a + b).astype(jnp.float32) * s).astype(x.dtype)
        q = jnp.matmul(x, sa, preferred_element_type=jnp.float32)
        pf = jnp.matmul(x, sab,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        # Neighbour mask from the kth-distance threshold: the max only
        # needs the neighbour SET, so a values-only sort replaces the
        # full index top-k (~2x cheaper, and shared across scales via
        # ``dist``). Exact distance ties at the kth place admit the tied
        # extras into the max — distinct points at bit-identical distance,
        # a measure-zero event on coordinates/soft spikes (duplicated
        # points have identical pf and cannot change the max). The train
        # path keeps exact top-k semantics.
        if dist is None:
            d = ops.pairwise_sqdist(x, x)
            nkth, _ = jax.lax.top_k(-d, min(k, m))
        else:
            d, nkth = dist
        kth = -nkth[..., min(k, m) - 1]
        mask = d <= kth[..., :, None]                    # [B, M, M]
        big = jnp.asarray(3e38, pf.dtype)
        pfb = pf[..., None, :, :]                        # [B, 1, M, C]
        mk = mask[..., :, :, None]                       # [B, M, M, 1]
        mx = jnp.max(jnp.where(mk, pfb, -big), axis=-2)  # [B, M, C]
        h = (mx.astype(jnp.float32) - q) + t
        return fnn.leaky_relu(h.astype(x.dtype), 0.2), bn_state

    q = jnp.matmul(x, a.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    pf = jnp.matmul(x, (a + b).astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    # named for the selective-remat policy: saving these [B,M,C] matmul
    # outputs lets backward recompute only the cheap gather/elementwise
    # tail instead of the whole timestep
    q = checkpoint_name(q, "edge_small")
    pf = checkpoint_name(pf, "edge_small")
    if idx is None:
        idx = ops.knn(x, k)
    else:
        idx = idx[..., :k]

    # Training also never materialises the [B, M, k, C] edge tensor: the
    # BN batch statistics of e_{bij} = pf_j - q_i over the adjacency
    # decompose into degree-weighted point sums,
    #   sum(e)   = deg.pf       - k*sum(q)
    #   sum(e^2) = deg.pf^2 - 2 sum_i q_i.(A pf)_i + k*sum(q^2),
    # needing one [M, M] adjacency matmul instead of the k-wide one-hot
    # gather (a k-fold FLOP cut in forward AND backward), and the
    # post-BN max over neighbours is the same masked channel-wise max as
    # eval with the batch-stat affine folded in. Algebraically identical
    # to gather+bn_apply+max up to float reassociation, so autodiff
    # yields the same gradients (up to the max's tie subgradient).
    kk = idx.shape[-1]
    mask = jnp.any(idx[..., :, :, None]
                   == jnp.arange(m, dtype=idx.dtype), axis=-2)  # [B, M, M]
    adj = mask.astype(jnp.float32)
    deg = jnp.sum(adj, axis=-2)                          # [B, M] in-degree
    qf = q.astype(jnp.float32)
    pff = pf.astype(jnp.float32)
    n = q.shape[0] * m * kk
    # Numerical form matters: e is invariant to shifting pf and q by the
    # same constant, and E[(e-mu)^2] decomposes with q shifted by mu, so
    # center everything first — the naive one-pass E[e^2] - mu^2 form
    # cancels catastrophically and amplifies reduction-order differences
    # (e.g. per-shard partial sums under data parallelism) into visible
    # BN drift.
    c0 = jnp.mean(pff, axis=(0, 1))
    pfc = pff - c0
    qc = qf - c0
    s_q = jnp.sum(qc, axis=(0, 1))
    mean = (jnp.einsum("bm,bmc->c", deg, pfc) - kk * s_q) / n
    q2 = qc + mean
    s_nbr = jnp.einsum("bij,bjc->bic", adj, pfc)         # [B, M, C]
    sum_e2c = (jnp.einsum("bm,bmc->c", deg, pfc * pfc)
               - 2.0 * jnp.sum(q2 * s_nbr, axis=(0, 1))
               + kk * jnp.sum(q2 * q2, axis=(0, 1)))
    var = jnp.maximum(sum_e2c / n, 0.0)                  # biased E[(e-mu)^2]
    unbiased = var * (n / max(n - 1, 1))
    momentum = 0.1
    new_bn = {
        "mean": ((1 - momentum) * bn_state["mean"].astype(jnp.float32)
                 + momentum * mean).astype(bn_state["mean"].dtype),
        "var": ((1 - momentum) * bn_state["var"].astype(jnp.float32)
                + momentum * unbiased).astype(bn_state["var"].dtype),
    }
    s = p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(var + 1e-5)
    t = p["bn"]["bias"].astype(jnp.float32) - s * mean
    pf_s = (pff * s).astype(x.dtype)
    big = jnp.asarray(3e38, x.dtype)
    mx = jnp.max(jnp.where(mask[..., :, :, None], pf_s[..., None, :, :],
                           -big), axis=-2)               # [B, M, C]
    h = mx.astype(jnp.float32) - qf * s + t
    return fnn.leaky_relu(h.astype(x.dtype), 0.2), new_bn


def fd_encoder_apply(params, state, x, cfg, *, training: bool,
                     carry: snn.NeuronState | None = None):
    """x: [B, M, 3] patches -> (features [B, emb], new_state, new_carry)."""
    enc_p, enc_s = params["enc"], state["enc"]
    m = x.shape[-2]
    new_state = {"enc": dict(enc_s), "dec": state["dec"]}

    # --- hoisted t-invariant block 0 (multi-scale edge convs, fd:411-421)
    # one neighbour computation serves every scale: nearest-first order
    # makes each smaller-k neighbour list a prefix of the largest (train:
    # shared top-k indices; eval: shared distance matrix + values sort)
    if training:
        idx0, dist0 = ops.knn(x, min(max(cfg["k_scales"]), m)), None
    else:
        d0 = ops.pairwise_sqdist(x, x)
        nk0, _ = jax.lax.top_k(-d0, min(max(cfg["k_scales"]), m))
        idx0, dist0 = None, (d0, nk0)
    scale_feats, ms_states = [], []
    for p, s, kk in zip(enc_p["ms_conv"], enc_s["ms_conv"], cfg["k_scales"]):
        f, bn = _edge_block(p, s["bn"], x, min(kk, m), training=training,
                            idx=idx0, dist=dist0)
        scale_feats.append(f)
        ms_states.append({"bn": bn})
    new_state["enc"]["ms_conv"] = ms_states
    fused = jnp.concatenate(scale_feats, axis=-1)
    fused = fnn.dense(enc_p["scale_fusion"]["fc"], fused)
    fused, new_state["enc"]["scale_fusion_bn"] = fnn.bn_apply(
        enc_p["scale_fusion"]["bn"], enc_s["scale_fusion_bn"], fused,
        training=training)
    x_conv0 = fnn.leaky_relu(fused, 0.2)                  # [B, M, 64]

    # --- temporal scan over T (fd:408-480)
    snn_steps = [snn.eif_step, snn.eif_step, snn.lif_step, snn.lif_step]
    b = x.shape[0]
    init_states = [
        snn.init_state(enc_p["snn"][0], x_conv0),
        snn.init_state(enc_p["snn"][1], jnp.zeros((b, m, 128), x.dtype)),
        snn.init_state(enc_p["snn"][2], jnp.zeros((b, m, 256), x.dtype)),
        snn.init_state(enc_p["snn"][3], jnp.zeros((b, m, 512), x.dtype)),
    ]
    # Under shard_map (sharded inference) the scan carry must have the same
    # varying-axes type at input and output; the zero/broadcast inits above
    # carry no data dependence on the (sharded) input, so add a
    # data-dependent zero to mark them varying. No-op numerically and
    # constant-folded by XLA after sharding propagation.
    vzero = jnp.sum(x_conv0) * 0
    init_states = jax.tree.map(lambda a: a + vzero.astype(a.dtype),
                               init_states)
    init_bn = [enc_s["conv_bn"][i] for i in range(3)] + [enc_s["ms_fuse_bn"]]

    # Remat: recompute in-loop activations in the backward pass instead of
    # storing T copies (the reference detaches states across timesteps, so
    # per-step backward is independent; storing all T steps OOMs a 16G chip
    # at the reference's batch size). fn.yaml's gradient_checkpointing
    # analog; disable with cfg["remat"]=False.
    def t_body(carry_t, _):
        states, bns = carry_t
        s0, st0 = snn_steps[0](enc_p["snn"][0], states[0], x_conv0,
                               training=training)
        new_states = [snn.detach_state(st0)]
        feats, cur = [s0], s0
        new_bns = []
        for i in range(3):
            h, bn_i = _edge_block(enc_p["conv"][i], bns[i], cur,
                                  min(cfg["k"], m), training=training)
            si, sti = snn_steps[i + 1](enc_p["snn"][i + 1], states[i + 1], h,
                                       training=training)
            new_states.append(snn.detach_state(sti))
            new_bns.append(bn_i)
            feats.append(si)
            cur = si
        cat = jnp.concatenate(feats, axis=-1)             # [B, M, 960]
        agg = fnn.dense(enc_p["ms_fuse"]["fc"], cat)
        agg, bn_f = fnn.bn_apply(enc_p["ms_fuse"]["bn"], bns[3], agg,
                                 training=training)
        agg = fnn.leaky_relu(agg, 0.2)
        pooled = jnp.max(agg, axis=-2)                    # [B, emb]
        new_bns.append(bn_f)
        rates = jnp.stack([jnp.mean(f) for f in feats])   # telemetry
        return (new_states, new_bns), (pooled, rates)

    remat_mode = cfg.get("remat", "names") if training else False
    if remat_mode == "names":
        # selective: keep the named [B,M,C] matmul outputs, recompute the
        # k-fold gather/elementwise tails (cheap since the one-hot-matmul
        # gather fix); ~2x less backward recompute than full remat for a
        # ~1.4G memory cost at the reference batch
        body = jax.checkpoint(
            t_body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "edge_small"))
    elif remat_mode:
        body = jax.checkpoint(t_body)
    else:
        body = t_body
    (final_states, final_bns), (pooled_t, rates_t) = jax.lax.scan(
        body, (init_states, init_bn), None, length=cfg["time_steps"])
    del final_states
    new_state["enc"]["conv_bn"] = final_bns[:3]
    new_state["enc"]["ms_fuse_bn"] = final_bns[3]

    # --- temporal integration (fd:320-328) + persistent snn_fc (fd:485-490)
    w = jax.nn.softmax(enc_p["temporal_w"])
    feat = jnp.einsum("t,tbe->be", w, pooled_t)
    if carry is None:
        carry = snn.init_state(enc_p["snn_fc"], feat)
    else:
        carry = snn.detach_state(carry)
    out, new_carry = snn.lif_step(enc_p["snn_fc"], carry, feat,
                                  training=training)
    new_state["enc"]["spike_rates"] = jax.lax.stop_gradient(jnp.concatenate(
        [jnp.mean(rates_t, axis=0), jnp.mean(out)[None]]).astype(jnp.float32))
    return out, new_state, new_carry


def fd_decoder_apply(params, state, x, cfg, *, training: bool, rng=None):
    """StandardDistanceDecoder: [B, emb] -> non-negative distances [B].

    Always computes in float32 regardless of the serving dtype: the
    trained decoder's BN running variances are tiny (~1e-6), so eval
    activations legitimately reach ~1e6 (attention logits ~1e12) before
    the LayerNorm renormalises — correct in f32, but the XLA-TPU bf16
    fusion of this segment produces NaN (measured: jit+bf16 -> all-NaN,
    eager or f32 -> clean, any input). The decoder is <0.5% of fd FLOPs,
    so f32 here costs nothing; torch autocast keeps BN in fp32 for the
    same reason (see bn_apply).
    """
    x = x.astype(jnp.float32)
    dec_p, dec_s = params["dec"], state["dec"]
    new_dec = dict(dec_s)
    rngs = iter(jax.random.split(rng, 8)) if rng is not None else iter([None] * 8)

    h = fnn.dense(dec_p["fc_in"]["fc"], x)
    h, new_dec["fc_in_bn"] = fnn.bn_apply(dec_p["fc_in"]["bn"], dec_s["fc_in_bn"],
                                          h, training=training)
    h = fnn.gelu(h)

    res_bns = []
    for blk, bns in zip(dec_p["res"], dec_s["res_bn"]):
        residual = h
        y = fnn.dense(blk["fc1"], h)
        y, b1 = fnn.bn_apply(blk["bn1"], bns["bn1"], y, training=training)
        y = fnn.gelu(y)
        y = fnn.dropout(next(rngs), y, cfg["dropout"], training)
        y = fnn.dense(blk["fc2"], y)
        y, b2 = fnn.bn_apply(blk["bn2"], bns["bn2"], y, training=training)
        if "res_proj" in blk:
            residual = fnn.dense(blk["res_proj"], residual)
        h = fnn.gelu(y + residual)
        res_bns.append({"bn1": b1, "bn2": b2})
    new_dec["res_bn"] = res_bns

    # single-token self-attention with softmax over heads (fd:777-798)
    ap = dec_p["attn"]
    bdim = h.shape[0]
    d = h.shape[-1]
    heads = cfg["num_heads"]
    hd = d // heads
    residual = h
    qkv = fnn.dense(ap["to_qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(bdim, heads, hd)
    k = k.reshape(bdim, heads, hd)
    v = v.reshape(bdim, heads, hd)
    attn = jnp.einsum("bhd,bhd->bh", q, k) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bh,bhd->bhd", attn, v).reshape(bdim, d)
    out = fnn.dense(ap["to_out"], out)
    out = fnn.dropout(next(rngs), out, cfg["dropout"], training)
    h = fnn.layer_norm(ap["ln"], out + residual)

    h = fnn.dense(dec_p["fc_hidden"]["fc"], h)
    h, new_dec["fc_hidden_bn"] = fnn.bn_apply(
        dec_p["fc_hidden"]["bn"], dec_s["fc_hidden_bn"], h, training=training)
    h = fnn.gelu(h)
    h = fnn.dropout(next(rngs), h, cfg["dropout"], training)
    dist = fnn.dense(dec_p["fc_distance"], h)
    # Softplus(beta=5): the critical ReLU->Softplus fix (fd:707-709)
    dist = fnn.softplus_beta(dist, 5.0)
    return dist[..., 0], {"enc": state["enc"], "dec": new_dec}


def fd_apply(params, state, x, cfg, *, training: bool, rng=None,
             carry: snn.NeuronState | None = None):
    """Full fd forward.

    x: [B, N, M, 3] (patch batch; flattened like fd/snn_coder.py:853-863)
       or [B, M, 3].
    Returns (distances [B, N] or [B], new_state, new_carry).
    """
    if x.ndim == 4:
        b, n, m, _ = x.shape
        flat = x.reshape(b * n, m, 3)
    else:
        flat = x
    feat, new_state, new_carry = fd_encoder_apply(params, state, flat, cfg,
                                                  training=training, carry=carry)
    dist, new_state = fd_decoder_apply(params, new_state, feat, cfg,
                                       training=training, rng=rng)
    if x.ndim == 4:
        dist = dist.reshape(b, n)
    return dist, new_state, new_carry


def fd_loss(pred: jax.Array, gt: jax.Array, beta: float = 0.1) -> jax.Array:
    """smooth_l1_loss(beta=0.1) (fd/snn_coder.py:800-803)."""
    diff = jnp.abs(pred - gt)
    return jnp.mean(jnp.where(diff < beta, 0.5 * diff * diff / beta,
                              diff - 0.5 * beta))
