"""sc model: shared-cloud encoder for amortized per-seed prediction.

The structural step past the reference's per-seed architecture: the
reference evaluates an SNN encoder on a 100-point patch PER SEED
(generation.py:122-172 — ~5.4 GFLOP/seed with the flagship fn+fd), yet
neighbouring seeds share >=95% of their patches. This model encodes the
input cloud ONCE into per-point features and predicts each seed's
(toward-surface normal, distance) from a tiny pooled-neighbourhood head —
~0.7 MFLOP/seed, four orders of magnitude less work at the same
self-supervised training signal.

This is a NEW fast-path model family (the reference has no analog); the
exact per-patch fn+fd path remains the parity product, and fast-vs-exact
quality is gated the same way as probe mode
(scripts/eval_fast_vs_exact.py). Trained with the reference's own
self-supervision labels (pseudo-normals toward the surface +
1-NN distances — sample_mesh-fn.py:95-173, fd/datacore.py:124-129) on the
device-resident synthetic pipeline (data/device_synth.py).

Architecture (channels-last, all matmuls on the MXU):
- encoder: 3 DGCNN-style edge-conv blocks over the SPATIAL kNN graph
  (computed once from xyz; reusing the spatial graph for the feature
  blocks keeps it one kNN per cloud) with LIF spiking after each conv
  (multi_step T=4, soft spikes in eval like the reference quirk), then a
  448->feat_dims fuse. Keeps the SNN character of the project at
  per-point (amortized) cost.
- head: for each query, gather the m nearest points' features + relative
  offsets, a small MLP per neighbour, max + inverse-distance-weighted
  mean pooling, and two heads: L2-normalized normal and
  Softplus(beta=5) distance (the fd output quirk, fd/snn_coder.py:709).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from sapcu_tpu import nn as fnn
from sapcu_tpu import ops, snn

Pytree = Any


def _keys(key, n):
    return list(jax.random.split(key, n))


def init_sc_model(key, k: int = 16, feat_dims: int = 256,
                  m_neighbors: int = 8, head_hidden: int = 128,
                  time_steps: int = 4,
                  dropout: float = 0.0) -> tuple[Pytree, Pytree, dict]:
    """Build (params, state, config) for the shared-cloud encoder."""
    cfg = dict(k=k, feat_dims=feat_dims, m_neighbors=m_neighbors,
               head_hidden=head_hidden, time_steps=time_steps,
               dropout=dropout)
    ks = iter(_keys(key, 32))
    params: dict = {"enc": {}, "head": {}}
    state: dict = {"enc": {}}

    dims = [(6, 64), (128, 128), (256, 256)]
    params["enc"]["conv"], state["enc"]["conv_bn"] = [], []
    params["enc"]["snn"] = []
    for cin, cout in dims:
        p = {"fc": fnn.dense_init(next(ks), cin, cout, use_bias=False)}
        p["bn"], s = fnn.bn_init(cout)
        params["enc"]["conv"].append(p)
        state["enc"]["conv_bn"].append(s)
        params["enc"]["snn"].append(snn.lif_init(cout))
    params["enc"]["fuse"] = {"fc": fnn.dense_init(next(ks), 64 + 128 + 256,
                                                  feat_dims, use_bias=False)}
    params["enc"]["fuse"]["bn"], state["enc"]["fuse_bn"] = fnn.bn_init(
        feat_dims)

    h = head_hidden
    params["head"]["nbr"] = fnn.dense_init(next(ks), feat_dims + 4, h)
    # trunk input: [max-pool H, weighted-mean H, 12 analytic-prior features]
    params["head"]["trunk1"] = fnn.dense_init(next(ks), 2 * h + 12, h)
    params["head"]["trunk2"] = fnn.dense_init(next(ks), h, h)
    # normal/dist heads are NEAR-ZERO-initialised residual corrections: at
    # init the model outputs (to ~1e-2) the analytic PCA-plane prior
    # (~14 deg mean / ~4 deg median vs the true SDF normal on the
    # synthetic family — already better than a converged pooled-feature
    # head), and training only learns the correction on ambiguous
    # neighbourhoods. Not exactly zero: a zero output kernel would zero
    # every upstream gradient at init.
    params["head"]["normal"] = {
        "kernel": 1e-3 * jax.random.normal(next(ks), (h, 3), jnp.float32),
        "bias": jnp.zeros((3,), jnp.float32)}
    params["head"]["dist"] = {
        "kernel": 1e-3 * jax.random.normal(next(ks), (h, 1), jnp.float32),
        "bias": jnp.zeros((1,), jnp.float32)}
    return params, state, cfg


def sc_encode(params, state, cloud: jax.Array, cfg: dict, *,
              training: bool, rng=None) -> tuple[jax.Array, Pytree]:
    """cloud [B, N, 3] -> (per-point features [B, N, F], new_state)."""
    enc_p, enc_s = params["enc"], state["enc"]
    new_s = {"conv_bn": [], "fuse_bn": None}
    idx = ops.knn(cloud, cfg["k"])              # spatial graph, once
    x = cloud
    feats = []
    for i, (p, bs) in enumerate(zip(enc_p["conv"], enc_s["conv_bn"])):
        e = ops.graph_feature(x, cfg["k"], idx=idx)   # [B, N, k, 2C]
        y = fnn.dense(p["fc"], e)
        y, nbs = fnn.bn_apply(p["bn"], bs, y, training=training)
        # fd-style integration: the SAME conv output drives the neuron
        # every step (fd/snn_coder.py:408-474), output = mean spike RATE
        # over T. Spike-feedback (fn-style multi_step) dies within 2 steps
        # here — post-BN drive rarely re-crosses threshold after the soft
        # reset+refractory — which zeroes every downstream gradient; rate
        # coding keeps a graded, surrogate-differentiable signal.
        st = snn.init_state(enc_p["snn"][i], y)
        acc = jnp.zeros_like(y)
        # Hard Heaviside spikes at eval (train/eval-consistent — the soft
        # eval mixture saturates firing neurons at 0.5, halving
        # activations vs the BN running stats; see snn/neuron.py
        # lif_step). Default HARD: sc is always rate-coded, and on the
        # trained checkpoint hard eval is strictly better than the
        # reference-quirk soft eval (angular 16.1 vs 19.6 deg signed,
        # dist MAE 0.0043 vs 0.0051 vs true labels). eval_spikes="soft"
        # restores the quirk for comparison.
        hard = None if cfg.get("eval_spikes") == "soft" else True
        for _ in range(cfg["time_steps"]):
            s, st = snn.lif_step(enc_p["snn"][i], st, y, training=training,
                                 hard=hard if not training else None)
            acc = acc + s
        y = acc / cfg["time_steps"]
        x = jnp.max(y, axis=-2)                        # [B, N, C]
        feats.append(x)
        new_s["conv_bn"].append(nbs)
    cat = jnp.concatenate(feats, axis=-1)
    f = fnn.dense(enc_p["fuse"]["fc"], cat)
    f, new_s["fuse_bn"] = fnn.bn_apply(enc_p["fuse"]["bn"],
                                       enc_s["fuse_bn"], f,
                                       training=training)
    f = fnn.gelu(f)
    return f, {"enc": new_s}


def sc_head(params, feats: jax.Array, cloud: jax.Array,
            queries: jax.Array, cfg: dict, *, training: bool,
            rng=None) -> tuple[jax.Array, jax.Array]:
    """(feats [B,N,F], cloud [B,N,3], queries [B,S,3]) ->
    (normals [B,S,3], dists [B,S])."""
    hp = params["head"]
    m = min(cfg["m_neighbors"], cloud.shape[-2])
    d = ops.pairwise_sqdist(queries, cloud)            # [B, S, N]
    if cfg.get("head_knn") == "approx" and not training \
            and d.shape[-1] >= 512:
        # Serving path (pipeline.sc_refine sets head_knn=approx): the
        # exact m-NN is ``m`` iterative argmax rounds over the [S, N]
        # distance matrix — ~150 GB of pure HBM traffic per 283k-seed
        # cloud, all but the whole sc refine cost. approx_min_k is ONE
        # PartialReduce pass (recall ~0.95/neighbour; the found set is
        # exactly sorted nearest-first). A missed neighbour is replaced
        # by a near-equidistant one, which the pooled head and the PCA
        # prior cannot meaningfully distinguish; serving quality is
        # gated on GT-Chamfer vs the exact pipeline
        # (scripts/quality_gate.py). Training and direct sc_apply
        # callers (quality evals) keep the exact selection.
        vals, idx = jax.lax.approx_min_k(d, m, recall_target=0.95)
        nd = -vals
    else:
        nd, idx = ops.top_k_select(-d, m)
    w = 1.0 / (jnp.maximum(-nd, 0.0) + 1e-6)           # [B, S, m]
    w = (w / jnp.sum(w, axis=-1, keepdims=True)).astype(feats.dtype)

    nbr_f = ops.index_points(feats, idx)               # [B, S, m, F]
    nbr_p = ops.index_points(cloud, idx)               # [B, S, m, 3]
    rel = nbr_p - queries[..., None, :]
    dist_ch = jnp.sqrt(jnp.maximum(
        jnp.sum(rel * rel, axis=-1, keepdims=True), 1e-12))

    # Analytic local-plane priors (ops.local_plane), always in f32 even
    # under AMP (3x3 eigenvectors in bf16 are junk). Neighbours arrive
    # nearest-first: the 8-NN plane has the better MEAN error (less
    # multi-surface contamination), the full-m plane the better median —
    # the head sees both and corrects from the 8-NN base.
    rel32 = rel.astype(jnp.float32)
    m8 = min(8, m)
    n8, d8 = ops.local_plane(rel32[..., :m8, :])
    nm, dm = ops.local_plane(rel32)
    cmean = jnp.mean(rel32, axis=-2)                   # [B, S, 3]
    cnorm = jnp.sqrt(jnp.maximum(
        jnp.sum(cmean * cmean, axis=-1, keepdims=True), 1e-12))
    cdir = cmean / cnorm
    geo = jnp.concatenate(
        [n8, d8[..., None] * 32.0, nm, dm[..., None] * 32.0,
         cdir, cnorm * 32.0], axis=-1)                 # [B, S, 12]

    g = jnp.concatenate([nbr_f, (rel * 32.0).astype(feats.dtype),
                         (dist_ch * 32.0).astype(feats.dtype)], axis=-1)
    g = fnn.gelu(fnn.dense(hp["nbr"], g))              # [B, S, m, H]
    pooled = jnp.concatenate(
        [jnp.max(g, axis=-2), jnp.sum(g * w[..., None], axis=-2),
         geo.astype(feats.dtype)], axis=-1)
    t = fnn.gelu(fnn.dense(hp["trunk1"], pooled))
    t = fnn.gelu(fnn.dense(hp["trunk2"], t))
    delta_n = fnn.dense(hp["normal"], t).astype(jnp.float32)
    normal = fnn.l2_normalize(n8 + delta_n)
    # dist = softplus_beta(raw + softplus^-1(prior)): exactly the 8-NN
    # plane distance at init (zero-init head), smooth + positive after
    d8c = jnp.clip(d8, 1e-5, 1.0)
    base = jnp.log(jnp.expm1(5.0 * d8c)) / 5.0
    raw = fnn.dense(hp["dist"], t).astype(jnp.float32)[..., 0]
    dist = fnn.softplus_beta(raw + base, beta=5.0)
    return normal, dist


def sc_apply(params, state, cloud: jax.Array, queries: jax.Array,
             cfg: dict, *, training: bool, rng=None
             ) -> tuple[jax.Array, jax.Array, Pytree]:
    """Full forward: encode + head. cloud [B,N,3], queries [B,S,3]."""
    feats, new_state = sc_encode(params, state, cloud, cfg,
                                 training=training, rng=rng)
    normal, dist = sc_head(params, feats, cloud, queries, cfg,
                           training=training, rng=rng)
    return normal, dist, new_state


def sc_loss(normal, dist, gt_normal, gt_len, beta: float = 0.1,
            disp_weight: float = 100.0) -> jax.Array:
    """smooth-l1 on distance (the fd loss, fd/snn_coder.py:800-803) +
    angular term + displacement consistency (the quantity the pipeline
    actually consumes is normal*dist)."""
    err = dist - gt_len
    a = jnp.abs(err)
    l_dist = jnp.mean(jnp.where(a < beta, 0.5 * err * err / beta,
                                a - 0.5 * beta))
    cos = jnp.sum(normal * gt_normal, axis=-1)
    l_ang = jnp.mean(1.0 - cos)
    disp = normal * dist[..., None] - gt_normal * gt_len[..., None]
    l_disp = jnp.mean(jnp.sum(disp * disp, axis=-1))
    return l_dist + l_ang + disp_weight * l_disp
