"""Round-5 features: product (ratio-scaled) serving path, fn PCA-prior
residual architecture, per-iteration cosine schedule, counter reset on
warm start, sharp-primitive synthetic family."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sapcu_tpu import models, ops
from sapcu_tpu.data import device_synth as dsynth
from sapcu_tpu.generate import pipeline as pl
from sapcu_tpu.generate.pipeline import Upsampler
from sapcu_tpu.models import fn_model
from sapcu_tpu.train import optim as optim_mod
from sapcu_tpu.train.loop import run_training


def _sphere(n, r=0.42, seed=2):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


# ------------------------------------------------------ product-mode units
def test_interp_seeds_lie_in_neighbour_fan_triangles():
    """Every seed is a barycentric point of SOME local fan triangle
    (x_i, x_j, x_l) with x_j, x_l among x_i's 8 nearest neighbours —
    checked against all N x C(8,2) candidate triangles."""
    cloud = jnp.asarray(_sphere(128))
    seeds = pl._interp_seeds(cloud, jax.random.PRNGKey(0), 512, k=8)
    assert seeds.shape == (512, 3)
    s = np.asarray(seeds)
    c = np.asarray(cloud)
    d = ((c[None] - c[:, None]) ** 2).sum(-1) + np.eye(128) * 1e9
    knn = np.argsort(d, axis=1)[:, :8]
    ju, lu = np.triu_indices(8, 1)
    nbr = c[knn]                                   # [N, 8, 3]
    A = nbr[:, ju] - c[:, None, :]                 # [N, P, 3]
    B = nbr[:, lu] - c[:, None, :]
    # 2x2 normal-equation solve of q = x_i + u A + v B per (i, pair)
    aa = (A * A).sum(-1)                           # [N, P]
    bb = (B * B).sum(-1)
    ab = (A * B).sum(-1)
    det = aa * bb - ab * ab
    rel = s[:, None, None, :] - c[None, :, None, :]      # [S, N, 1->P, 3]
    ra = (rel * A[None]).sum(-1)                   # [S, N, P]
    rb = (rel * B[None]).sum(-1)
    safe = np.maximum(det, 1e-18)
    u = (ra * bb - rb * ab) / safe
    v = (rb * aa - ra * ab) / safe
    rec = (c[None, :, None, :] + u[..., None] * A[None]
           + v[..., None] * B[None])
    res = np.linalg.norm(rec - s[:, None, None, :], axis=-1)
    inside = ((u > -1e-4) & (v > -1e-4) & (u + v < 1 + 1e-4)
              & (res < 1e-5) & (det[None] > 1e-18))
    assert inside.any(axis=(1, 2)).all()
    # deterministic under the same key
    seeds2 = pl._interp_seeds(cloud, jax.random.PRNGKey(0), 512, k=8)
    np.testing.assert_array_equal(np.asarray(seeds), np.asarray(seeds2))


def test_interp_seeds_cover_the_surface():
    """The round-5 coverage property (why triangles replaced chords —
    the chord cut failed its GT-Chamfer gate): on a sparse sphere, every
    surface point must be NEAR some candidate. 4096 candidates from a
    256-point sphere: p95 of the surface->candidate NN distance stays
    below the input's own ~0.093 mean spacing."""
    cloud = jnp.asarray(_sphere(256, seed=4))
    seeds = np.asarray(pl._interp_seeds(cloud, jax.random.PRNGKey(1), 4096))
    gt = _sphere(512, seed=11)                     # held-out surface probes
    nn = np.sqrt(((gt[:, None] - seeds[None]) ** 2).sum(-1).min(1))
    assert np.quantile(nn, 0.95) < 0.09, np.quantile(nn, 0.95)
    # and candidates hug the sphere (inside, within sagitta depth)
    r = np.linalg.norm(seeds, axis=1)
    assert r.max() < 0.42 + 1e-4
    assert np.quantile(r, 0.05) > 0.33


def test_stride_select_exact_count_from_valid_prefix():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(1024, 3)).astype(np.float32)
    pts[700:] = 7.7  # sentinel rows past the valid count
    sel = np.asarray(pl._stride_select(jnp.asarray(pts), jnp.int32(700), 256))
    assert sel.shape == (256, 3)
    assert not (sel == 7.7).all(axis=1).any()  # never picks invalid rows
    # spatial stratification: selected set spans the cloud's extent
    assert (sel.max(0) - sel.min(0)).min() > 0.5
    # n_valid < n_out falls back to repeating candidates, never invalid
    sel2 = np.asarray(pl._stride_select(jnp.asarray(pts), jnp.int32(10), 64))
    assert sel2.shape == (64, 3)
    assert not (sel2 == 7.7).all(axis=1).any()
    uniq = np.unique(sel2.round(6), axis=0)
    assert uniq.shape[0] <= 10


def _sc_upsampler(**kw):
    fn_bundle = models.init_fn_model(jax.random.PRNGKey(0),
                                     k_values=(6, 6, 4), emb_dims=32,
                                     time_steps_enc=2, num_heads=4)
    fd_bundle = models.init_fd_model(jax.random.PRNGKey(1), k=8, emb_dims=48,
                                     time_steps=2, k_scales=(4, 8),
                                     num_heads=4)
    sc_bundle = models.init_sc_model(jax.random.PRNGKey(2), k=8,
                                     feat_dims=32, m_neighbors=4,
                                     head_hidden=16, time_steps=2)
    return Upsampler(fn_bundle, fd_bundle, k_neighbors=16,
                     dense_spacing=0.02, batch_size=64, mode="sc",
                     sc_bundle=sc_bundle, **kw)


def test_product_mode_end_to_end():
    """Ratio-scaled product path: exactly target points, on the surface
    band. The sc head's analytic-prior projection works even at random
    init (near-zero residual head), so the output must hug the sphere."""
    up = _sc_upsampler(refine_steps=2)
    cloud = _sphere(300)
    target = 4 * 300
    out = np.asarray(up.upsample_product(cloud, target))
    assert out.shape == (target, 3)
    assert np.isfinite(out).all()
    radii = np.linalg.norm(out, axis=1)
    assert radii.min() > 0.3 and radii.max() < 0.55
    # dispatch/resolve handle round-trips the same result
    sel, n_keep = up.product_resolve(up.product_dispatch(cloud, target))
    assert n_keep > target  # oversample margin survived the filter
    np.testing.assert_array_equal(np.asarray(sel), out)


def test_product_batch_matches_single():
    """The fused cloud-batched product program must reproduce the
    single-cloud product path per cloud: same seeds (same per-cloud key),
    same head chunking, chunk-independent outlier kNN, and an
    order-preserving compact — so outputs agree to float tolerance."""
    up = _sc_upsampler(refine_steps=2)
    clouds = np.stack([_sphere(300, seed=2), _sphere(300, r=0.38, seed=9)])
    target = 4 * 300
    singles = [np.asarray(up.upsample_product(c, target)) for c in clouds]
    batch, n_keep = up.upsample_product_batch(clouds, target)
    batch = np.asarray(batch)
    n_keep = np.asarray(n_keep)
    assert batch.shape == (2, target, 3)
    assert (n_keep > target).all()
    for i in range(2):
        np.testing.assert_allclose(batch[i], singles[i], atol=1e-4)


def test_product_mode_requires_sc():
    fn_bundle = models.init_fn_model(jax.random.PRNGKey(0),
                                     k_values=(6, 6, 4), emb_dims=32,
                                     time_steps_enc=2, num_heads=4)
    fd_bundle = models.init_fd_model(jax.random.PRNGKey(1), k=8, emb_dims=48,
                                     time_steps=2, k_scales=(4, 8),
                                     num_heads=4)
    up = Upsampler(fn_bundle, fd_bundle, k_neighbors=16,
                   dense_spacing=0.02, batch_size=64)
    with pytest.raises(AssertionError):
        up.product_dispatch(_sphere(64), 128)


# ------------------------------------------------------- fn PCA prior
def test_fn_pca_prior_outputs_prior_at_init():
    """Near-zero-init residual head: at init the model's normals must be
    within a degree of the analytic 8-NN oriented plane prior."""
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(0), k_values=(6, 6, 4), emb_dims=32,
        time_steps_enc=2, num_heads=4, pca_prior=True)
    assert cfg["pca_prior"] is True
    # a curved patch, nearest-first, query-centered
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(64, 12, 3)).astype(np.float32) * 0.05
    pts[..., 2] = 0.01 * (pts[..., 0] ** 2 + pts[..., 1] ** 2) + 0.02
    x = jnp.asarray(pts)
    pred, _ = fn_model.fn_apply(params, state, x, cfg, training=False)
    pred = np.asarray(pred)
    np.testing.assert_allclose(np.linalg.norm(pred, axis=-1), 1.0, atol=1e-5)
    prior, geo = fn_model.patch_plane_features(x)
    assert geo.shape == (64, 12)
    cosang = np.clip((pred * np.asarray(prior)).sum(-1), -1, 1)
    ang = np.degrees(np.arccos(cosang))
    assert ang.max() < 1.0, ang.max()


def test_fn_pca_prior_param_shapes_and_default_off():
    params, _, cfg = models.init_fn_model(
        jax.random.PRNGKey(0), k_values=(6, 6, 4), emb_dims=32,
        time_steps_enc=2, num_heads=4, pca_prior=True)
    assert params["dec"]["mlp"][0]["fc"]["kernel"].shape[0] == 2060  # +12
    p0, _, cfg0 = models.init_fn_model(
        jax.random.PRNGKey(0), k_values=(6, 6, 4), emb_dims=32,
        time_steps_enc=2, num_heads=4)
    assert cfg0["pca_prior"] is False
    assert p0["dec"]["mlp"][0]["fc"]["kernel"].shape[0] == 2048


def test_patch_plane_features_recover_plane_normal():
    """Points on z=c plane around a query below it -> prior = +z (toward
    the neighbourhood centroid) and plane distance = c."""
    rng = np.random.default_rng(1)
    xy = rng.uniform(-0.1, 0.1, size=(32, 2)).astype(np.float32)
    rel = np.concatenate([xy, np.full((32, 1), 0.03, np.float32)], axis=1)
    n8, geo = fn_model.patch_plane_features(jnp.asarray(rel))
    n8 = np.asarray(n8)
    np.testing.assert_allclose(np.abs(n8[2]), 1.0, atol=1e-4)
    assert n8[2] > 0  # oriented toward the centroid
    # geo layout: [n8, d8*32, nm, dm*32, cdir, cnorm*32]
    geo = np.asarray(geo)
    np.testing.assert_allclose(geo[3], 0.03 * 32.0, atol=1e-3)


def test_fn_pca_prior_grads_flow():
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(0), k_values=(6, 6, 4), emb_dims=32,
        time_steps_enc=2, num_heads=4, pca_prior=True, snn_mode="rate")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 12, 3)).astype(np.float32) * 0.05)
    tgt = jnp.asarray(np.tile([0.0, 0.0, 1.0], (8, 1)).astype(np.float32))

    def loss(p):
        pred, _ = fn_model.fn_apply(p, state, x, cfg, training=True,
                                    rng=jax.random.PRNGKey(1))
        return jnp.mean(jnp.sum((pred - tgt) ** 2, axis=-1))

    g = jax.grad(loss)(params)
    gnorm = float(optim_mod.global_norm(g)) if hasattr(
        optim_mod, "global_norm") else float(
        jnp.sqrt(sum(jnp.sum(a * a) for a in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_fn_pca_prior_ms_outputs_prior_at_init_and_shapes():
    """pca_prior="ms": 24 geo dims, head input 256+24, output still the
    8-NN prior at init; multiscale normals are sign-aligned to it."""
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(0), k_values=(6, 6, 4), emb_dims=32,
        time_steps_enc=2, num_heads=4, pca_prior="ms")
    assert cfg["pca_prior"] == "ms"
    assert params["dec"]["mlp"][0]["fc"]["kernel"].shape[0] == 2072  # +24
    assert params["dec"]["fc_out"]["kernel"].shape[0] == 256 + 24
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(32, 24, 3)).astype(np.float32) * 0.05
    pts[..., 2] = 0.01 * (pts[..., 0] ** 2 + pts[..., 1] ** 2) + 0.02
    x = jnp.asarray(pts)
    pred, _ = fn_model.fn_apply(params, state, x, cfg, training=False)
    prior, geo = fn_model.patch_plane_features(x, multiscale=True)
    assert geo.shape == (32, 24)
    cosang = np.clip((np.asarray(pred) * np.asarray(prior)).sum(-1), -1, 1)
    assert np.degrees(np.arccos(cosang)).max() < 1.0
    # geo layout: [base 12 | n16, d16*32, n32, d32*32, n64, d64*32];
    # every multiscale normal is sign-aligned with the 8-NN prior
    geo = np.asarray(geo)
    pr = np.asarray(prior)
    for off in (12, 16, 20):
        assert ((geo[:, off:off + 3] * pr).sum(-1) >= 0).all(), off


def test_fn_pca_prior_ms_grads_reach_head_geo_columns():
    """The direct geo->head skip must carry gradient (the r5b fix: scale
    blending learnable without routing through the MLP)."""
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(0), k_values=(6, 6, 4), emb_dims=32,
        time_steps_enc=2, num_heads=4, pca_prior="ms", snn_mode="rate")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 24, 3)).astype(np.float32) * 0.05)
    tgt = jnp.asarray(np.tile([0.0, 0.0, 1.0], (8, 1)).astype(np.float32))

    def loss(p):
        pred, _ = fn_model.fn_apply(p, state, x, cfg, training=True,
                                    rng=jax.random.PRNGKey(1))
        return jnp.mean(jnp.sum((pred - tgt) ** 2, axis=-1))

    g = jax.grad(loss)(params)
    gk = np.asarray(g["dec"]["fc_out"]["kernel"])
    assert np.isfinite(gk).all()
    assert np.abs(gk[256:]).max() > 0       # geo skip columns get gradient


# ------------------------------------------------------- schedules / loop
def test_cosine_it_schedule_decays_per_iteration():
    cfg = {"training": {"lr": 1e-3, "min_lr": 1e-5, "lr_policy": "cosine_it",
                        "warmup_steps": 100, "max_iterations": 1000,
                        "validate_every": 10000}}
    sched = optim_mod.fn_schedule(cfg)
    assert abs(sched(100, 0)[0] - 1e-3) < 1e-9       # peak at warmup end
    assert abs(sched(1000, 0)[0] - 1e-5) < 1e-9      # floor at t_max
    assert abs(sched(5000, 0)[0] - 1e-5) < 1e-9      # clamped past t_max
    mid = sched(550, 0)[0]
    assert 1e-5 < mid < 1e-3
    # decays BETWEEN validations (the quirk fix): strictly monotone
    lrs = [sched(it, 0)[0] for it in range(100, 1000, 50)]
    assert all(a > b for a, b in zip(lrs, lrs[1:]))
    # warmup ramp
    assert sched(50, 0)[0] < sched(99, 0)[0] < 1e-3


def test_reference_cosine_per_validation_unchanged():
    """The golden-parity default must keep the reference quirk: lr steps
    once per validate_every, so it's flat inside a validation window."""
    cfg = {"training": {"lr": 1e-3, "lr_policy": "cosine",
                        "warmup_steps": 0, "max_iterations": 100,
                        "validate_every": 1000}}
    sched = optim_mod.fn_schedule(cfg)
    assert sched(0, 0)[0] == sched(999, 0)[0] == 1e-3


def test_resume_reset_counters_restarts_schedule(tmp_path):
    """checkpoint.reset_counters: warm start under a NEW schedule — the
    resumed iteration counter restarts at 0 (weights kept), so a fresh
    cosine doesn't begin past its own t_max."""
    cfg = {
        "data": {"synthetic": True, "synthetic_length": 8, "patch_n": 4,
                 "patch_k": 8},
        "training": {"batch_size": 2, "max_iterations": 3, "max_epochs": 10,
                     "print_every": 1, "checkpoint_every": 2,
                     "validate_every": 2, "backup_every": 0,
                     "early_stopping": False, "lr": 1e-3,
                     "lr_policy": "cosine", "warmup_steps": 0,
                     "optimizer": "adamw", "weight_decay": 1e-4,
                     "grad_clip": 0.1, "learning_rate": 1e-4},
        "loss": {"beta": 0.1},
        "monitoring": {"use_tensorboard": False},
        "checkpoint": {"resume_file": "model_best.pt"},
        "hardware": {"seed": 0},
        "model": {"k": 8, "emb_dims": 48, "time_steps_enc": 2,
                  "k_scales": [4, 8], "num_heads": 4},
    }
    out = str(tmp_path / "fd")
    s0 = run_training("fd", cfg, out, resume=False, seed=0)
    assert s0["it"] == 3
    # plain resume continues the counter
    s1 = run_training("fd", cfg, out, max_iterations=5, resume=True, seed=0)
    assert s1["it"] == 5
    # reset_counters restarts it (3 fresh iterations from it=0)
    cfg["checkpoint"]["reset_counters"] = True
    s2 = run_training("fd", cfg, out, max_iterations=3, resume=True, seed=0)
    assert s2["it"] == 3


# ------------------------------------------------- sharp synth primitives
def test_sharp_primitives_project_onto_zero_set():
    shape = dsynth.sample_shape_params(jax.random.PRNGKey(0))
    for t in range(dsynth.N_TYPES):
        for c in shape["comps"]:
            c["onehot"] = jax.nn.one_hot(t, dsynth.N_TYPES)
        pts = dsynth.sample_surface(shape, jax.random.PRNGKey(t), 256)
        sd = np.asarray(dsynth.shape_sdf(shape, pts))
        assert np.isfinite(np.asarray(pts)).all(), f"type {t}"
        # a handful of starts land outside Newton's quadratic basin
        # (e.g. near the torus axis); the bulk must be on the zero set
        assert np.median(np.abs(sd)) < 1e-6, f"type {t}"
        assert np.quantile(np.abs(sd), 0.99) < 5e-3, f"type {t}"
        assert np.abs(sd).max() < 2e-2, f"type {t}: {np.abs(sd).max()}"


def test_cone_sdf_metric_accuracy():
    """_sdf_cone must be a true distance (not just a bound) away from the
    apex/rim: check against brute-force distance to a dense surface
    sampling."""
    h, r = 0.25, 0.2
    hr = jnp.asarray([h, r])
    # dense boundary sampling: lateral surface + base disk
    th = np.linspace(0, 2 * np.pi, 256, endpoint=False)
    t = np.linspace(0, 1, 64)
    tt, thh = np.meshgrid(t, th)
    lat = np.stack([r * (1 - tt) * np.cos(thh),
                    -h + 2 * h * tt,
                    r * (1 - tt) * np.sin(thh)], -1).reshape(-1, 3)
    rr = np.sqrt(np.linspace(0, 1, 64)) * r
    rrr, th2 = np.meshgrid(rr, th)
    base = np.stack([rrr * np.cos(th2), np.full_like(rrr, -h),
                     rrr * np.sin(th2)], -1).reshape(-1, 3)
    surf = np.concatenate([lat, base]).astype(np.float32)
    rng = np.random.default_rng(0)
    q = rng.uniform(-0.45, 0.45, size=(128, 3)).astype(np.float32)
    sd = np.asarray(dsynth._sdf_cone(jnp.asarray(q), hr))
    brute = np.linalg.norm(q[:, None] - surf[None], axis=-1).min(1)
    # atol bounded by the surface sampling coverage radius (~5e-3)
    np.testing.assert_allclose(np.abs(sd), brute, atol=6e-3)


def test_shape_family_uses_n_types_onehot():
    shape = dsynth.sample_shape_params(jax.random.PRNGKey(7))
    for c in shape["comps"]:
        assert c["onehot"].shape == (dsynth.N_TYPES,)
        assert float(jnp.sum(c["onehot"])) == 1.0


def test_fn_synth_batch_with_sharp_family_finite():
    b = dsynth.fn_synth_batch(jax.random.PRNGKey(5), 2, n_dense=256,
                              n_cloud=128, n_patches=8, k=12)
    for k_, v in b.items():
        assert np.isfinite(np.asarray(v)).all(), k_
    n = np.asarray(b["normal"])
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
