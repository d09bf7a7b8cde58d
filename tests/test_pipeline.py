"""End-to-end pipeline tests with randomly initialised tiny models."""
import jax
import numpy as np
import pytest

from sapcu_tpu import models
from sapcu_tpu.generate import Upsampler, normalize_pointcloud
from sapcu_tpu.ops import metrics
import jax.numpy as jnp


@pytest.fixture(scope="module")
def upsampler():
    fn_bundle = models.init_fn_model(jax.random.PRNGKey(0),
                                     k_values=(6, 6, 4), emb_dims=32,
                                     time_steps_enc=2, num_heads=4)
    fd_bundle = models.init_fd_model(jax.random.PRNGKey(1), k=8, emb_dims=48,
                                     time_steps=2, k_scales=(4, 8),
                                     num_heads=4)
    return Upsampler(fn_bundle, fd_bundle, k_neighbors=16,
                     dense_spacing=0.02, batch_size=64)


def _sphere(n, r=0.42, seed=2):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def test_refine_and_outlier(upsampler):
    cloud = _sphere(300)
    seeds = upsampler.generate_seeds(cloud)
    assert seeds.shape[0] > 50
    sub = seeds[:100]
    out = upsampler.refine(cloud, sub)
    assert out.ndim == 2 and out.shape[1] == 3
    assert 0 < out.shape[0] <= 100          # outlier filter may drop some
    assert np.all(np.isfinite(out))
    # with random fd weights, distances are small (softplus near init) so
    # moved points stay near the seed shell
    d = np.linalg.norm(out[:, None, :] - sub[None, :, :], axis=-1).min(1)
    assert d.max() < 0.5


def test_full_upsample_increases_density(upsampler):
    cloud = _sphere(300)
    out = upsampler.upsample(cloud[None])    # [1, N, 3] input path
    assert out.shape[0] > cloud.shape[0]
    # output should hug the sphere: radii within the seed band + predicted
    # distances of the shell
    radii = np.linalg.norm(out, axis=1)
    assert radii.min() > 0.25 and radii.max() < 0.6


def test_normalize_pointcloud_roundtrip(rng):
    cloud = rng.normal(size=(100, 3)).astype(np.float32) * 5 + 2
    norm, loc, scale = normalize_pointcloud(cloud)
    assert np.all(np.abs(norm) <= 0.5 + 1e-6)
    np.testing.assert_allclose(norm * scale + loc, cloud, atol=1e-4)


def test_metrics_sanity(rng):
    a = rng.normal(size=(1, 128, 3)).astype(np.float32)
    self_cd = float(metrics.chamfer(jnp.asarray(a), jnp.asarray(a)))
    assert self_cd < 1e-9
    b = a + 0.01
    cd = float(metrics.chamfer(jnp.asarray(a), jnp.asarray(b)))
    assert cd > 0
    m = metrics.evaluate_pair(jnp.asarray(a[0]), jnp.asarray(a[0]))
    assert float(m["fscore@1e-2"]) == 1.0
    assert float(m["cd"]) < 1e-6
    hd = float(metrics.hausdorff(jnp.asarray(a), jnp.asarray(b))[0])
    assert abs(hd - 0.01 * np.sqrt(3)) < 1e-3


def test_sinkhorn_emd_identity_and_shift(rng):
    a = rng.normal(size=(64, 3)).astype(np.float32)
    same = float(metrics.sinkhorn_emd(jnp.asarray(a), jnp.asarray(a),
                                      epsilon=0.005))
    shifted = float(metrics.sinkhorn_emd(jnp.asarray(a),
                                         jnp.asarray(a + np.array([0.5, 0, 0],
                                                                  np.float32)),
                                         epsilon=0.005))
    assert same < 0.05
    assert abs(shifted - 0.5) < 0.1


def _fast_upsampler(probe_factor):
    fn_bundle = models.init_fn_model(jax.random.PRNGKey(0),
                                     k_values=(6, 6, 4), emb_dims=32,
                                     time_steps_enc=2, num_heads=4)
    fd_bundle = models.init_fd_model(jax.random.PRNGKey(1), k=8, emb_dims=48,
                                     time_steps=2, k_scales=(4, 8),
                                     num_heads=4)
    return Upsampler(fn_bundle, fd_bundle, k_neighbors=16,
                     dense_spacing=0.02, batch_size=64, mode="fast",
                     probe_factor=probe_factor)


def test_fast_mode_degenerate_probes_equal_exact(upsampler):
    """probe_factor <= 1 makes every seed its own probe; the tangent-plane
    projection is then n.(p - s) = 0, i.e. exactly the per-seed move."""
    cloud = _sphere(300)
    fast = _fast_upsampler(probe_factor=0.9)
    exact_pts, n_e = upsampler.upsample_device(cloud)
    fast_pts, n_f = fast.upsample_device(cloud)
    assert n_e == n_f
    np.testing.assert_allclose(np.asarray(fast_pts[:n_f]),
                               np.asarray(exact_pts[:n_e]), atol=1e-5)


def test_fast_mode_close_to_exact(upsampler):
    """Coarse probes (2x seed spacing): symmetric Chamfer between fast and
    exact outputs stays a small fraction of the exact output's distance to
    the input cloud (the VERDICT r1 quality bar, checked structurally)."""
    cloud = _sphere(300)
    fast = _fast_upsampler(probe_factor=2.0)
    exact_pts, n_e = upsampler.upsample_device(cloud)
    fast_pts, n_f = fast.upsample_device(cloud)
    assert n_f > 0.8 * n_e
    e = jnp.asarray(exact_pts[:n_e])[None]
    f = jnp.asarray(fast_pts[:n_f])[None]
    cd_fe = float(metrics.chamfer(f, e))
    cd_ec = float(metrics.chamfer(e, jnp.asarray(cloud)[None]))
    assert np.isfinite(cd_fe)
    assert cd_fe < 0.05 * max(cd_ec, 1e-6), (cd_fe, cd_ec)


def test_outlier_window_matches_full():
    """The Morton-window outlier mask must agree with the full O(N^2) rule
    on a dense shell (planted far outliers removed, inliers kept)."""
    from sapcu_tpu.generate.pipeline import _outlier_mask, _outlier_mask_window

    pts = _sphere(3000, seed=5)
    pts[::500] *= 3.0                     # 6 blatant outliers
    n = pts.shape[0]
    cap = 4096
    buf = np.pad(pts, ((0, cap - n), (0, 0)), constant_values=1e3)
    valid = np.arange(cap) < n
    full = np.asarray(_outlier_mask(jnp.asarray(buf), jnp.asarray(valid),
                                    1.5, approx=False))
    win = np.asarray(_outlier_mask_window(jnp.asarray(buf),
                                          jnp.asarray(valid), 1.5, 0.08))
    assert not win[n:].any()
    assert not win[::500][: n // 500 + 1].any()      # outliers dropped
    agree = (full[:n] == win[:n]).mean()
    assert agree > 0.99, agree


def test_outlier_window_adversarial_parallel_sheets():
    """The documented worst case for the Morton-window rule (VERDICT r3
    weak #7): tight parallel sheets whose points interleave along the
    Z-order curve. Candidate windows then mix points from BOTH sheets,
    which can only overestimate per-point 30-NN means; the keep decision
    must still agree with the full O(N^2) rule and drop planted
    far-outliers."""
    from sapcu_tpu.generate.pipeline import (_outlier_mask,
                                             _outlier_mask_window)

    rng = np.random.default_rng(11)
    n_sheet = 1900
    sheets = []
    for z in (-0.04, 0.04):               # gap ~ the seed-band width
        xy = rng.uniform(-0.6, 0.6, size=(n_sheet, 2))
        sheets.append(np.column_stack(
            [xy, np.full(n_sheet, z) + rng.normal(0, 0.002, n_sheet)]))
    pts = np.vstack(sheets).astype(np.float32)
    pts[::500] += np.float32([0.9, 0.9, 0.9])        # planted outliers
    n = pts.shape[0]
    cap = 4096
    buf = np.pad(pts, ((0, cap - n), (0, 0)), constant_values=1e3)
    valid = np.arange(cap) < n
    full = np.asarray(_outlier_mask(jnp.asarray(buf), jnp.asarray(valid),
                                    1.5, approx=False))
    # morton_cell = 4 * dense_spacing (the production setting) at the
    # production cell 0.004
    win = np.asarray(_outlier_mask_window(jnp.asarray(buf),
                                          jnp.asarray(valid), 1.5, 0.016))
    assert not win[n:].any()
    assert not win[::500][: (n - 1) // 500 + 1].any()
    agree = (full[:n] == win[:n]).mean()
    assert agree > 0.98, agree


# ------------------------------------------------ sc (shared-cloud) mode
def _sc_upsampler(mesh=None, **kw):
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
                     sc_bundle=sc_bundle, mesh=mesh, **kw)


def test_sc_mode_end_to_end():
    up = _sc_upsampler()
    cloud = _sphere(300)
    out = up.upsample(cloud)
    assert out.shape[0] > 100 and out.shape[1] == 3
    assert np.all(np.isfinite(out))
    # random-init Softplus head => small distances: output stays near the
    # seed shell around the sphere
    radii = np.linalg.norm(out, axis=1)
    assert radii.min() > 0.2 and radii.max() < 0.7


def test_sc_refine_pad_skip_matches_full():
    """Pad tiles skipping the head must not change any valid row."""
    from sapcu_tpu.generate import pipeline as pl

    sc_params, sc_state, sc_cfg = models.init_sc_model(
        jax.random.PRNGKey(2), k=8, feat_dims=32, m_neighbors=4,
        head_hidden=16, time_steps=2)
    cfg_s = tuple(sorted(sc_cfg.items()))
    cloud = jnp.asarray(_sphere(300))
    n = 70  # valid seeds; buffer padded to 4 tiles of 64
    rng = np.random.default_rng(0)
    seeds = jnp.asarray(
        np.pad((rng.normal(size=(n, 3)) * 0.4).astype(np.float32),
               ((0, 256 - n), (0, 0)), constant_values=1e3))
    full = pl.sc_refine(sc_params, sc_state, cloud, seeds,
                        jnp.int32(256), cfg_s, 64)
    skip = pl.sc_refine(sc_params, sc_state, cloud, seeds,
                        jnp.int32(n), cfg_s, 64)
    np.testing.assert_allclose(np.asarray(skip[:n]), np.asarray(full[:n]),
                               atol=1e-6)
    # pad tiles past the valid range return their sentinels untouched
    np.testing.assert_array_equal(np.asarray(skip[128:]),
                                  np.asarray(seeds[128:]))


def test_sc_fused_single_sync_matches_classic(monkeypatch):
    """The single-host-sync fused sc path (seeds stats stay on device,
    outlier/compact run at fixed capacity with a traced count, one
    batched scalar pull) must produce the classic path's output
    bit-for-bit — in the PRODUCTION regime where both paths pick the
    Morton-window outlier rule."""
    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.ops import seeds as seeds_mod

    # shrink the fixed extraction capacity so the CPU compiles stay tiny;
    # the dispatch logic under test is capacity-independent. Lower the
    # window threshold below the seed count so this exercises the
    # production rule-selection (window kNN on both paths), not only the
    # small-buffer full-scan branch.
    monkeypatch.setattr(seeds_mod, "_SEED_ECAP", 8192)
    monkeypatch.setattr(pl, "_WINDOW_MIN_ROWS", 1024)
    up = _sc_upsampler()
    cloud = _sphere(2048)  # > 1024 points engages the shortlist seeds

    res = up._upsample_fused_sc(jnp.asarray(cloud))
    assert res is not None, "fused path unexpectedly fell back"
    pts_f, n_f = res

    monkeypatch.setenv("SAPCU_FUSED_PIPE", "0")
    pts_c, n_c = up.upsample_device(cloud)
    assert n_f == n_c > 0
    np.testing.assert_array_equal(np.asarray(pts_f[:n_f]),
                                  np.asarray(pts_c[:n_c]))


def test_upsample_async_two_in_flight_matches_sync(monkeypatch):
    """upsample_device_async/resolve with two clouds in flight must give
    each cloud the same result as the synchronous call (no state
    cross-contamination between dispatches)."""
    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.ops import seeds as seeds_mod

    monkeypatch.setattr(seeds_mod, "_SEED_ECAP", 8192)
    monkeypatch.setattr(pl, "_WINDOW_MIN_ROWS", 1024)
    up = _sc_upsampler()
    a = _sphere(2048, seed=3)
    b = _sphere(2048, seed=4) * 0.9

    ha = up.upsample_device_async(a)
    hb = up.upsample_device_async(b)   # dispatched before resolving a
    pa, na = up.upsample_device_resolve(ha)
    pb, nb = up.upsample_device_resolve(hb)

    ra, ma = up.upsample_device(a)
    rb, mb = up.upsample_device(b)
    assert na == ma > 0 and nb == mb > 0
    np.testing.assert_array_equal(np.asarray(pa[:na]), np.asarray(ra[:ma]))
    np.testing.assert_array_equal(np.asarray(pb[:nb]), np.asarray(rb[:mb]))


def test_sc_fused_small_count_serves_classic_rule(monkeypatch):
    """Seed counts below _WINDOW_MIN_ROWS: refine_device picks the full
    approx outlier scan, so the fused path (which must commit to the
    window rule before the count is known) has to fall back to classic
    rather than silently serve a different rule."""
    from sapcu_tpu.ops import seeds as seeds_mod

    monkeypatch.setattr(seeds_mod, "_SEED_ECAP", 8192)
    # _WINDOW_MIN_ROWS stays at its production value (32768), far above
    # this cloud's seed count -> the count gate must trigger
    up = _sc_upsampler()
    cloud = _sphere(2048)
    res = up._upsample_fused_sc(jnp.asarray(cloud))
    assert res is not None
    pts_f, n_f = res

    monkeypatch.setenv("SAPCU_FUSED_PIPE", "0")
    pts_c, n_c = up.upsample_device(cloud)
    assert n_f == n_c > 0
    np.testing.assert_array_equal(np.asarray(pts_f[:n_f]),
                                  np.asarray(pts_c[:n_c]))


def test_refine_steps_iterated_move(monkeypatch):
    """refine_steps=2 (iterated distance step: re-query the move at the
    moved points, original cloud fixed) must change the output vs one
    step, stay finite and near the shell, and keep the fused single-sync
    path bit-for-bit equal to the classic path."""
    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.ops import seeds as seeds_mod

    monkeypatch.setattr(seeds_mod, "_SEED_ECAP", 8192)
    monkeypatch.setattr(pl, "_WINDOW_MIN_ROWS", 1024)
    cloud = _sphere(2048)

    up2 = _sc_upsampler(refine_steps=2)
    res = up2._upsample_fused_sc(jnp.asarray(cloud))
    assert res is not None, "fused path unexpectedly fell back"
    pts_f, n_f = res
    assert n_f > 0 and np.all(np.isfinite(np.asarray(pts_f[:n_f])))
    radii = np.linalg.norm(np.asarray(pts_f[:n_f]), axis=1)
    assert radii.min() > 0.2 and radii.max() < 0.7

    monkeypatch.setenv("SAPCU_FUSED_PIPE", "0")
    pts_c, n_c = up2.upsample_device(cloud)
    assert n_f == n_c
    np.testing.assert_array_equal(np.asarray(pts_f[:n_f]),
                                  np.asarray(pts_c[:n_c]))

    # one step vs two actually differ (the second query moves points)
    up1 = _sc_upsampler(refine_steps=1)
    pts_1, n_1 = up1.upsample_device(cloud)
    assert not np.array_equal(np.asarray(pts_1[:n_1]),
                              np.asarray(pts_c[:n_c]))


def test_sc_mode_sharded_matches_single():
    from sapcu_tpu import parallel

    cloud = _sphere(300)
    up1 = _sc_upsampler()
    pts1, n1 = up1.upsample_device(cloud)
    mesh = parallel.data_parallel_mesh(jax.devices()[:8])
    up8 = _sc_upsampler(mesh=mesh)
    pts8, n8 = up8.upsample_device(cloud)
    assert n1 == n8
    np.testing.assert_allclose(np.asarray(pts1[:n1]), np.asarray(pts8[:n8]),
                               atol=2e-5)
