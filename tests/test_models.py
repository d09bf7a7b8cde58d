"""Structural + semantic tests for the fn/fd models (tiny configs on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sapcu_tpu import models
from sapcu_tpu.models import fd_model, fn_model


@pytest.fixture(scope="module")
def fd_tiny():
    params, state, cfg = models.init_fd_model(
        jax.random.PRNGKey(0), k=8, emb_dims=64, time_steps=3,
        k_scales=(4, 8), num_heads=4)
    return params, state, cfg


@pytest.fixture(scope="module")
def fn_tiny():
    params, state, cfg = models.init_fn_model(
        jax.random.PRNGKey(1), k_values=(6, 6, 4), emb_dims=48,
        time_steps_enc=2, num_heads=4)
    return params, state, cfg


def _patches(rng, b, n, m):
    return jnp.asarray(rng.normal(size=(b, n, m, 3)).astype(np.float32) * 0.1)


def test_fd_forward_shapes_and_range(fd_tiny, rng):
    params, state, cfg = fd_tiny
    x = _patches(rng, 2, 5, 16)
    dist, new_state, carry = models.fd_apply(params, state, x, cfg,
                                             training=False)
    assert dist.shape == (2, 5)
    assert bool(jnp.all(dist >= 0))  # Softplus head
    assert bool(jnp.all(jnp.isfinite(dist)))
    # 3D input path
    d3, _, _ = models.fd_apply(params, state, x[0], cfg, training=False)
    assert d3.shape == (5,)


def test_fd_eval_deterministic_and_state_updates(fd_tiny, rng):
    params, state, cfg = fd_tiny
    x = _patches(rng, 1, 4, 16)
    d1, s1, _ = models.fd_apply(params, state, x, cfg, training=False)
    d2, _, _ = models.fd_apply(params, state, x, cfg, training=False)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))
    # training mode must update BN running stats
    _, s_train, _ = models.fd_apply(params, state, x, cfg, training=True)
    before = np.asarray(state["enc"]["ms_fuse_bn"]["mean"])
    after = np.asarray(s_train["enc"]["ms_fuse_bn"]["mean"])
    assert not np.allclose(before, after)


def test_fd_gradients_reach_all_params(fd_tiny, rng):
    params, state, cfg = fd_tiny
    x = _patches(rng, 1, 4, 16)
    gt = jnp.abs(jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))) * 0.01

    def loss_fn(p):
        pred, _, _ = models.fd_apply(p, state, x, cfg, training=True,
                                     rng=jax.random.PRNGKey(3))
        return models.fd_loss(pred, gt)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    dead = [jax.tree_util.keystr(k) for k, g in flat
            if not np.any(np.asarray(g))]
    # snn state params may legitimately have zero grad only if no spikes
    # crossed threshold; conv/dense kernels must always receive gradient.
    dead_dense = [k for k in dead if "kernel" in k or "temporal_w" in k]
    assert dead_dense == [], f"dead parameters: {dead_dense}"
    finite = all(np.all(np.isfinite(np.asarray(g))) for _, g in flat)
    assert finite


def test_fd_loss_matches_torch_smooth_l1(rng):
    p = rng.normal(size=(32,)).astype(np.float32) * 0.1
    g = np.abs(rng.normal(size=(32,)).astype(np.float32)) * 0.1
    got = float(models.fd_loss(jnp.asarray(p), jnp.asarray(g)))
    want = torch.nn.functional.smooth_l1_loss(
        torch.tensor(p), torch.tensor(g), beta=0.1).item()
    assert abs(got - want) < 1e-6


def test_fd_carry_roundtrip(fd_tiny, rng):
    params, state, cfg = fd_tiny
    x = _patches(rng, 1, 4, 16)
    d1, _, carry = models.fd_apply(params, state, x, cfg, training=False)
    d2, _, _ = models.fd_apply(params, state, x, cfg, training=False,
                               carry=carry)
    # with a non-fresh snn_fc membrane, the output must change
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


def test_fn_forward_unit_normals(fn_tiny, rng):
    params, state, cfg = fn_tiny
    x = _patches(rng, 2, 3, 12)
    normals, _ = models.fn_apply(params, state, x, cfg, training=False)
    assert normals.shape == (2, 3, 3)
    norms = np.linalg.norm(np.asarray(normals), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_fn_gradients_flow(fn_tiny, rng):
    params, state, cfg = fn_tiny
    x = _patches(rng, 1, 4, 12)
    gt = jnp.asarray(rng.normal(size=(1, 4, 3)).astype(np.float32))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)

    def loss_fn(p):
        pred, _ = models.fn_apply(p, state, x, cfg, training=True,
                                  rng=jax.random.PRNGKey(5))
        loss, _ = models.fn_loss(pred, gt, x)
        return loss

    def loss_fn_input(p, v):
        pred, _ = models.fn_apply(p, state, v, cfg, training=True,
                                  rng=jax.random.PRNGKey(5))
        loss, _ = models.fn_loss(pred, gt, v)
        return loss

    loss = loss_fn(params)
    assert np.isfinite(float(loss))
    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for _, g in flat)
    # Kernels fed by spike outputs can legitimately get zero gradient when
    # the presynaptic layer's final timestep doesn't fire (same in the torch
    # reference); assert the always-live paths instead.
    assert np.any(np.asarray(grads["dec"]["mlp"][0]["fc"]["kernel"]))
    assert np.any(np.asarray(grads["enc"]["conv1"]["fc"]["kernel"]))
    assert np.any(np.asarray(grads["enc"]["blocks"][0]["fc_delta"]["fc"]["kernel"]))
    # ...and that the input itself receives gradient through the encoder
    gx = jax.grad(lambda v: loss_fn_input(params, v))(x)
    assert np.any(np.asarray(gx)) and np.all(np.isfinite(np.asarray(gx)))


def test_fn_loss_matches_torch_oracle(rng):
    """Oracle restates fn/snn_coder.py:588-624 in torch."""
    b, n = 2, 16
    pred = rng.normal(size=(b, n, 3)).astype(np.float32)
    pred /= np.linalg.norm(pred, axis=-1, keepdims=True)
    gt = rng.normal(size=(b, n, 3)).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32)

    got_loss, got_conf = models.fn_loss(jnp.asarray(pred), jnp.asarray(gt),
                                        jnp.asarray(xyz))

    tp = torch.tensor(pred.reshape(-1, 3))
    tg = torch.tensor(gt.reshape(-1, 3))
    cos = torch.nn.functional.cosine_similarity(tp, tg, dim=1)
    ang = torch.acos(torch.clamp(cos, -1 + 1e-6, 1 - 1e-6))
    conf = torch.sigmoid(ang.detach() / 0.1)
    base = (ang * conf + 0.1 * (conf - 0.5) ** 2).mean()

    txyz = torch.tensor(xyz)
    d = torch.cdist(txyz, txyz) ** 2
    idx = d.argsort(dim=-1)[:, :, 1:9]
    tpn = torch.tensor(pred)
    nb = torch.gather(tpn.unsqueeze(2).expand(b, n, 8, 3), 1,
                      idx.unsqueeze(-1).expand(b, n, 8, 3))
    ccos = torch.nn.functional.cosine_similarity(
        tpn.unsqueeze(2), nb, dim=-1)
    want = base + 0.15 * (1 - ccos).mean()

    assert abs(float(got_loss) - want.item()) < 1e-4
    assert abs(float(got_conf) - conf.mean().item()) < 1e-5


def test_angular_error_deg(rng):
    a = np.eye(3, dtype=np.float32)
    b = np.roll(np.eye(3, dtype=np.float32), 1, axis=0)
    err = float(models.angular_error_deg(jnp.asarray(a), jnp.asarray(b)))
    assert abs(err - 90.0) < 0.1
