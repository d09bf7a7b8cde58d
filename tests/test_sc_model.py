"""Shared-cloud encoder (models/sc_model.py) — a new fast-path family.

No reference counterpart to golden-test against; these pin the API
contract, gradient flow, and trainability (loss decreases on a fixed
batch), plus the train-step wiring.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sapcu_tpu import models
from sapcu_tpu.data import device_synth as dsynth
from sapcu_tpu.train.optim import make_tx
from sapcu_tpu.train.steps import make_sc_train_step, make_sc_eval_step


def _tiny():
    return models.init_sc_model(jax.random.PRNGKey(0), k=8, feat_dims=32,
                                m_neighbors=4, head_hidden=16, time_steps=2)


def test_sc_apply_shapes_and_ranges():
    params, state, cfg = _tiny()
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32) * 0.3)
    n, d, new_state = models.sc_apply(params, state, cloud, q, cfg,
                                      training=False)
    assert n.shape == (2, 16, 3) and d.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0,
                               atol=1e-5)
    assert (np.asarray(d) >= 0).all()          # Softplus head
    # eval must not mutate BN stats
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sc_encoder_batch_independence():
    """Per-cloud kNN: sample 0's output must not depend on sample 1."""
    params, state, cfg = _tiny()
    rng = np.random.default_rng(1)
    cloud = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32) * 0.3)
    n1, d1, _ = models.sc_apply(params, state, cloud, q, cfg, training=False)
    cloud2 = cloud.at[1].set(cloud[1] * 0.5 + 0.1)
    n2, d2, _ = models.sc_apply(params, state, cloud2, q, cfg, training=False)
    np.testing.assert_allclose(np.asarray(n1[0]), np.asarray(n2[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d2[0]),
                               atol=1e-6)


def test_sc_gradients_flow_everywhere():
    params, state, cfg = _tiny()
    rng = np.random.default_rng(2)
    cloud = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32) * 0.3)
    gt_n = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    gt_n = gt_n / jnp.linalg.norm(gt_n, axis=-1, keepdims=True)
    gt_l = jnp.abs(jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32)))

    def loss(p):
        n, d, _ = models.sc_apply(p, state, cloud, q, cfg, training=True)
        return models.sc_loss(n, d, gt_n, gt_l)

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # dense kernels (encoder convs + head) must receive signal
    nz = [float(jnp.abs(g).max()) for g in flat]
    assert sum(v > 0 for v in nz) >= len(nz) - 6  # snn threshold_base etc.


def test_sc_overfits_fixed_batch():
    params, state, cfg = _tiny()
    batch = dsynth.sc_synth_batch(jax.random.PRNGKey(3), 2, n_dense=256,
                                  n_cloud=64, n_queries=32)
    tx = make_tx(params, optimizer="adamw", weight_decay=0.0,
                 grad_clip=1.0, snn_groups=False)
    opt_state = tx.init(params)
    step = make_sc_train_step(tx, cfg)
    eval_step = make_sc_eval_step(cfg)
    lr = jnp.float32(3e-3)
    m0 = eval_step(params, state, batch["cloud"], batch["query"],
                   batch["normal"], batch["len"])
    for i in range(150):
        params, opt_state, state, loss, gnorm, ok = step(
            params, opt_state, state, batch["cloud"], batch["query"],
            batch["normal"], batch["len"], lr, jax.random.PRNGKey(i))
        assert bool(ok)
    m1 = eval_step(params, state, batch["cloud"], batch["query"],
                   batch["normal"], batch["len"])
    # The analytic PCA-plane prior makes the INIT already strong (the
    # near-zero-init heads start at the prior), so the relative headroom
    # 40 tiny steps can claw back is smaller than for a cold head.
    assert float(m1["loss"]) < 0.85 * float(m0["loss"])
    assert float(m1["angular_error_deg"]) < float(m0["angular_error_deg"])
