"""Reference-API-parity Trainer classes."""
import jax
import numpy as np
import pytest

from sapcu_tpu import data as data_mod
from sapcu_tpu import models
from sapcu_tpu.train.trainer import FdTrainer, FnTrainer
from sapcu_tpu.utils.config import get_optimizer, get_scheduler


@pytest.fixture(scope="module")
def fd_trainer():
    params, state, cfg = models.init_fd_model(jax.random.PRNGKey(0), k=8,
                                              emb_dims=48, time_steps=2,
                                              k_scales=(4, 8), num_heads=4)
    tx = get_optimizer(params, {"training": {}}, kind="fd")
    return FdTrainer(params, state, cfg, tx, lr=1e-3)


def _fd_loader(n=4, bs=2):
    ds = data_mod.SyntheticFdDataset(length=n, num_input_points=16,
                                     num_gt_points=64, k_neighbors=8)
    return data_mod.DataLoader(ds, bs, shuffle=False, prefetch=0)


def test_fd_trainer_train_eval_predict(fd_trainer, tmp_path):
    loader = _fd_loader()
    batch = next(iter(loader))
    loss, d = fd_trainer.train_step(batch)
    assert np.isfinite(loss) and d["step_ok"]

    val_loss, metrics = fd_trainer.evaluate(loader, return_metrics=True)
    assert np.isfinite(val_loss)
    assert {"mae", "mse", "relative_error"} <= set(metrics)

    pred = fd_trainer.predict(batch)
    assert pred.shape == batch["len"].shape
    assert np.all(pred >= 0)

    stats = fd_trainer.get_spike_statistics()
    assert len(stats) == 5 and all(np.isfinite(v) for v in stats.values())

    # save/load round trip
    path = str(tmp_path / "m.pt")
    fd_trainer.save_model(path)
    before = fd_trainer.predict(batch)
    fd_trainer.train_step(batch)  # perturb
    fd_trainer.load_model(path)
    after = fd_trainer.predict(batch)
    np.testing.assert_allclose(before, after, atol=1e-6)


def test_fn_trainer_step_and_angular():
    params, state, cfg = models.init_fn_model(jax.random.PRNGKey(0),
                                              k_values=(6, 6, 4),
                                              emb_dims=32, time_steps_enc=2,
                                              num_heads=4)
    tx = get_optimizer(params, {"training": {"grad_clip": 0.15}}, kind="fn")
    tr = FnTrainer(params, state, cfg, tx, lr=1e-3)
    ds = data_mod.SyntheticFnDataset(length=2, num_points=64, num_patches=4,
                                     k_neighbors=8)
    loader = data_mod.DataLoader(ds, 2, shuffle=False, prefetch=0)
    batch = next(iter(loader))
    loss, d = tr.train_step(batch)
    assert loss is None or np.isfinite(loss)
    a = np.eye(3, dtype=np.float32)
    # identical vectors give ~0.08 deg, not 0: the reference clamps cos to
    # 1-1e-6 before acos (fn/trainer.py:273) and we match it
    assert abs(tr.compute_angular_error(a, a)) < 0.1


def test_scheduler_factory():
    cfg = {"training": {"lr": 1e-3, "lr_policy": "cosine",
                        "warmup_steps": 10, "warmup_factor": 0.1,
                        "validate_every": 5, "max_iterations": 100}}
    s = get_scheduler(cfg, "fn")
    assert s(0, 0)[0] == pytest.approx(1e-4)
    s2 = get_scheduler({"training": {}}, "fd", steps_per_epoch=10)
    assert s2(0, 0)[0] == pytest.approx(1e-4)
