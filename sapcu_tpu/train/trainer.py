"""Trainer classes mirroring the reference Trainer APIs.

Thin object wrappers over the jitted functional steps so code written
against the reference surface (fn/trainer.py:9-287, fd/trainer.py:6-198)
ports 1:1: ``train_step(batch)``, ``evaluate(loader)``,
``eval_step(batch)``, ``compute_angular_error``, ``predict``,
``save_model``/``load_model``, ``reset_states``.

State notes (the functional analog of the reference's mutable modules):
- the trainer OWNS params / optimizer state / model state and updates
  them in place on each call;
- fd resets the snn_fc carry every train step (fd/trainer.py:29-31) —
  automatic here since the jitted step doesn't thread a carry;
- fd evaluation threads the carry across batches after one reset
  (fd/trainer.py:38-48).
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from sapcu_tpu.models import fd_apply, fn_apply
from sapcu_tpu.models.fn_model import angular_error_deg
from sapcu_tpu.train import steps as steps_mod
from sapcu_tpu.utils.checkpoint import _to_device, _to_host


class _TrainerBase:
    def __init__(self, params, model_state, model_cfg, tx, lr: float = 1e-4,
                 seed: int = 0):
        self.params = params
        self.model_state = model_state
        self.model_cfg = model_cfg
        self.tx = tx
        self.opt_state = tx.init(params)
        self.lr = lr
        self._rng = jax.random.PRNGKey(seed)

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def get_learning_rate(self):
        return self.lr

    def set_learning_rate(self, lr):
        self.lr = float(lr)

    def reset_states(self):
        """SNN states are per-forward pytrees; nothing persists except the
        fd carry, which callers hold explicitly — kept for API parity."""

    def get_spike_statistics(self) -> dict:
        """Live spike telemetry (the reference hook at fn/trainer.py:280-283
        returns {} because no model implements it; here it is real)."""
        rates = self.model_state.get("enc", {}).get("spike_rates")
        if rates is None:
            return {}
        return {f"spike_rate_block{i}": float(r)
                for i, r in enumerate(np.asarray(rates))}

    def save_model(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump({"model_state_dict": _to_host(self.params),
                         "optimizer_state_dict": _to_host(self.opt_state),
                         "model_buffers": _to_host(self.model_state)}, f)

    def load_model(self, path: str) -> None:
        with open(path, "rb") as f:
            d = pickle.load(f)
        self.params = _to_device(d["model_state_dict"])
        self.opt_state = _to_device(d["optimizer_state_dict"])
        if "model_buffers" in d:
            self.model_state = _to_device(d["model_buffers"])


class FdTrainer(_TrainerBase):
    """fd/trainer.py analog."""

    def __init__(self, params, model_state, model_cfg, tx, lr=1e-4,
                 beta: float = 0.1, seed: int = 0):
        super().__init__(params, model_state, model_cfg, tx, lr, seed)
        self._train = steps_mod.make_fd_train_step(tx, model_cfg, beta=beta)
        self._eval = steps_mod.make_fd_eval_step(model_cfg, beta=beta)

    def train_step(self, batch: dict):
        (self.params, self.opt_state, self.model_state, loss, gnorm,
         ok) = self._train(self.params, self.opt_state, self.model_state,
                           jnp.asarray(batch["input"]),
                           jnp.asarray(batch["len"]),
                           jnp.float32(self.lr), self._next_rng())
        loss = float(loss)
        return loss, {"total_loss": loss, "grad_norm": float(gnorm),
                      "step_ok": bool(ok)}

    def eval_step_with_metrics(self, batch: dict, carry=None):
        m, carry = self._eval(self.params, self.model_state,
                              jnp.asarray(batch["input"]),
                              jnp.asarray(batch["len"]), carry)
        return {k: float(v) for k, v in m.items()}, carry

    def eval_step(self, batch: dict):
        return self.eval_step_with_metrics(batch)[0]["loss"]

    def evaluate(self, loader, return_metrics: bool = False):
        sums, n, carry = {}, 0, None
        for batch in loader:
            m, carry = self.eval_step_with_metrics(batch, carry)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1
        avg = {k: v / max(n, 1) for k, v in sums.items()}
        if return_metrics:
            return avg.get("loss", 0.0), avg
        return avg.get("loss", 0.0)

    def predict(self, batch: dict):
        pred, _, _ = fd_apply(self.params, self.model_state,
                              jnp.asarray(batch["input"]), self.model_cfg,
                              training=False)
        return np.asarray(pred)


class FnTrainer(_TrainerBase):
    """fn/trainer.py analog."""

    def __init__(self, params, model_state, model_cfg, tx, lr=1.8e-4,
                 snn_lr_scale: float = 0.5, seed: int = 0):
        super().__init__(params, model_state, model_cfg, tx, lr, seed)
        self.snn_lr_scale = snn_lr_scale
        self._train = steps_mod.make_fn_train_step(tx, model_cfg)
        self._eval = steps_mod.make_fn_eval_step(model_cfg)

    def train_step(self, batch: dict):
        (self.params, self.opt_state, self.model_state, loss, conf, gnorm,
         ok) = self._train(self.params, self.opt_state, self.model_state,
                           jnp.asarray(batch["input"]),
                           jnp.asarray(batch["normal"]),
                           jnp.float32(self.lr),
                           jnp.float32(self.lr * self.snn_lr_scale),
                           self._next_rng())
        if not bool(ok):  # NaN-grad skip (fn/trainer.py:110-116)
            return None, None
        loss = float(loss)
        return loss, {"total_loss": loss, "confidence": float(conf),
                      "grad_norm": float(gnorm)}

    def eval_step(self, batch: dict):
        m = self._eval(self.params, self.model_state,
                       jnp.asarray(batch["input"]),
                       jnp.asarray(batch["normal"]))
        return float(m["loss"]), float(m["confidence"])

    def evaluate(self, loader):
        sums, n = {}, 0
        for batch in loader:
            m = self._eval(self.params, self.model_state,
                           jnp.asarray(batch["input"]),
                           jnp.asarray(batch["normal"]))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        avg = {k: v / max(n, 1) for k, v in sums.items()}
        return avg.get("loss", 0.0), avg.get("confidence", 0.0), avg

    @staticmethod
    def compute_angular_error(pred, gt):
        return float(angular_error_deg(jnp.asarray(pred), jnp.asarray(gt)))

    def predict(self, batch: dict):
        pred, _ = fn_apply(self.params, self.model_state,
                           jnp.asarray(batch["input"]), self.model_cfg,
                           training=False)
        return np.asarray(pred)
