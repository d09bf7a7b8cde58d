from sapcu_tpu.train.loop import run_training
from sapcu_tpu.train.trainer import FdTrainer, FnTrainer
from sapcu_tpu.train.optim import (
    make_tx,
    clamp_snn_params,
    snn_label_tree,
    apply_updates_grouped,
    fn_schedule,
    fd_schedule,
)
from sapcu_tpu.train.steps import (
    make_fd_train_step,
    make_fd_eval_step,
    make_fn_train_step,
    make_fn_eval_step,
    make_sc_train_step,
    make_sc_eval_step,
)

__all__ = [
    "run_training", "FdTrainer", "FnTrainer", "make_tx", "clamp_snn_params", "snn_label_tree",
    "apply_updates_grouped", "fn_schedule", "fd_schedule",
    "make_fd_train_step", "make_fd_eval_step", "make_fn_train_step",
    "make_fn_eval_step", "make_sc_train_step", "make_sc_eval_step",
]
