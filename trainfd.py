#!/usr/bin/env python
"""Train the fd (distance estimation) model.

CLI surface mirrors the reference trainfd.py:44-55 (--multi_gpu,
--batch_size) plus extensions (--config, --out-dir, --max-iterations,
--synthetic, --no-resume). Reproduces the reference's effective training
values (learning_rate 1e-4, StepLR(10000, 0.5) double-stepped) — see
sapcu_tpu.utils.config.effective_fd_training.
"""
import argparse

import jax

from sapcu_tpu import parallel
from sapcu_tpu.train import run_training
from sapcu_tpu.utils import load_config, setup_seed
from sapcu_tpu.utils.config import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser(description="Train FD model")
    p.add_argument("--multi_gpu", "--multi-chip", action="store_true",
                   dest="multi_chip",
                   help="Data-parallel over all visible devices")
    p.add_argument("--batch_size", "--batch-size", type=int, default=None)
    p.add_argument("--config", default="configs/fd.yaml")
    p.add_argument("--out-dir", default="out/fd")
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="Use the synthetic ellipsoid dataset")
    p.add_argument("--device-synthetic", action="store_true",
                   help="Generate batches on-device (data/device_synth.py);"
                        " zero per-step host->device traffic")
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="Epoch length for --device-synthetic")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    cfg = load_config(args.config)
    if args.batch_size is not None:
        cfg["training"]["batch_size"] = args.batch_size
        print(f"Overriding batch size to: {args.batch_size}")
    if args.synthetic:
        cfg["data"]["synthetic"] = True
    if args.device_synthetic:
        cfg["data"]["device_synthetic"] = True
    if args.steps_per_epoch is not None:
        cfg["data"]["steps_per_epoch"] = args.steps_per_epoch
    seed = setup_seed(cfg)

    mesh = None
    if args.multi_chip and len(jax.devices()) > 1:
        mesh = parallel.data_parallel_mesh()
        print(f"Data-parallel over {len(jax.devices())} devices")

    summary = run_training("fd", cfg, args.out_dir,
                           max_iterations=args.max_iterations,
                           batch_size=args.batch_size, mesh=mesh,
                           resume=not args.no_resume, seed=seed)
    print(f"Done: {summary}")


if __name__ == "__main__":
    main()
