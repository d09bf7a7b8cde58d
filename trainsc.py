#!/usr/bin/env python
"""Train the sc (shared-cloud encoder) model — the amortized fast path.

A new model family with no reference counterpart (models/sc_model.py):
one cloud encoding + a tiny per-seed head replaces the reference's
per-seed patch evaluation (generation.py:122-172). Trains on device-
synthesized data only (data/device_synth.py).
"""
import argparse

import jax

from sapcu_tpu import parallel
from sapcu_tpu.train import run_training
from sapcu_tpu.utils import load_config, setup_seed
from sapcu_tpu.utils.config import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser(description="Train SC model")
    p.add_argument("--multi_gpu", "--multi-chip", action="store_true",
                   dest="multi_chip",
                   help="Data-parallel over all visible devices")
    p.add_argument("--batch_size", "--batch-size", type=int, default=None)
    p.add_argument("--config", default="configs/sc.yaml")
    p.add_argument("--out-dir", default="out/sc")
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    cfg = load_config(args.config)
    if args.batch_size is not None:
        cfg["training"]["batch_size"] = args.batch_size
        print(f"Overriding batch size to: {args.batch_size}")
    if args.steps_per_epoch is not None:
        cfg["data"]["steps_per_epoch"] = args.steps_per_epoch
    seed = setup_seed(cfg)

    mesh = None
    if args.multi_chip and len(jax.devices()) > 1:
        mesh = parallel.data_parallel_mesh()
        print(f"Data-parallel over {len(jax.devices())} devices")

    summary = run_training("sc", cfg, args.out_dir,
                           max_iterations=args.max_iterations,
                           batch_size=args.batch_size, mesh=mesh,
                           resume=not args.no_resume, seed=seed)
    print(f"Done: {summary}")


if __name__ == "__main__":
    main()
