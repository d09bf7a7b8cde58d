#!/usr/bin/env python
"""Safe checkpoint evaluation over the configured validation set.

Rebuild of scripts/old_metrics/eval_fn_safe.py + eval_fd_safe.py: loads a
checkpoint, filters unloadable samples, runs the jitted eval step over the
val split, and prints/saves the metric dict (fn: loss / confidence /
angular_error_deg; fd: loss / mae / mse / relative_error).

  python scripts/eval_model.py fn --config configs/fn.yaml --out-dir out/fn
  python scripts/eval_model.py fd --synthetic
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402

from sapcu_tpu import data as data_mod  # noqa: E402
from sapcu_tpu.train import make_fd_eval_step, make_fn_eval_step  # noqa: E402
from sapcu_tpu.utils import CheckpointIO, get_model, load_config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["fn", "fd"])
    p.add_argument("--config", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--checkpoint", default="model_best.pt")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    cfg = load_config(args.config or f"configs/{args.kind}.yaml")
    if args.synthetic:
        cfg["data"]["synthetic"] = True
    out_dir = args.out_dir or f"out/{args.kind}"

    params, state, model_cfg = get_model(cfg, args.kind)
    if not args.random_weights:
        ckpt = CheckpointIO(out_dir, model=params, model_state=state)
        ckpt.load(args.checkpoint)
        params, state = ckpt.trees["model"], ckpt.trees["model_state"]
        print(f"Loaded {out_dir}/{args.checkpoint}")

    ds = data_mod.get_dataset("val", cfg, args.kind)
    # "safe" filter: drop samples that fail to load (eval_fd_safe.py:27-48)
    good = []
    for i in range(len(ds)):
        try:
            s = ds[i]
            if s is not None and np.all(np.isfinite(s["input"])):
                good.append(i)
        except Exception as e:
            print(f"skip sample {i}: {e}")

    class _View:
        def __len__(self):
            return len(good)

        def __getitem__(self, j):
            return ds[good[j]]

    loader = data_mod.DataLoader(_View(), args.batch_size, shuffle=False,
                                 drop_last=True)
    step = (make_fn_eval_step(model_cfg) if args.kind == "fn"
            else make_fd_eval_step(model_cfg))

    sums, n, carry = {}, 0, None
    for batch in loader:
        if args.kind == "fn":
            m = step(params, state, batch["input"], batch["normal"])
        else:
            m, carry = step(params, state, batch["input"], batch["len"],
                            carry)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    result = {k: v / max(n, 1) for k, v in sums.items()}
    result["num_batches"] = n
    result["num_samples_valid"] = len(good)
    print(json.dumps(result, indent=2))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as fh:
            json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
