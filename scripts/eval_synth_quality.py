#!/usr/bin/env python
"""Model quality vs ANALYTIC ground truth on the synthetic val family.

Produces the quality table comparable to the reference's published
numbers (BASELINE.md: fn ~3 deg mean angular error, confidence 0.9986;
fd MSE 0.00148): for a fixed held-out set of device-synthesized shapes,

- fn: mean/median angular error (deg) of the predicted normal vs the
  TRUE SDF normal (toward-surface), plus vs the noisy pseudo-normal
  label (what the training loss sees), plus mean cosine confidence;
- fd: MSE/MAE of the predicted distance vs the TRUE offset, plus vs the
  1-NN label (the training target, which itself overshoots truth by
  up to the sampling spacing);
- sc: both, from the shared-cloud path.

Checkpoints load from --weights (default out/release, layout
{fn,fd,sc}/model_best.pt); absent checkpoints run random-init so the
script always completes (stamped in the output).

Prints one JSON line per model + writes --json-out if given.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def ang_deg(pred, gt):
    cos = jnp.clip(jnp.sum(pred * gt, axis=-1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="out/release")
    p.add_argument("--models", default="fn,fd,sc")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--fn-patch-k", type=int, default=100,
                   help="fn eval patch size. Default 100 = the SERVING "
                        "patch (generation.py:127-129 k_neighbors) and the "
                        "synth training recipe (configs/fn_synth.yaml "
                        "patch_k), so this metric, the train-loop val "
                        "metric, and serving all score the same geometry. "
                        "12 restores the reference's training-patch eval "
                        "(fn/datacore.py) — r4's unexplained 5-deg "
                        "val-vs-harness gap was exactly this mismatch.")
    p.add_argument("--fn-patch-n", type=int, default=16)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    from sapcu_tpu import models
    from sapcu_tpu.data import device_synth as dsynth
    from sapcu_tpu.utils import load_config, get_model
    from sapcu_tpu.utils.checkpoint import load_model_weights

    results = {}
    want = args.models.split(",")

    def load(kind):
        bundle = get_model(load_config(f"configs/{kind}.yaml"), kind)
        path = os.path.join(args.weights, kind, "model_best.pt")
        if os.path.exists(path):
            return load_model_weights(bundle, args.weights, kind), True
        return bundle, False

    key0 = jax.random.PRNGKey(123457)  # held-out: disjoint from training

    if "fn" in want:
        (params, state, cfg), trained = load("fn")

        @jax.jit
        def fn_eval(key):
            b = dsynth.fn_synth_batch(key, args.batch_size, n_dense=4096,
                                      n_cloud=512,
                                      n_patches=args.fn_patch_n,
                                      k=args.fn_patch_k)
            pred, _ = models.fn_apply(params, state, b["input"], cfg,
                                      training=False)
            pred = pred / jnp.maximum(
                jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
            return (ang_deg(pred, b["true_normal"]),
                    ang_deg(pred, b["normal"]),
                    jnp.sum(pred * b["true_normal"], axis=-1))

        at, al, cs = [], [], []
        for i in range(args.batches):
            a, l, c = fn_eval(jax.random.fold_in(key0, i))
            at.append(np.asarray(a).ravel())
            al.append(np.asarray(l).ravel())
            cs.append(np.asarray(c).ravel())
        at, al, cs = map(np.concatenate, (at, al, cs))
        results["fn"] = {
            "trained": trained,
            "patch_k": args.fn_patch_k, "patch_n": args.fn_patch_n,
            "angular_error_deg_vs_true_mean": float(at.mean()),
            "angular_error_deg_vs_true_median": float(np.median(at)),
            "angular_error_deg_vs_label_mean": float(al.mean()),
            "confidence_mean_cos": float(cs.mean()),
            "n": int(at.size),
        }
        print(json.dumps({"model": "fn", **results["fn"]}), flush=True)

    if "fd" in want:
        (params, state, cfg), trained = load("fd")

        @jax.jit
        def fd_eval(key):
            b = dsynth.fd_synth_batch(key, args.batch_size, n_dense=4096,
                                      n_cloud=256, n_queries=256, k=32)
            pred, _, _ = models.fd_apply(params, state, b["input"], cfg,
                                         training=False)
            return pred, b["true_len"], b["len"]

        pr, tr, lb = [], [], []
        for i in range(args.batches):
            a, t, l = fd_eval(jax.random.fold_in(key0, 1000 + i))
            pr.append(np.asarray(a).ravel())
            tr.append(np.asarray(t).ravel())
            lb.append(np.asarray(l).ravel())
        pr, tr, lb = map(np.concatenate, (pr, tr, lb))
        results["fd"] = {
            "trained": trained,
            "mse_vs_true": float(((pr - tr) ** 2).mean()),
            "mae_vs_true": float(np.abs(pr - tr).mean()),
            "mse_vs_label": float(((pr - lb) ** 2).mean()),
            "label_mse_vs_true": float(((lb - tr) ** 2).mean()),
            "n": int(pr.size),
        }
        print(json.dumps({"model": "fd", **results["fd"]}), flush=True)

    if "sc" in want:
        (params, state, cfg), trained = load("sc")

        @jax.jit
        def sc_eval(key):
            b = dsynth.sc_synth_batch(key, args.batch_size, n_dense=4096,
                                      n_cloud=1024, n_queries=512)
            n, d, _ = models.sc_apply(params, state, b["cloud"], b["query"],
                                      cfg, training=False)
            return (ang_deg(n, b["true_normal"]), d, b["true_len"], b["len"])

        at, pr, tr, lb = [], [], [], []
        for i in range(args.batches):
            a, d, t, l = sc_eval(jax.random.fold_in(key0, 2000 + i))
            at.append(np.asarray(a).ravel())
            pr.append(np.asarray(d).ravel())
            tr.append(np.asarray(t).ravel())
            lb.append(np.asarray(l).ravel())
        at, pr, tr, lb = map(np.concatenate, (at, pr, tr, lb))
        results["sc"] = {
            "trained": trained,
            "angular_error_deg_vs_true_mean": float(at.mean()),
            "angular_error_deg_vs_true_median": float(np.median(at)),
            "mse_vs_true": float(((pr - tr) ** 2).mean()),
            "mae_vs_true": float(np.abs(pr - tr).mean()),
            "n": int(at.size),
        }
        print(json.dumps({"model": "sc", **results["sc"]}), flush=True)

    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump({"summary": results}, f, indent=2)


if __name__ == "__main__":
    main()
