#!/usr/bin/env python
"""fn information-floor diagnostic (round 5).

The fn model estimates an ORIENTED surface normal from a k=100-NN patch
alone (reference serving semantics, generation.py:122-139). Two floors
bound what any patch-only estimator can score on the synthetic family:

1. the analytic-prior floor: the oriented 8-NN PCA plane normal
   (ops.local_plane) — what the model outputs at init under the r5
   pca_prior recipe;
2. the orientation floor: the patch is (near-)mirror-symmetric about the
   local tangent plane, so the toward-surface SIGN of the normal is only
   recoverable from the centroid offset. Where the true normal's sign
   disagrees with the centroid orientation, EVERY patch-only estimator
   that orients the same way pays ~180 deg. The unsigned angular error
   (min(theta, 180-theta)) measures plane accuracy with orientation
   factored out; `flip_frac` is the mass the orientation convention
   loses outright.

Per input density (k=100 patches from a 256-pt cloud span much larger
surface area than from 1024), reports prior-only and trained-model
oriented mean/median, unsigned mean, and flip fraction, on the held-out
synthetic family of scripts/eval_synth_quality.py (same key stream).

Writes out/metrics/fn_floor.json. Run in an exclusive device window.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sapcu_tpu.utils import apply_platform_env, load_config, get_model  # noqa: E402
apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="out/release")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--patch-k", type=int, default=100)
    p.add_argument("--sizes", default="256,512,1024")
    p.add_argument("--json-out", default="out/metrics/fn_floor.json")
    args = p.parse_args()

    from sapcu_tpu import models
    from sapcu_tpu.models.fn_model import patch_plane_features
    from sapcu_tpu.data import device_synth as dsynth
    from sapcu_tpu.utils.checkpoint import load_model_weights

    bundle = get_model(load_config("configs/fn.yaml"), "fn")
    trained = os.path.exists(os.path.join(args.weights, "fn", "model_best.pt"))
    if trained:
        bundle = load_model_weights(bundle, args.weights, "fn")
    params, state, cfg = bundle

    key0 = jax.random.PRNGKey(123457)   # same held-out stream as the harness

    def stats(cos):
        """cos: [n] oriented cosine(pred, true)."""
        cos = np.clip(np.concatenate(cos), -1 + 1e-6, 1 - 1e-6)
        ang = np.degrees(np.arccos(cos))
        return {
            "oriented_mean": float(ang.mean()),
            "oriented_median": float(np.median(ang)),
            "unsigned_mean": float(np.minimum(ang, 180.0 - ang).mean()),
            "flip_frac": float((cos < 0).mean()),
            "n": int(ang.size),
        }

    out = {"patch_k": args.patch_k, "trained": trained,
           "weights": args.weights, "per_size": {}}
    for n_cloud in [int(s) for s in args.sizes.split(",")]:

        @jax.jit
        def probe(key, n_cloud=n_cloud):
            b = dsynth.fn_synth_batch(key, args.batch_size, n_dense=4096,
                                      n_cloud=n_cloud, n_patches=16,
                                      k=args.patch_k)
            flat = b["input"].reshape(-1, args.patch_k, 3)
            true = b["true_normal"].reshape(-1, 3)
            n8, _ = patch_plane_features(flat)
            pred, _ = models.fn_apply(params, state, b["input"], cfg,
                                      training=False)
            pred = pred.reshape(-1, 3)
            pred = pred / jnp.maximum(
                jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
            return (jnp.sum(n8 * true, axis=-1),
                    jnp.sum(pred * true, axis=-1))

        cp, cm = [], []
        for i in range(args.batches):
            a, b_ = probe(jax.random.fold_in(key0, i))
            cp.append(np.asarray(a, np.float64).ravel())
            cm.append(np.asarray(b_, np.float64).ravel())
        out["per_size"][str(n_cloud)] = {
            "prior": stats(cp), "model": stats(cm)}
        print(json.dumps({"n_cloud": n_cloud,
                          **out["per_size"][str(n_cloud)]}), flush=True)

    os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"summary": "fn_floor", "out": args.json_out}),
          flush=True)


if __name__ == "__main__":
    main()
