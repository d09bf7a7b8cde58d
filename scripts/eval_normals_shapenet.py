#!/usr/bin/env python
"""Per-category ShapeNet normal evaluation via test.lst splits.

Rebuild of scripts/old_metrics/eval_normals_shapenet.py:92-234: walk
``data_root/<category>/test.lst``, load each model's ``fn.npz`` (fallback
``pointcloud.npz``), run the fn model on the bbox-normalized cloud, match
predictions to GT normals by nearest neighbour when counts differ, and
write per-model + per-category stats to
``out/metrics/normals_shapenet.json`` (+ optional histogram PNGs).
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

from sapcu_tpu.ops import knn_tiled  # noqa: E402
from sapcu_tpu.utils import CheckpointIO, load_config, get_model  # noqa: E402

POINT_KEYS = ["points", "pointcloud", "cloud", "pts"]
NORMAL_KEYS = ["normals", "fn", "gt_normals", "pointing", "normal"]


def load_arrays(model_dir):
    for fname in ("fn.npz", "pointcloud.npz"):
        p = os.path.join(model_dir, fname)
        if os.path.exists(p):
            try:
                d = np.load(p, allow_pickle=True)
                return {k: d[k] for k in d.files}
            except Exception:
                continue
    return None


def pick(arrs, keys, exclude=None):
    for k in keys:
        if k in arrs:
            return np.asarray(arrs[k], np.float32)
    for k, v in arrs.items():
        a = np.asarray(v)
        if a.ndim == 2 and a.shape[1] == 3 and (
                exclude is None or not np.array_equal(a[:exclude.shape[0]],
                                                      exclude)):
            return a.astype(np.float32)
    return None


def angular_error_deg(a, b):
    an = a / (np.linalg.norm(a, axis=1, keepdims=True) + 1e-9)
    bn = b / (np.linalg.norm(b, axis=1, keepdims=True) + 1e-9)
    dot = np.clip(np.sum(an * bn, axis=1), -1.0, 1.0)
    return np.degrees(np.arccos(np.abs(dot)))  # unoriented, as reference


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data/ShapeNet")
    p.add_argument("--out_dir", default="out/metrics")
    p.add_argument("--fn-config", default="configs/fn.yaml")
    p.add_argument("--fn-dir", default="out/fn")
    p.add_argument("--checkpoint", default="model_best.pt")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--max_models", type=int, default=0)
    p.add_argument("--model_list", default=None,
                   help="comma-separated model ids / cat / cat/mid filter")
    p.add_argument("--histograms", action="store_true")
    p.add_argument("--patch-k", type=int, default=12,
                   help="kNN patch size fed to fn per point")
    args = p.parse_args()

    wanted = (set(s.strip() for s in args.model_list.split(",") if s.strip())
              if args.model_list else None)

    cfg = load_config(args.fn_config)
    params, state, model_cfg = get_model(cfg, "fn")
    if not args.random_weights:
        ck = CheckpointIO(args.fn_dir, model=params, model_state=state)
        ck.load(args.checkpoint)
        params, state = ck.trees["model"], ck.trees["model_state"]

    from sapcu_tpu.models import fn_apply

    @jax.jit
    def predict(pts):
        # patches = per-point kNN neighbourhoods, centered (the legacy
        # GdataKNN transform shape, fn/transform.py:39-58)
        d = jnp.sum((pts[:, None] - pts[None]) ** 2, -1)
        idx = jnp.argsort(d, axis=-1)[:, :args.patch_k]
        patches = pts[idx] - pts[:, None, :]
        out, _ = fn_apply(params, state, patches[None], model_cfg,
                          training=False)
        return out[0]

    results, per_cat = {}, {}
    processed = 0
    cats = sorted(d for d in os.listdir(args.data_root)
                  if os.path.isdir(os.path.join(args.data_root, d)))
    for cat in cats:
        lst = os.path.join(args.data_root, cat, "test.lst")
        if not os.path.exists(lst):
            continue
        with open(lst) as fh:
            mids = [l.strip() for l in fh if l.strip()]
        for mid in mids:
            if wanted and not ({mid, cat, f"{cat}/{mid}"} & wanted):
                continue
            mdir = os.path.join(args.data_root, cat, mid)
            arrs = load_arrays(mdir)
            if arrs is None:
                continue
            pts = pick(arrs, POINT_KEYS)
            norms = pick(arrs, NORMAL_KEYS, exclude=pts)
            if pts is None or norms is None:
                continue

            lo, hi = pts.min(0), pts.max(0)
            normed = (pts - (lo + hi) / 2) / max((hi - lo).max(), 1e-9)
            sub = normed[:2048]
            pred = np.asarray(predict(jnp.asarray(sub)))

            if pred.shape[0] != norms.shape[0]:
                _, idx = knn_tiled(jnp.asarray(pred), jnp.asarray(norms), k=1)
                gt = norms[np.asarray(idx)[:, 0]]
            else:
                gt = norms
            ang = angular_error_deg(pred, gt)
            results[f"{cat}/{mid}"] = {
                "mean_deg": float(ang.mean()),
                "median_deg": float(np.median(ang)),
                "count": int(ang.shape[0])}
            per_cat.setdefault(cat, []).append(float(ang.mean()))

            if args.histograms:
                try:
                    import matplotlib
                    matplotlib.use("Agg")
                    import matplotlib.pyplot as plt
                    hd = os.path.join(args.out_dir, "histograms_shapenet")
                    os.makedirs(hd, exist_ok=True)
                    plt.figure(figsize=(4, 3), dpi=120)
                    plt.hist(ang, bins=50)
                    plt.xlabel("Angular error (deg)")
                    plt.title(f"{cat}/{mid}")
                    plt.tight_layout()
                    plt.savefig(os.path.join(hd, f"{cat}_{mid}.png"))
                    plt.close()
                except Exception:
                    pass

            processed += 1
            print(f"{cat}/{mid}: mean={ang.mean():.3f} deg")
            if args.max_models and processed >= args.max_models:
                break
        if args.max_models and processed >= args.max_models:
            break

    summary = {c: {"mean_deg": float(np.mean(v)), "models": len(v)}
               for c, v in per_cat.items()}
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "normals_shapenet.json")
    with open(out, "w") as fh:
        json.dump({"per_category": summary, "per_model": results}, fh,
                  indent=2)
    print(f"Processed {processed} models. Saved {out}")


if __name__ == "__main__":
    main()
