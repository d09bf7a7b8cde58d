#!/usr/bin/env python
"""Exact-path floor evidence (VERDICT r3 next #9).

Measures, on the real chip with scalar-pull syncing and rotated inputs
(identical pure calls may be memoized server-side — CLAUDE.md):

  1. refine_mega per-chunk wall time (the exact serving unit: patch ->
     fn -> rotate -> fd -> move at batch 1024);
  2. fn_apply and fd_apply alone at the same tile size (the split);
  3. an analytic FLOP/byte model of the same computation, giving the
     MXU-bound and HBM-bound floors on v5e (microbenched ceilings:
     bf16 matmul 97 TF/s, HBM-bound [1.2M,128] matmul 18 TF/s,
     elementwise ~800 GB/s — STATUS.md round-2 calibration);
  4. best-effort jax.profiler trace of one chunk (the axon tunnel's AOT
     service may not support it — recorded either way).

Writes out/metrics/exact_floor.json. The point: the exact path's cost
is the reference ARCHITECTURE (5+ GFLOP/seed through [B,N,k,C] SNN
chains), not kernel slack — the sc mode exists because no kernel work
closes a 4-orders-of-magnitude FLOP gap.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import json
import time

import numpy as np

from sapcu_tpu.utils import apply_platform_env, load_config, get_model
apply_platform_env()
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timed(fn, reps=3):
    ts = []
    for i in range(reps):
        t0 = time.time()
        sync(fn(i))
        ts.append(time.time() - t0)
    return min(ts), ts


def fn_flops_per_patch(cfg):
    """MXU FLOPs for one fn eval forward on an [N=100, 3] patch."""
    n = 100
    d = cfg["emb_dims"]
    f = 2 * n * 3 * d                       # conv1
    for k in cfg["k_values"]:
        # per block: fc1, q/k/v projections on [N, d]; fc_delta2,
        # fc_gamma, fc_gamma2 on [N, k, d]; out_proj, fc2 on [N, d]
        f += 2 * n * d * d * 4              # fc1 + q + k + v
        f += 2 * n * k * d * d * 3          # delta2 + gamma + gamma2
        f += 2 * n * d * d * 2              # out_proj + fc2
        f += 2 * n * k * d * 2              # one-hot gathers ~2 matmuls [N,k]x[N? ] (lower bound: skip)
    # decoder heads on pooled [2048] feature
    dims = [2 * d] + [1024, 512, 256] + [3]
    for a, b in zip(dims[:-1], dims[1:]):
        f += 2 * a * b
    return f


def fd_flops_per_seed(cfg):
    n = 100
    d = cfg["emb_dims"]
    f = 0
    # edge blocks over k_scales with gather-free BN-decomposed max
    for k in cfg.get("k_scales", (8, 16, 32, 48)):
        f += 2 * n * d * d                  # projection matmuls (approx)
        f += n * n * d                      # masked channel-max as [N,N,d] select-reduce (VPU)
    dims = [2 * d, 256, 128, 64, 1]
    for a, b in zip(dims[:-1], dims[1:]):
        f += 2 * a * b
    return f


def main():
    fn_b = get_model(load_config("configs/fn.yaml"), "fn")
    fd_b = get_model(load_config("configs/fd.yaml"), "fd")
    from sapcu_tpu.utils.checkpoint import load_model_weights
    if os.path.exists("out/release/fn/model_best.pt"):
        fn_b = load_model_weights(fn_b, "out/release", "fn")
        fd_b = load_model_weights(fd_b, "out/release", "fd")
    fn_p, fn_s, fn_cfg = fn_b
    fd_p, fd_s, fd_cfg = fd_b

    from sapcu_tpu.generate import pipeline as pl
    from sapcu_tpu.models import fn_model, fd_model

    B, N = 1024, 100
    rng = np.random.default_rng(0)
    v = rng.normal(size=(2048, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cloud = jnp.asarray((v * 0.42).astype(np.float32))
    seeds = jnp.asarray((rng.normal(size=(B, 3)) * 0.44).astype(np.float32))

    fn_cfg_s = tuple(sorted(fn_cfg.items()))
    fd_cfg_s = tuple(sorted(fd_cfg.items()))

    mega = jax.jit(lambda s: pl.refine_mega(
        fn_p, fn_s, fd_p, fd_s, cloud, s, fn_cfg_s, fd_cfg_s, 100,
        "bfloat16", B, False))
    rot = lambda i: seeds @ jnp.asarray(
        [[np.cos(i), -np.sin(i), 0], [np.sin(i), np.cos(i), 0],
         [0, 0, 1]], jnp.float32)
    sync(mega(rot(0)))                       # compile
    t_mega, ts_mega = timed(lambda i: mega(rot(i + 1)))

    # fn/fd alone on a patch batch (the layout the pipeline feeds them).
    # Cast params/state to bf16 exactly as pipeline._refine_body does —
    # bf16 inputs against f32 SNN state trip a scan carry-dtype mismatch
    # (threshold/refractory carries), and fd's decoder must STAY f32
    # (trained BN vars ~1e-6 NaN under bf16).
    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tree)

    fn_pc, fn_sc = cast(fn_p), cast(fn_s)
    fd_pc = {**cast(fd_p), "dec": fd_p["dec"]}
    fd_sc = {**cast(fd_s), "dec": fd_s["dec"]}

    patch = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.02)
    fn_j = jax.jit(lambda x: fn_model.fn_apply(
        fn_pc, fn_sc, x.astype(jnp.bfloat16), fn_cfg, training=False)[0])
    sync(fn_j(patch))
    t_fn, _ = timed(lambda i: fn_j(patch * (1 + 1e-4 * i)))

    fd_j = jax.jit(lambda x: fd_model.fd_apply(
        fd_pc, fd_sc, x.astype(jnp.bfloat16), fd_cfg, training=False)[0])
    sync(fd_j(patch))
    t_fd, _ = timed(lambda i: fd_j(patch * (1 + 1e-4 * i)))

    # analytic floors
    f_fn = fn_flops_per_patch(fn_cfg)
    f_fd = fd_flops_per_seed(fd_cfg)
    peak = 97e12                             # measured bf16 ceiling
    hbm_eff = 800e9                          # measured elementwise ceiling
    d = fn_cfg["emb_dims"]
    # bytes: each [B,N,k,d] bf16 tensor materialization in block i
    bytes_per_patch = sum(2 * N * k * d for k in fn_cfg["k_values"])
    # ~#materializations per block (q-k+pos, gamma, gamma2, softmax, prod,
    # pos_enc chain w/ 4-step SNN x2) — conservative lower bound 8 passes
    passes = 8

    res = {
        "chunk": B,
        "refine_mega_ms_per_1024": round(t_mega * 1000, 1),
        "refine_mega_seeds_per_s": round(B / t_mega, 1),
        "fn_apply_ms_per_1024": round(t_fn * 1000, 1),
        "fd_apply_ms_per_1024": round(t_fd * 1000, 1),
        "fn_gflop_per_seed": round(f_fn / 1e9, 2),
        "fd_gflop_per_seed": round(f_fd / 1e9, 2),
        "mxu_floor_ms_per_1024": round(
            B * (f_fn + f_fd) / peak * 1000, 1),
        "hbm_floor_ms_per_1024_fn_knc_traffic": round(
            B * bytes_per_patch * passes / hbm_eff * 1000, 1),
        "measured_tf_per_s": round(B * (f_fn + f_fd) / t_mega / 1e12, 1),
        "note": ("exact serving floor: max(MXU, HBM) floors vs measured; "
                 "sc mode serves the same quality gate at ~0.7 MFLOP/seed "
                 "(~4000x less work) — the gap is the reference "
                 "architecture, not kernel slack"),
        "raw_reps_s": [round(t, 3) for t in ts_mega],
    }

    # best-effort profiler trace (may be unsupported over the tunnel)
    trace_dir = "out/metrics/exact_trace"
    try:
        with jax.profiler.trace(trace_dir):
            sync(mega(rot(99)))
        res["profiler_trace"] = trace_dir
    except Exception as e:  # noqa: BLE001
        res["profiler_trace"] = f"unavailable: {type(e).__name__}: {e}"

    os.makedirs("out/metrics", exist_ok=True)
    with open("out/metrics/exact_floor.json", "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
