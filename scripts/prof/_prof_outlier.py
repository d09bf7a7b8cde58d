import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))  # repo root
#!/usr/bin/env python
"""Micro-profile of the outlier-window + compaction internals on chip.

Varied inputs per rep (server-side memoization — CLAUDE.md); sync by
4-byte scalar pull.
"""
import time

import numpy as np

from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax
import jax.numpy as jnp
from sapcu_tpu import ops
from sapcu_tpu.generate import pipeline as pl
from sapcu_tpu.ops import seeds as seeds_mod

N = 294912
rng = np.random.default_rng(0)


def mkpts(i):
    v = rng.normal(size=(N, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray(v * 0.42)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:4]))


def timeit(label, fn, reps=3):
    fn(mkpts(99))  # compile
    ts = []
    for i in range(reps):
        x = mkpts(i)
        sync(x)
        t0 = time.time()
        sync(fn(x))
        ts.append(time.time() - t0)
    print(f"{label:28s} min={min(ts)*1e3:7.1f}ms med={sorted(ts)[len(ts)//2]*1e3:7.1f}ms",
          flush=True)


valid = jnp.arange(N) < N - 1000
cell = 4.0 * 0.004

timeit("full_window_mask", lambda p: pl._outlier_mask_window(
    p, valid, jnp.float32(1.5), cell))


@jax.jit
def keys_only(p):
    safe = jnp.where(valid[:, None], p, 1e3 + p)
    return ops.morton_code(safe, cell)


timeit("morton_code", keys_only)


@jax.jit
def argsort_gather(p):
    key = keys_only(p)
    order = jnp.argsort(key)
    return p[order]


timeit("argsort+gather3", argsort_gather)


@jax.jit
def sort_payload(p):
    key = keys_only(p)
    k2, x, y, z = jax.lax.sort((key, p[:, 0], p[:, 1], p[:, 2]),
                               num_keys=1, is_stable=True)
    return x + y + z


timeit("sort_with_payload", sort_payload)


@jax.jit
def scatter_back(p):
    key = keys_only(p)
    order = jnp.argsort(key)
    keep = p[:, 0] > 0
    return jnp.zeros((N,), bool).at[order].set(keep)


timeit("argsort+scatter_back", scatter_back)


@jax.jit
def knn_map_only(p):
    chunk, window, k = 2048, 512, 30
    spq = p
    cand = jnp.pad(spq, ((window, window), (0, 0)), constant_values=3e3)

    def one(i):
        tile = jax.lax.dynamic_slice_in_dim(spq, i * chunk, chunk)
        c = jax.lax.dynamic_slice_in_dim(cand, i * chunk, chunk + 2 * window)
        d = ops.pairwise_sqdist(tile, c)
        vals, _ = jax.lax.approx_min_k(d, k, recall_target=0.95)
        return jnp.mean(jnp.sqrt(jnp.maximum(vals, 0.0)), axis=-1)

    return jax.lax.map(one, jnp.arange(N // chunk, dtype=jnp.int32))


timeit("knn_window_map", knn_map_only)

keep_fixed = jnp.arange(N) % 97 != 0
cap = N


@jax.jit
def compact_nonzero(p):
    keep = keep_fixed & (p[:, 0] > -10)
    (idx,) = jnp.nonzero(keep, size=cap, fill_value=0)
    return p[idx]


timeit("compact_nonzero", compact_nonzero)


@jax.jit
def compact_inv(p):
    keep = keep_fixed & (p[:, 0] > -10)
    idx, cnt = seeds_mod._flatnonzero_inv(keep, cap)
    return p[idx]


timeit("compact_flatnonzero_inv", compact_inv)
