#!/usr/bin/env python
"""Seed-stage microbench: full-grid XLA vs certified block-candidate path.

VERDICT r2 #4: the block-candidate shortcut (ops/seeds.py) only engaged
for N > 4096, but PU1K inputs are 256-2048 points, so the production sweep
always paid the full 15.6M-voxel x N path. This measures both paths (and
the certificate hit rate) at PU1K sizes on the real chip so the dispatch
gate is set from data, not guesswork.

Timing discipline per CLAUDE.md: block_until_ready is a no-op under the
axon tunnel — sync by pulling a 4-byte scalar; vary inputs across reps to
defeat server-side memoization.

Usage: python scripts/bench_seeds.py [sizes...]   (default 512 2048)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sapcu_tpu.utils.config import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sapcu_tpu.ops import seeds as S  # noqa: E402


def sync(x):
    return float(jnp.sum(x))


def cloud_of(n, i):
    rng = np.random.default_rng(i)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray((v * (0.40 + 0.01 * (i % 5))).astype(np.float32))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [512, 2048]
    cell = 0.004
    boxsize = int(round(1.0 / cell))
    for n in sizes:
        # ---- full-grid path (the current small-N default)
        for i in range(3):
            pts = cloud_of(n, i)
            t0 = time.time()
            m = S.seed_mask(pts, boxsize, cell)
            cnt = sync(m.astype(jnp.float32))
            t_full = time.time() - t0
            if i:  # skip compile rep
                print(f"N={n} full-grid: {t_full:.3f}s ({int(cnt)} seeds)")

        # ---- blocked path: distances + certificate + mask
        for i in range(3):
            pts = cloud_of(n, 10 + i)
            t0 = time.time()
            dist, okg = S._blocked_dist(pts, boxsize, cell)
            m, reach = S._mask_reach_from_dist(pts, dist, boxsize, cell,
                                               S.BAND_LO, S.BAND_HI)
            cert_ok = bool(jnp.all(okg | ~reach))
            cnt = sync(m.astype(jnp.float32))
            t_blk = time.time() - t0
            if i:
                print(f"N={n} blocked:   {t_blk:.3f}s ({int(cnt)} seeds, "
                      f"certificate={'OK' if cert_ok else 'FAIL->fallback'})")

        # ---- certificate agreement vs full grid (same cloud)
        pts = cloud_of(n, 99)
        m_full = S.seed_mask(pts, boxsize, cell)
        dist, okg = S._blocked_dist(pts, boxsize, cell)
        m_blk, reach = S._mask_reach_from_dist(pts, dist, boxsize, cell,
                                               S.BAND_LO, S.BAND_HI)
        ok = bool(jnp.all(okg | ~reach))
        same = int(jnp.sum(m_full != m_blk))
        print(f"N={n} parity: certificate={'OK' if ok else 'FAIL'}, "
              f"mask diff voxels={same} (must be 0 when certificate OK)")


if __name__ == "__main__":
    main()
