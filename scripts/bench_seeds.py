#!/usr/bin/env python
"""Seed-stage microbench: shortlist-exact (default) vs pruned vs full grid.

VERDICT r2 #4 asks for the seed stage at <=0.5s for PU1K-size inputs.
This measures the production default (`_fast_exact_mask`: block-level
prune + per-block candidate shortlists + refinement to parity), the
pruned-exact path, and the dense grid, on the real chip — plus bitwise
parity of every path against the dense grid (all paths refine to exact,
so any diff is a bug).

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

    paths = {
        "shortlist": lambda p: S._fast_exact_mask(
            p, boxsize, cell, S.BAND_LO, S.BAND_HI, 8192),
        "pruned": lambda p: S._pruned_exact_mask(
            p, boxsize, cell, S.BAND_LO, S.BAND_HI, 8192),
        "full": lambda p: S.seed_mask(p, boxsize, cell),
    }
    for n in sizes:
        for name, fn in paths.items():
            for i in range(3):
                pts = cloud_of(n, i)
                t0 = time.time()
                m = fn(pts)
                cnt = sync(m.astype(jnp.float32))
                dt = time.time() - t0
                if i:  # skip compile rep
                    print(f"N={n} {name:9s}: {dt:.3f}s ({int(cnt)} seeds)")

        # parity on a held-out cloud (all paths refine to exact; rare
        # distance-tie flips in the shortlist are benign — see the
        # exactness caveat above _shortlist_pass)
        pts = cloud_of(n, 99)
        m_full = paths["full"](pts)
        for name in ("shortlist", "pruned"):
            diff = int(jnp.sum(paths[name](pts) != m_full))
            print(f"N={n} parity {name} vs full: diff voxels={diff} "
                  f"(0 expected; <=tie noise tolerated for shortlist)")


if __name__ == "__main__":
    main()
