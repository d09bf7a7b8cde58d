#!/usr/bin/env python
"""Sub-stage breakdown of the shortlist-exact seed path on the real chip.

The shortlist pass (ops/seeds.py::_shortlist_pass) is one fused dispatch
in production; to find where its ~0.4-0.55 s goes this script re-runs its
three phases as separate jits:

  A. active-block selection: per-point 1-NN spacing quantile + block-center
     1-NN lower bound + source-block union  (one [NB, N] matmul)
  B. surface_distance_blocked on the selected bcap blocks (the 10-NN +
     8-triangle kernel against per-block candidate shortlists) — the
     presumed hot phase
  C. scatter + BFS closure + the in-dispatch refinement while_loop

plus the per-voxel 1-NN-only variant of B (one pairwise + min, no top-k
rounds / gathers / triangle math) to bound what a voxel-level second
prune could save.

Timing discipline per CLAUDE.md: sync via 4-byte scalar pulls; vary the
cloud across reps to defeat server-side memoization.
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
from sapcu_tpu.ops.pointops import pairwise_sqdist  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:4]))


def cloud_of(n, i):
    rng = np.random.default_rng(i)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return jnp.asarray((v * (0.40 + 0.01 * (i % 5))).astype(np.float32))


BCAP, N_CAND, SLACK = 12288, 64, 3.0


@jax.jit
def stage_a(pts, bc):
    n = pts.shape[0]

    def _one_nn(tile):
        d = pairwise_sqdist(tile, pts)
        d = jnp.where(d <= 0.0, jnp.inf, d)
        return jnp.min(d, axis=-1)

    pchunk = min(2048, n)
    ppad = (-n) % pchunk
    d1nn_sq = jax.lax.map(_one_nn,
                          jnp.pad(pts, ((0, ppad), (0, 0)),
                                  constant_values=1e6)
                          .reshape(-1, pchunk, 3)).reshape(-1)[:n]
    spacing = jnp.sqrt(jnp.quantile(d1nn_sq, 0.9))
    d1 = jnp.sqrt(jnp.maximum(
        jnp.min(pairwise_sqdist(bc, pts), axis=-1), 0.0))
    return spacing, d1


@jax.jit
def stage_b(centers_sel, pts):
    return S.surface_distance_blocked(centers_sel, pts, n_cand=N_CAND)


@jax.jit
def stage_b_1nn(centers_sel, pts):
    """Per-voxel 1-NN over the block shortlists only (what a voxel-level
    prune would pay before the full kernel)."""
    n_cand = min(N_CAND, pts.shape[0])
    nb = centers_sel.shape[0]
    bc = jnp.mean(centers_sel, axis=1)
    chunk = min(2048, nb)
    while nb % chunk:
        chunk //= 2

    def cands(tile):
        d = pairwise_sqdist(tile, pts)
        _, idx = jax.lax.top_k(-d, n_cand)
        return idx.astype(jnp.int32)
    cidx = jax.lax.map(cands, bc.reshape(-1, chunk, 3))
    cand = jnp.take(pts, cidx.reshape(nb, n_cand), axis=0)

    bchunk = min(1024, nb)
    while nb % bchunk:
        bchunk //= 2

    def one(args):
        cb, cd = args
        d = pairwise_sqdist(cb, cd)
        return jnp.min(d, axis=-1)

    t = centers_sel.shape[1]
    return jax.lax.map(one, (
        centers_sel.reshape(-1, bchunk, t, 3),
        cand.reshape(-1, bchunk, n_cand, 3)))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2048]
    cell = 0.004
    boxsize = int(round(1.0 / cell))
    bs_pad = -(-boxsize // 8) * 8
    nb1 = bs_pad // 8
    axis_b = (jnp.arange(nb1, dtype=jnp.float32) * 8.0 + 4.0) * cell - 0.5
    gx, gy, gz = jnp.meshgrid(axis_b, axis_b, axis_b, indexing="ij")
    bc = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    off = jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(8),
                                 jnp.arange(8), indexing="ij"),
                    axis=-1).reshape(512, 3)
    r_block = float(np.sqrt(3.0)) * 3.5 * cell

    for n in sizes:
        for i in range(3):
            pts = cloud_of(n, i)
            label = "steady" if i else "compile"

            t0 = time.time()
            spacing, d1 = stage_a(pts, bc)
            sp = float(spacing)
            ta = time.time() - t0

            thresh = S.BAND_HI + sp + SLACK * cell
            active = (d1 - r_block) <= thresh
            n_active = int(jnp.sum(active))
            (idx_b,) = jnp.nonzero(active, size=BCAP, fill_value=0)
            bx = idx_b // (nb1 * nb1)
            by = (idx_b // nb1) % nb1
            bz = idx_b % nb1
            vox_int = (jnp.stack([bx, by, bz], axis=-1)[:, None, :] * 8
                       + off[None])
            centers_sel = vox_int.astype(jnp.float32) * cell \
                + 0.5 * cell - 0.5
            sync(centers_sel)

            t0 = time.time()
            dist_b, ok_b = stage_b(centers_sel, pts)
            sync(dist_b)
            tb = time.time() - t0

            t0 = time.time()
            d1v = stage_b_1nn(centers_sel, pts)
            sync(d1v)
            tb1 = time.time() - t0
            # what a voxel prune would keep (thresh on 1-NN over cands)
            keep = float(jnp.mean(
                (d1v.reshape(-1, 512)[:max(n_active, 1)]
                 <= thresh * thresh).astype(jnp.float32)))

            # full pass for reference (includes scatter+BFS+refine)
            t0 = time.time()
            mask, dist, okg, missing, stats = S._shortlist_pass(
                pts, boxsize, cell, S.BAND_LO, S.BAND_HI, BCAP, N_CAND,
                SLACK, 8192, 8192)
            sync(stats)
            tfull = time.time() - t0

            print(f"N={n} [{label}] A(select)={ta:.3f}s "
                  f"B(blocked kernel)={tb:.3f}s B1nn={tb1:.3f}s "
                  f"full_pass={tfull:.3f}s | active={n_active}/{BCAP} "
                  f"spacing={sp:.4f} voxel_keep={keep:.2%}", flush=True)


if __name__ == "__main__":
    main()
