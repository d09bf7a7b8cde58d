import sys, os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))  # repo root
"""Per-stage shortlist-exact seeds profile on the real chip.

Scratch tool (untracked): times the sub-stages of ops/seeds.py
_shortlist_pass separately, scalar-pull syncing per CLAUDE.md.
"""
import time
import numpy as np

from sapcu_tpu.utils import apply_platform_env
apply_platform_env()
import jax
import jax.numpy as jnp

from sapcu_tpu.ops import seeds as S
from sapcu_tpu.ops.pointops import pairwise_sqdist
import functools


def sync(x):
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))


rng = np.random.default_rng(0)
v = rng.normal(size=(2048, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
cell = 0.004
boxsize = int(round(1.0 / cell))
band_lo, band_hi = S.BAND_LO, S.BAND_HI
bcap, n_cand, slack, scap, chunk = 12288, 64, 3.0, 8192, 8192


@functools.partial(jax.jit, static_argnames=("bcap",))
def stage_prune(pts, bcap: int):
    bs_pad = -(-boxsize // 8) * 8
    nb1 = bs_pad // 8
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
    thresh = band_hi + spacing + slack * cell

    axis_b = (jnp.arange(nb1, dtype=jnp.float32) * 8.0 + 4.0) * cell - 0.5
    gx, gy, gz = jnp.meshgrid(axis_b, axis_b, axis_b, indexing="ij")
    bc = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    d1 = jnp.sqrt(jnp.maximum(jnp.min(pairwise_sqdist(bc, pts), axis=-1), 0.0))
    r_block = float(np.sqrt(3.0)) * 3.5 * cell
    active = (d1 - r_block) <= thresh
    vox = jnp.clip(jnp.floor((pts + 0.5) / cell).astype(jnp.int32),
                   0, boxsize - 1)
    bvox = vox // 8
    active = active.reshape(nb1, nb1, nb1) \
        .at[bvox[:, 0], bvox[:, 1], bvox[:, 2]].set(True).reshape(-1)
    (idx_b,) = jnp.nonzero(active, size=bcap, fill_value=0)
    bx = idx_b // (nb1 * nb1)
    by = (idx_b // nb1) % nb1
    bz = idx_b % nb1
    off = jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(8),
                                 jnp.arange(8), indexing="ij"),
                    axis=-1).reshape(512, 3)
    vox_int = (jnp.stack([bx, by, bz], axis=-1)[:, None, :] * 8 + off[None])
    centers_sel = vox_int.astype(jnp.float32) * cell + 0.5 * cell - 0.5
    return centers_sel, vox_int


@jax.jit
def stage_blockdist(centers_sel, pts):
    return S.surface_distance_blocked(centers_sel, pts, n_cand=n_cand)


@jax.jit
def stage_scatter(vox_int, dist_b, ok_b):
    valid = jnp.all(vox_int < boxsize, axis=-1)
    flat = jnp.where(
        valid,
        (vox_int[..., 0] * boxsize + vox_int[..., 1]) * boxsize
        + vox_int[..., 2],
        boxsize ** 3).reshape(-1)
    dist = jnp.full((boxsize ** 3 + 1,), jnp.inf, jnp.float32) \
        .at[flat].set(dist_b.reshape(-1))[:-1] \
        .reshape(boxsize, boxsize, boxsize)
    okg = jnp.zeros((boxsize ** 3 + 1,), bool) \
        .at[flat].set((ok_b & valid).reshape(-1))[:-1] \
        .reshape(boxsize, boxsize, boxsize)
    return dist, okg


@jax.jit
def stage_bfs(pts, dist):
    mask, reach = S._mask_reach_from_dist(pts, dist, boxsize, cell,
                                          band_lo, band_hi)
    return mask, reach


for rep in range(3):
    a = 0.7 + 0.1 * rep
    pts = jnp.asarray((v * np.float32([a, 0.42, 0.42])).astype(np.float32))
    t0 = time.time(); c_sel, v_int = stage_prune(pts, bcap); sync(c_sel)
    t1 = time.time(); db, ok = stage_blockdist(c_sel, pts); sync(db)
    t2 = time.time(); dist, okg = stage_scatter(v_int, db, ok); sync(dist)
    t3 = time.time(); mask, reach = stage_bfs(pts, dist); nmask = sync(mask)
    t4 = time.time()
    # and the full production path for comparison
    t5 = time.time()
    ctr, cnt = S.generate_seeds_device(np.asarray(pts), cell=cell)
    sync(ctr)
    t6 = time.time()
    print(f"[rep {rep}] prune {t1-t0:.3f}s blockdist {t2-t1:.3f}s "
          f"scatter {t3-t2:.3f}s bfs {t4-t3:.3f}s (mask {int(nmask)}) "
          f"| full path {t6-t5:.3f}s n={cnt}", flush=True)
