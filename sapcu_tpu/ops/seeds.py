"""Seed-shell generation: the TPU-native replacement for ``dense.cpp``.

The reference generates upsampling seed points with a C++ program invoked
as a subprocess from the inference hot path (generation.py:114-117):
a voxel-grid BFS flood-fill from the input points where each visited voxel
center gets a "distance to approximate surface" and voxels whose distance
falls in the band [0.0110, 0.0150] are emitted (dense.cpp:175-252).

The distance of a voxel center c (dense.cpp:214-225):
  - find the 10 nearest input points (kd-tree max-heap pops them
    farthest-first: pt[0] = 10th-nearest ... pt[9] = nearest)
  - approximate the local surface with 8 triangles
    (pt[i], pt[8], pt[9]) for i in 0..7, i.e. (j-th-nearest for j=3..10,
    2nd-nearest, nearest)
  - distance = min point-to-triangle distance over those 8 triangles

BFS semantics (dense.cpp:195-247): start from the voxels containing input
points; expand 6-connected; a voxel only expands further if its distance
<= band_hi, so the visited set is the connected <=band_hi shell plus one
boundary layer; emit visited voxels with band_lo <= dist <= band_hi.

TPU-native redesign — instead of a pointer-chasing BFS with a hash map we
use dense, static-shaped ops:
1. compute the surface distance for EVERY voxel of the bounded grid
   (boxsize = round(1/cell), centers at k*cell + cell/2 - 0.5, matching
   dense.cpp:186,211-213) with a memory-tiled 10-NN + 8-triangle kernel —
   a few large MXU matmuls;
2. reach = fixpoint of ``reach | dilate6(reach & (dist <= band_hi))``
   seeded from the input-point voxels — a masked-dilation while_loop that
   is exactly the BFS closure;
3. emit ``reach & (band_lo <= dist <= band_hi)``.

Documented divergences from dense.cpp (SURVEY.md §7 quirk ledger):
- input coordinates exactly on the +0.5 boundary are clamped into the
  grid (dense.cpp silently indexes out of its array: UB);
- BFS neighbour ids at grid edges don't wrap into adjacent rows (the C++
  linear-id arithmetic wraps, visiting garbage voxels);
- no 5000-point input cap (dense.cpp:64 overflows beyond it).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from sapcu_tpu.ops.pointops import (pairwise_sqdist, point_triangle_closest,
                                     topk_small)

BAND_LO = 0.0110
BAND_HI = 0.0150

# Shortlist-path tuning constants, shared by every entry point
# (_fast_exact_seeds / _fast_exact_mask / generate_seeds_device_async).
# Fused/classic parity REQUIRES identical values — do not override one
# call site without the others.
SHORTLIST_BCAP = 12288     # active-block capacity (overflow -> pruned path)
SHORTLIST_NCAND = 64       # per-block candidate shortlist size
SHORTLIST_SLACK = 3.0      # pruning slack in cells (exactness via refinement)
SHORTLIST_SCAP = 8192      # speculative on-device refinement capacity


def _shortlist_selected(n_points: int) -> bool:
    """The SAPCU_SEEDS_PATH gate shared by the sync and async entry
    points: shortlist-exact for dense clouds (auto, N > 1024 — below
    that the dense grid wins outright, measured on-chip), or forced."""
    path = os.environ.get("SAPCU_SEEDS_PATH", "auto")
    return path == "shortlist" or (path == "auto" and n_points > 1024)


def _shortlist_use_pallas() -> bool:
    return (_on_tpu()
            and os.environ.get("SAPCU_PALLAS_BLOCKED", "1") != "0")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("chunk",))
def surface_distance(centers: jax.Array, points: jax.Array,
                     chunk: int = 8192) -> jax.Array:
    """Distance from each center to the 8-triangle local surface approx.

    centers: [C, 3], points: [N, 3] (N >= 10) -> [C] float32.
    Tiled over centers so peak memory is chunk*N. On TPU the fused Pallas
    kernel (ops/pallas_kernels.py) replaces this XLA path.
    """
    c = centers.shape[0]
    pad = (-c) % chunk
    cp = jnp.pad(centers, ((0, pad), (0, 0)))
    tiles = cp.reshape(-1, chunk, 3)

    def one(tile):
        d = pairwise_sqdist(tile, points)
        _, idx = topk_small(-d, 10)                  # nearest-first
        nn = points[idx]                              # [chunk, 10, 3]
        nearest = nn[:, 0:1, :]                       # pt[9]
        second = nn[:, 1:2, :]                        # pt[8]
        others = nn[:, 2:10, :]                       # pt[0..7] (far-first order
        #                                               irrelevant: min over all)
        cpnt = point_triangle_closest(
            others,                                   # a = pt[i]
            jnp.broadcast_to(second, others.shape),   # b = pt[8]
            jnp.broadcast_to(nearest, others.shape),  # c = pt[9]
            tile[:, None, :])
        dist = jnp.linalg.norm(cpnt - tile[:, None, :], axis=-1)
        return jnp.min(dist, axis=-1)

    out = jax.lax.map(one, tiles).reshape(-1)
    return out[:c]


def _dilate6(mask: jax.Array) -> jax.Array:
    """6-connected dilation of a [X, Y, Z] boolean grid (no wraparound)."""
    m = mask
    out = mask
    zero = jnp.zeros_like(m[:1])
    out = out | jnp.concatenate([m[1:], zero], axis=0)
    out = out | jnp.concatenate([zero, m[:-1]], axis=0)
    zero = jnp.zeros_like(m[:, :1])
    out = out | jnp.concatenate([m[:, 1:], zero], axis=1)
    out = out | jnp.concatenate([zero, m[:, :-1]], axis=1)
    zero = jnp.zeros_like(m[:, :, :1])
    out = out | jnp.concatenate([m[:, :, 1:], zero], axis=2)
    out = out | jnp.concatenate([zero, m[:, :, :-1]], axis=2)
    return out


@functools.partial(jax.jit, static_argnames=("boxsize",))
def _bfs_closure(seed_mask: jax.Array, expandable: jax.Array,
                 boxsize: int) -> jax.Array:
    """Fixpoint of reach = reach | dilate6(reach & expandable)."""

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        reach, _ = carry
        new = reach
        for _ in range(4):  # a few dilations per convergence check
            new = new | _dilate6(new & expandable)
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(cond, body, (seed_mask, jnp.asarray(True)))
    return reach


def voxel_centers(boxsize: int, cell: float) -> jax.Array:
    """Grid of voxel centers k*cell + cell/2 - 0.5 (dense.cpp:211-213)."""
    axis = jnp.arange(boxsize, dtype=jnp.float32) * cell + 0.5 * cell - 0.5
    gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def _blocked_centers(boxsize: int, cell: float) -> tuple[jax.Array, int]:
    """Voxel centers regrouped into 8^3 spatial blocks: [NB, 512, 3].

    The grid is padded up to a multiple of 8; pad voxels get real (out-of-
    band) distances and are sliced away by the caller.
    """
    bs_pad = -(-boxsize // 8) * 8
    axis = jnp.arange(bs_pad, dtype=jnp.float32) * cell + 0.5 * cell - 0.5
    gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    g = jnp.stack([gx, gy, gz], axis=-1)                 # [P, P, P, 3]
    nb1 = bs_pad // 8
    g = g.reshape(nb1, 8, nb1, 8, nb1, 8, 3)
    g = jnp.transpose(g, (0, 2, 4, 1, 3, 5, 6))
    return g.reshape(nb1 ** 3, 512, 3), bs_pad


def _unblock(dist_b: jax.Array, boxsize: int, bs_pad: int) -> jax.Array:
    nb1 = bs_pad // 8
    d = dist_b.reshape(nb1, nb1, nb1, 8, 8, 8)
    d = jnp.transpose(d, (0, 3, 1, 4, 2, 5)).reshape(bs_pad, bs_pad, bs_pad)
    return d[:boxsize, :boxsize, :boxsize]


@functools.partial(jax.jit, static_argnames=("boxsize", "chunk", "use_pallas"))
def seed_mask(points: jax.Array, boxsize: int, cell: float,
              band_lo: float = BAND_LO, band_hi: float = BAND_HI,
              chunk: int = 8192, use_pallas: bool = False) -> jax.Array:
    """Full on-device seed computation -> boolean [bs, bs, bs] emit mask."""
    centers = voxel_centers(boxsize, cell)
    if use_pallas:
        from sapcu_tpu.ops.pallas_kernels import surface_distance_pallas
        dist = surface_distance_pallas(centers, points, tile=min(chunk, 128))
    else:
        dist = surface_distance(centers, points, chunk=chunk)
    dist = dist.reshape(boxsize, boxsize, boxsize)

    return _mask_from_dist(points, dist, boxsize, cell, band_lo, band_hi)


@functools.partial(jax.jit, static_argnames=("boxsize",))
def _mask_reach_from_dist(points, dist, boxsize: int, cell, band_lo,
                          band_hi):
    vox = jnp.clip(jnp.floor((points + 0.5) / cell).astype(jnp.int32),
                   0, boxsize - 1)
    seed = jnp.zeros((boxsize, boxsize, boxsize), bool)
    seed = seed.at[vox[:, 0], vox[:, 1], vox[:, 2]].set(True)

    reach = _bfs_closure(seed, dist <= band_hi, boxsize)
    return reach & (dist >= band_lo) & (dist <= band_hi), reach


def _mask_from_dist(points, dist, boxsize: int, cell, band_lo, band_hi):
    mask, _ = _mask_reach_from_dist(points, dist, boxsize, cell,
                                    band_lo, band_hi)
    return mask


def _topk10_gather(negd: jax.Array, cd: jax.Array
                   ) -> tuple[jax.Array, jax.Array]:
    """10 iterative argmax rounds + candidate gather, gather-free.

    negd: [C, T, K] (negated squared distances), cd: [C, K, 3] candidate
    coordinates -> (vals [C, T, 10] descending like ``topk_small``,
    nn [C, T, 10, 3] the selected candidates' coordinates).

    The row gathers run as one-hot matmuls (TPU gather HLOs on C=3 data
    are slow custom calls — the round-1 framework-wide finding). A
    one-hot f32 matmul at HIGHEST precision copies rows bitwise (each
    output element is 1.0 * x + exact zeros), so this stays exact for
    the seed-band math; scripts/bench_seeds.py asserts parity on-chip.
    """
    k_axis = negd.shape[-1]
    x = negd
    vals, nns = [], []
    for _ in range(10):
        i = jnp.argmax(x, axis=-1)                          # [C, T]
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        oh = jax.nn.one_hot(i, k_axis, dtype=cd.dtype)      # [C, T, K]
        nn = jnp.einsum("ctk,ckd->ctd", oh, cd,
                        precision=jax.lax.Precision.HIGHEST)
        vals.append(v)
        nns.append(nn)
        x = jnp.where(jax.nn.one_hot(i, k_axis, dtype=bool), -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(nns, axis=-2)


def surface_distance_blocked(centers_blocked: jax.Array,
                             points: jax.Array,
                             n_cand: int = 128, block_chunk: int = 1024,
                             use_pallas: bool = False
                             ) -> tuple[jax.Array, jax.Array]:
    """Block-candidate surface distances: [NB, T, 3] spatial blocks of
    centers, [N, 3] points -> (distances [NB, T], per-center
    completeness certificate [NB, T]).

    The full path pays 10 argmin rounds + neighbour gathers against all N
    points for every voxel; restricting each block to the n_cand points
    nearest its block center cuts that work by N/n_cand (16x at N=2048).
    Exactness is certified per center: c's found 10-NN is provably
    complete iff

        ||c - 10thNN_found(c)|| + ||c - bc|| <= ||bc - cand_n||

    (triangle inequality: any point nearer c than its found 10th-NN would
    be within that bound of the block center bc, hence among the n_cand
    nearest). Returns (distances [NB, T], ok [NB, T] bool). Incomplete
    centers (deep inside / far outside the surface, where the shortlist
    is a one-sided cap) may carry wrong distances — callers must either
    ignore them (the BFS never reads unreachable voxels) or fall back,
    so the shortcut is exact-or-rejected, never silently wrong.

    use_pallas=True fuses the 10-NN selection + triangle math per block
    into a VMEM-resident kernel (pallas_kernels.blocked_nn_triangle_pallas
    — elementwise f32 distances, no MXU dot, so the Mosaic bf16-pass
    caveat does not apply). Distance VALUES may differ from the XLA path
    in the last f32 ulp (different reduction order than the HIGHEST-
    precision matmul), which can flip exact-tie neighbour selections —
    the same caveat class as the documented shortlist tie behavior.
    """
    nb, t = centers_blocked.shape[:2]
    pts = points.astype(jnp.float32)
    n_cand = min(n_cand, pts.shape[0])
    bc = jnp.mean(centers_blocked, axis=1)               # [NB, 3]

    chunk = min(2048, nb)
    while nb % chunk:
        chunk //= 2

    def cands(tile):                                     # [c, 3] block centers
        d = pairwise_sqdist(tile, pts)
        nd, idx = jax.lax.top_k(-d, n_cand)
        return -nd[:, n_cand - 1], idx.astype(jnp.int32)
    d128sq, cidx = jax.lax.map(cands, bc.reshape(-1, chunk, 3))
    d128 = jnp.sqrt(jnp.maximum(d128sq.reshape(nb), 0.0))
    cand = jnp.take(pts, cidx.reshape(nb, n_cand), axis=0)  # [NB, n_cand, 3]

    if use_pallas:
        from sapcu_tpu.ops.pallas_kernels import blocked_nn_triangle_pallas
        cb = centers_blocked.astype(jnp.float32)
        best, d10 = blocked_nn_triangle_pallas(
            cb[..., 0], cb[..., 1], cb[..., 2],
            cand[..., 0], cand[..., 1], cand[..., 2])
        dbc = jnp.linalg.norm(cb - bc[:, None, :], axis=-1)
        ok = d10 + dbc <= d128[:, None]
        if pts.shape[0] <= n_cand:
            ok = jnp.ones_like(ok)  # shortlist == full set
        return best, ok

    bchunk = min(block_chunk, nb)
    while nb % bchunk:
        bchunk //= 2

    def one(args):
        cb, cd, bcc, d128c = args   # [C, T, 3], [C, n_cand, 3], [C, 3], [C]
        d = pairwise_sqdist(cb, cd)                      # [C, T, n_cand]
        vals, nn = _topk10_gather(-d, cd)                # nearest-first
        nearest = nn[..., 0:1, :]
        second = nn[..., 1:2, :]
        others = nn[..., 2:10, :]
        q = cb[..., None, :]
        cpnt = point_triangle_closest(
            others, jnp.broadcast_to(second, others.shape),
            jnp.broadcast_to(nearest, others.shape), q)
        dist = jnp.linalg.norm(cpnt - q, axis=-1)
        best = jnp.min(dist, axis=-1)                    # [C, T]
        d10 = jnp.sqrt(jnp.maximum(-vals[..., 9], 0.0))
        dbc = jnp.linalg.norm(cb - bcc[:, None, :], axis=-1)
        ok = d10 + dbc <= d128c[:, None]                 # [C, T]
        return best, ok

    best, ok = jax.lax.map(one, (
        centers_blocked.astype(jnp.float32).reshape(-1, bchunk, t, 3),
        cand.reshape(-1, bchunk, n_cand, 3),
        bc.reshape(-1, bchunk, 3),
        d128.reshape(-1, bchunk)))
    if pts.shape[0] <= n_cand:
        ok = jnp.ones_like(ok)  # shortlist == full set
    return best.reshape(nb, t), ok.reshape(nb, t)


@functools.partial(jax.jit, static_argnames=("boxsize",))
def _blocked_dist(points: jax.Array, boxsize: int, cell: float):
    """(dist grid, per-voxel certificate grid) via block candidates."""
    cb, bs_pad = _blocked_centers(boxsize, cell)
    dist_b, ok_b = surface_distance_blocked(cb, points)
    return (_unblock(dist_b, boxsize, bs_pad),
            _unblock(ok_b.astype(jnp.float32), boxsize, bs_pad) > 0.5)


def _flatnonzero_inv(flat: jax.Array, cap: int) -> tuple[jax.Array, jax.Array]:
    """Bit-identical ``jnp.flatnonzero(flat, size=cap, fill_value=0)`` plus
    the true count, ~3.3x faster on TPU.

    ``jnp.nonzero(size=)`` lowers to ``cumsum(bincount(cumsum(mask)))`` —
    a full-length int32 scan plus an M-update scatter-add (measured 165 ms
    at M=15.6M on v5e). This packs the mask into uint32 words (popcount
    for per-word counts), builds the query->word map SEARCH-FREE by
    scatter-min of the word cumsum into the query axis + reverse cummin,
    and rank-selects the bit inside each word with population_count —
    only nw=M/32 scatter updates and two [cap]-sized gathers (50 ms).
    """
    M = flat.shape[0]
    W = 32
    Mp = -(-M // W) * W
    bits = jnp.pad(flat, (0, Mp - M)).reshape(-1, W).astype(jnp.uint32)
    words = jnp.sum(bits << jnp.arange(W, dtype=jnp.uint32)[None, :],
                    axis=1, dtype=jnp.uint32)                    # [nw]
    wc = jax.lax.population_count(words).astype(jnp.int32)
    c32 = jnp.cumsum(wc)                                         # [nw]
    nw = c32.shape[0]
    # tmp[v] = min{w : c32[w] == v} (v clipped into [0, cap]);
    # inv[v] = min{w : c32[w] >= v} = reverse cummin of tmp
    tmp = jnp.full((cap + 1,), jnp.int32(nw), jnp.int32).at[
        jnp.clip(c32, 0, cap)].min(jnp.arange(nw, dtype=jnp.int32))
    inv = jnp.flip(jax.lax.cummin(jnp.flip(tmp)))
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)
    b = jnp.minimum(inv[1:], nw - 1)                             # [cap]
    w = words[b]
    prev = jnp.where(b > 0, c32[jnp.maximum(b - 1, 0)], 0)
    r = (q - 1 - prev).astype(jnp.uint32)                        # in-word rank
    pos = jnp.zeros_like(r)
    for width in (16, 8, 4, 2, 1):      # branchless select of r-th set bit
        seg = (w >> pos) & jnp.uint32((1 << width) - 1)
        cnt = jax.lax.population_count(seg)
        go = r >= cnt
        r = r - jnp.where(go, cnt, 0)
        pos = pos + jnp.where(go, jnp.uint32(width), 0)
    idx = b * W + pos.astype(jnp.int32)
    count = c32[-1]
    return jnp.where(q <= count, jnp.minimum(idx, M - 1), 0), count


def _extract_inline(mask: jax.Array, boxsize: int, cell: float, cap: int
                    ) -> tuple[jax.Array, jax.Array]:
    """Traceable mask -> (centers [cap, 3], count) compaction body."""
    flat = mask.reshape(-1)
    idx, count = _flatnonzero_inv(flat, cap)
    z = idx % boxsize
    y = (idx // boxsize) % boxsize
    x = idx // (boxsize * boxsize)
    centers = jnp.stack([x, y, z], axis=-1).astype(jnp.float32) \
        * cell + 0.5 * cell - 0.5
    return centers, count


@functools.partial(jax.jit, static_argnames=("boxsize", "cap"))
def extract_seeds(mask: jax.Array, boxsize: int, cell: float,
                  cap: int) -> tuple[jax.Array, jax.Array]:
    """Device-side mask -> (centers [cap, 3], n_valid scalar).

    Valid centers are compacted to the front (jnp.nonzero preserves index
    order, matching the C-order voxel enumeration of the host argwhere
    path); pad rows repeat center 0.
    """
    return _extract_inline(mask, boxsize, cell, cap)


def _bucket(n: int, base: int = 8192) -> int:
    cap = base
    while cap < n:
        cap *= 2
    return cap


# ------------------------------------------------- pruned-exact path
#
# The full path computes the exact 10-NN + 8-triangle distance for every
# voxel of the 250^3 grid, but the BFS only ever READS a thin shell around
# the surface (the <=band_hi closure plus one boundary layer) — typically
# <20% of the grid. The pruned path:
#   1. a cheap coarse pass (one matmul + min per tile, no top-k/gather)
#      lower-bounds the 1-NN distance of every 2x2x2 voxel GROUP;
#   2. exact distances are computed only for voxels of "active" groups
#      (lower bound <= band_hi + slack); inactive voxels get +inf —
#      which the BFS treats as "not expandable, not emitted";
#   3. a refinement loop makes this EXACT regardless of slack: after the
#      BFS, any voxel the traversal read (reach + its 6-neighbourhood)
#      that was not computed exactly gets the exact kernel, and the BFS
#      reruns — repeating until every read voxel is exact. Emission needs
#      dist in [lo, hi] and dist(c) <= d_1NN(c) always (pt[9] is a vertex
#      of every triangle), so pruned voxels with d_1NN > band_hi can
#      never be wrongly dropped FROM the computed reach; voxels wrongly
#      treated as walls are exactly what the refinement detects.
# Measured on-chip (scripts/bench_seeds.py): the coarse pass is
# matmul/HBM-bound (~tens of ms) while the exact kernel's 10 selection
# rounds dominate — shrinking its voxel count by ~6x is a ~4-6x seed
# speedup at PU1K sizes.


@functools.partial(jax.jit, static_argnames=("boxsize",))
def _group_lower_bound(points: jax.Array, boxsize: int, cell: float
                       ) -> jax.Array:
    """Per-2x2x2-group lower bound on member-voxel 1-NN distance.

    Returns [G, G, G] f32 (G = ceil(bs/2)): distance from the group
    center to the nearest input point minus the group circumradius.
    """
    g = -(-boxsize // 2)
    axis = (jnp.arange(g, dtype=jnp.float32) * 2.0 + 1.0) * cell - 0.5
    gx, gy, gz = jnp.meshgrid(axis, axis, axis, indexing="ij")
    centers = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    r = float(np.sqrt(3.0)) * cell  # half the group diagonal

    def one(tile):
        d = pairwise_sqdist(tile, points)
        return jnp.sqrt(jnp.maximum(jnp.min(d, axis=-1), 0.0))

    chunk = 16384
    pad = (-centers.shape[0]) % chunk
    cp = jnp.pad(centers, ((0, pad), (0, 0)))
    d1 = jax.lax.map(one, cp.reshape(-1, chunk, 3)).reshape(-1)
    d1 = d1[:centers.shape[0]]
    return (d1 - r).reshape(g, g, g)


@functools.partial(jax.jit, static_argnames=("boxsize", "cap", "chunk"))
def _masked_exact_dist(points: jax.Array, active: jax.Array, boxsize: int,
                       cell: float, cap: int, chunk: int) -> jax.Array:
    """Exact surface distance on active voxels, +inf elsewhere.

    active: [bs, bs, bs] bool; cap: static compaction capacity
    (power-of-two bucket >= active count).
    """
    flat = active.reshape(-1)
    idx, _ = _flatnonzero_inv(flat, cap)
    z = idx % boxsize
    y = (idx // boxsize) % boxsize
    x = idx // (boxsize * boxsize)
    centers = jnp.stack([x, y, z], axis=-1).astype(jnp.float32) \
        * cell + 0.5 * cell - 0.5
    d = surface_distance(centers, points, chunk=chunk)
    grid = jnp.full((boxsize * boxsize * boxsize,), jnp.inf, jnp.float32)
    # pad rows all hold voxel idx 0; later writes win, but idx 0's OWN
    # distance is correct regardless (same center, same kernel)
    grid = grid.at[idx].set(d)
    return grid.reshape(boxsize, boxsize, boxsize)


def _pruned_exact_mask(pts: jax.Array, boxsize: int, cell: float,
                       band_lo: float, band_hi: float, chunk: int,
                       slack_cells: float = 5.0):
    """Seed mask via coarse pruning + exact shell + refinement to parity."""
    lb = _group_lower_bound(pts, boxsize, cell)
    thresh = band_hi + slack_cells * cell
    active_g = lb <= thresh                       # [G, G, G]
    # input voxels are BFS sources: always active
    vox = jnp.clip(jnp.floor((pts + 0.5) / cell).astype(jnp.int32),
                   0, boxsize - 1)
    gsize = active_g.shape[0]
    src = jnp.zeros((gsize, gsize, gsize), bool)
    src = src.at[vox[:, 0] // 2, vox[:, 1] // 2, vox[:, 2] // 2].set(True)
    active_g = active_g | src
    # expand to voxels ([G,G,G] -> [bs,bs,bs])
    act = jnp.repeat(jnp.repeat(jnp.repeat(
        active_g, 2, axis=0), 2, axis=1), 2, axis=2)
    act = act[:boxsize, :boxsize, :boxsize]

    computed = act
    n_act = int(jnp.sum(act))
    cap = _bucket(max(n_act, 1), base=65536)
    dist = _masked_exact_dist(pts, act, boxsize, cell, cap, chunk)
    for _ in range(8):  # refinement: converges in 0-2 rounds in practice
        mask, reach = _mask_reach_from_dist(pts, dist, boxsize, cell,
                                            band_lo, band_hi)
        # the BFS only reads dist at voxels in reach (see _shortlist_pass)
        missing = reach & ~computed
        n_miss = int(jnp.sum(missing))
        if n_miss == 0:
            return mask
        mcap = _bucket(n_miss, base=4096)
        dmiss = _masked_exact_dist(pts, missing, boxsize, cell, mcap, chunk)
        dist = jnp.where(missing, dmiss, dist)
        computed = computed | missing
    # safety net: fall back to the dense grid (never hit in testing)
    return seed_mask(pts, boxsize, cell, band_lo, band_hi, chunk)


# --------------------------------------------- shortlist-exact path
#
# The production default (SAPCU_SEEDS_PATH=auto): combines the pruned
# path's shell restriction with the blocked path's per-block candidate
# shortlists, refined to exact parity, in ONE device dispatch + ONE
# 8-byte host pull on the common path (each extra dispatch/pull costs
# ~100ms+ of stdio-tunnel latency — see CLAUDE.md):
#   1. _shortlist_pass (one jit): block-level 1-NN lower bound (with a
#      sample-spacing-aware margin) prunes the 8^3-voxel blocks to the
#      surface shell; active blocks' voxels get the 10-NN + 8-triangle
#      distance against the n_cand points nearest their block center
#      (N/n_cand less selection work than full-N), each voxel carrying
#      the triangle-inequality completeness certificate of
#      surface_distance_blocked; BFS + emission mask; `missing` = voxels
#      the BFS read (= the reach set) that are pruned-away OR
#      uncertified; a speculative full-N refinement of up to scap
#      missing voxels + BFS rerun happens inside the same dispatch.
#   2. if missing is still non-empty, _refine_round recomputes those
#      voxels with the full-N exact kernel and reruns the BFS, looping
#      until every read voxel is exact — identical convergence argument
#      to _pruned_exact_mask: wrong-high shell values (false walls) are
#      in the read set and get recomputed; voxels beyond a wall enter
#      the read set only after the wall falls; the exact-known set grows
#      monotonically. The final mask equals the dense grid's.
# The certificate is an accelerator (first-pass misses are rare), not a
# correctness requirement. Overflowing bcap active blocks (giant
# surfaces) falls back to _pruned_exact_mask.
#
# Exactness caveat (measured, documented): certified voxels whose
# candidate list contains EXACT distance ties can legitimately pick a
# different 10-NN set than the full-grid scan order and emit a
# different (equally valid) triangle distance — observed 2 voxels per
# ~281k seeds on TPU. The reference's kd-tree max-heap tie order is
# equally arbitrary (dense.cpp pops equal keys in heap order). The CPU
# parity tests are bitwise because both paths see identical f32 values
# in identical order there.


@functools.partial(jax.jit,
                   static_argnames=("boxsize", "bcap", "n_cand", "scap",
                                    "chunk", "use_pallas", "ecap"))
def _shortlist_pass(points: jax.Array, boxsize: int, cell: float,
                    band_lo: float, band_hi: float, bcap: int,
                    n_cand: int, slack_cells: float, scap: int,
                    chunk: int, use_pallas: bool = False, ecap: int = 0):
    bs_pad = -(-boxsize // 8) * 8
    nb1 = bs_pad // 8
    pts = points.astype(jnp.float32)
    n = pts.shape[0]

    # Pruning threshold: a voxel's triangle distance can undershoot its
    # 1-NN distance by roughly the local sample spacing (the 8 triangles
    # span the 10-NN, whose surface passes between samples), so the
    # shell margin must scale with the cloud's density — a fixed margin
    # that works at N=2048 misses most of the reach set at N=512. Use
    # the 90th-percentile 1-NN spacing (robust to isolated points) plus
    # slack_cells cells. Mis-pruned voxels are caught by the refinement
    # (exactness never depends on this threshold).
    def _one_nn(tile):
        d = pairwise_sqdist(tile, pts)
        d = jnp.where(d <= 0.0, jnp.inf, d)  # drop self-pairs
        return jnp.min(d, axis=-1)

    pchunk = min(2048, n)
    ppad = (-n) % pchunk
    d1nn_sq = jax.lax.map(_one_nn,
                          jnp.pad(pts, ((0, ppad), (0, 0)),
                                  constant_values=1e6)
                          .reshape(-1, pchunk, 3)).reshape(-1)[:n]
    spacing = jnp.sqrt(jnp.quantile(d1nn_sq, 0.9))
    thresh = band_hi + spacing + slack_cells * cell

    # block-center grid + 1-NN lower bound for member voxels
    axis_b = (jnp.arange(nb1, dtype=jnp.float32) * 8.0 + 4.0) * cell - 0.5
    gx, gy, gz = jnp.meshgrid(axis_b, axis_b, axis_b, indexing="ij")
    bc = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)    # [NB, 3]
    d1 = jnp.sqrt(jnp.maximum(
        jnp.min(pairwise_sqdist(bc, pts), axis=-1), 0.0))
    r_block = float(np.sqrt(3.0)) * 3.5 * cell  # center -> farthest voxel
    lb = d1 - r_block                                       # [NB]

    active = lb <= thresh
    # BFS-source blocks are always active
    vox = jnp.clip(jnp.floor((pts + 0.5) / cell).astype(jnp.int32),
                   0, boxsize - 1)
    bvox = vox // 8
    active = active.reshape(nb1, nb1, nb1) \
        .at[bvox[:, 0], bvox[:, 1], bvox[:, 2]].set(True).reshape(-1)
    n_active = jnp.sum(active.astype(jnp.int32))
    overflow = n_active > bcap

    (idx_b,) = jnp.nonzero(active, size=bcap, fill_value=0)
    bx = idx_b // (nb1 * nb1)
    by = (idx_b // nb1) % nb1
    bz = idx_b % nb1
    off = jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(8),
                                 jnp.arange(8), indexing="ij"),
                    axis=-1).reshape(512, 3)                 # [512, 3]
    vox_int = (jnp.stack([bx, by, bz], axis=-1)[:, None, :] * 8
               + off[None])                                  # [bcap, 512, 3]
    centers_sel = vox_int.astype(jnp.float32) * cell + 0.5 * cell - 0.5

    dist_b, ok_b = surface_distance_blocked(centers_sel, pts,
                                            n_cand=n_cand,
                                            use_pallas=use_pallas)

    # scatter into the grid (+inf / uncertified elsewhere) as whole-BLOCK
    # rows into the padded blocked layout, then relayout: a row scatter
    # of bcap indices + one transpose is far cheaper on TPU than the
    # bcap*512-element flat scatter it replaces (scatter HLOs serialize
    # per index). Pad-block duplicates rewrite identical values; voxels
    # beyond boxsize land in the pad margin _unblock slices away.
    nb_all = nb1 ** 3
    dist = _unblock(
        jnp.full((nb_all, 512), jnp.inf, jnp.float32).at[idx_b].set(dist_b),
        boxsize, bs_pad)
    okg = _unblock(
        jnp.zeros((nb_all, 512), bool).at[idx_b].set(ok_b),
        boxsize, bs_pad)

    mask, reach = _mask_reach_from_dist(points, dist, boxsize, cell,
                                        band_lo, band_hi)
    # The BFS only ever reads dist at voxels IN reach (expandability of
    # reached voxels; emission on reach) — reach & ~okg is the exact set
    # of reads that aren't yet trustworthy.
    missing = reach & ~okg

    # On-device refinement: recompute missing voxels with the full-N
    # exact kernel (<=scap per round, first-in-C-order) and rerun the
    # BFS, until no read voxel is untrusted. The full-N kernel on <=scap
    # voxels is trivial next to the shortlist stage, and looping on
    # DEVICE keeps the common path at ONE dispatch + one 8-byte stats
    # pull — a host-side round costs ~100ms+ of stdio-tunnel latency and
    # a one-time multi-10s AOT compile of the refine program (measured
    # 77s, scripts/bench_seeds history). Two refinements over the plain
    # reach & ~okg loop:
    # - partial batches: rounds take the first scap of the workset (the
    #   marked-exact subset matches what was computed), so correctness
    #   never depends on scap;
    # - K-layer lookahead: a mis-pruned strip of W voxel layers would
    #   otherwise peel one layer per round (the BFS only exposes the
    #   next layer once the wall falls) — recomputing dilate6^K(reach)
    #   fixes walls before they are hit, ~(K+1) layers per round.
    lookahead = 4

    def _workset(reach, okg):
        grow = reach
        for _ in range(lookahead):
            grow = _dilate6(grow)
        return grow & ~okg

    def _cond(c):
        _, okg, _, _, reach, it = c
        return jnp.any(reach & ~okg) & (it < 16)

    def _body(c):
        dist, okg, mask, _, reach, it = c
        work = _workset(reach, okg).reshape(-1)
        take = work & (jnp.cumsum(work.astype(jnp.int32)) <= scap)
        sub = take.reshape(mask.shape)
        dmiss = _masked_exact_dist(points, sub, boxsize, cell, scap,
                                   chunk)
        dist = jnp.where(sub, dmiss, dist)
        okg = okg | sub
        mask, reach = _mask_reach_from_dist(points, dist, boxsize, cell,
                                            band_lo, band_hi)
        return (dist, okg, mask, sub, reach, it + 1)

    dist, okg, mask, _, reach, _ = jax.lax.while_loop(
        _cond, _body, (dist, okg, mask, missing, reach, jnp.int32(0)))
    missing = reach & ~okg
    # nm > 0 on exit means 16 rounds were not enough (host loop takes
    # over with dynamically bucketed capacity)
    if ecap:
        # fused count + seed extraction: the common path (no missing, no
        # overflow, count <= ecap) then needs ONE dispatch and ONE stats
        # pull total — each extra round trip over the stdio tunnel costs
        # ~15-30 ms (scripts/bench_stages_sc.py; CLAUDE.md)
        centers, count = _extract_inline(mask, boxsize, cell, ecap)
        stats = jnp.stack([jnp.sum(missing.astype(jnp.int32)),
                           overflow.astype(jnp.int32), count])
        return mask, dist, okg, missing, stats, centers
    stats = jnp.stack([jnp.sum(missing.astype(jnp.int32)),
                       overflow.astype(jnp.int32)])
    return mask, dist, okg, missing, stats


@functools.partial(jax.jit, static_argnames=("boxsize", "mcap", "chunk"))
def _refine_round(points, dist, okg, missing, boxsize: int, cell,
                  band_lo, band_hi, mcap: int, chunk: int):
    dmiss = _masked_exact_dist(points, missing, boxsize, cell, mcap, chunk)
    dist = jnp.where(missing, dmiss, dist)
    okg = okg | missing
    mask, reach = _mask_reach_from_dist(points, dist, boxsize, cell,
                                        band_lo, band_hi)
    missing2 = reach & ~okg
    return mask, dist, okg, missing2, jnp.sum(missing2.astype(jnp.int32))


def _fast_exact_mask(pts: jax.Array, boxsize: int, cell: float,
                     band_lo: float, band_hi: float, chunk: int,
                     bcap: int = SHORTLIST_BCAP, n_cand: int = SHORTLIST_NCAND,
                     slack_cells: float = SHORTLIST_SLACK,
                     scap: int = SHORTLIST_SCAP,
                     use_pallas: bool = False):
    """Shortlist-exact seed mask (see block comment above)."""
    nb_total = (-(-boxsize // 8)) ** 3
    bcap = min(bcap, nb_total)
    mask, dist, okg, missing, stats = _shortlist_pass(
        pts, boxsize, cell, band_lo, band_hi, bcap, n_cand, slack_cells,
        scap, chunk, use_pallas)
    n_miss, overflow = (int(x) for x in np.asarray(stats))
    if overflow:
        return _pruned_exact_mask(pts, boxsize, cell, band_lo, band_hi,
                                  chunk)
    for _ in range(8):  # converges in 0-2 rounds in practice
        if n_miss == 0:
            return mask
        mcap = _bucket(n_miss, base=4096)
        mask, dist, okg, missing, nm = _refine_round(
            pts, dist, okg, missing, boxsize, cell, band_lo, band_hi,
            mcap, chunk)
        n_miss = int(nm)
    # safety net: fall back to the dense grid (never hit in testing)
    return seed_mask(pts, boxsize, cell, band_lo, band_hi, chunk)


_SEED_ECAP = 1 << 19  # fixed extraction capacity of the fused pass


def _extract_bucketed(mask, boxsize: int, cell: float):
    count = int(jnp.sum(mask))
    cap = _bucket(max(count, 1))
    centers, _ = extract_seeds(mask, boxsize, cell, cap)
    return centers, count


def _fast_exact_seeds(pts: jax.Array, boxsize: int, cell: float,
                      band_lo: float, band_hi: float, chunk: int,
                      use_pallas: bool = False, bcap: int = SHORTLIST_BCAP,
                      n_cand: int = SHORTLIST_NCAND,
                      slack_cells: float = SHORTLIST_SLACK,
                      scap: int = SHORTLIST_SCAP):
    """Shortlist-exact path fused down to (centers, count).

    Same math as ``_fast_exact_mask`` + ``extract_seeds``, but the count
    and the compacted centers come out of the SAME dispatch as the
    shortlist pass (static capacity ``_SEED_ECAP`` — a power-of-two
    bucket like the classic path would pick for every dense-cloud seed
    shell), so the common path costs ONE dispatch + ONE stats pull.
    Falls back to the mask-based flow on refinement/overflow (rare).
    """
    nb_total = (-(-boxsize // 8)) ** 3
    bcap = min(bcap, nb_total)
    mask, dist, okg, missing, stats, centers = _shortlist_pass(
        pts, boxsize, cell, band_lo, band_hi, bcap, n_cand, slack_cells,
        scap, chunk, use_pallas, _SEED_ECAP)
    n_miss, overflow, count = (int(x) for x in np.asarray(stats))
    if overflow:
        mask = _pruned_exact_mask(pts, boxsize, cell, band_lo, band_hi,
                                  chunk)
        return _extract_bucketed(mask, boxsize, cell)
    refined = False
    for _ in range(8):  # converges in 0-2 rounds in practice
        if n_miss == 0:
            break
        refined = True
        mcap = _bucket(n_miss, base=4096)
        mask, dist, okg, missing, nm = _refine_round(
            pts, dist, okg, missing, boxsize, cell, band_lo, band_hi,
            mcap, chunk)
        n_miss = int(nm)
    else:
        # safety net: fall back to the dense grid (never hit in testing)
        mask = seed_mask(pts, boxsize, cell, band_lo, band_hi, chunk)
    if refined or count > _SEED_ECAP:
        return _extract_bucketed(mask, boxsize, cell)
    return centers, count


def generate_seeds_device_async(points, cell: float = 0.004,
                                band_lo: float = BAND_LO,
                                band_hi: float = BAND_HI,
                                chunk: int = 8192):
    """Shortlist-exact seeds with NO host synchronisation.

    Returns (centers [_SEED_ECAP, 3], stats int32[3]) as DEVICE arrays,
    where stats = (n_missing, overflow, count) from the fused shortlist
    pass, or None when the cloud is outside the shortlist regime
    (N <= 1024, or SAPCU_SEEDS_PATH forces another path).

    Callers MUST validate ``stats`` (n_missing == 0, overflow == 0,
    count <= _SEED_ECAP) before trusting ``centers`` — on violation
    (never observed in testing; the pass refines up to 16 rounds on
    device) fall back to ``generate_seeds_device``. The point: each
    host round-trip over the stdio-relayed tunnel costs ~25-30 ms
    (scripts/prof/_prof_outlier.py), so the serving pipeline defers ALL scalar pulls
    to one batched pull after the last stage is dispatched.
    """
    boxsize = int(round(1.0 / cell))
    pts = jnp.asarray(points, dtype=jnp.float32)
    if not _shortlist_selected(pts.shape[0]):
        return None
    nb_total = (-(-boxsize // 8)) ** 3
    _, _, _, _, stats, centers = _shortlist_pass(
        pts, boxsize, cell, band_lo, band_hi,
        min(SHORTLIST_BCAP, nb_total), SHORTLIST_NCAND, SHORTLIST_SLACK,
        SHORTLIST_SCAP, chunk, _shortlist_use_pallas(), _SEED_ECAP)
    return centers, stats


def generate_seeds_device(points, cell: float = 0.004,
                          band_lo: float = BAND_LO, band_hi: float = BAND_HI,
                          chunk: int = 8192):
    """[N, 3] cloud (host or device) -> (centers [cap, 3] ON DEVICE,
    n_valid int). Only a few scalars cross to the host (refinement /
    bucket-capacity counts) — the axon tunnel makes large device->host
    transfers prohibitively slow, so the seed set never leaves the chip.
    """
    import os

    boxsize = int(round(1.0 / cell))
    pts = jnp.asarray(points, dtype=jnp.float32)
    mask = None
    # SAPCU_SEEDS_PATH: auto (default — shortlist-exact for dense
    # clouds, dense grid for sparse ones, with pruned/full fallbacks) |
    # shortlist | pruned | blocked | full.
    path = os.environ.get("SAPCU_SEEDS_PATH", "auto")
    if _shortlist_selected(pts.shape[0]):
        # Path-selection rationale lives in _shortlist_selected; on TPU
        # the blocked kernel runs as the fused VMEM Pallas kernel by
        # default (SAPCU_PALLAS_BLOCKED=0 for the tiled XLA form).
        return _fast_exact_seeds(pts, boxsize, cell, band_lo, band_hi,
                                 chunk, use_pallas=_shortlist_use_pallas())
    if mask is None and path == "blocked":
        # Block-candidate path: selection/gather work scales with the 128
        # candidates instead of N, so it wins for large clouds. The
        # per-voxel certificate must hold on every voxel the BFS READS
        # (the reach set incl. its stopping boundary); un-certified
        # voxels far from the surface (e.g. deep interior, where the
        # shortlist is a one-sided cap) cannot influence the output.
        # Any certificate violation on the reach set -> exact fallback.
        dist, okg = _blocked_dist(pts, boxsize, cell)
        m, reach = _mask_reach_from_dist(pts, dist, boxsize, cell,
                                         band_lo, band_hi)
        if bool(jnp.all(okg | ~reach)):
            mask = m
    if mask is None and path == "pruned":
        # Pruned-exact (coarse lower-bound pass + full-N exact kernel on
        # the active shell + refinement to full parity — see the block
        # comment above _group_lower_bound). Same result as the dense
        # grid; also the shortlist path's overflow fallback.
        mask = _pruned_exact_mask(pts, boxsize, cell, band_lo, band_hi,
                                  chunk)
    if mask is None:
        # The tiled XLA dense-grid path (SAPCU_SEEDS_PATH=full): exact f32
        # end-to-end, the same math the reference-ELF parity test pins on
        # CPU. Faster on TPU than the Pallas kernel it replaces (1.4s vs
        # 2.5s for the 250^3 grid): Mosaic lowers f32 dots through bf16
        # MXU passes whose ~1e-3 distance error is a quarter of the
        # emission band. The Pallas kernel remains opt-in
        # (SAPCU_PALLAS_SEEDS=1) for experimentation.
        use_pallas = (_on_tpu()
                      and os.environ.get("SAPCU_PALLAS_SEEDS") == "1")
        mask = seed_mask(pts, boxsize, cell, band_lo, band_hi, chunk,
                         use_pallas=use_pallas)
    count = int(jnp.sum(mask))
    cap = _bucket(max(count, 1))
    centers, _ = extract_seeds(mask, boxsize, cell, cap)
    return centers, count


def generate_seeds(points: np.ndarray, cell: float = 0.004,
                   band_lo: float = BAND_LO, band_hi: float = BAND_HI,
                   chunk: int = 8192) -> np.ndarray:
    """Host entry point: [N, 3] normalized cloud -> [S, 3] seed centers.

    Replaces ``os.system(f"./dense {cell} {N}")`` + target.xyz round-trip
    (generation.py:114-117). Transfers the seed array to host; prefer
    ``generate_seeds_device`` inside device-resident pipelines.
    """
    centers, count = generate_seeds_device(points, cell, band_lo, band_hi,
                                           chunk)
    return np.asarray(centers[:count])
