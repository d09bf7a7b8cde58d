"""End-to-end upsampling pipeline: the TPU-native Generator3D6.

Replaces generation.py:50-187 with a fused, batched, jitted flow:

reference (per cloud):                     this module:
  ./dense subprocess + target.xyz     ->   ops.seeds.generate_seeds (device)
  per-chunk KDTree.query + host loop  ->   tiled top-k patch gather (device)
  fn forward per chunk                ->   fn_apply fused in one jitted chunk fn
  SERIAL numpy rotation per seed      ->   vmapped Rodrigues (ops.rotation_to_target)
  fd forward per chunk                ->   fd_apply in the same jitted chunk fn
  host outlier filter (sklearn 30-NN) ->   tiled 30-NN on device + masked stats

Compilation discipline: the refine step has a FIXED shape (mega-tiles of
``mega_chunks`` x batch_size seeds, a lax.map over chunk tiles inside one
jitted program), compiled once per cloud size and re-dispatched from a
host loop; the outlier stage pads its reference set to power-of-two
buckets so a whole PU1K sweep triggers only a handful of compiles.

Semantics preserved (generation.py):
- k_neighbors=100 patches, centered on the seed (:127-129)
- normals L2-normalized (:139), SNN states fresh per chunk (:133,163)
- seed + normal * distance (:172)
- outlier removal: mean 30-NN distance (self included) < 1.5x global mean
  (:177-183)
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from sapcu_tpu import ops
from sapcu_tpu.models import fd_model as fdm
from sapcu_tpu.models import fn_model as fnm
from sapcu_tpu.ops import seeds as seeds_mod

_XHAT = jnp.array([1.0, 0.0, 0.0], jnp.float32)


def _refine_body(fn_params, fn_state, fd_params, fd_state, cloud, seed_tile,
                 fn_cfg_s, fd_cfg_s, k_neighbors: int,
                 compute_dtype: str = "float32"):
    """One fused seeds->patches->fn->rotate->fd->move step for a fixed-size
    seed tile [C, 3]. Returns moved points [C, 3].

    compute_dtype="bfloat16" runs the two models in bf16 (f32 MXU
    accumulation, geometry — kNN, rotations, the final move — stays f32):
    ~2x MXU throughput and half the activation bandwidth for a small,
    documented accuracy cost.
    """
    fn_cfg, fd_cfg = dict(fn_cfg_s), dict(fd_cfg_s)
    k = min(k_neighbors, cloud.shape[0])
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, tree)

    if compute_dtype != "float32":
        fn_params, fn_state = cast(fn_params), cast(fn_state)
        fd_params, fd_state = cast(fd_params), cast(fd_state)

    d = ops.pairwise_sqdist(seed_tile, cloud)
    _, idx = jax.lax.top_k(-d, k)
    patch = cloud[idx] - seed_tile[:, None, :]              # [C, k, 3]

    normals, _ = fnm.fn_apply(fn_params, fn_state, patch.astype(cdt), fn_cfg,
                              training=False)
    normals = normals.astype(jnp.float32)
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)

    rot = ops.rotation_to_target(normals, _XHAT)
    rotated = ops.rotate_points(rot, patch)

    dist, _, _ = fdm.fd_apply(fd_params, fd_state, rotated.astype(cdt),
                              fd_cfg, training=False)
    return seed_tile + normals * dist[:, None].astype(jnp.float32)


refine_chunk = functools.partial(
    jax.jit, static_argnames=("fn_cfg_s", "fd_cfg_s", "k_neighbors",
                              "compute_dtype"))(_refine_body)


@functools.partial(jax.jit, static_argnames=("fn_cfg_s", "fd_cfg_s",
                                             "k_neighbors", "compute_dtype",
                                             "chunk"))
def refine_mega(fn_params, fn_state, fd_params, fd_state, cloud, seeds,
                fn_cfg_s, fd_cfg_s, k_neighbors: int,
                compute_dtype: str = "float32", chunk: int = 1024):
    """Refine a mega-tile of seeds [M, 3] (M a multiple of ``chunk``) as ONE
    dispatch: a lax.map over chunk-sized tiles inside a single jitted call.
    Peak memory equals one chunk's activations (map is sequential), while
    the host pays one dispatch per mega-tile instead of per chunk — the
    stdio-relayed tunnel makes per-dispatch latency expensive."""
    tiles = seeds.reshape(-1, chunk, 3)

    def body(tile):
        return _refine_body(fn_params, fn_state, fd_params, fd_state,
                            cloud, tile, fn_cfg_s, fd_cfg_s, k_neighbors,
                            compute_dtype)

    return jax.lax.map(body, tiles).reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _outlier_mask(pts, valid, threshold, k: int = 30, chunk: int = 2048):
    """Reference outlier rule (generation.py:177-183) with padding mask."""
    big = 1e3
    safe = jnp.where(valid[:, None], pts, big + pts)
    d, _ = ops.knn_tiled(safe, safe, k=k, chunk=chunk)
    d = jnp.sqrt(jnp.maximum(d, 0.0))
    avg = jnp.mean(d, axis=-1)
    nvalid = jnp.maximum(jnp.sum(valid), 1)
    avg_total = jnp.sum(jnp.where(valid, avg, 0.0)) / nvalid
    return valid & (avg < avg_total * threshold)


def _bucket(n: int, base: int = 8192) -> int:
    cap = base
    while cap < n:
        cap *= 2
    return cap


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact(pts: jax.Array, keep: jax.Array, cap: int
             ) -> tuple[jax.Array, jax.Array]:
    """Gather kept rows to the front (order-preserving), pad with row 0."""
    (idx,) = jnp.nonzero(keep, size=cap, fill_value=0)
    return pts[idx], jnp.sum(keep.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint",))
def _fps_select(pts: jax.Array, n_valid: jax.Array, npoint: int) -> jax.Array:
    idx = ops.farthest_point_sample_masked(pts, npoint, n_valid)
    return pts[idx]


class Upsampler:
    """Drop-in functional analog of Generator3D6 (generation.py:50-187).

    Args mirror the reference defaults: k_neighbors=100,
    dense_spacing=0.004, outlier_threshold=1.5; batch_size is the on-device
    chunk length (generate.py:135 uses 256).
    """

    def __init__(self, fn_bundle, fd_bundle, k_neighbors: int = 100,
                 dense_spacing: float = 0.004,
                 outlier_threshold: float = 1.5, batch_size: int = 256,
                 seed_chunk: int = 8192, compute_dtype: str = "float32",
                 mega_chunks: int = 8):
        self.fn_params, self.fn_state, fn_cfg = fn_bundle
        self.fd_params, self.fd_state, fd_cfg = fd_bundle
        self.fn_cfg_s = tuple(sorted(fn_cfg.items()))
        self.fd_cfg_s = tuple(sorted(fd_cfg.items()))
        self.k_neighbors = k_neighbors
        self.dense_spacing = dense_spacing
        self.outlier_threshold = outlier_threshold
        self.batch_size = batch_size
        self.seed_chunk = seed_chunk
        self.compute_dtype = compute_dtype
        self.mega_chunks = mega_chunks

    def upsample(self, data: np.ndarray) -> np.ndarray:
        """[N, 3] or [1, N, 3] normalized cloud -> [M, 3] upsampled (host).

        Legacy host-array API (Generator3D6.upsample); transfers the full
        result. Prefer ``upsample_device``/``upsample_to`` where the
        result feeds further device work — the tunnel makes large
        device->host transfers the dominant cost.
        """
        pts, n = self.upsample_device(data)
        return np.asarray(pts[:n])

    def upsample_device(self, data) -> tuple[jax.Array, int]:
        """Full device-resident pipeline -> (padded points ON DEVICE,
        n_valid). Only scalar counts cross to the host."""
        cloud = jnp.asarray(data, dtype=jnp.float32)
        if cloud.ndim == 3:
            cloud = cloud[0]
        seed_pts, n_seeds = seeds_mod.generate_seeds_device(
            cloud, cell=self.dense_spacing, chunk=self.seed_chunk)
        return self.refine_device(cloud, seed_pts, n_seeds)

    def upsample_to(self, data, target_points: int) -> jax.Array:
        """Pipeline + on-device FPS to target_points -> [target, 3] device
        array (the generate.py:95-99 FPS step without the host round-trip)."""
        pts, n = self.upsample_device(data)
        assert n >= target_points, \
            f"Generated {n} points, expected >= {target_points}"
        return _fps_select(pts, jnp.asarray(n), target_points)

    def generate_seeds(self, cloud: np.ndarray) -> np.ndarray:
        return seeds_mod.generate_seeds(cloud, cell=self.dense_spacing,
                                        chunk=self.seed_chunk)

    def refine_device(self, cloud, seed_pts, n_seeds: int
                      ) -> tuple[jax.Array, int]:
        """seeds [cap, 3] on device (valid count n_seeds) -> (compacted
        outlier-filtered points [cap, 3] on device, n_valid)."""
        if n_seeds == 0:
            return jnp.zeros((1, 3), jnp.float32), 0
        c = self.batch_size
        cloud_j = jnp.asarray(cloud, dtype=jnp.float32)

        # only refine chunks containing valid seeds (the buffer capacity is
        # a power-of-two bucket, often ~2x the count — skipping pad chunks
        # halves the hot-loop work); mega-tiles of `mega_chunks` chunks per
        # dispatch bound host-side dispatch latency (<= ~(mega-1)*c waste
        # on the last tile)
        mega = self.mega_chunks * c
        n_mega = -(-n_seeds // mega)
        need = n_mega * mega
        if seed_pts.shape[0] < need:
            seed_pts = jnp.pad(seed_pts,
                               ((0, need - seed_pts.shape[0]), (0, 0)))
        moved_tiles = []
        for i in range(n_mega):
            moved_tiles.append(refine_mega(
                self.fn_params, self.fn_state, self.fd_params, self.fd_state,
                cloud_j, jax.lax.dynamic_slice_in_dim(seed_pts, i * mega,
                                                      mega),
                self.fn_cfg_s, self.fd_cfg_s, self.k_neighbors,
                self.compute_dtype, c))
        moved = jnp.concatenate(moved_tiles, axis=0)
        cap = _bucket(n_seeds)
        if moved.shape[0] < cap:
            moved = jnp.pad(moved, ((0, cap - moved.shape[0]), (0, 0)))
        else:
            moved = moved[:cap]

        valid = jnp.arange(cap) < n_seeds
        keep = _outlier_mask(moved, valid, self.outlier_threshold)
        out, n_keep = _compact(moved, keep, cap)
        return out, int(n_keep)

    def refine(self, cloud: np.ndarray, seed_pts: np.ndarray) -> np.ndarray:
        """Host-array convenience wrapper around refine_device."""
        s = seed_pts.shape[0]
        if s == 0:
            return np.zeros((0, 3), np.float32)
        cap = _bucket(s)
        seeds_p = jnp.asarray(np.pad(seed_pts.astype(np.float32),
                                     ((0, cap - s), (0, 0))))
        out, n = self.refine_device(cloud, seeds_p, s)
        return np.asarray(out[:n])

    def multi_scale_upsample(self, data: np.ndarray,
                             num_passes: int = 1) -> np.ndarray:
        """Multi-pass upsampling (SNNPointCloudGenerator.multi_scale_upsample,
        generation.py:205-220)."""
        result = np.asarray(data, dtype=np.float32)
        if result.ndim == 3:
            result = result[0]
        for _ in range(num_passes):
            result = self.upsample(result)
        return result


def normalize_pointcloud(cloud: np.ndarray):
    """bbox-center/scale normalization (generate.py:43-53)."""
    lo, hi = cloud.min(axis=0), cloud.max(axis=0)
    loc = (lo + hi) / 2
    scale = (hi - lo).max()
    scale_inv = 1.0 / scale if scale > 0 else 1.0
    return (cloud - loc) * scale_inv, loc, scale
