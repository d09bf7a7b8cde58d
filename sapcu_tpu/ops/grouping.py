"""pointnet2-style grouping ops + PCA normal estimation.

TPU-native equivalents of the vendored CUDA extension surface
(external/Meta-PU_evaluation/pointnet2/_ext-src/src/{sampling, ball_query,
group_points, interpolate}*.cu — SURVEY.md §2.3 N2): expressed as masked
dense ops (MXU pairwise distances + top-k/gather) instead of per-thread
scatter loops. FPS lives in pointops.farthest_point_sample.

Also hosts `pca_normals`, the batched analog of
scripts/generate_gt_normals.py:33-51 (eigenvector of the smallest
eigenvalue of each point's kNN covariance).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sapcu_tpu.ops.pointops import index_points, knn, pairwise_sqdist


def ball_query(radius: float, nsample: int, xyz: jax.Array,
               new_xyz: jax.Array) -> jax.Array:
    """Indices of up to ``nsample`` points within ``radius`` of each query.

    xyz: [B, N, 3], new_xyz: [B, S, 3] -> int32 [B, S, nsample].
    Matches the CUDA kernel's fill behaviour: slots beyond the in-ball
    count repeat the FIRST in-ball index; queries with no in-ball point
    return index 0 (ball_query_gpu.cu semantics).
    """
    d = pairwise_sqdist(new_xyz, xyz)                     # [B, S, N]
    in_ball = d < radius * radius
    n = xyz.shape[-2]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    # order in-ball points first (by index), everything else after
    rank = jnp.where(in_ball, col, n + col)
    idx = jnp.argsort(rank, axis=-1)[..., :nsample].astype(jnp.int32)
    took = jnp.take_along_axis(rank, idx, axis=-1) < n
    first = idx[..., :1]
    return jnp.where(took, idx, first)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather features by group indices: [B, N, C], [B, S, K] -> [B, S, K, C].
    (group_points_gpu.cu equivalent; pure gather under XLA.)"""
    return index_points(points, idx)


def three_nn(unknown: jax.Array, known: jax.Array
             ) -> tuple[jax.Array, jax.Array]:
    """3 nearest known points per unknown point.

    unknown: [B, N, 3], known: [B, M, 3] -> (dist [B, N, 3], idx [B, N, 3])
    with EUCLIDEAN distances (interpolate_gpu.cu returns sqrt'd values).
    """
    d = pairwise_sqdist(unknown, known)
    neg, idx = jax.lax.top_k(-d, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(points: jax.Array, idx: jax.Array,
                      weight: jax.Array) -> jax.Array:
    """Weighted sum of 3 neighbour features: [B, M, C], [B, N, 3],
    [B, N, 3] -> [B, N, C]."""
    gathered = index_points(points, idx)                  # [B, N, 3, C]
    return jnp.sum(gathered * weight[..., None], axis=-2)


def interpolate_features(unknown: jax.Array, known: jax.Array,
                         feats: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance 3-NN feature interpolation (the standard
    three_nn + three_interpolate composition)."""
    dist, idx = three_nn(unknown, known)
    w = 1.0 / (dist + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return three_interpolate(feats, idx, w)


@functools.partial(jax.jit, static_argnames=("k",))
def pca_normals(points: jax.Array, k: int = 30) -> jax.Array:
    """Unoriented PCA normals: [N, 3] -> [N, 3] unit vectors.

    Batched replacement for scripts/generate_gt_normals.py:33-51: for each
    point, the eigenvector of the smallest eigenvalue of its kNN
    covariance. One batched eigh instead of a per-point Python loop.
    """
    idx = knn(points[None], k)[0]                          # [N, k]
    nbrs = points[idx]                                     # [N, k, 3]
    centered = nbrs - jnp.mean(nbrs, axis=1, keepdims=True)
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = jnp.linalg.eigh(cov)                         # ascending
    normals = vecs[..., 0]
    return normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
