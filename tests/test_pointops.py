"""Unit tests for sapcu_tpu.ops.pointops against numpy/scipy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from sapcu_tpu import ops


def test_pairwise_sqdist_matches_numpy(rng):
    src = rng.normal(size=(2, 7, 3)).astype(np.float32)
    dst = rng.normal(size=(2, 5, 3)).astype(np.float32)
    got = np.asarray(ops.pairwise_sqdist(jnp.asarray(src), jnp.asarray(dst)))
    want = np.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_knn_matches_kdtree(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    k = 8
    idx = np.asarray(ops.knn(jnp.asarray(pts)[None], k))[0]
    _, want = cKDTree(pts).query(pts, k=k)
    # first neighbour is self
    np.testing.assert_array_equal(idx[:, 0], np.arange(64))
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(want, axis=1))


def test_knn_clamps_k_to_n(rng):
    pts = rng.normal(size=(1, 5, 3)).astype(np.float32)
    idx = ops.knn(jnp.asarray(pts), 12)
    assert idx.shape == (1, 5, 5)


def test_index_points_2d_and_3d(rng):
    pts = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx2 = rng.integers(0, 10, size=(2, 6)).astype(np.int32)
    idx3 = rng.integers(0, 10, size=(2, 6, 3)).astype(np.int32)
    g2 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx2)))
    g3 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx3)))
    for b in range(2):
        np.testing.assert_array_equal(g2[b], pts[b][idx2[b]])
        np.testing.assert_array_equal(g3[b], pts[b][idx3[b]])


def test_graph_feature_semantics(rng):
    x = rng.normal(size=(1, 12, 5)).astype(np.float32)
    k = 4
    feat = np.asarray(ops.graph_feature(jnp.asarray(x), k=k))
    assert feat.shape == (1, 12, k, 10)
    idx = np.asarray(ops.knn(jnp.asarray(x), k))[0]
    for i in range(12):
        for j in range(k):
            nb = x[0, idx[i, j]]
            np.testing.assert_allclose(feat[0, i, j, :5], nb - x[0, i], atol=1e-6)
            np.testing.assert_allclose(feat[0, i, j, 5:], nb, atol=1e-6)


def _fps_numpy(xyz, npoint):
    """Oracle mirroring generate.py:56-74."""
    n = xyz.shape[0]
    centroids = np.zeros(npoint, dtype=np.int64)
    distance = np.full(n, 1e32)
    farthest = n // 2
    for i in range(npoint):
        centroids[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        distance = np.minimum(distance, d)
        farthest = int(np.argmax(distance))
    return centroids


def test_fps_matches_reference_semantics(rng):
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(pts), 32))
    want = _fps_numpy(pts, 32)
    np.testing.assert_array_equal(got, want)


def _rotmat_numpy(vec1, vec2):
    """Oracle mirroring generation.py:30-47."""
    a = vec1 / np.linalg.norm(vec1)
    b = vec2 / np.linalg.norm(vec2)
    v = np.cross(a, b)
    if any(v):
        c = np.dot(a, b)
        s = np.linalg.norm(v)
        kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        return np.eye(3) + kmat + kmat.dot(kmat) * ((1 - c) / (s ** 2))
    return np.eye(3)


def test_rotation_to_target_matches_reference(rng):
    target = np.array([1.0, 0.0, 0.0], dtype=np.float32)
    vecs = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(ops.rotation_to_target(jnp.asarray(vecs), jnp.asarray(target)))
    for i in range(50):
        np.testing.assert_allclose(got[i], _rotmat_numpy(vecs[i], target), atol=1e-4)
    # rotated vector aligns with +x
    rotated = np.einsum("nij,nj->ni", got, vecs / np.linalg.norm(vecs, axis=1, keepdims=True))
    np.testing.assert_allclose(rotated[:, 0], 1.0, atol=1e-4)


def test_rotation_degenerate_cases():
    x = jnp.array([1.0, 0.0, 0.0])
    same = ops.rotation_to_target(x, x)
    np.testing.assert_allclose(np.asarray(same), np.eye(3), atol=1e-6)
    # antiparallel: reference quirk returns identity (generation.py:41-47)
    anti = ops.rotation_to_target(-x, x)
    np.testing.assert_allclose(np.asarray(anti), np.eye(3), atol=1e-6)


def test_point_triangle_closest_regions():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    cases = {
        (-1.0, -1.0, 0.0): [0, 0, 0],          # vertex a
        (2.0, -0.5, 0.0): [1, 0, 0],            # vertex b
        (-0.5, 2.0, 0.0): [0, 1, 0],            # vertex c
        (0.5, -1.0, 0.0): [0.5, 0, 0],          # edge ab
        (-1.0, 0.5, 0.0): [0, 0.5, 0],          # edge ca
        (1.0, 1.0, 0.0): [0.5, 0.5, 0],         # edge bc
        (0.25, 0.25, 5.0): [0.25, 0.25, 0],     # interior (projected)
    }
    for p, want in cases.items():
        got = np.asarray(ops.point_triangle_closest(a, b, c, jnp.array(p)))
        np.testing.assert_allclose(got, np.array(want), atol=1e-6, err_msg=str(p))


def test_point_triangle_closest_batched(rng):
    tri = rng.normal(size=(3, 20, 3)).astype(np.float32)
    p = rng.normal(size=(20, 3)).astype(np.float32)
    got = np.asarray(ops.point_triangle_closest(*[jnp.asarray(t) for t in tri], jnp.asarray(p)))
    for i in range(20):
        single = np.asarray(ops.point_triangle_closest(
            jnp.asarray(tri[0, i]), jnp.asarray(tri[1, i]), jnp.asarray(tri[2, i]), jnp.asarray(p[i])))
        np.testing.assert_allclose(got[i], single, atol=1e-6)
        # the closest point must not be farther than all three vertices
        d = np.linalg.norm(got[i] - p[i])
        dv = min(np.linalg.norm(tri[j, i] - p[i]) for j in range(3))
        assert d <= dv + 1e-5


def test_knn_tiled_matches_dense(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32)
    r = rng.normal(size=(200, 3)).astype(np.float32)
    d, idx = ops.knn_tiled(jnp.asarray(q), jnp.asarray(r), k=10, chunk=128)
    _, want = cKDTree(r).query(q, k=10)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1), np.sort(want, axis=1))
    wd = np.sum((q[:, None, :] - r[np.asarray(idx)]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(d), wd, atol=1e-4)


def test_fps_masked_matches_unmasked(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    import jax.numpy as jnp2
    padded = np.pad(pts, ((0, 28), (0, 0)), constant_values=99.0)
    got = np.asarray(ops.farthest_point_sample_masked(
        jnp.asarray(padded), 32, jnp.asarray(100)))
    want = np.asarray(ops.farthest_point_sample(jnp.asarray(pts), 32))
    np.testing.assert_array_equal(got, want)
    assert got.max() < 100  # never selects pad rows


def test_index_points_matmul_exact(rng):
    pts = rng.normal(size=(2, 64, 32)).astype(np.float32)
    idx = rng.integers(0, 64, size=(2, 10, 8)).astype(np.int32)
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    got = np.asarray(ops.index_points_matmul(
        jnp.asarray(pts).astype(jnp.bfloat16), jnp.asarray(idx)))
    # one-hot matmul gathers are exact (single source row per output)
    np.testing.assert_array_equal(got.astype(np.float32),
                                  want.astype(jnp.bfloat16).astype(np.float32))
    # the dispatching index_points agrees in bf16 too
    got2 = np.asarray(ops.index_points(
        jnp.asarray(pts).astype(jnp.bfloat16), jnp.asarray(idx)))
    np.testing.assert_array_equal(got, got2)


def test_smallest_eigvec_sym3_matches_eigh():
    rng = np.random.default_rng(11)
    a = rng.normal(size=(200, 3, 3)).astype(np.float32)
    a = (a + a.transpose(0, 2, 1)) / 2
    # plane-like covariances (the local_plane regime)
    pts = rng.normal(size=(100, 16, 3)).astype(np.float32)
    pts[..., 2] *= 0.01
    c = pts - pts.mean(1, keepdims=True)
    a = np.concatenate([a, np.einsum("nmi,nmj->nij", c, c)])
    v = np.asarray(ops.smallest_eigvec_sym3(jnp.asarray(a)))
    w, vecs = np.linalg.eigh(a)
    cos = np.abs(np.sum(v * vecs[..., 0], axis=-1))
    assert cos.min() > 1 - 1e-4
    # isotropic degenerate input: still a unit vector, no NaN
    iso = np.asarray(ops.smallest_eigvec_sym3(jnp.eye(3)))
    assert np.isfinite(iso).all() and abs(np.linalg.norm(iso) - 1) < 1e-5


def test_local_plane_oriented_toward_centroid():
    rng = np.random.default_rng(12)
    # flat patch in z=0.01 plane, query at origin: normal ~ +/-z, oriented
    # toward the patch (positive z), dist ~ 0.01
    xy = rng.normal(size=(5, 16, 2)).astype(np.float32) * 0.05
    rel = np.concatenate([xy, np.full((5, 16, 1), 0.01, np.float32)], -1)
    n, d = ops.local_plane(jnp.asarray(rel))
    n, d = np.asarray(n), np.asarray(d)
    assert (n[:, 2] > 0.99).all()
    np.testing.assert_allclose(d, 0.01, atol=1e-4)
