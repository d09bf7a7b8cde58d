"""Tests for grouping ops and PCA normals."""
import jax.numpy as jnp
import numpy as np

from sapcu_tpu import ops


def test_ball_query_semantics(rng):
    xyz = rng.normal(size=(1, 64, 3)).astype(np.float32)
    new_xyz = xyz[:, :8]
    r, ns = 0.5, 16
    idx = np.asarray(ops.ball_query(r, ns, jnp.asarray(xyz),
                                    jnp.asarray(new_xyz)))[0]
    d = np.linalg.norm(new_xyz[0][:, None] - xyz[0][None], axis=-1)
    for i in range(8):
        inball = set(np.nonzero(d[i] < r)[0])
        got = idx[i]
        # all returned indices are in-ball (query point itself is in-ball)
        assert set(got).issubset(inball)
        # fill semantics: duplicates of the first in-ball index
        want_n = min(len(inball), 16)
        assert len(set(got)) == want_n


def test_three_interpolate_reconstructs_linear_field(rng):
    known = rng.normal(size=(1, 100, 3)).astype(np.float32)
    w = np.array([[1.5], [-2.0], [0.7]], dtype=np.float32)
    feats = known @ w  # linear field
    unknown = known[:, :20] + 1e-4
    out = np.asarray(ops.interpolate_features(
        jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats)))
    want = unknown @ w
    np.testing.assert_allclose(out, want, atol=1e-2)


def test_three_nn_distances(rng):
    a = rng.normal(size=(1, 10, 3)).astype(np.float32)
    b = rng.normal(size=(1, 30, 3)).astype(np.float32)
    dist, idx = ops.three_nn(jnp.asarray(a), jnp.asarray(b))
    d = np.linalg.norm(a[0][:, None] - b[0][None], axis=-1)
    want = np.sort(d, axis=-1)[:, :3]
    np.testing.assert_allclose(np.asarray(dist)[0], want, atol=1e-5)


def test_pca_normals_on_sphere(rng):
    v = rng.normal(size=(512, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * 0.5).astype(np.float32)
    normals = np.asarray(ops.pca_normals(jnp.asarray(pts), k=16))
    # unoriented: |cos| with the true radial normal should be ~1
    cos = np.abs(np.sum(normals * v, axis=1))
    assert np.mean(cos) > 0.99
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0,
                               atol=1e-5)
