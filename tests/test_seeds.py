"""Golden parity tests: JAX seed generator vs the reference `dense` binary.

The prebuilt reference ELF (/root/reference/dense) is run as a black-box
oracle on the same synthetic cloud; the emitted seed-voxel sets must match
exactly (same voxel ids), validating the 10-NN + 8-triangle band distance
AND the BFS reachability semantics end to end.
"""
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from sapcu_tpu.ops import seeds

DENSE_BIN = "/root/reference/dense"


def _sphere(n, radius, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * radius).astype(np.float32)


def _voxel_keys(centers, cell):
    return set(map(tuple, np.round((centers + 0.5) / cell - 0.5).astype(int)))


@pytest.mark.skipif(not os.path.exists(DENSE_BIN), reason="oracle missing")
def test_seed_parity_with_reference_binary(tmp_path):
    cell = 0.02
    pts = _sphere(800, 0.40)
    np.savetxt(tmp_path / "test.xyz", pts.astype(np.float64), fmt="%.6f")
    subprocess.run([DENSE_BIN, str(cell), "800"], cwd=tmp_path, check=True)
    oracle = np.loadtxt(tmp_path / "target.xyz")
    assert oracle.shape[0] > 100  # non-trivial shell

    got = seeds.generate_seeds(pts, cell=cell, chunk=4096)
    kg, ko = _voxel_keys(got, cell), _voxel_keys(oracle, cell)
    assert kg == ko, (f"mismatch: {len(kg - ko)} only-jax, "
                      f"{len(ko - kg)} only-oracle of {len(ko)}")


def test_surface_distance_plane():
    # points on the z=0 plane; voxel-center distances == |z| when the local
    # triangles tile the plane around the query
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(-0.3, 0.3, size=(400, 2)),
                          np.zeros((400, 1))], axis=1).astype(np.float32)
    centers = np.array([[0.0, 0.0, 0.05], [0.05, -0.05, -0.12],
                        [0.0, 0.0, 0.0]], dtype=np.float32)
    d = np.asarray(seeds.surface_distance(jnp.asarray(centers),
                                          jnp.asarray(pts), chunk=4))
    np.testing.assert_allclose(d[:2], [0.05, 0.12], atol=2e-3)
    # on-plane query: distance is to the nearest local triangle, bounded by
    # the in-plane NN spacing
    assert d[2] < 0.02


def test_bfs_blocks_unreachable_band():
    # two parallel planes far apart: seeds from plane A must not emit
    # band voxels around plane B (no BFS path through the > band_hi gap)
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    xy = rng.uniform(-0.4, 0.4, size=(600, 2)).astype(np.float32)
    plane_a = np.concatenate([xy, np.full((600, 1), -0.3, np.float32)], axis=1)
    cell = 0.02
    boxsize = int(round(1 / cell))
    mask = np.asarray(seeds.seed_mask(jnp.asarray(plane_a), boxsize, cell,
                                      chunk=4096))
    zs = np.nonzero(mask)[2]
    if len(zs):
        # all emitted voxels hug plane A (z = -0.3 -> index 10)
        assert zs.min() >= 7 and zs.max() <= 13


def test_pruned_exact_equals_dense_grid():
    """The pruned path (coarse prune + refinement) must reproduce the
    dense-grid mask bit-for-bit — including with zero slack, where the
    refinement loop has to grow the computed set itself."""
    from sapcu_tpu.ops import seeds as sm

    rng = np.random.default_rng(5)
    v = rng.normal(size=(256, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = jnp.asarray(v * 0.35)
    boxsize = 50
    cell = 1.0 / boxsize
    dense = np.asarray(sm.seed_mask(pts, boxsize, cell, chunk=4096))
    for slack in (5.0, 0.0):
        pruned = np.asarray(sm._pruned_exact_mask(
            pts, boxsize, cell, sm.BAND_LO, sm.BAND_HI, 4096,
            slack_cells=slack))
        assert (pruned == dense).all(), f"slack={slack}"


def test_shortlist_exact_equals_dense_grid():
    """The shortlist path (block prune + per-block candidate 10-NN +
    certificate + refinement) must reproduce the dense-grid mask
    bit-for-bit: with zero slack (refinement grows the shell itself),
    with a starved shortlist (n_cand=16 -> certificates fail and the
    full-N refinement takes over), and through the bcap-overflow
    fallback."""
    from sapcu_tpu.ops import seeds as sm

    rng = np.random.default_rng(11)
    v = rng.normal(size=(256, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = jnp.asarray(v * 0.35)
    boxsize = 50
    cell = 1.0 / boxsize
    dense = np.asarray(sm.seed_mask(pts, boxsize, cell, chunk=4096))
    for kw in ({}, {"slack_cells": 0.0}, {"n_cand": 16}, {"bcap": 4}):
        got = np.asarray(sm._fast_exact_mask(
            pts, boxsize, cell, sm.BAND_LO, sm.BAND_HI, 4096, **kw))
        assert (got == dense).all(), f"kwargs={kw}"


def test_fast_exact_seeds_matches_mask_plus_extract():
    """The fused one-dispatch (centers, count) path == the classic
    mask -> count -> extract flow, on the common path AND through the
    starved-shortlist refinement fallback."""
    from sapcu_tpu.ops import seeds as sm

    rng = np.random.default_rng(12)
    v = rng.normal(size=(256, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = jnp.asarray(v * 0.35)
    boxsize = 50
    cell = 1.0 / boxsize
    mask = sm._fast_exact_mask(pts, boxsize, cell, sm.BAND_LO,
                               sm.BAND_HI, 4096)
    want_centers, want_count = sm._extract_bucketed(mask, boxsize, cell)
    for kw in ({}, {"n_cand": 16}):
        got_centers, got_count = sm._fast_exact_seeds(
            pts, boxsize, cell, sm.BAND_LO, sm.BAND_HI, 4096, **kw)
        assert got_count == want_count, kw
        np.testing.assert_array_equal(
            np.asarray(got_centers[:got_count]),
            np.asarray(want_centers[:want_count]), err_msg=str(kw))
