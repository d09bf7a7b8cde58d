"""Native C++ seed generator: build + parity with the JAX kernel and the
reference binary oracle."""
import os
import shutil
import subprocess

import numpy as np
import pytest

from sapcu_tpu.native import build, generate_seeds_native
from sapcu_tpu.ops import seeds as seeds_mod

gxx = shutil.which("g++")
pytestmark = pytest.mark.skipif(gxx is None, reason="no g++")


def _sphere(n, r, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def _keys(a, cell):
    return set(map(tuple, np.round((a + 0.5) / cell - 0.5).astype(int)))


def test_native_matches_jax_kernel():
    cell = 0.02
    pts = _sphere(800, 0.40)
    native = generate_seeds_native(pts, cell=cell)
    jaxs = seeds_mod.generate_seeds(pts, cell=cell, chunk=4096)
    assert _keys(native, cell) == _keys(jaxs, cell)


def test_native_cli_contract(tmp_path):
    """./seed_gen <cell> <n> reads test.xyz, writes target.xyz (the
    reference dense.cpp:180-184 file contract)."""
    build()
    from sapcu_tpu import native as native_mod
    exe = os.path.join(os.path.dirname(native_mod.__file__), "seed_gen")
    pts = _sphere(500, 0.42, seed=3).astype(np.float64)
    np.savetxt(tmp_path / "test.xyz", pts, fmt="%.6f")
    subprocess.run([exe, "0.02", "500"], cwd=tmp_path, check=True)
    out = np.loadtxt(tmp_path / "target.xyz")
    assert out.ndim == 2 and out.shape[1] == 3 and out.shape[0] > 50
    want = generate_seeds_native(pts, cell=0.02)
    assert _keys(out, 0.02) == _keys(want, 0.02)
