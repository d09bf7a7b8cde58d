"""ctypes bindings + lazy build for the native seed generator.

The production seed path is the TPU kernel (sapcu_tpu.ops.seeds); this
module exposes the C++ host tool both as a shared library (ctypes, no
subprocess or file round-trip — unlike the reference's os.system +
target.xyz contract at generation.py:114-117) and as a CLI-compatible
executable ``seed_gen``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "seed_gen.cpp")
_LIB = os.path.join(_DIR, "libseed_gen.so")
_BIN = os.path.join(_DIR, "seed_gen")


def build(force: bool = False) -> str:
    """Compile the shared library (and CLI tool) if missing or stale."""
    def stale(target):
        return (not os.path.exists(target)
                or os.path.getmtime(target) < os.path.getmtime(_SRC))

    # Portable -O3 (no -march=native): artifacts are built lazily per host
    # and gitignored, so they must run wherever they land.
    if force or stale(_LIB):
        subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                        "-DSEED_GEN_NO_MAIN", "-o", _LIB, _SRC], check=True)
    if force or stale(_BIN):
        subprocess.run(["g++", "-O3", "-o", _BIN, _SRC], check=True)
    return _LIB


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        build()
        _lib = ctypes.CDLL(_LIB)
        _lib.seed_generate.restype = ctypes.c_long
        _lib.seed_generate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ]
    return _lib


def generate_seeds_native(points: np.ndarray, cell: float = 0.004,
                          band_lo: float = 0.0110,
                          band_hi: float = 0.0150) -> np.ndarray:
    """[N, 3] normalized cloud -> [S, 3] seed centers, via the C++ library."""
    lib = _get_lib()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    cap = max(1 << 20, n * 64)
    out = np.empty((cap, 3), dtype=np.float64)
    cnt = lib.seed_generate(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, cell,
        band_lo, band_hi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap)
    if cnt > cap:
        out = np.empty((cnt, 3), dtype=np.float64)
        cnt = lib.seed_generate(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, cell,
            band_lo, band_hi,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cnt)
    return out[:cnt].astype(np.float32)
