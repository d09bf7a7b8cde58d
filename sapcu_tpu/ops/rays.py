"""Vectorised ray-triangle intersection (Moller-Trumbore).

TPU-native replacement for the pyembree ray casting the reference's fd
ground-truth sampler depends on (scripts/sample_mesh-rd.py:99-151): all
rays against all triangles as one batched computation instead of a BVH —
for the subsampled training meshes (thousands of faces) the dense product
is a single MXU-friendly pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def first_hit(origins: jax.Array, dirs: jax.Array, v0: jax.Array,
              v1: jax.Array, v2: jax.Array, chunk: int = 1024,
              eps: float = 1e-9) -> tuple[jax.Array, jax.Array]:
    """First triangle hit per ray.

    origins, dirs: [Q, 3]; v0/v1/v2: [F, 3].
    Returns (t [Q], face_idx int32 [Q]) with t=inf / idx=-1 for misses.
    Tiled over rays so peak memory is chunk*F.
    """
    q = origins.shape[0]
    pad = (-q) % chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)))
    e1, e2 = v1 - v0, v2 - v0

    def one(args):
        o_t, d_t = args                                     # [C, 3]
        h = jnp.cross(d_t[:, None, :], e2[None, :, :])      # [C, F, 3]
        a = jnp.einsum("fi,cfi->cf", e1, h)
        f = jnp.where(jnp.abs(a) < eps, jnp.inf, 1.0 / a)
        s = o_t[:, None, :] - v0[None, :, :]
        u = f * jnp.einsum("cfi,cfi->cf", s, h)
        qv = jnp.cross(s, jnp.broadcast_to(e1, s.shape))
        v = f * jnp.einsum("ci,cfi->cf", d_t, qv)
        t = f * jnp.einsum("fi,cfi->cf", e2, qv)
        hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps) & jnp.isfinite(t)
        t = jnp.where(hit, t, jnp.inf)
        idx = jnp.argmin(t, axis=-1)
        tmin = jnp.min(t, axis=-1)
        return tmin, jnp.where(jnp.isfinite(tmin), idx, -1).astype(jnp.int32)

    ts, idxs = jax.lax.map(one, (o.reshape(-1, chunk, 3),
                                 d.reshape(-1, chunk, 3)))
    return ts.reshape(-1)[:q], idxs.reshape(-1)[:q]
