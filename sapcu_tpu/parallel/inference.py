"""Multi-chip inference: shard the seed axis over the mesh.

The arbitrary-scale analog of sequence parallelism (SURVEY.md §5.7): at
inference the scale axis is the number of seed points (hundreds of
thousands per cloud), and attention is local (k <= 100 neighbours), so
the natural decomposition is by seeds — each chip refines its shard of
the seed shell against a replicated copy of the (tiny) input cloud. No
collectives are needed in the hot loop; only the outlier filter's global
mean reduces across chips (one psum).

Since round 2 this module is a thin veneer over the PRODUCTION pipeline:
``Upsampler(mesh=...)`` runs the same _refine_body/outlier/compact/FPS
code sharded (generate/pipeline.py), so the sharded and single-chip paths
cannot drift. The helpers below exist for API compatibility and tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sapcu_tpu.generate.pipeline import Upsampler, _bucket


def sharded_upsampler(mesh, fn_bundle, fd_bundle, **kwargs) -> Upsampler:
    """The production Upsampler bound to a mesh (seed axis over 'dp')."""
    return Upsampler(fn_bundle, fd_bundle, mesh=mesh, **kwargs)


def sharded_refine(mesh, fn_bundle, fd_bundle, k_neighbors: int = 100,
                   batch_size: int = 256):
    """Build a mesh-sharded refine step (legacy API).

    Returns refine(cloud [N,3], seeds [S,3]) -> moved [S,3] computed by the
    production Upsampler._refine_tiles path under the mesh.
    """
    up = Upsampler(fn_bundle, fd_bundle, k_neighbors=k_neighbors,
                   batch_size=batch_size, mesh=mesh)

    def run(cloud, seeds):
        cloud_j = jnp.asarray(cloud, jnp.float32)
        seeds_j = jnp.asarray(seeds, jnp.float32)
        s = seeds_j.shape[0]
        moved = up._refine_tiles(cloud_j, seeds_j, s, want_nd=False)
        return moved[:s]

    return run


def sharded_outlier_mask(mesh, pts, valid, threshold: float = 1.5,
                         k: int = 30):
    """Outlier filter with points sharded over 'dp' (global-mean psum;
    the kNN reference set is replicated). Delegates to the production
    Upsampler._sharded_outlier (bundle-free construction)."""
    up = Upsampler.__new__(Upsampler)
    up.mesh = mesh
    up.outlier_threshold = threshold
    up._outlier_k = k
    up._sharded_mega = {}
    pts = jnp.asarray(pts, jnp.float32)
    valid = jnp.asarray(valid)
    return up._sharded_outlier(pts, valid)
