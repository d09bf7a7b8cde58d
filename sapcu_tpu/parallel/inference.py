"""Multi-chip inference: shard the seed axis over the mesh.

The arbitrary-scale analog of sequence parallelism (SURVEY.md §5.7): at
inference the scale axis is the number of seed points (hundreds of
thousands per cloud), and attention is local (k <= 100 neighbours), so
the natural decomposition is by seeds — each chip refines its shard of
the seed shell against a replicated copy of the (tiny) input cloud. No
collectives are needed in the hot loop; only the outlier filter's global
mean reduces across chips (one psum inserted by GSPMD).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sapcu_tpu.generate.pipeline import refine_chunk, _outlier_mask


def sharded_refine(mesh, fn_bundle, fd_bundle, k_neighbors: int = 100):
    """Build a mesh-sharded refine step.

    Returns refine(cloud [N,3], seeds [S,3]) -> moved [S,3] with S sharded
    over the 'dp' axis (S must be a multiple of mesh size; pad upstream).
    Parameters and the input cloud are replicated; the per-seed fn->rotate
    ->fd chain is embarrassingly parallel across chips.
    """
    fn_params, fn_state, fn_cfg = fn_bundle
    fd_params, fd_state, fd_cfg = fd_bundle
    fn_cfg_s = tuple(sorted(fn_cfg.items()))
    fd_cfg_s = tuple(sorted(fd_cfg.items()))

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))

    fn_params = jax.device_put(fn_params, repl)
    fn_state = jax.device_put(fn_state, repl)
    fd_params = jax.device_put(fd_params, repl)
    fd_state = jax.device_put(fd_state, repl)

    @functools.partial(jax.jit, out_shardings=shard)
    def refine(cloud, seeds):
        return refine_chunk(fn_params, fn_state, fd_params, fd_state,
                            cloud, seeds, fn_cfg_s, fd_cfg_s, k_neighbors)

    def run(cloud, seeds):
        cloud = jax.device_put(jnp.asarray(cloud, jnp.float32), repl)
        seeds = jax.device_put(jnp.asarray(seeds, jnp.float32), shard)
        return refine(cloud, seeds)

    return run


def sharded_outlier_mask(mesh, pts, valid, threshold: float = 1.5,
                         k: int = 30):
    """Outlier filter with points sharded over 'dp' (global-mean psum is
    inserted by GSPMD; the kNN reference set is all-gathered once)."""
    shard = NamedSharding(mesh, P("dp"))
    pts = jax.device_put(jnp.asarray(pts, jnp.float32), shard)
    valid = jax.device_put(jnp.asarray(valid), shard)
    return _outlier_mask(pts, valid, threshold, k=k)
