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
import os

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from sapcu_tpu import ops
from sapcu_tpu.models import fd_model as fdm
from sapcu_tpu.models import fn_model as fnm
from sapcu_tpu.models import sc_model as scm
from sapcu_tpu.ops import seeds as seeds_mod

_XHAT = jnp.array([1.0, 0.0, 0.0], jnp.float32)


def _refine_body(fn_params, fn_state, fd_params, fd_state, cloud, seed_tile,
                 fn_cfg_s, fd_cfg_s, k_neighbors: int,
                 compute_dtype: str = "float32", want_nd: bool = False):
    """One fused seeds->patches->fn->rotate->fd->move step for a fixed-size
    seed tile [C, 3]. Returns moved points [C, 3], or with ``want_nd`` the
    raw (normals [C, 3], distances [C]) pair for the probe-amortized fast
    path.

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
        # fd's decoder always computes in f32 (see fd_decoder_apply: its
        # trained BN variances are ~1e-6 and the bf16-fused segment NaNs)
        # — keep its params/state at full precision too.
        fd_params = {**cast(fd_params), "dec": fd_params["dec"]}
        fd_state = {**cast(fd_state), "dec": fd_state["dec"]}

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
    dist = dist.astype(jnp.float32)
    if want_nd:
        return normals, dist
    return seed_tile + normals * dist[:, None]


refine_chunk = functools.partial(
    jax.jit, static_argnames=("fn_cfg_s", "fd_cfg_s", "k_neighbors",
                              "compute_dtype", "want_nd"))(_refine_body)


@functools.partial(jax.jit, static_argnames=("fn_cfg_s", "fd_cfg_s",
                                             "k_neighbors", "compute_dtype",
                                             "chunk", "want_nd"))
def refine_mega(fn_params, fn_state, fd_params, fd_state, cloud, seeds,
                fn_cfg_s, fd_cfg_s, k_neighbors: int,
                compute_dtype: str = "float32", chunk: int = 1024,
                want_nd: bool = False):
    """Refine a mega-tile of seeds [M, 3] (M a multiple of ``chunk``) as ONE
    dispatch: a lax.map over chunk-sized tiles inside a single jitted call.
    Peak memory equals one chunk's activations (map is sequential), while
    the host pays one dispatch per mega-tile instead of per chunk — the
    stdio-relayed tunnel makes per-dispatch latency expensive."""
    tiles = seeds.reshape(-1, chunk, 3)

    def body(tile):
        return _refine_body(fn_params, fn_state, fd_params, fd_state,
                            cloud, tile, fn_cfg_s, fd_cfg_s, k_neighbors,
                            compute_dtype, want_nd)

    out = jax.lax.map(body, tiles)
    if want_nd:
        normals, dist = out
        return normals.reshape(-1, 3), dist.reshape(-1)
    return out.reshape(-1, 3)


# ------------------------------------------------ sc (shared-cloud) mode
@functools.partial(jax.jit, static_argnames=("cfg_s", "chunk",
                                             "compute_dtype"))
def sc_refine(sc_params, sc_state, cloud, seeds, n_valid, cfg_s,
              chunk: int = 8192, compute_dtype: str = "float32"):
    """Amortized refine: encode the cloud ONCE, then move every seed with
    the tiny per-seed head (models/sc_model.py) — one dispatch for the
    whole padded seed buffer (lax.map over fixed-size tiles).

    The seed buffer is a power-of-two bucket, often ~2x the true count;
    ``n_valid`` (traced scalar — no recompiles across counts) lets pad
    tiles skip the head entirely (lax.map is a sequential scan, so the
    cond genuinely skips the work; pads return their +1e3 sentinels and
    are masked out by the caller's valid mask).

    Replaces the per-seed fn+fd evaluation of the exact path
    (~5.4 GFLOP/seed -> ~0.7 MFLOP/seed); quality vs exact is gated by
    scripts/eval_fast_vs_exact.py --mode sc.
    """
    cfg = dict(cfg_s)
    # serving uses the single-pass approx m-NN in the head (see
    # sc_model.sc_head; SAPCU_SC_HEAD_KNN=exact restores the m-round
    # exact selection — env is read at trace time, so it is pinned per
    # compiled program)
    cfg.setdefault("head_knn",
                   os.environ.get("SAPCU_SC_HEAD_KNN", "approx"))
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if compute_dtype != "float32":
        sc_params, sc_state = jax.tree.map(
            lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a,
            (sc_params, sc_state))
    cloud_c = cloud[None].astype(cdt)
    feats, _ = scm.sc_encode(sc_params, sc_state, cloud_c, cfg,
                             training=False)
    tiles = seeds.reshape(-1, chunk, 3)
    n_tiles_used = (jnp.asarray(n_valid, jnp.int32) + chunk - 1) // chunk

    def move(tile):
        n, d = scm.sc_head(sc_params, feats, cloud_c, tile[None].astype(cdt),
                           cfg, training=False)
        return tile + n[0] * d[0][:, None]

    def body(args):
        i, tile = args
        return jax.lax.cond(i < n_tiles_used, move, lambda t: t, tile)

    out = jax.lax.map(body, (jnp.arange(tiles.shape[0], dtype=jnp.int32),
                             tiles))
    return out.reshape(-1, 3)


# ------------------------------------------------------- fast (probe) mode
@functools.partial(jax.jit, static_argnames=("cap",))
def _select_probes(seeds: jax.Array, valid: jax.Array, probe_cell,
                   cap: int) -> tuple[jax.Array, jax.Array]:
    """Voxel-dedup seed subset: one representative seed per probe_cell
    voxel. Returns (probe points [cap, 3] padded with +1e3 sentinels so
    pads never win a nearest-probe query, n_probes)."""
    q = jnp.floor((seeds + 0.5) / probe_cell).astype(jnp.int32)
    key = (((q[:, 0] & 1023) << 20) | ((q[:, 1] & 1023) << 10)
           | (q[:, 2] & 1023))
    key = jnp.where(valid, key, jnp.int32(2 ** 30))
    order = jnp.argsort(key)
    sk = key[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = first & (sk < 2 ** 30)
    (pos,) = jnp.nonzero(first, size=cap, fill_value=-1)
    probes = jnp.where((pos >= 0)[:, None], seeds[order[pos]], 1e3)
    return probes, jnp.sum(first.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("chunk",))
def _interp_project(seeds: jax.Array, probes: jax.Array,
                    p_normals: jax.Array, p_dists: jax.Array,
                    chunk: int = 4096) -> jax.Array:
    """Project each seed via its 3 nearest probes' tangent planes.

    Per probe p the exact pipeline moved p to the surface point p + n*d;
    the local first-order surface model is the plane through that point
    with normal n, under which a nearby seed s lands at
        s + n * max(d + n.(p - s), 0)
    (the clamp mirrors the exact path's Softplus >= 0 output). Blending
    the 3 nearest probes' displacements with inverse-squared-distance
    weights upgrades the reconstruction from piecewise-planar to a
    smoothly varying field, which holds the fast-vs-exact Chamfer bar at
    coarser probe spacings (measured in scripts/eval_fast_vs_exact.py).
    A seed that IS a probe (d=0) gets weight ~1e12 and degenerates to
    its own exact move; pad probes sit at +1e3 and get ~1e-10 relative
    weight.
    """
    s2 = seeds.reshape(-1, chunk, 3)

    def one(tile):
        d = ops.pairwise_sqdist(tile, probes)           # [chunk, P]
        nd, idx = ops.top_k_select(-d, 3)               # iterative small-k
        w = 1.0 / (jnp.maximum(-nd, 0.0) + 1e-12)       # [chunk, 3]
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        p = jnp.take(probes, idx, axis=0)               # [chunk, 3, 3]
        n = jnp.take(p_normals, idx, axis=0)
        dist = jnp.take(p_dists, idx, axis=0)
        ds = jnp.maximum(
            dist + jnp.sum(n * (p - tile[:, None, :]), axis=-1), 0.0)
        return tile + jnp.sum((w * ds)[..., None] * n, axis=1)

    return jax.lax.map(one, s2).reshape(-1, 3)


# Above this row count the exact O(N^2) outlier scan is not run at all:
# the full-sort scan at the 1,048,576-row bucket is tens of minutes of
# device time for ONE cloud and reproducibly CRASHES the TPU worker
# process partway (no RESOURCE_EXHAUSTED — diagnosed on the OOF box_union
# mesh, 665k seeds; a single [256, 1M] top_k and the approx scan at the
# same size both complete, so it is the aggregate multi-minute program,
# not one kernel). 524,288 rows is the largest bucket the exact scan has
# completed on (box_sharp, 414k seeds). Exact mode falls back to the
# Morton-window rule above this — a documented TPU-pragmatics divergence
# (window-vs-full agreement is pinned by tests/test_pipeline.py
# test_outlier_window_matches_full and the adversarial-sheets test).
_EXACT_OUTLIER_MAX_ROWS = 524288


def _outlier_chunk(n_rows: int, chunk: int = 2048) -> int:
    """Query-tile rows for the O(N^2) outlier scan: above the exact-scan
    ceiling only the approx path runs it, and one [chunk, n_rows] f32
    distance tile is capped ~<=1 GB there ([2048, 1M] would be 8.6 GB;
    the approx scan at [256, 1M] tiles measures 25.8 s)."""
    if n_rows <= _EXACT_OUTLIER_MAX_ROWS:
        return chunk
    return min(chunk, max(256, (1 << 28) // n_rows))


@functools.partial(jax.jit, static_argnames=("k", "chunk", "approx"))
def _outlier_mask(pts, valid, threshold, k: int = 30, chunk: int = 2048,
                  approx: bool = False):
    """Reference outlier rule (generation.py:177-183) with padding mask."""
    big = 1e3
    safe = jnp.where(valid[:, None], pts, big + pts)
    d, _ = ops.knn_tiled(safe, safe, k=k, chunk=chunk, approx=approx)
    d = jnp.sqrt(jnp.maximum(d, 0.0))
    avg = jnp.mean(d, axis=-1)
    nvalid = jnp.maximum(jnp.sum(valid), 1)
    avg_total = jnp.sum(jnp.where(valid, avg, 0.0)) / nvalid
    return valid & (avg < avg_total * threshold)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "window"))
def _outlier_mask_window(pts, valid, threshold, morton_cell, k: int = 30,
                         chunk: int = 2048, window: int = 512):
    """Reference outlier rule via Morton-window kNN: O(N*window) instead
    of the O(N^2) tiled scan (which is pure HBM traffic on the [Q, N]
    distance matrix — measured 2.97 s of a 3.8 s sc-mode cloud at 524k
    rows).

    Points are sorted along a Z-order curve (ops.morton_code); each
    point's kNN candidates are its ``chunk + 2*window`` sorted-rank
    neighbours, which cover the true 30-NN for all but curve-discontinuity
    points. Per point the approximation can only OVERESTIMATE the mean
    30-NN distance (candidates are a subset of the cloud). That raises
    the global mean too — so the rule is not strictly one-sided — but
    curve discontinuities touch a tiny fraction of points, the global
    mean shifts by far less than the 1.5x threshold margin, and
    far-from-surface outliers keep large averages under any candidate
    subset, so they are always caught. Used by the approx (fast/sc)
    serving modes; exact mode keeps the full scan. Quality is gated in
    tests (window-vs-full keep agreement) and by the GT-based serving
    gate (scripts/quality_gate.py).
    """
    n = pts.shape[0]
    big = 1e3
    safe = jnp.where(valid[:, None], pts, big + pts)
    key = jnp.where(valid, ops.morton_code(safe, morton_cell),
                    jnp.int32(2 ** 30))
    order = jnp.argsort(key)          # stable: valid rows keep rank order
    sp = safe[order]
    pad = (-n) % chunk
    spq = jnp.pad(sp, ((0, pad), (0, 0)), constant_values=2.0 * big)
    cand = jnp.pad(spq, ((window, window), (0, 0)),
                   constant_values=3.0 * big)
    n_valid = jnp.sum(valid.astype(jnp.int32))

    def one(i):
        # valid rows sort first (invalid keys are 2^30), so chunks past
        # the valid count hold only padding: skip their kNN entirely.
        # This replaces the host-side rcap trimming (which needed the
        # valid count ON HOST) with a traced bound — the fused serving
        # path never pulls the seed count to the host.
        def real(_):
            tile = jax.lax.dynamic_slice_in_dim(spq, i * chunk, chunk)
            c = jax.lax.dynamic_slice_in_dim(cand, i * chunk,
                                             chunk + 2 * window)
            d = ops.pairwise_sqdist(tile, c)          # [chunk, chunk+2w]
            vals, _ = jax.lax.approx_min_k(d, min(k, chunk + 2 * window),
                                           recall_target=0.95)
            return jnp.mean(jnp.sqrt(jnp.maximum(vals, 0.0)), axis=-1)

        return jax.lax.cond(i * chunk < n_valid, real,
                            lambda _: jnp.zeros((chunk,), jnp.float32),
                            operand=None)

    n_tiles = (n + pad) // chunk
    avg = jax.lax.map(one, jnp.arange(n_tiles, dtype=jnp.int32))
    avg = avg.reshape(-1)[:n]
    vsort = jnp.arange(n) < n_valid   # valid rows sort first (keys < 2^30)
    avg_total = jnp.sum(jnp.where(vsort, avg, 0.0)) / jnp.maximum(n_valid, 1)
    keep_sorted = vsort & (avg < avg_total * threshold)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


# Row count above which the serving modes switch the outlier rule from
# the full approx scan to the Morton-window kNN (the O(N^2) scan is pure
# HBM traffic past this size). Shared by refine_device and the fused sc
# path — the fused path falls back to classic below it so both always
# apply the same rule.
_WINDOW_MIN_ROWS = 32768


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


# --------------------------------------------------- product (ratio) mode
@functools.partial(jax.jit, static_argnames=("n_seeds", "k"))
def _interp_seeds(cloud: jax.Array, key: jax.Array, n_seeds: int,
                  k: int = 8) -> jax.Array:
    """Area-weighted triangle-fan seeding for the ratio-scaled product
    path.

    Each candidate is a uniform barycentric sample of a local fan
    triangle (x_i, x_j, x_l) with x_j, x_l among x_i's k nearest
    neighbours, and triangles are drawn with probability proportional to
    their AREA. Samples stay within sagitta (chord-error) distance of
    the surface — inside the sc model's trained query band — and the sc
    move projects them onto it.

    Why triangles and why area weighting (round-5 fix; the first product
    cut sampled u ~ U[0,1] along single chords with round-robin anchors
    and FAILED its GT-Chamfer gate at +30% aggregate CD vs exact):
    - coverage: chords populate only the 1D geodesics of the kNN graph,
      so the GT->pred Chamfer term blows up in the 2D regions between
      them (at 256 inputs the product CD was WORSE than the input
      baseline while its F-score was better — points individually
      accurate, surface under-covered). Triangle interiors tile the
      local surface patches.
    - uniformity: round-robin anchors put equal candidate mass on every
      input point, so dense input clusters got dense candidates, and
      the Morton-strided selection (uniform in candidate RANK) inherits
      candidate density. Area-proportional triangle sampling makes the
      candidate density ~uniform per unit surface — the property the
      full pipeline gets for free from its uniform voxel shell
      (generation.py:114-116 semantics).

    Rationale for interpolation seeding at all: the reference's product
    path builds the full 0.004-cell voxel shell (~280k seeds for a
    2048-pt cloud) and FPS-selects 3% of it (generate.py:95-99 +
    generation.py:114-116) — ~34x oversampled for a 4x product. Seeding
    only ~oversample*target queries makes the product cost scale with
    the OUTPUT size, not the shell size; output quality vs the
    full-shell path is gated on GT Chamfer (scripts/quality_gate.py,
    quality_product_it2.json)."""
    n = cloud.shape[0]
    kk = min(k, n - 1)
    d = ops.pairwise_sqdist(cloud, cloud)
    d = d + jnp.eye(n, dtype=d.dtype) * 1e9          # exclude self
    _, idx = ops.top_k_select(-d, kk)                # [N, kk]
    # local fan triangles: all kk*(kk-1)/2 neighbour pairs per anchor
    ju, lu = jnp.triu_indices(kk, 1)                 # [P] pair indices
    nbr = cloud[idx]                                 # [N, kk, 3]
    ej = nbr[:, ju] - cloud[:, None, :]              # [N, P, 3]
    el = nbr[:, lu] - cloud[:, None, :]
    area = 0.5 * jnp.linalg.norm(jnp.cross(ej, el), axis=-1)   # [N, P]
    kt, ku = jax.random.split(key)
    logits = jnp.log(jnp.maximum(area, 1e-12)).reshape(-1)
    tri = jax.random.categorical(kt, logits, shape=(n_seeds,))
    anchors = tri // area.shape[1]
    pair = tri % area.shape[1]
    uv = jax.random.uniform(ku, (n_seeds, 2))
    u, v = uv[:, 0], uv[:, 1]
    over = u + v > 1.0                               # fold the square to
    u = jnp.where(over, 1.0 - u, u)                  # the lower triangle:
    v = jnp.where(over, 1.0 - v, v)                  # uniform barycentric
    return (cloud[anchors] + u[:, None] * ej[anchors, pair]
            + v[:, None] * el[anchors, pair])


@functools.partial(jax.jit, static_argnames=("n_out",))
def _stride_select(pts: jax.Array, n_valid: jax.Array, n_out: int,
                   morton_cell: float = 0.004) -> jax.Array:
    """Exactly n_out spatially-stratified rows from the first n_valid.

    Sort by Z-order key, pick every (n_valid/n_out)-th rank: one sort
    instead of the O(n_out * n_valid) sequential FPS loop (fps at
    270k->8192 measured 63 ms; this is ~1 ms). Spatial stratification is
    what FPS buys for near-uniform candidate sets — the moved seed set
    is one (gated on GT Chamfer). n_valid < n_out repeats candidates
    (callers oversample so this never triggers in practice)."""
    cap = pts.shape[0]
    nv = jnp.maximum(jnp.asarray(n_valid, jnp.int32), 1)
    keym = jnp.where(jnp.arange(cap) < nv,
                     ops.morton_code(pts, morton_cell), jnp.int32(2 ** 30))
    order = jnp.argsort(keym)
    pos = (jnp.arange(n_out, dtype=jnp.int32) * nv) // n_out
    return pts[order[pos]]


@functools.partial(jax.jit, static_argnames=("n_seeds", "target", "cfg_s",
                                             "compute_dtype", "refine_steps",
                                             "outlier_chunk"))
def _product_batch(sc_params, sc_state, clouds, keys, n_seeds: int,
                   target: int, cfg_s, compute_dtype: str,
                   threshold, refine_steps: int, outlier_chunk: int = 1024):
    """Fused, cloud-BATCHED product pipeline: one compiled program runs
    B clouds through interp-seeding -> sc move -> outlier filter ->
    Morton-strided selection -> (refine_steps-1) Newton moves.

    Why this exists: the per-cloud product path (product_dispatch) is
    6 separate dispatches whose kernels run far below the chip's compute
    ceiling at ~24k-seed shapes (the sc head measures ~1% of bf16 peak
    at serving sizes — HBM/layout-bound, not FLOP-bound; STATUS.md r3
    stage times). vmapping the whole chain over a cloud axis widens every
    kernel by B with no extra dispatches, which is where the remaining
    product throughput lives on TPU. The math per cloud is identical to
    the single-cloud path (pinned by
    tests/test_r5_features.py::test_product_batch_matches_single):
    - same per-cloud RNG key stream,
    - same head chunking (min(8192, n)),
    - knn_tiled per-row results are chunk-independent, so the smaller
      outlier query tile (memory: B tiles live at once) changes nothing,
    - compact here is a stable argsort on ~keep (kept rows first, input
      order preserved) — _stride_select reads only ranks < n_keep, so
      the differing pad tails of _compact never matter.
    The cloud ONCE-encode is reused across both refine steps (the
    single-cloud path re-encodes per _sc_moved call).
    """
    cfg = dict(cfg_s)
    cfg.setdefault("head_knn",
                   os.environ.get("SAPCU_SC_HEAD_KNN", "approx"))
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if compute_dtype != "float32":
        sc_params, sc_state = jax.tree.map(
            lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a,
            (sc_params, sc_state))

    def one(cloud, key):
        seeds = _interp_seeds(cloud, key, n_seeds)
        cloud_c = cloud[None].astype(cdt)
        feats, _ = scm.sc_encode(sc_params, sc_state, cloud_c, cfg,
                                 training=False)

        def head_move(pts, chunk):
            npts = pts.shape[0]
            pad = (-npts) % chunk
            if pad:      # same sentinel padding as _sc_moved
                pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=1e3)
            tiles = pts.reshape(-1, chunk, 3)

            def mv(tile):
                n, d = scm.sc_head(sc_params, feats, cloud_c,
                                   tile[None].astype(cdt), cfg,
                                   training=False)
                return tile + n[0] * d[0][:, None]

            return jax.lax.map(mv, tiles).reshape(-1, 3)[:npts]

        moved = head_move(seeds, min(8192, n_seeds))
        keep = _outlier_mask(moved, jnp.ones((n_seeds,), bool), threshold,
                             chunk=outlier_chunk, approx=True)
        # stable argsort on (kept? 0 : 1): kept rows first, input order
        # preserved — the order-preserving compact
        order = jnp.argsort(jnp.where(keep, 0, 1).astype(jnp.int32))
        n_keep = jnp.sum(keep.astype(jnp.int32))
        sel = _stride_select(moved[order], n_keep, target)
        for _ in range(refine_steps - 1):
            sel = head_move(sel, min(8192, target))
        return sel, n_keep

    return jax.vmap(one)(clouds, keys)


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
                 mega_chunks: int = 8, mode: str = "exact",
                 probe_factor: float = 8.0, mesh=None, sc_bundle=None,
                 refine_steps: int = 1):
        """mode="exact" runs the fn+fd models per seed (reference
        semantics). mode="fast" amortizes: one exact model evaluation per
        ``probe`` (a probe_factor*dense_spacing voxel-dedup subset of the
        seed shell — neighbouring seeds share >=95% of their 100-NN patch,
        so the predicted normal/distance fields are locally planar), then
        every seed is projected onto its nearest probe's tangent plane.
        ~probe_factor^2-fold fewer model FLOPs for a first-order-accurate
        output; quality vs exact is pinned by tests/test_pipeline.py.
        mode="sc" uses the shared-cloud encoder (models/sc_model.py,
        requires sc_bundle): one cloud encoding + a ~0.7 MFLOP/seed head
        instead of any per-seed patch model.

        refine_steps > 1 iterates the normal/distance move Newton-style:
        each extra step re-queries the model AT the moved points while
        conditioning on the ORIGINAL input cloud (unlike the reference's
        multi_scale_upsample, generation.py:205-220, which re-runs the
        whole pipeline on its own noisy output and measurably amplifies
        off-surface error — out/metrics/quality_sc_p2.json). Measured on
        a sparse N=256 sphere (sc, trained weights): surface residual
        0.0141 (seeds) -> 0.0065 (1 step) -> 0.0048 (2 steps), converged
        by step 3; each extra step costs one move-stage pass (~0.2 s at
        280k seeds)."""
        self.fn_params, self.fn_state, fn_cfg = fn_bundle
        self.fd_params, self.fd_state, fd_cfg = fd_bundle
        self.sc_bundle = sc_bundle
        if sc_bundle is not None:
            self.sc_params, self.sc_state, sc_cfg = sc_bundle
            self.sc_cfg_s = tuple(sorted(sc_cfg.items()))
        self.fn_cfg_s = tuple(sorted(fn_cfg.items()))
        self.fd_cfg_s = tuple(sorted(fd_cfg.items()))
        self.k_neighbors = k_neighbors
        self.dense_spacing = dense_spacing
        self.outlier_threshold = outlier_threshold
        self.batch_size = batch_size
        self.seed_chunk = seed_chunk
        self.compute_dtype = compute_dtype
        self.mega_chunks = mega_chunks
        assert mode in ("exact", "fast", "sc"), mode
        assert mode != "sc" or sc_bundle is not None, \
            "mode='sc' needs sc_bundle=(params, state, cfg)"
        self.mode = mode
        self.probe_factor = probe_factor
        self.refine_steps = max(1, int(refine_steps))
        # Multi-chip: shard the seed/probe tile axis over the mesh's 'dp'
        # axis (SURVEY.md §5.7 — the arbitrary-scale analog of sequence
        # parallelism). The SAME _refine_body/refine pipeline runs per
        # shard; only the outlier filter's global mean crosses chips.
        self.mesh = mesh
        self._sharded_mega: dict = {}
        if mesh is not None:
            n_dev = mesh.devices.size
            self.mega_chunks = -(-self.mega_chunks // n_dev) * n_dev
            repl = NamedSharding(mesh, P())
            (self.fn_params, self.fn_state, self.fd_params,
             self.fd_state) = jax.device_put(
                (self.fn_params, self.fn_state, self.fd_params,
                 self.fd_state), repl)
            if sc_bundle is not None:
                self.sc_params, self.sc_state = jax.device_put(
                    (self.sc_params, self.sc_state), repl)

    def _get_sharded_mega(self, want_nd: bool):
        """Build (once) the shard_map'd analog of refine_mega: tiles
        [n_tiles, chunk, 3] sharded over 'dp', params/cloud replicated;
        each device lax.map's its local tiles sequentially (peak memory =
        one chunk per chip, one host dispatch per mega-tile)."""
        if want_nd in self._sharded_mega:
            return self._sharded_mega[want_nd]
        from jax.experimental.shard_map import shard_map

        def mapped(fn_params, fn_state, fd_params, fd_state, cloud, tiles):
            def body(tile):
                return _refine_body(fn_params, fn_state, fd_params, fd_state,
                                    cloud, tile, self.fn_cfg_s, self.fd_cfg_s,
                                    self.k_neighbors, self.compute_dtype,
                                    want_nd)
            return jax.lax.map(body, tiles)

        out_specs = (P("dp"), P("dp")) if want_nd else P("dp")
        fn = jax.jit(shard_map(
            mapped, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(), P("dp")),
            out_specs=out_specs))
        self._sharded_mega[want_nd] = fn
        return fn

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
        if (self.mode == "sc" and self.mesh is None
                and os.environ.get("SAPCU_FUSED_PIPE", "1") != "0"):
            res = self._upsample_fused_sc(cloud)
            if res is not None:
                return res
        seed_pts, n_seeds = seeds_mod.generate_seeds_device(
            cloud, cell=self.dense_spacing, chunk=self.seed_chunk)
        return self.refine_device(cloud, seed_pts, n_seeds)

    def _fused_sc_dispatch(self, cloud_j):
        """Dispatch half of the fused sc path: enqueue seeds -> sc refine
        -> outlier -> compact WITHOUT reading any device scalar. Returns
        (cloud, centers, pts, scalars_dev) device handles, or None when
        the cloud is outside the fused regime."""
        out = seeds_mod.generate_seeds_device_async(
            cloud_j, cell=self.dense_spacing, chunk=self.seed_chunk)
        if out is None:
            return None
        centers, stats = out
        count = stats[2]
        moved = centers
        for _ in range(self.refine_steps):
            moved = self._sc_moved(cloud_j, moved, count)
        cap = centers.shape[0]
        valid = jnp.arange(cap) < count
        # The fused dispatch must pick the outlier rule BEFORE the seed
        # count is known on host, so it always uses the window kNN (the
        # production regime: dense clouds -> >=32k seeds). refine_device
        # picks by the count-derived rcap; the small-count case where the
        # rules would differ falls back to the classic path at resolve
        # time, so fused output == classic output at every size.
        window = os.environ.get("SAPCU_OUTLIER_WINDOW", "1") != "0"
        if window:
            keep = _outlier_mask_window(moved, valid,
                                        self.outlier_threshold,
                                        4.0 * self.dense_spacing)
        else:
            keep = _outlier_mask(moved, valid, self.outlier_threshold,
                                 chunk=_outlier_chunk(moved.shape[0]),
                                 approx=True)
        pts, n_keep = _compact(moved, keep, cap)
        scalars = jnp.concatenate([stats, n_keep.reshape(1)])
        return cloud_j, centers, pts, scalars, window

    def _fused_sc_resolve(self, handle) -> tuple[jax.Array, int] | None:
        """Pull the fused dispatch's batched scalars (ONE host round-trip)
        and validate; falls back to the classic path (returns its result)
        on refinement/overflow or the small-count outlier-rule case."""
        cloud_j, centers, pts, scalars_dev, window = handle
        scalars = np.asarray(scalars_dev)  # the single pull for the cloud
        n_miss, overflow, n_seeds, nk = (int(x) for x in scalars)
        cap = centers.shape[0]
        if not (n_miss == 0 and not overflow and 0 < n_seeds <= cap):
            return None
        if window and n_seeds < _WINDOW_MIN_ROWS:
            # Small clouds: refine_device's count-derived rcap would pick
            # the full approx scan, not the window. Re-run the classic
            # path from the already-generated seeds (no seed recompute)
            # so the two paths never silently serve different outputs.
            return self.refine_device(cloud_j, centers[:_bucket(n_seeds)],
                                      n_seeds)
        return pts, nk

    def _upsample_fused_sc(self, cloud_j) -> tuple[jax.Array, int] | None:
        """Single-sync sc serving path: seeds -> sc refine -> outlier ->
        compact are all dispatched without reading ANY device scalar, then
        one batched pull fetches (seed stats, n_keep) together.

        Each host round-trip over the stdio-relayed tunnel costs ~25-30 ms
        (scripts/prof/_prof_outlier.py) and — worse — serialises the host
        dispatch stream against device progress; the classic path pays two
        (seed-stats pull, n_keep pull). Every stage here runs at the seed
        buffer's fixed capacity with a TRACED valid count (sc_refine and
        the Morton-window outlier both skip padding tiles on device), so
        no host-side bucketing decision needs the count. Falls back to
        the classic path (returns None) when the seed pass reports
        refinement work or overflow — never observed in testing; the
        shortlist pass refines up to 16 rounds on device first.
        """
        handle = self._fused_sc_dispatch(cloud_j)
        if handle is None:
            return None
        return self._fused_sc_resolve(handle)

    def upsample_device_async(self, data):
        """Dispatch a cloud's full pipeline without waiting; returns an
        opaque handle for ``upsample_device_resolve``.

        Streaming serving: dispatching cloud i+1 BEFORE resolving cloud i
        keeps the device queue full across the ~25-30 ms host round-trip
        that resolve pays on the stdio-relayed tunnel (and across the
        host-side dispatch work itself), hiding both behind device
        compute. Outside the fused-sc regime this degrades to the
        synchronous path (the classic flow needs the seed count on host
        to pick bucket sizes)."""
        cloud = jnp.asarray(data, dtype=jnp.float32)
        if cloud.ndim == 3:
            cloud = cloud[0]
        if (self.mode == "sc" and self.mesh is None
                and os.environ.get("SAPCU_FUSED_PIPE", "1") != "0"):
            handle = self._fused_sc_dispatch(cloud)
            if handle is not None:
                return ("fused", handle)
        return ("sync", self.upsample_device(cloud))

    def upsample_device_resolve(self, handle) -> tuple[jax.Array, int]:
        kind, payload = handle
        if kind == "sync":
            return payload
        res = self._fused_sc_resolve(payload)
        if res is not None:
            return res
        # rare fallback: the fused pass reported refinement/overflow —
        # rerun the cloud through the classic path
        cloud_j = payload[0]
        seed_pts, n_seeds = seeds_mod.generate_seeds_device(
            cloud_j, cell=self.dense_spacing, chunk=self.seed_chunk)
        return self.refine_device(cloud_j, seed_pts, n_seeds)

    def upsample_to(self, data, target_points: int) -> jax.Array:
        """Pipeline + on-device FPS to target_points -> [target, 3] device
        array (the generate.py:95-99 FPS step without the host round-trip)."""
        pts, n = self.upsample_device(data)
        assert n >= target_points, \
            f"Generated {n} points, expected >= {target_points}"
        return _fps_select(pts, jnp.asarray(n), target_points)

    # ------------------------------------------------------- product mode
    def product_dispatch(self, data, target_points: int,
                         oversample: float = 2.5):
        """Dispatch the ratio-scaled product pipeline (sc mode only) with
        NO host synchronisation: interpolation seeding (oversample *
        target queries instead of the ~34x-oversampled voxel shell) ->
        sc move (x refine_steps) -> outlier filter -> Morton-strided
        selection to EXACTLY target_points. Returns an opaque handle for
        ``product_resolve``; dispatching cloud i+1 before resolving
        cloud i streams the product path the same way
        upsample_device_async streams the shell path."""
        assert self.mode == "sc" and self.sc_bundle is not None, \
            "product mode requires mode='sc'"
        assert self.mesh is None, "product mode is single-chip"
        cloud = jnp.asarray(data, dtype=jnp.float32)
        if cloud.ndim == 3:
            cloud = cloud[0]
        # seed-count bucket: multiples of 8192 bound the compile variants
        # (one per (input size, bucket) pair across a whole sweep)
        n_seeds = max(8192, -(-int(target_points * oversample) // 8192)
                      * 8192)
        seeds = _interp_seeds(cloud, jax.random.PRNGKey(0), n_seeds)
        # one move over the full candidate set; the remaining
        # refine_steps-1 Newton iterations run AFTER selection, on only
        # the target_points kept rows — the shipped it2 quality lands on
        # every delivered point at ~60% of the all-candidates cost
        moved = self._sc_moved(cloud, seeds, n_seeds)
        valid = jnp.ones((moved.shape[0],), bool)
        if (moved.shape[0] >= _WINDOW_MIN_ROWS
                and os.environ.get("SAPCU_OUTLIER_WINDOW", "1") != "0"):
            keep = _outlier_mask_window(moved, valid, self.outlier_threshold,
                                        4.0 * self.dense_spacing)
        else:
            keep = _outlier_mask(moved, valid, self.outlier_threshold,
                                 chunk=_outlier_chunk(moved.shape[0]),
                                 approx=True)
        pts, n_keep = _compact(moved, keep, moved.shape[0])
        sel = _stride_select(pts, n_keep, target_points)
        for _ in range(self.refine_steps - 1):
            sel = self._sc_moved(cloud, sel, target_points)
        return sel, n_keep

    def product_resolve(self, handle) -> tuple[jax.Array, int]:
        """(selected [target, 3] ON DEVICE, n_candidates). n_candidates <
        target means the outlier filter ate into the oversample margin
        and the selection repeated rows — never observed at the default
        oversample (filter keeps ~99%); callers may re-dispatch with a
        larger oversample in that case."""
        sel, n_keep = handle
        return sel, int(n_keep)

    def upsample_product(self, data, target_points: int,
                         oversample: float = 2.5) -> jax.Array:
        """Synchronous product path -> [target, 3] device array."""
        sel, _ = self.product_resolve(
            self.product_dispatch(data, target_points, oversample))
        return sel

    def upsample_product_batch(self, data, target_points: int,
                               oversample: float = 2.5
                               ) -> tuple[jax.Array, jax.Array]:
        """Cloud-batched product path: [B, N, 3] -> ([B, target, 3]
        on device, keep counts [B]). One fused program for all B clouds
        (see _product_batch) — the production serving shape for sweeps
        of same-size clouds (the reference's generate.py iterates its
        test set serially one cloud at a time, generate.py:22-36)."""
        assert self.mode == "sc" and self.sc_bundle is not None, \
            "product mode requires mode='sc'"
        assert self.mesh is None, "product mode is single-chip"
        clouds = jnp.asarray(data, dtype=jnp.float32)
        assert clouds.ndim == 3, "expected [B, N, 3]"
        n_seeds = max(8192, -(-int(target_points * oversample) // 8192)
                      * 8192)
        # same per-cloud key as product_dispatch -> identical outputs
        keys = jnp.tile(jax.random.PRNGKey(0)[None], (clouds.shape[0], 1))
        return _product_batch(self.sc_params, self.sc_state, clouds, keys,
                              n_seeds, target_points, self.sc_cfg_s,
                              self.compute_dtype, self.outlier_threshold,
                              self.refine_steps)

    def generate_seeds(self, cloud: np.ndarray) -> np.ndarray:
        return seeds_mod.generate_seeds(cloud, cell=self.dense_spacing,
                                        chunk=self.seed_chunk)

    def _refine_tiles(self, cloud_j, pts, n_valid: int, want_nd: bool):
        """Mega-tile dispatch loop over the first n_valid rows of a padded
        point buffer; returns moved [>=n_valid, 3] or (normals, dists)."""
        c = self.batch_size
        # only refine chunks containing valid seeds (the buffer capacity is
        # a power-of-two bucket, often ~2x the count — skipping pad chunks
        # halves the hot-loop work); mega-tiles of `mega_chunks` chunks per
        # dispatch bound host-side dispatch latency (<= ~(mega-1)*c waste
        # on the last tile)
        mega = self.mega_chunks * c
        n_mega = -(-n_valid // mega)
        need = n_mega * mega
        if pts.shape[0] < need:
            pts = jnp.pad(pts, ((0, need - pts.shape[0]), (0, 0)),
                          constant_values=1e3)
        outs = []
        for i in range(n_mega):
            tile = jax.lax.dynamic_slice_in_dim(pts, i * mega, mega)
            if self.mesh is not None:
                sharded = self._get_sharded_mega(want_nd)
                out = sharded(self.fn_params, self.fn_state, self.fd_params,
                              self.fd_state, cloud_j,
                              tile.reshape(-1, c, 3))
                out = (jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]),
                                    out))
                outs.append(out)
            else:
                outs.append(refine_mega(
                    self.fn_params, self.fn_state, self.fd_params,
                    self.fd_state, cloud_j, tile,
                    self.fn_cfg_s, self.fd_cfg_s, self.k_neighbors,
                    self.compute_dtype, c, want_nd))
        if want_nd:
            return (jnp.concatenate([o[0] for o in outs], axis=0),
                    jnp.concatenate([o[1] for o in outs], axis=0))
        return jnp.concatenate(outs, axis=0)

    def _fast_moved(self, cloud_j, seed_pts, n_seeds: int) -> jax.Array:
        """Probe-amortized move: exact model on the probe subset, tangent-
        plane projection for every seed. One scalar host sync (the probe
        count)."""
        cap_s = seed_pts.shape[0]
        valid = jnp.arange(cap_s) < n_seeds
        # every seed CAN be its own probe (probe_factor <= 1), so the
        # selection buffer must hold cap_s entries; it is then trimmed to
        # the bucketed true count so the interp distance tiles stay small
        probe_cell = self.probe_factor * self.dense_spacing
        probes, n_p = _select_probes(seed_pts, valid, probe_cell, cap_s)
        n_probes = max(int(n_p), 1)
        p_used = _bucket(n_probes, base=2048)
        probes = probes[:p_used]

        normals, dists = self._refine_tiles(cloud_j, probes, n_probes,
                                            want_nd=True)
        n_buf = jnp.zeros((p_used, 3), jnp.float32)
        d_buf = jnp.zeros((p_used,), jnp.float32)
        m = min(normals.shape[0], p_used)
        n_buf = jax.lax.dynamic_update_slice_in_dim(n_buf, normals[:m],
                                                    0, axis=0)
        d_buf = jax.lax.dynamic_update_slice_in_dim(d_buf, dists[:m],
                                                    0, axis=0)
        # bound the [chunk, p_used] distance tile to ~64M f32
        chunk = min(4096, cap_s, max(512, (1 << 26) // p_used))
        return _interp_project(seed_pts, probes, n_buf, d_buf, chunk=chunk)

    def _sc_moved(self, cloud_j, seed_pts, n_seeds: int) -> jax.Array:
        """Shared-cloud-encoder move over the whole padded seed buffer.
        Pad tiles past n_seeds skip the head (lax.cond inside the
        sequential tile map — the buffer is a power-of-two bucket, often
        ~2x the true count); one dispatch per cloud. With a mesh the
        seed-tile axis shards over 'dp' (encode replicated per chip —
        it is ~1% of the head work)."""
        chunk = min(8192, seed_pts.shape[0])
        cap = seed_pts.shape[0]
        pad = (-cap) % chunk
        if self.mesh is not None:  # tile count must divide the mesh
            n_dev = self.mesh.devices.size
            tiles = -(-(cap + pad) // chunk)
            pad += (-tiles % n_dev) * chunk
        if pad:
            seed_pts = jnp.pad(seed_pts, ((0, pad), (0, 0)),
                               constant_values=1e3)
        n_valid = jnp.asarray(n_seeds, jnp.int32)
        if self.mesh is not None:
            out = self._get_sharded_sc(chunk)(
                self.sc_params, self.sc_state, cloud_j,
                seed_pts.reshape(-1, chunk, 3), n_valid)
            return out.reshape(-1, 3)[:cap]
        return sc_refine(self.sc_params, self.sc_state, cloud_j, seed_pts,
                         n_valid, self.sc_cfg_s, chunk,
                         self.compute_dtype)[:cap]

    def _get_sharded_sc(self, chunk: int):
        key = ("sc", chunk)
        if key not in self._sharded_mega:
            from jax.experimental.shard_map import shard_map

            def mapped(sc_params, sc_state, cloud, tiles, n_valid):
                # tiles shard contiguously over 'dp': shard i holds global
                # tiles [i*T_local, (i+1)*T_local) — its local valid count
                # is the global one minus the rows before it (<=0 means
                # every local tile is padding and skips the head).
                shard = jax.lax.axis_index("dp").astype(jnp.int32)
                n_loc = (jnp.asarray(n_valid, jnp.int32)
                         - shard * tiles.shape[0] * chunk)
                return sc_refine(sc_params, sc_state, cloud,
                                 tiles.reshape(-1, 3), n_loc, self.sc_cfg_s,
                                 chunk,
                                 self.compute_dtype).reshape(tiles.shape)

            self._sharded_mega[key] = jax.jit(shard_map(
                mapped, mesh=self.mesh,
                in_specs=(P(), P(), P(), P("dp"), P()), out_specs=P("dp")))
        return self._sharded_mega[key]

    def refine_device(self, cloud, seed_pts, n_seeds: int
                      ) -> tuple[jax.Array, int]:
        """seeds [cap, 3] on device (valid count n_seeds) -> (compacted
        outlier-filtered points [cap, 3] on device, n_valid)."""
        if n_seeds == 0:
            return jnp.zeros((1, 3), jnp.float32), 0
        cloud_j = jnp.asarray(cloud, dtype=jnp.float32)

        if self.mode == "fast":
            move = self._fast_moved
        elif self.mode == "sc":
            move = self._sc_moved
        else:
            move = lambda c, p, n: self._refine_tiles(c, p, n, want_nd=False)
        moved = seed_pts
        for _ in range(self.refine_steps):
            moved = move(cloud_j, moved, n_seeds)
        cap = _bucket(n_seeds)
        if moved.shape[0] < cap:
            moved = jnp.pad(moved, ((0, cap - moved.shape[0]), (0, 0)))
        else:
            moved = moved[:cap]

        valid = jnp.arange(cap) < n_seeds
        if self.mesh is not None:
            keep = self._sharded_outlier(moved, valid)
            # compaction + FPS are global/sequential: replicate first
            repl = NamedSharding(self.mesh, P())
            moved, keep = jax.device_put((moved, keep), repl)
        else:
            # trim the quadratic stage to the valid prefix: the bucket cap
            # is up to 2x the true count and kNN cost scales with
            # rows*refs — an eighth-of-cap granularity bounds the compile
            # variants at 8 per bucket while cutting the work up to ~4x
            gran = max(8192, cap // 8)
            rcap = min(cap, -(-n_seeds // gran) * gran)
            use_window = (self.mode != "exact" and rcap >= _WINDOW_MIN_ROWS
                          or rcap > _EXACT_OUTLIER_MAX_ROWS)
            if (use_window
                    and os.environ.get("SAPCU_OUTLIER_WINDOW", "1") != "0"):
                # large clouds: the O(N^2) scan is pure HBM traffic
                # (2.97 s of a 3.8 s sc cloud at 524k rows) — use the
                # Morton-window kNN instead
                keep = _outlier_mask_window(
                    moved[:rcap], valid[:rcap], self.outlier_threshold,
                    4.0 * self.dense_spacing)
            else:
                keep = _outlier_mask(moved[:rcap], valid[:rcap],
                                     self.outlier_threshold,
                                     chunk=_outlier_chunk(rcap),
                                     approx=self.mode != "exact")
            if rcap < cap:
                keep = jnp.pad(keep, (0, cap - rcap))
        out, n_keep = _compact(moved, keep, cap)
        return out, int(n_keep)

    def _sharded_outlier(self, pts, valid):
        """Outlier rule with query rows sharded over 'dp'; the kNN
        reference set is replicated (one small all-gather) and the global
        mean is a psum."""
        key = "outlier"
        if key not in self._sharded_mega:
            from jax.experimental.shard_map import shard_map
            thr = self.outlier_threshold
            k_out = getattr(self, "_outlier_k", 30)
            approx = getattr(self, "mode", "exact") == "fast"

            def mapped(q, vq, refs, vr):
                big = 1e3
                safe_refs = jnp.where(vr[:, None], refs, big + refs)
                safe_q = jnp.where(vq[:, None], q, big + q)
                d, _ = ops.knn_tiled(safe_q, safe_refs, k=k_out,
                                     chunk=_outlier_chunk(refs.shape[0]),
                                     approx=approx)
                d = jnp.sqrt(jnp.maximum(d, 0.0))
                avg = jnp.mean(d, axis=-1)
                s = jax.lax.psum(jnp.sum(jnp.where(vq, avg, 0.0)), "dp")
                nv = jax.lax.psum(jnp.sum(vq.astype(jnp.int32)), "dp")
                return vq & (avg < s / jnp.maximum(nv, 1) * thr)

            self._sharded_mega[key] = jax.jit(shard_map(
                mapped, mesh=self.mesh,
                in_specs=(P("dp"), P("dp"), P(), P()),
                out_specs=P("dp")))
        return self._sharded_mega[key](pts, valid, pts, valid)

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
