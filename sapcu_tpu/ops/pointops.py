"""Pure jittable point-cloud ops.

TPU-first reimplementations of the point-cloud helpers the reference
duplicates across ``fn/snn_coder.py``, ``fd/snn_coder.py``, ``generation.py``
and ``generate.py``. Everything here is shape-static, channels-last, and
compiles to MXU matmuls + VPU elementwise under jit.

Reference parity notes (file:line cite the PyTorch reference):
- ``pairwise_sqdist``     fn/snn_coder.py:10-17 (``square_distance``)
- ``knn``                 fn/snn_coder.py:31-39 (nearest-first, includes self)
- ``index_points``        fn/snn_coder.py:19-29
- ``graph_feature``       fd/snn_coder.py:52-68 (``get_graph_feature``,
                          edge feature = [x_j - x_i, x_j])
- ``farthest_point_sample`` generate.py:56-74 (start index N//2, 1e32 init)
- ``rotation_to_target``  generation.py:30-47 (Rodrigues; parallel AND
                          antiparallel inputs both yield identity — the
                          reference's documented quirk is preserved)
- ``point_triangle_closest`` dense.cpp:135-174 (closest point on triangle)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Squared Euclidean distance matrix.

    src: [..., N, C], dst: [..., M, C] -> [..., N, M].

    Computed as ||s||^2 + ||d||^2 - 2 s.d so the inner product runs on the
    MXU. Result may be slightly negative from cancellation; callers that
    need true distances should clamp at 0.
    """
    # Accumulate in f32 even when features are bf16 (AMP / bfloat16
    # inference): neighbour selection on bf16-accumulated distances adds
    # avoidable index divergence from the f32 reference, and the f32
    # accumulation is free on the MXU.
    #
    # For f32 INPUTS the pass precision matters too: the TPU MXU runs
    # f32 dots as truncated-bf16 passes under the default precision,
    # which perturbs squared distances by up to ~2.6e-3 absolute
    # (measured, 2048-point cloud) — at seed-band distances (~0.013,
    # squared 1.7e-4) that exceeds the value itself and reorders
    # neighbours, silently breaking the "exact" seed math on device.
    # precision=HIGHEST restores ~2e-7 agreement with f64 at a cost only
    # paid by f32-input matmuls (bf16 inputs run the native bf16 MXU
    # path either way; CPU is unaffected).
    s2 = jnp.sum(jnp.square(src.astype(jnp.float32)), axis=-1, keepdims=True)
    d2 = jnp.sum(jnp.square(dst.astype(jnp.float32)), axis=-1, keepdims=True)
    prec = (jax.lax.Precision.HIGHEST
            if src.dtype == jnp.float32 or dst.dtype == jnp.float32
            else None)
    inner = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       preferred_element_type=jnp.float32, precision=prec)
    return s2 - 2.0 * inner + jnp.swapaxes(d2, -1, -2)


def topk_small(neg_dist: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis for SMALL k via iterative argmax.

    ``lax.top_k`` lowers to a full sort on TPU (~80ms for [8192, 2048]);
    k sequential masked argmax passes are VPU-bound and far cheaper for
    k <= ~16. Returns (values, indices) sorted descending like lax.top_k.
    """
    n = neg_dist.shape[-1]
    x = neg_dist
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        x = jnp.where(jax.nn.one_hot(i, n, dtype=bool), -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def top_k_select(neg_dist: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Dispatch to the iterative selector for small k, lax.top_k otherwise."""
    if k <= 16:
        return topk_small(neg_dist, k)
    v, i = jax.lax.top_k(neg_dist, k)
    return v, i.astype(jnp.int32)


def knn(points: jax.Array, k: int, queries: jax.Array | None = None) -> jax.Array:
    """k-nearest-neighbour indices, nearest first.

    points:  [..., N, C] reference set.
    queries: [..., Q, C] (defaults to ``points`` — self-kNN includes self
             at position 0, matching fn/snn_coder.py:31-39).
    Returns int32 [..., Q, k].

    k is statically clamped to N (the reference's ``k = min(k, N)``).
    """
    if queries is None:
        queries = points
    n = points.shape[-2]
    k = min(k, n)
    dist = pairwise_sqdist(queries, points)
    _, idx = top_k_select(-dist, k)
    return idx


def index_points_matmul(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Neighbour gather as a one-hot matmul: [B, N, C], [B, S, K] ->
    [B, S, K, C].

    TPU gather HLOs are slow (tens of ms for model-sized neighbour
    gathers); a one-hot [S*K, N] times [N, C] runs on the MXU instead and
    is exact (each output row sums exactly one source row). Profitable for
    bf16 values with small source length N.
    """
    n = points.shape[-2]
    oh = jax.nn.one_hot(idx, n, dtype=points.dtype)        # [B, S, K, N]
    return jnp.einsum("...skn,...nc->...skc", oh, points)


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather point features by index.

    points: [B, N, C]; idx: [B, S] or [B, S, K] -> [B, S, C] / [B, S, K, C].
    The [B, S, K] neighbour-gather dispatches to the one-hot-matmul path
    for bf16 features from small point sets (the per-patch model case).
    """
    if idx.ndim == points.ndim - 1:  # [B, S]
        return jnp.take_along_axis(points, idx[..., None], axis=-2)
    if idx.ndim == points.ndim:  # [B, S, K]
        if (points.dtype == jnp.bfloat16 and points.shape[-2] <= 128
                and points.shape[-1] >= 8):
            return index_points_matmul(points, idx)
        b, s, kk = idx.shape[-3], idx.shape[-2], idx.shape[-1]
        flat = idx.reshape(*idx.shape[:-2], s * kk)
        out = jnp.take_along_axis(points, flat[..., None], axis=-2)
        return out.reshape(*idx.shape[:-2], s, kk, points.shape[-1])
    raise ValueError(f"idx rank {idx.ndim} incompatible with points rank {points.ndim}")


def graph_feature(x: jax.Array, k: int = 20, idx: jax.Array | None = None) -> jax.Array:
    """DGCNN edge features in channels-last layout.

    x: [B, N, C] -> [B, N, k, 2C] where the feature is
    ``concat([x_j - x_i, x_j])`` over the k nearest neighbours of each
    point (fd/snn_coder.py:52-68, re-laid-out so C sits on TPU lanes).
    """
    if idx is None:
        idx = knn(x, k)
    neighbors = index_points(x, idx)            # [B, N, k, C]
    center = x[..., :, None, :]                  # [B, N, 1, C]
    return jnp.concatenate([neighbors - center, jnp.broadcast_to(neighbors, neighbors.shape)], axis=-1)


def farthest_point_sample(points: jax.Array, npoint: int,
                          start_idx: int | None = None) -> jax.Array:
    """Iterative farthest point sampling, matching generate.py:56-74.

    points: [N, 3] -> int32 [npoint] indices. Start index defaults to N//2
    and the running min-distance buffer is initialised to 1e32, exactly as
    the reference does. Sequential by nature; expressed as a fori_loop so
    XLA keeps the whole loop on-device.
    """
    n = points.shape[0]
    if start_idx is None:
        start_idx = n // 2

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[i].set(farthest)
        centroid = points[farthest]
        d = jnp.sum((points - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, d)
        return centroids, distance, jnp.argmax(distance).astype(jnp.int32)

    centroids = jnp.zeros((npoint,), dtype=jnp.int32)
    distance = jnp.full((n,), 1e32, dtype=points.dtype)
    farthest = jnp.asarray(start_idx, dtype=jnp.int32)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids, distance, farthest))
    return centroids


def farthest_point_sample_masked(points: jax.Array, npoint: int,
                                 n_valid: jax.Array) -> jax.Array:
    """FPS over the first ``n_valid`` rows of a padded [N, 3] buffer.

    Same semantics as ``farthest_point_sample`` (start index n_valid//2,
    1e32 init) but ignores pad rows, so the whole pipeline can stay
    device-resident with bucketed static shapes. ``n_valid`` may be traced.

    On TPU this dispatches to the VMEM-resident Pallas kernel (the XLA
    fori_loop round-trips HBM every one of the npoint iterations:
    ~185 us/iter at 262k candidates vs ~2 us/iter in VMEM).
    """
    n = points.shape[0]
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if (on_tpu and n % 128 == 0 and npoint % 128 == 0
            and n * 20 <= 12 * 2 ** 20):
        from sapcu_tpu.ops.pallas_kernels import fps_masked_pallas
        return fps_masked_pallas(points.astype(jnp.float32), npoint,
                                 n_valid)
    valid = jnp.arange(n) < n_valid

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[i].set(farthest)
        centroid = points[farthest]
        d = jnp.sum((points - centroid) ** 2, axis=-1)
        distance = jnp.where(valid, jnp.minimum(distance, d), -jnp.inf)
        return centroids, distance, jnp.argmax(distance).astype(jnp.int32)

    centroids = jnp.zeros((npoint,), dtype=jnp.int32)
    distance = jnp.where(valid, 1e32, -jnp.inf).astype(points.dtype)
    farthest = (n_valid // 2).astype(jnp.int32)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body,
                                        (centroids, distance, farthest))
    return centroids


def _skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zero = jnp.zeros_like(v[..., 0])
    rows = jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ], axis=-2)
    return rows


def rotation_to_target(vec: jax.Array, target: jax.Array) -> jax.Array:
    """Rotation matrix aligning ``vec`` with ``target`` (Rodrigues form).

    vec, target: [..., 3] -> [..., 3, 3]. Batched/vmappable replacement for
    the serial numpy loop at generation.py:157-160.

    Parity quirk preserved: when cross(vec, target) == 0 — i.e. the vectors
    are parallel OR antiparallel — the reference returns the identity
    (generation.py:41-47); so do we (via an s^2 <= eps guard).
    """
    a = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)
    b = target / jnp.linalg.norm(target, axis=-1, keepdims=True)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)
    s2 = jnp.sum(v * v, axis=-1)
    kmat = _skew(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=vec.dtype), kmat.shape)
    safe_s2 = jnp.where(s2 > 1e-12, s2, 1.0)
    factor = ((1.0 - c) / safe_s2)[..., None, None]
    rot = eye + kmat + jnp.matmul(kmat, kmat) * factor
    return jnp.where((s2 > 1e-12)[..., None, None], rot, eye)


def rotate_points(rot: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [..., 3, 3] rotation to [..., K, 3] points: (R @ p^T)^T."""
    return jnp.einsum("...ij,...kj->...ki", rot, pts)


def point_triangle_closest(a: jax.Array, b: jax.Array, c: jax.Array,
                           p: jax.Array) -> jax.Array:
    """Closest point on triangle (a, b, c) to p; all [..., 3].

    Branchless re-derivation of the classic Voronoi-region closest-point
    algorithm that dense.cpp:135-174 implements, with the same region
    ordering so results agree bit-for-bit up to float precision.
    """
    ab, ac, bc = b - a, c - a, c - b

    def dot(u, v):
        return jnp.sum(u * v, axis=-1)

    snom, sdenom = dot(p - a, ab), dot(p - b, a - b)
    tnom, tdenom = dot(p - a, ac), dot(p - c, a - c)
    unom, udenom = dot(p - b, bc), dot(p - c, b - c)

    n = jnp.cross(ab, ac)
    vc = dot(n, jnp.cross(a - p, b - p))
    va = dot(n, jnp.cross(b - p, c - p))
    vb = dot(n, jnp.cross(c - p, a - p))

    def safe_div(num, den):
        return num / jnp.where(den == 0, 1.0, den)

    on_ab = a + ab * safe_div(snom, snom + sdenom)[..., None]
    on_bc = b + bc * safe_div(unom, unom + udenom)[..., None]
    on_ca = a + ac * safe_div(tnom, tnom + tdenom)[..., None]
    denom = va + vb + vc
    u = safe_div(va, denom)[..., None]
    v = safe_div(vb, denom)[..., None]
    interior = a * u + b * v + c * (1.0 - u - v)

    conds = [
        (snom <= 0) & (tnom <= 0),                     # vertex a
        (sdenom <= 0) & (unom <= 0),                   # vertex b
        (tdenom <= 0) & (udenom <= 0),                 # vertex c
        (vc <= 0) & (snom >= 0) & (sdenom >= 0),       # edge ab
        (va <= 0) & (unom >= 0) & (udenom >= 0),       # edge bc
        (vb <= 0) & (tnom >= 0) & (tdenom >= 0),       # edge ca
    ]
    outs = [jnp.broadcast_to(x, interior.shape)
            for x in (a, b, c, on_ab, on_bc, on_ca)]
    result = interior
    # jnp.select evaluates first-match-wins, mirroring the early returns.
    conds_b = [jnp.broadcast_to(cc[..., None], interior.shape) for cc in conds]
    result = jnp.select(conds_b, outs, interior)
    return result


@functools.partial(jax.jit, static_argnames=("k", "chunk", "approx"))
def knn_tiled(queries: jax.Array, refs: jax.Array, k: int,
              chunk: int = 1024, approx: bool = False
              ) -> tuple[jax.Array, jax.Array]:
    """Memory-tiled kNN for large query sets (inference seed shells).

    queries: [Q, C], refs: [N, C] -> (sqdist [Q, k], idx int32 [Q, k]).
    Processes queries in ``chunk``-row tiles with a lax.map so peak memory
    is chunk*N instead of Q*N. Q must not be huge relative to padding: the
    query array is zero-padded up to a multiple of ``chunk`` and the pad
    rows are discarded.

    approx=True selects neighbours with ``lax.approx_min_k`` (TPU
    PartialReduce, recall ~0.95) instead of a full sort — for N in the
    hundreds of thousands the sort dominates (measured 7.1s vs ~0.3s for
    the 30-NN outlier filter over 262k points); a ~5% recall miss swaps a
    neighbour for the next-nearest one, which statistical consumers (the
    outlier filter's mean distance) cannot distinguish.
    """
    q = queries.shape[0]
    k = min(k, refs.shape[0])
    pad = (-q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    tiles = qp.reshape(-1, chunk, queries.shape[-1])

    def one(tile):
        d = pairwise_sqdist(tile, refs)
        if approx:
            vals, idx = jax.lax.approx_min_k(d, k, recall_target=0.95)
            return vals, idx.astype(jnp.int32)
        neg, idx = top_k_select(-d, k)
        return -neg, idx

    dists, idxs = jax.lax.map(one, tiles)
    dists = dists.reshape(-1, k)[:q]
    idxs = idxs.reshape(-1, k)[:q]
    return dists, idxs


def morton_code(points: jax.Array, cell: float,
                origin: float = -0.5) -> jax.Array:
    """Z-order (Morton) key of each point's voxel, 10 bits per axis.

    points [..., 3] -> int32 [...] in [0, 2^30). Points quantized to
    ``cell``-sized voxels from ``origin``; coordinates clip to [0, 1023].
    Sorting by this key gives a space-filling-curve order in which
    spatially near points are (mostly) near in rank — the basis of the
    window-kNN approximation used by the inference outlier filter.
    """
    q = jnp.clip(jnp.floor((points - origin) / cell), 0, 1023).astype(
        jnp.int32)

    def spread(x):  # interleave 10 bits with two zero bits each
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
            | (spread(q[..., 2]) << 2))


def smallest_eigvec_sym3(a: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of a symmetric 3x3.

    a: [..., 3, 3] -> [..., 3]. Closed-form trigonometric eigenvalues
    (Eberly) + cross-product eigenvector extraction — pure elementwise
    math, so it vmaps/fuses on the VPU with no LAPACK custom call (TPU
    jnp.linalg.eigh lowers to a slow CPU-style QR custom call). Replaces
    the per-point sklearn/numpy eigh of the reference's PCA-normal tooling
    (scripts/generate_gt_normals.py:33-51).

    Degenerate inputs (isotropic or rank-0 neighbourhoods) return an
    arbitrary but valid unit vector; callers that care orient/replace it.
    """
    af = a.astype(jnp.float32)
    # scale-normalise for conditioning (eigenvectors are scale-invariant)
    scale = jnp.maximum(jnp.abs(af).max(axis=(-2, -1), keepdims=True), 1e-30)
    af = af / scale
    q = jnp.trace(af, axis1=-2, axis2=-1)[..., None, None] / 3.0
    b = af - q * jnp.eye(3, dtype=af.dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1), keepdims=True) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = jnp.linalg.det(b / p)[..., None, None]
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # smallest eigenvalue: q + 2 p cos(phi + 2*pi/3)
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    m = af - lam * jnp.eye(3, dtype=af.dtype)
    # rows of m span the complement of the eigenspace: the largest cross
    # product of row pairs is the most numerically stable eigenvector
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    best = jnp.where(n01 >= n02,
                     jnp.where(n01 >= n12, c01, c12),
                     jnp.where(n02 >= n12, c02, c12))
    bn = jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True), 0.0)
    # isotropic fallback: all cross products vanish -> pick x-hat
    fallback = jnp.zeros_like(best).at[..., 0].set(1.0)
    ok = bn > 1e-24
    v = jnp.where(ok, best, fallback)
    return v / jnp.sqrt(jnp.maximum(
        jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))


def local_plane(rel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Oriented local tangent plane from query-relative neighbours.

    rel: [..., m, 3] neighbour offsets (neighbour - query) ->
    (normal [..., 3] unit, toward the neighbourhood centroid — the
    toward-surface orientation for off-surface queries, matching the
    pseudo-normal label convention of sample_mesh-fn.py:95-173;
    dist [...]: distance from the query to the PCA plane through the
    neighbourhood centroid).

    This is the analytic prior the sc model corrects: on the synthetic
    family it alone reaches ~9-10 deg mean angular error vs the true SDF
    normal (vs ~25 deg noise in the pseudo-normal training label).
    """
    c = jnp.mean(rel, axis=-2)                              # [..., 3]
    centered = rel - c[..., None, :]
    cov = jnp.einsum("...mi,...mj->...ij", centered, centered)
    n = smallest_eigvec_sym3(cov)
    sign = jnp.sign(jnp.sum(n * c, axis=-1, keepdims=True))
    n = n * jnp.where(sign == 0, 1.0, sign)
    dist = jnp.abs(jnp.sum(c * n, axis=-1))
    return n, dist
