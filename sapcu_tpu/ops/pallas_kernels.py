"""Pallas TPU kernels for the hot inference ops.

`surface_distance_pallas` fuses the entire per-voxel seed-distance
computation (the dense.cpp:214-225 semantics, see ops/seeds.py) into one
kernel: squared-distance matmul on the MXU, iterative exact 10-NN
selection on the VPU, neighbour *gathers as one-hot matmuls* (TPU Pallas
has no vector gather; a [TILE, N] one-hot times [N, 3] runs on the MXU
instead), then the 8-triangle closest-point math elementwise — no
intermediate ever leaves VMEM, vs. the XLA path which materialises the
[TILE, N] distance matrix + top-k indices between fusions.

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 10  # neighbours per voxel (dense.cpp kd.query(center, 10))

_INV_SQRT_2PI = 0.3989422804014327
_CLAMP = 10.0


def _soft_spike(x, grad_width):
    xc = jnp.clip(x, -_CLAMP, _CLAMP)
    return (0.5 * jnp.exp(-0.5 * xc * xc) * _INV_SQRT_2PI
            + 0.5 * jax.nn.sigmoid(grad_width * xc))


def _make_lif_kernel(time_steps: int, kind: str, hard: bool,
                     grad_width: float):
    is_eif = kind == "eif"

    def kernel(*refs):
        if is_eif:
            (x_ref, md_ref, ta_ref, rd_ref, tb_ref, dt_ref, trh_ref,
             out_ref) = refs
        else:
            x_ref, md_ref, ta_ref, rd_ref, tb_ref, out_ref = refs
        x = x_ref[:]                                     # [TR, C]
        md = jnp.clip(md_ref[0, :], 0.1, 0.99)
        ta = jnp.clip(ta_ref[0, :], 0.001, 0.1)
        rd = jnp.clip(rd_ref[0, :], 0.1, 0.95)
        tb = tb_ref[0, :]
        if is_eif:
            dt = jnp.clip(dt_ref[0, :], 0.1, 5.0)
            trh = jnp.clip(trh_ref[0, :], 0.1, 2.0)

        m = jnp.zeros_like(x)
        th = jnp.broadcast_to(tb, x.shape)
        r = jnp.zeros_like(x)
        cur = x
        for _ in range(time_steps):  # T <= 8: fully unrolled in VMEM
            gated = cur * (r <= 0).astype(cur.dtype)
            if is_eif:
                exp_term = dt * jnp.exp(
                    jnp.clip((m - trh) / (dt + 1e-6), -5.0, 5.0))
                m = m * md * (1.0 - r) + gated + exp_term
            else:
                m = m * md * (1.0 - r) + gated
            v = m - th
            s = (v > 0).astype(cur.dtype) if hard else _soft_spike(
                v, grad_width)
            m = m * (1.0 - s)
            r = r * rd + s
            th = tb + (th + ta * s - tb) * 0.95
            cur = s
        out_ref[:] = cur

    return kernel


@functools.partial(jax.jit, static_argnames=("time_steps", "kind", "hard",
                                             "grad_width", "tile",
                                             "interpret"))
def lif_multistep_pallas(params: dict, x: jax.Array, time_steps: int,
                         kind: str = "lif", hard: bool = False,
                         grad_width: float = 10.0, tile: int = 512,
                         interpret: bool = False) -> jax.Array:
    """Fused T-step spike-feedback neuron loop (inference path).

    The TPU analog of the vendored spikingjelly fused multi-step neuron
    CUDA kernels (external/SPT/spikingjelly/clock_driven/neuron_kernel.cu,
    SURVEY.md §2.3 N7): the whole ``for t: x, state = cell(x, state)`` loop
    of fn/snn_coder.py:319-335 runs in VMEM per tile — one HBM read of the
    input and one write of the final spikes, instead of a scan carry
    round-tripping T times. Forward-only; training uses the XLA scan with
    the surrogate-gradient custom VJP.

    x: [R, C] rows; params: per-channel dicts from snn.lif_init/eif_init.
    ``hard`` selects binary spikes (training forward) vs the soft mixture
    (eval forward, the reference quirk).
    """
    r, c = x.shape
    pad = (-r) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    n_tiles = xp.shape[0] // tile
    names = ["membrane_decay", "threshold_adapt", "refractory_decay",
             "threshold_base"]
    if kind == "eif":
        names += ["delta_t", "theta_rh"]
    pvecs = [params[n].reshape(1, c) for n in names]

    space = pltpu.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _make_lif_kernel(time_steps, kind, hard, grad_width),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=space)]
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=space)
           for _ in pvecs],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(xp, *pvecs)
    return out[:r]


def _nn_triangle_best(c, p):
    """Shared kernel body: centers [T, 3], points [N, 3] -> (best squared
    triangle distance [T], squared 10th-NN distance [T])."""
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)          # [T, 1]
    p2 = jnp.sum(p * p, axis=-1)                         # [N]
    # precision=HIGHEST: Mosaic otherwise lowers f32 MXU dots to a single
    # bf16 pass, which perturbs distances by up to ~1e-3 — a quarter of
    # the emission band width (the XLA reference path, pinned bitwise to
    # the reference ELF by tests/test_seeds.py, accumulates in f32)
    dist = c2 + p2[None, :] - 2.0 * jnp.dot(
        c, p.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [T, N]

    # exact 10-NN selection: iterative argmin + one-hot masking; the
    # one-hot row also serves as the gather matrix for the coordinates.
    nn = []
    d = dist
    d10 = None
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    for _ in range(_K):
        d10 = jnp.min(d, axis=-1)                        # this round's NN
        i = jnp.argmin(d, axis=-1)                       # [T]
        onehot = (col == i[:, None]).astype(jnp.float32)  # [T, N]
        nn.append(jnp.dot(onehot, p, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))
        d = jnp.where(onehot > 0, jnp.inf, d)

    nearest, second = nn[0], nn[1]                       # [T, 3]

    def dot3(a, b):
        return jnp.sum(a * b, axis=-1)

    def cross_c(u, v):
        """Component tuple cross product (Mosaic can't lower jnp.cross's
        internal concatenate; keep components as separate [T] vectors)."""
        ux, uy, uz = u[:, 0], u[:, 1], u[:, 2]
        vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
        return (uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx)

    def dot_c(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    best = jnp.full(c.shape[:1], jnp.inf, jnp.float32)
    for j in range(2, _K):
        a, b2, c3, q = nn[j], second, nearest, c
        ab, ac, bc = b2 - a, c3 - a, c3 - b2
        snom, sdenom = dot3(q - a, ab), dot3(q - b2, a - b2)
        tnom, tdenom = dot3(q - a, ac), dot3(q - c3, a - c3)
        unom, udenom = dot3(q - b2, bc), dot3(q - c3, b2 - c3)
        nrm = cross_c(ab, ac)
        vc = dot_c(nrm, cross_c(a - q, b2 - q))
        va = dot_c(nrm, cross_c(b2 - q, c3 - q))
        vb = dot_c(nrm, cross_c(c3 - q, a - q))

        def safe(numer, denom):
            return numer / jnp.where(denom == 0, 1.0, denom)

        on_ab = a + ab * safe(snom, snom + sdenom)[:, None]
        on_bc = b2 + bc * safe(unom, unom + udenom)[:, None]
        on_ca = a + ac * safe(tnom, tnom + tdenom)[:, None]
        den = va + vb + vc
        u = safe(va, den)[:, None]
        v = safe(vb, den)[:, None]
        interior = a * u + b2 * v + c3 * (1.0 - u - v)

        conds = [
            (snom <= 0) & (tnom <= 0),
            (sdenom <= 0) & (unom <= 0),
            (tdenom <= 0) & (udenom <= 0),
            (vc <= 0) & (snom >= 0) & (sdenom >= 0),
            (va <= 0) & (unom >= 0) & (udenom >= 0),
            (vb <= 0) & (tnom >= 0) & (tdenom >= 0),
        ]
        outs = [a, b2, c3, on_ab, on_bc, on_ca]
        cp = interior
        for cond, val in zip(reversed(conds), reversed(outs)):
            cp = jnp.where(cond[:, None], val, cp)
        best = jnp.minimum(best, jnp.sum((cp - q) ** 2, axis=-1))

    return best, d10  # d10: squared distance of the 10th-nearest point


def _kernel(centers_ref, points_ref, out_ref):
    best, _ = _nn_triangle_best(centers_ref[:], points_ref[:])
    out_ref[:, 0] = jnp.sqrt(best)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def surface_distance_pallas(centers: jax.Array, points: jax.Array,
                            tile: int = 128,
                            interpret: bool = False) -> jax.Array:
    """centers [C, 3], points [N, 3] -> [C] band distances (float32)."""
    c = centers.shape[0]
    pad = (-c) % tile
    cp = jnp.pad(centers, ((0, pad), (0, 0))).astype(jnp.float32)
    n_tiles = cp.shape[0] // tile

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(points.shape, lambda i: (0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(cp, points.astype(jnp.float32))
    return out[:c, 0]


# ----------------------------------------------- blocked shortlist kernel
def _tri_sqdist_c(a, b, c, q):
    """Squared point-triangle distance, component tuples of [G, T] arrays.

    Exactly ops.pointops.point_triangle_closest's Voronoi-region formula
    (dense.cpp:135-174 semantics) with the same first-match-wins region
    priority, written per-component so Mosaic never sees a [..., 3] lane
    axis or a concatenate.
    """
    def sub(u, v):
        return (u[0] - v[0], u[1] - v[1], u[2] - v[2])

    def dot(u, v):
        return (u[0] * v[0] + u[1] * v[1]) + u[2] * v[2]

    def cross(u, v):
        return (u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    def axpy(p, d, s):  # p + d * s
        return (p[0] + d[0] * s, p[1] + d[1] * s, p[2] + d[2] * s)

    ab, ac, bc = sub(b, a), sub(c, a), sub(c, b)
    snom, sdenom = dot(sub(q, a), ab), dot(sub(q, b), sub(a, b))
    tnom, tdenom = dot(sub(q, a), ac), dot(sub(q, c), sub(a, c))
    unom, udenom = dot(sub(q, b), bc), dot(sub(q, c), sub(b, c))

    nrm = cross(ab, ac)
    vc = dot(nrm, cross(sub(a, q), sub(b, q)))
    va = dot(nrm, cross(sub(b, q), sub(c, q)))
    vb = dot(nrm, cross(sub(c, q), sub(a, q)))

    def safe_div(num, den):
        return num / jnp.where(den == 0, 1.0, den)

    on_ab = axpy(a, ab, safe_div(snom, snom + sdenom))
    on_bc = axpy(b, bc, safe_div(unom, unom + udenom))
    on_ca = axpy(a, ac, safe_div(tnom, tnom + tdenom))
    den = va + vb + vc
    u = safe_div(va, den)
    v = safe_div(vb, den)
    interior = (a[0] * u + b[0] * v + c[0] * (1.0 - u - v),
                a[1] * u + b[1] * v + c[1] * (1.0 - u - v),
                a[2] * u + b[2] * v + c[2] * (1.0 - u - v))

    conds = [
        (snom <= 0) & (tnom <= 0),                     # vertex a
        (sdenom <= 0) & (unom <= 0),                   # vertex b
        (tdenom <= 0) & (udenom <= 0),                 # vertex c
        (vc <= 0) & (snom >= 0) & (sdenom >= 0),       # edge ab
        (va <= 0) & (unom >= 0) & (udenom >= 0),       # edge bc
        (vb <= 0) & (tnom >= 0) & (tdenom >= 0),       # edge ca
    ]
    outs = [a, b, c, on_ab, on_bc, on_ca]
    cp = interior
    for cond, val in zip(reversed(conds), reversed(outs)):
        cp = (jnp.where(cond, val[0], cp[0]),
              jnp.where(cond, val[1], cp[1]),
              jnp.where(cond, val[2], cp[2]))
    dq = sub(cp, q)
    return (dq[0] * dq[0] + dq[1] * dq[1]) + dq[2] * dq[2]


def _make_blocked_kernel(g: int, k: int, t: int):
    def kernel(cx_ref, cy_ref, cz_ref, px_ref, py_ref, pz_ref,
               best_ref, d10_ref):
        cx, cy, cz = cx_ref[:], cy_ref[:], cz_ref[:]      # [G, T]
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]      # [G, K]

        # pairwise_sqdist's exact formula (s2 - 2*inner + d2), candidates
        # on the sublane axis, voxels on lanes -> [G, K, T]. Pure VPU f32:
        # no MXU dot, hence no Mosaic bf16-pass precision caveat (see
        # surface_distance_pallas above / CLAUDE.md round-2 notes).
        c2 = (cx * cx + cy * cy) + cz * cz                # [G, T]
        p2 = (px * px + py * py) + pz * pz                # [G, K]
        inner = ((px[:, :, None] * cx[:, None, :]
                  + py[:, :, None] * cy[:, None, :])
                 + pz[:, :, None] * cz[:, None, :])       # [G, K, T]
        d = (c2[:, None, :] - 2.0 * inner) + p2[:, :, None]

        kiota = jax.lax.broadcasted_iota(jnp.int32, (g, k, t), 1)
        q = (cx, cy, cz)
        nn0 = nn1 = None
        best = jnp.full((g, t), jnp.inf, jnp.float32)
        d10 = None
        for j in range(_K):
            m = jnp.min(d, axis=1)                        # [G, T]
            # first index attaining the min — topk_small's argmax tie rule
            ik = jnp.min(jnp.where(d == m[:, None, :], kiota, k), axis=1)
            oh = kiota == ik[:, None, :]                  # [G, K, T]
            nn = (jnp.sum(jnp.where(oh, px[:, :, None], 0.0), axis=1),
                  jnp.sum(jnp.where(oh, py[:, :, None], 0.0), axis=1),
                  jnp.sum(jnp.where(oh, pz[:, :, None], 0.0), axis=1))
            d = jnp.where(oh, jnp.inf, d)
            if j == 0:
                nn0 = nn                                  # nearest (c role)
            elif j == 1:
                nn1 = nn                                  # second (b role)
            else:
                best = jnp.minimum(best, _tri_sqdist_c(nn, nn1, nn0, q))
            if j == _K - 1:
                d10 = m
        best_ref[:] = jnp.sqrt(best)
        d10_ref[:] = jnp.sqrt(jnp.maximum(d10, 0.0))

    return kernel


@functools.partial(jax.jit, static_argnames=("gblocks", "interpret"))
def blocked_nn_triangle_pallas(cx, cy, cz, px, py, pz, gblocks: int = 8,
                               interpret: bool = False
                               ) -> tuple[jax.Array, jax.Array]:
    """Fused per-block 10-NN + 8-triangle surface distances.

    cx/cy/cz: [NB, T] voxel-center coordinate planes; px/py/pz: [NB, K]
    per-block candidate coordinate planes -> (triangle distance [NB, T],
    10th-NN distance [NB, T]), both float32.

    The XLA path (ops/seeds.py::surface_distance_blocked) round-trips the
    [NB, T, K] distance tensor through HBM ~10x for the selection rounds
    plus one-hot gather matmuls (~80 GB per bench cloud — measured
    0.24 s of the 0.53 s seed stage at N=2048). Here each block's
    [K, T] matrix stays in VMEM for all 10 rounds and the triangle math;
    HBM traffic is one read of the coords and one write of the two
    results (~0.13 GB). Distances use pairwise_sqdist's exact f32
    formula as elementwise VPU ops — no MXU dot is issued anywhere, so
    Mosaic's f32-dot-as-bf16-pass lowering (the round-2 seed-kernel
    bug) cannot perturb them.
    """
    nb, t = cx.shape
    k = px.shape[1]
    g = max(1, min(gblocks, nb))
    padb = (-nb) % g
    if padb:
        def padb_(a):
            return jnp.pad(a, ((0, padb), (0, 0)))
        cx, cy, cz = padb_(cx), padb_(cy), padb_(cz)
        px, py, pz = padb_(px), padb_(py), padb_(pz)
    grid = (cx.shape[0] // g,)
    space = pltpu.ANY if interpret else pltpu.VMEM
    spec_c = pl.BlockSpec((g, t), lambda i: (i, 0), memory_space=space)
    spec_p = pl.BlockSpec((g, k), lambda i: (i, 0), memory_space=space)
    best, d10 = pl.pallas_call(
        _make_blocked_kernel(g, k, t),
        grid=grid,
        in_specs=[spec_c] * 3 + [spec_p] * 3,
        out_specs=(spec_c, spec_c),
        out_shape=(jax.ShapeDtypeStruct(cx.shape, jnp.float32),
                   jax.ShapeDtypeStruct(cx.shape, jnp.float32)),
        interpret=interpret,
    )(cx, cy, cz, px, py, pz)
    return best[:nb], d10[:nb]


# --------------------------------------------------------------- FPS kernel
def _fps_kernel(nv_ref, x_ref, y_ref, z_ref, out_ref, dmin_ref):
    """VMEM-resident farthest point sampling.

    The whole candidate buffer lives in VMEM for the full run: each of the
    npoint iterations is ~6 VPU passes over [R, 128] instead of an HBM
    round-trip per iteration, which makes the inherently sequential loop
    (the XLA fori_loop version measures ~185 us/iter at 262k candidates;
    this kernel ~2 us/iter) compute-bound again. Semantics identical to
    ops.farthest_point_sample_masked (start n_valid//2, first-max ties).
    """
    n_valid = nv_ref[0]
    r, c = x_ref.shape
    row_i = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    flat_i = row_i * c + col_i
    valid = flat_i < n_valid
    dmin_ref[:] = jnp.where(valid, 1e32, -jnp.inf).astype(jnp.float32)
    ro, co = out_ref.shape
    npoint = ro * co
    out_i = (jax.lax.broadcasted_iota(jnp.int32, (ro, co), 0) * co
             + jax.lax.broadcasted_iota(jnp.int32, (ro, co), 1))
    out_ref[:] = jnp.zeros((ro, co), jnp.int32)

    def body(i, farthest):
        # dynamic-lane scalar stores aren't supported; a masked full-array
        # select over the tiny [npoint/128, 128] output is ~free
        out_ref[:] = jnp.where(out_i == i, farthest, out_ref[:])
        # centroid coords via masked sums (dynamic-lane loads unsupported)
        sel = flat_i == farthest
        px = jnp.sum(jnp.where(sel, x_ref[:], 0.0))
        py = jnp.sum(jnp.where(sel, y_ref[:], 0.0))
        pz = jnp.sum(jnp.where(sel, z_ref[:], 0.0))
        d = ((x_ref[:] - px) ** 2 + (y_ref[:] - py) ** 2
             + (z_ref[:] - pz) ** 2)
        dm = jnp.where(valid, jnp.minimum(dmin_ref[:], d), -jnp.inf)
        dmin_ref[:] = dm
        m = jnp.max(dm)
        # first flat index attaining the max (jnp.argmax tie rule)
        best = jnp.min(jnp.where(dm == m, flat_i, jnp.int32(2 ** 30)))
        return best

    jax.lax.fori_loop(0, npoint, body, n_valid // 2)


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_masked_pallas(points: jax.Array, npoint: int,
                      n_valid: jax.Array) -> jax.Array:
    """Drop-in Pallas version of ``farthest_point_sample_masked``.

    points: [N, 3] float32 (N a multiple of 128, pad rows arbitrary),
    returns int32 [npoint] indices. Requires 5*N*4 bytes of VMEM
    (N <= ~512k).
    """
    n = points.shape[0]
    assert n % 128 == 0 and npoint % 128 == 0, (n, npoint)
    r = n // 128
    cols = points.astype(jnp.float32).T.reshape(3, r, 128)
    nv = jnp.asarray(n_valid, jnp.int32)[None]
    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((npoint // 128, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
    )(nv, cols[0], cols[1], cols[2])
    return out.reshape(npoint)


# --------------------------------------------------- fused fn branch kernel
def _lif4_soft(x, md, ta, rd, tb, grad_width=10.0):
    """Eval-mode 4-step spike-feedback LIF chain (soft spikes), exactly
    snn.multi_step semantics (see _make_lif_kernel)."""
    md = jnp.clip(md, 0.1, 0.99)
    ta = jnp.clip(ta, 0.001, 0.1)
    rd = jnp.clip(rd, 0.1, 0.95)
    m = jnp.zeros_like(x)
    th = jnp.broadcast_to(tb, x.shape)
    r = jnp.zeros_like(x)
    cur = x
    for _ in range(4):
        gated = cur * (r <= 0).astype(cur.dtype)
        m = m * md * (1.0 - r) + gated
        v = m - th
        s = _soft_spike(v, grad_width)
        m = m * (1.0 - s)
        r = r * rd + s
        th = tb + (th + ta * s - tb) * 0.95
        cur = s
    return cur


def _make_fn_branch_kernel(n: int, k: int, c: int, hd: int):
    inv_sqrt_hd = 1.0 / (hd ** 0.5)

    def kernel(u_ref, q_ref, kf_ref, v_ref, idx_ref, tc_ref,
               wd2_ref, bd2_ref, wg_ref, bg_ref, wg2_ref, bg2_ref,
               sd_ref, sd2_ref, sg_ref, out_ref):
        u, q, kf, v = u_ref[0], q_ref[0], kf_ref[0], v_ref[0]   # [N, C]
        idx = idx_ref[0]                                         # [N, k]
        dt = u.dtype

        # one-hot gather matrix [N*k, N] built in VMEM
        col = jax.lax.broadcasted_iota(jnp.int32, (n, k, n), 2)
        oh = (col == idx[:, :, None]).astype(dt).reshape(n * k, n)

        def gath(src):
            return jnp.dot(oh, src, preferred_element_type=jnp.float32
                           ).astype(dt)

        def rep(src):   # row i of src repeated k times consecutively
            return jnp.broadcast_to(src[:, None, :], (n, k, c)
                                    ).reshape(n * k, c)

        def mm(x, w_ref, b_ref):
            y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
            return (y + b_ref[0].astype(jnp.float32)).astype(dt)

        def snn4(x, p_ref):
            # f32 inside the chain: Mosaic has no bf16 compare, and the
            # XLA path promotes to f32 anyway (f32 params x bf16 input)
            p = p_ref[:]                                         # [4, C]
            return _lif4_soft(x, p[0], p[1], p[2], p[3])

        pos0 = rep(u) - gath(u) + tc_ref[0].astype(dt)
        pos1 = snn4(pos0, sd_ref)
        pos3 = snn4(mm(pos1, wd2_ref, bd2_ref), sd2_ref)

        attn0 = rep(q) - gath(kf) + pos3
        attn2 = snn4(mm(attn0, wg_ref, bg_ref), sg_ref)
        attn3 = mm(attn2, wg2_ref, bg2_ref).astype(jnp.float32)

        a = (attn3 * inv_sqrt_hd).reshape(n, k, c)
        amax = jnp.max(a, axis=1, keepdims=True)
        e = jnp.exp(a - amax)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)

        val = (gath(v) + pos3).reshape(n, k, c)
        out_ref[0] = jnp.sum((p * val).astype(jnp.float32), axis=1
                             ).astype(dt)

    return kernel


@functools.partial(jax.jit, static_argnames=("hd", "interpret"))
def fn_branch_pallas(u, q, kf, v, idx, tc, wd2, bd2, wg, bg, wg2, bg2,
                     snn_delta, snn_delta2, snn_gamma, hd: int,
                     interpret: bool = False):
    """Fused fn attention branch (eval): per batch element, the whole
    gather -> pos-enc SNN chain -> fc_delta2+SNN -> gamma projections ->
    softmax -> weighted sum runs inside VMEM.

    MEASURED NEGATIVE RESULT (kept opt-in for the record): the XLA
    version round-trips HBM ~14 times per block with relayout copies at
    ~200 GB/s, and this kernel does eliminate that traffic — but
    Mosaic's elementwise throughput on the 4-step SNN chains (f32
    compares + transcendentals; bf16 compare/logistic lowerings are
    broken) loses more than the relayouts cost: 217-296 ms vs XLA's
    190 ms per 1024x100 patches on v5e. Off by default
    (SAPCU_FUSED_FN=1 to enable). BN affines must be pre-folded into
    the weight/bias args.

    u, q, kf, v: [B, N, C]; idx: [B, N, k] int32; snn_*: [4, C] stacked
    (membrane_decay, threshold_adapt, refractory_decay, threshold_base).
    Returns [B, N, C] (the pre-out_proj attention result).
    """
    b, n, c = u.shape
    k = idx.shape[-1]
    space = pltpu.ANY if interpret else pltpu.VMEM

    def vec(x):
        return x.reshape(1, -1)

    out = pl.pallas_call(
        _make_fn_branch_kernel(n, k, c, hd),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=space)] * 4
        + [pl.BlockSpec((1, n, k), lambda i: (i, 0, 0), memory_space=space)]
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=space)]
        + [pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=space),
           pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=space)] * 3
        + [pl.BlockSpec((4, c), lambda i: (0, 0), memory_space=space)] * 3,
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((b, n, c), u.dtype),
        interpret=interpret,
    )(u, q, kf, v, idx, vec(tc), wd2, vec(bd2), wg, vec(bg), wg2, vec(bg2),
      snn_delta, snn_delta2, snn_gamma)
    return out
