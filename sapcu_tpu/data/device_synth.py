"""Device-resident synthetic training data: batches generated ON the TPU.

Motivation (runtime-specific): on this runtime every host<->device byte
rides a stdio-relayed tunnel at ~100s KB/s — streaming even the reference's
small training batches (fd: 4x256x32x3 f32 = 393 KB/it) would cost seconds
per iteration and can wedge the device path outright. So for training
without the (absent) PU1K download, batches are synthesized on-device by a
jitted generator keyed by the iteration index: the only host->device
traffic per step is a PRNG key.

The recipe is the reference's own self-supervision, applied to procedural
shapes instead of ShapeNet meshes:

- Shapes are composite signed-distance fields (2 randomized primitives out
  of {ellipsoid, torus, capsule, rounded box, cone, wedge} — round 5 added
  the sharp/creased types and thin-plate box aspect ratios, VERDICT r4 #5 —
  randomly rotated/offset, min-union, optional low-frequency radial bump).
  Surface SAMPLES come
  from Newton projection p <- p - f(p) grad f / |grad f|^2 (a few
  iterations), normals from autodiff grad f.
- fn labels: pseudo-normal = normalize(mean(10-NN of query in a dense
  sampling) - query) — exactly the self-supervised normal label of
  /root/reference/scripts/sample_mesh-fn.py:95-173 (toward-surface
  orientation included).
- fd labels: 1-NN distance from the query to the dense sampling — the
  estimator of /root/reference/fd/datacore.py:124-129 with a denser GT.
- Queries sit OFF the surface at |t| ~ U[0.003, 0.03] along the local
  normal (both sides), the reference GT samplers' band
  (sample_mesh-fn.py keep-band / sample_mesh-rd.py length range), which
  covers the inference seed band [0.011, 0.015].

Deliberate divergence (documented, training recipe only): patches are
centered on the off-surface QUERY and, for fd, rotated by the GT
toward-surface normal -> +x̂ (the legacy transform semantics,
/root/reference/fd/transform.py:55-57). This matches the distribution the
inference pipeline feeds the models (generation.py:127-129,153-160),
unlike the reference's H5 path which trains fd on unrotated on-surface
self-patches and eats the shift at inference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sapcu_tpu import ops

# ----------------------------------------------------------------- SDFs


def _norm(x, axis=-1):
    """sqrt(sum x^2 + eps): NaN-free gradient at 0 (jnp.linalg.norm's
    gradient at the origin is 0/0, which poisons Newton projection)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)


def _sdf_ellipsoid(p, radii):
    # Inigo Quilez bound-correct approximation; exact enough for Newton
    k0 = _norm(p / radii)
    k1 = _norm(p / (radii * radii))
    return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-9)


def _sdf_torus(p, rR):
    q = jnp.stack([_norm(p[..., :2]) - rR[0],
                   p[..., 2]], axis=-1)
    return _norm(q) - rR[1]


def _sdf_capsule(p, hr):
    z = jnp.clip(p[..., 2], -hr[0], hr[0])
    q = p - jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
    return _norm(q) - hr[1]


def _sdf_roundbox(p, br):
    q = jnp.abs(p) - br[:3]
    outside = _norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside - br[3]


def _sdf_cone(p, hr):
    """Exact capped cone, apex radius 0 (sharp tip + sharp base rim).

    hr = (half-height h, base radius r). Round-4 OOF sweeps showed the
    upsampler adds points farther from the surface than the inputs on
    sharp-feature meshes (F-score@1e-2 below input at N=256) because the
    training family had no creases — cones/wedges/sharp boxes close that
    gap (VERDICT r4 #5)."""
    h, r = hr[0], hr[1]
    q = jnp.stack([_norm(p[..., ::2]), p[..., 1]], axis=-1)   # (len(xz), y)
    k1 = jnp.stack([jnp.zeros_like(h), h])                    # top: r2 = 0
    k2 = jnp.stack([-r, 2.0 * h])
    cax = q[..., 0] - jnp.minimum(q[..., 0],
                                  jnp.where(q[..., 1] < 0.0, r, 0.0))
    cay = jnp.abs(q[..., 1]) - h
    t = jnp.clip(jnp.sum((k1 - q) * k2, axis=-1)
                 / jnp.maximum(jnp.sum(k2 * k2), 1e-12), 0.0, 1.0)
    cb = q - k1 + t[..., None] * k2
    s = jnp.where((cb[..., 0] < 0.0) & (cay < 0.0), -1.0, 1.0)
    d2 = jnp.minimum(cax * cax + cay * cay,
                     jnp.sum(cb * cb, axis=-1))
    return s * jnp.sqrt(jnp.maximum(d2, 1e-12))


_WEDGE_N = jnp.array([0.70710678, 0.0, 0.70710678])  # 45-deg cut plane


def _sdf_wedge(p, bw):
    """Sharp box intersected with a 45-deg halfspace: a wedge with one
    concave-free sharp edge chain. max() of SDFs is exact away from the
    intersection crease — fine for sampling/Newton/labels a.e."""
    box = _sdf_roundbox(p, jnp.concatenate([bw[:3], jnp.zeros((1,))]))
    plane = jnp.sum(p * _WEDGE_N, axis=-1) - bw[3]
    return jnp.maximum(box, plane)


N_TYPES = 6  # ellipsoid, torus, capsule, roundbox, cone, wedge


def _rand_rotation(key):
    """Uniform random rotation matrix (quaternion method)."""
    q = jax.random.normal(key, (4,))
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
    w, x, y, z = q
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def sample_shape_params(key) -> dict:
    """Random composite-shape parameters (a pytree of traced scalars)."""
    ks = jax.random.split(key, 8)
    comps = []
    for i in range(2):
        kt, kp, kr, kc, kx = jax.random.split(ks[i], 5)
        onehot = jax.nn.one_hot(jax.random.randint(kt, (), 0, N_TYPES),
                                N_TYPES)
        radii = jax.random.uniform(kp, (3,), minval=0.16, maxval=0.40)
        rR = jnp.stack([jax.random.uniform(kp, (), minval=0.2, maxval=0.34),
                        jax.random.uniform(kc, (), minval=0.06, maxval=0.14)])
        hr = jnp.stack([jax.random.uniform(kp, (), minval=0.1, maxval=0.28),
                        jax.random.uniform(kc, (), minval=0.08, maxval=0.2)])
        # box extents down to 0.03 (thin plates / plate stacks) and round
        # radius down to 0 (sharp edges) — the r4 OOF families the
        # training data lacked
        br = jnp.concatenate([
            jax.random.uniform(kp, (3,), minval=0.03, maxval=0.32),
            jax.random.uniform(kc, (1,), minval=0.0, maxval=0.06)])
        cone_hr = jnp.stack([
            jax.random.uniform(kp, (), minval=0.15, maxval=0.32),
            jax.random.uniform(kc, (), minval=0.12, maxval=0.3)])
        bw = jnp.concatenate([
            jax.random.uniform(kp, (3,), minval=0.08, maxval=0.3),
            jax.random.uniform(kx, (1,), minval=-0.06, maxval=0.06)])
        comps.append({
            "onehot": onehot, "radii": radii, "rR": rR, "hr": hr, "br": br,
            "cone_hr": cone_hr, "bw": bw,
            "rot": _rand_rotation(kr),
            "center": jax.random.uniform(kc, (3,), minval=-0.12, maxval=0.12)
            * (1.0 if i else 0.0),  # first component stays centered
        })
    bump_amp = jax.random.uniform(ks[6], (), minval=0.0, maxval=0.008)
    bump_freq = jax.random.uniform(ks[7], (3,), minval=6.0, maxval=14.0)
    return {"comps": comps, "bump_amp": bump_amp, "bump_freq": bump_freq}


def shape_sdf(shape: dict, p: jax.Array) -> jax.Array:
    """Composite SDF at points [..., 3]."""
    ds = []
    for c in shape["comps"]:
        q = (p - c["center"]) @ c["rot"].T
        d = (c["onehot"][0] * _sdf_ellipsoid(q, c["radii"])
             + c["onehot"][1] * _sdf_torus(q, c["rR"])
             + c["onehot"][2] * _sdf_capsule(q, c["hr"])
             + c["onehot"][3] * _sdf_roundbox(q, c["br"])
             + c["onehot"][4] * _sdf_cone(q, c["cone_hr"])
             + c["onehot"][5] * _sdf_wedge(q, c["bw"]))
        ds.append(d)
    d = jnp.minimum(ds[0], ds[1])
    bump = shape["bump_amp"] * (
        jnp.sin(shape["bump_freq"][0] * p[..., 0])
        * jnp.sin(shape["bump_freq"][1] * p[..., 1])
        * jnp.sin(shape["bump_freq"][2] * p[..., 2]))
    return d + bump


def _sdf_grad(shape, p):
    g = jax.grad(lambda q: jnp.sum(shape_sdf(shape, q)))(p)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)


def project_to_surface(shape: dict, p: jax.Array, iters: int = 16
                       ) -> jax.Array:
    """Newton projection onto the SDF zero set."""
    for _ in range(iters):
        f = shape_sdf(shape, p)
        g = jax.grad(lambda q: jnp.sum(shape_sdf(shape, q)))(p)
        gn2 = jnp.maximum(jnp.sum(g * g, axis=-1, keepdims=True), 1e-9)
        p = p - (f[..., None] * g) / gn2
    return p


def sample_surface(shape: dict, key, n: int, iters: int = 16) -> jax.Array:
    """n approximately-uniform surface samples (projected ball samples)."""
    kd, kr = jax.random.split(key)
    v = jax.random.normal(kd, (n, 3))
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    pts = v * jax.random.uniform(kr, (n, 1), minval=0.15, maxval=0.45)
    return jnp.clip(project_to_surface(shape, pts, iters), -0.5, 0.5)


# ------------------------------------------------------------- batches


def _queries(shape, key, n, off_max: float = 0.03):
    """Off-surface queries q = p + t*n, |t| ~ U[0.003, off_max], both sides.

    Returns (q [n,3], true_normal [n,3], true_len [n]): the ANALYTIC
    toward-surface unit direction (-sign * grad f at p) and offset |t|.
    Training labels use the reference's noisy kNN estimators instead
    (_pseudo_normal / 1-NN); the true values are carried for honest
    quality EVALUATION (scripts/eval_synth_quality.py) — the estimator
    noise would otherwise put a floor under reported angular error that
    says nothing about the model."""
    kp, kt, ks = jax.random.split(key, 3)
    p = sample_surface(shape, kp, n)
    nrm = _sdf_grad(shape, p)
    t = jax.random.uniform(kt, (n, 1), minval=0.003, maxval=off_max)
    sign = jnp.where(jax.random.bernoulli(ks, 0.5, (n, 1)), 1.0, -1.0)
    return p + nrm * t * sign, -nrm * sign, t[:, 0]


def _pseudo_normal(dense, q, k: int = 10):
    """sample_mesh-fn.py:95-173 label: normalize(mean(k-NN) - query)."""
    d = ops.pairwise_sqdist(q, dense)
    _, idx = ops.topk_small(-d, k)
    nn = jnp.take(dense, idx, axis=0)               # [n, k, 3]
    v = jnp.mean(nn, axis=1) - q
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)


def _one_fn_sample(key, n_dense: int, n_cloud: int, n_patches: int, k: int,
                   jitter: float):
    ks = jax.random.split(key, 5)
    shape = sample_shape_params(ks[0])
    dense = sample_surface(shape, ks[1], n_dense)
    cloud = sample_surface(shape, ks[2], n_cloud)
    cloud = cloud + jitter * jax.random.normal(ks[3], cloud.shape)
    q, tn, tl = _queries(shape, ks[4], n_patches)
    gt = _pseudo_normal(dense, q)
    d = ops.pairwise_sqdist(q, cloud)
    _, idx = ops.topk_small(-d, k)
    patch = jnp.take(cloud, idx, axis=0) - q[:, None, :]
    return {"input": patch, "normal": gt, "true_normal": tn}


def _one_fd_sample(key, n_dense: int, n_cloud: int, n_queries: int, k: int,
                   jitter: float):
    ks = jax.random.split(key, 5)
    shape = sample_shape_params(ks[0])
    dense = sample_surface(shape, ks[1], n_dense)
    cloud = sample_surface(shape, ks[2], n_cloud)
    cloud = cloud + jitter * jax.random.normal(ks[3], cloud.shape)
    q, tn, tl = _queries(shape, ks[4], n_queries)
    # label: 1-NN distance to the dense sampling (fd/datacore.py:124-129)
    dd = ops.pairwise_sqdist(q, dense)
    lens = jnp.sqrt(jnp.maximum(jnp.min(dd, axis=-1), 0.0))
    # patch: query-centered kNN of the sparse cloud, rotated so the GT
    # toward-surface normal maps to +x̂ (fd/transform.py:55-57 semantics —
    # the distribution generation.py:153-160 feeds the model)
    d = ops.pairwise_sqdist(q, cloud)
    _, idx = ops.topk_small(-d, k)
    patch = jnp.take(cloud, idx, axis=0) - q[:, None, :]
    nrm = _pseudo_normal(dense, q)
    rot = ops.rotation_to_target(nrm, jnp.array([1.0, 0.0, 0.0]))
    patch = ops.rotate_points(rot, patch)
    return {"input": patch, "len": lens, "true_len": tl}


@functools.partial(jax.jit, static_argnames=("batch", "n_dense", "n_cloud",
                                             "n_patches", "k"))
def fn_synth_batch(key, batch: int, n_dense: int = 2048, n_cloud: int = 512,
                   n_patches: int = 64, k: int = 12,
                   jitter: float = 0.002) -> dict:
    """fn training batch {'input' [B,P,k,3], 'normal' [B,P,3]} on device."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda kk: _one_fn_sample(
        kk, n_dense, n_cloud, n_patches, k, jitter))(keys)


@functools.partial(jax.jit, static_argnames=("batch", "n_dense", "n_cloud",
                                             "n_queries", "k"))
def fd_synth_batch(key, batch: int, n_dense: int = 2048, n_cloud: int = 256,
                   n_queries: int = 256, k: int = 32,
                   jitter: float = 0.002) -> dict:
    """fd training batch {'input' [B,N,k,3], 'len' [B,N]} on device."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda kk: _one_fd_sample(
        kk, n_dense, n_cloud, n_queries, k, jitter))(keys)


def _one_sc_sample(key, n_dense: int, n_cloud: int, n_queries: int,
                   jitter: float, off_max: float = 0.03):
    """Shared-cloud-encoder sample: the cloud itself plus off-surface
    queries with the same pseudo-normal / 1-NN-distance labels the fn/fd
    recipes use (models/sc_model.py trains on the raw cloud, not
    per-query patches)."""
    ks = jax.random.split(key, 5)
    shape = sample_shape_params(ks[0])
    dense = sample_surface(shape, ks[1], n_dense)
    cloud = sample_surface(shape, ks[2], n_cloud)
    cloud = cloud + jitter * jax.random.normal(ks[3], cloud.shape)
    q, tn, tl = _queries(shape, ks[4], n_queries, off_max)
    nrm = _pseudo_normal(dense, q)
    dd = ops.pairwise_sqdist(q, dense)
    lens = jnp.sqrt(jnp.maximum(jnp.min(dd, axis=-1), 0.0))
    return {"cloud": cloud, "query": q, "normal": nrm, "len": lens,
            "true_normal": tn, "true_len": tl}


@functools.partial(jax.jit, static_argnames=("batch", "n_dense", "n_cloud",
                                             "n_queries"))
def sc_synth_batch(key, batch: int, n_dense: int = 4096, n_cloud: int = 1024,
                   n_queries: int = 512, jitter: float = 0.002,
                   off_max: float = 0.03) -> dict:
    """sc training batch {'cloud' [B,N,3], 'query' [B,S,3],
    'normal' [B,S,3], 'len' [B,S]} on device.

    off_max widens the query-offset band: at sparse serving densities
    the seed shell starts up to ~0.06 off-surface (measured N=256
    sphere: seed residual max 0.057), so the default 0.03 band leaves
    the farthest serving queries out of distribution."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda kk: _one_sc_sample(
        kk, n_dense, n_cloud, n_queries, jitter, off_max))(keys)


class DeviceSynthLoader:
    """DataLoader-shaped iterable yielding device-resident batches.

    Train mode folds the epoch counter into the key (fresh data every
    epoch); val mode replays the same keys every epoch (a fixed validation
    set). Drop-in for train/loop.py's loader slots — batches are jax
    arrays already on device, so the loop's host->device hop is a no-op.
    """

    def __init__(self, kind: str, batch_size: int, steps_per_epoch: int = 250,
                 *, seed: int = 0, train: bool = True,
                 label_source: str = "pseudo", **gen_kwargs):
        assert kind in ("fn", "fd", "sc")
        assert label_source in ("pseudo", "true"), label_source
        self.kind = kind
        self.batch_size = batch_size
        self.steps = steps_per_epoch
        self.seed = seed
        self.train = train
        # label_source="true" swaps the reference's noisy self-supervised
        # estimator labels (_pseudo_normal / 1-NN distance — measured
        # ~30 deg mean angular noise at the training offsets) for the
        # synthetic SDF's ANALYTIC normals/offsets that every batch
        # already carries. The default keeps the reference recipe
        # (sample_mesh-fn.py:95-173); "true" is the supervised-on-synth
        # recipe that removes the label-noise ceiling (fn plateaued at
        # 42 deg vs truth under pseudo labels). Patch geometry is
        # untouched — fd patches stay rotated by the PSEUDO normal, which
        # models serving-time fn error.
        self.label_source = label_source
        self.gen_kwargs = gen_kwargs
        self._epoch = 0

    def __len__(self):
        return self.steps

    def __iter__(self):
        base = jax.random.PRNGKey(self.seed)
        if self.train:
            base = jax.random.fold_in(base, self._epoch)
            self._epoch += 1
        gen = {"fn": fn_synth_batch, "fd": fd_synth_batch,
               "sc": sc_synth_batch}[self.kind]
        kwargs = dict(self.gen_kwargs)
        # n_cloud given as a list/tuple cycles input densities across
        # steps (one jit variant per size — a handful of compiles). The
        # arbitrary-SCALE serving pipeline sees any input density; an
        # encoder trained at one density underfits the others (sc at
        # n_cloud=1024 only: p2m tail at N=256 serving, VERDICT r3 #3).
        sizes = kwargs.pop("n_cloud", None)
        if not isinstance(sizes, (list, tuple)):
            sizes = [sizes] if sizes is not None else [None]
        for i in range(self.steps):
            key = jax.random.fold_in(base, i)
            nc = sizes[i % len(sizes)]
            if nc is not None:
                kwargs["n_cloud"] = int(nc)
            batch = dict(gen(key, self.batch_size, **kwargs))
            if self.label_source == "true":
                if "true_normal" in batch:
                    batch["normal"] = batch["true_normal"]
                if "true_len" in batch:
                    batch["len"] = batch["true_len"]
            yield batch
