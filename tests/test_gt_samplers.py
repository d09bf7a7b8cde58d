"""Analytic-sphere unit tests for the GT sampler scripts (SURVEY §2.1
#25/#26). These scripts produce the training labels; a wrong sign or band
would silently poison training, so we pin:

- sample_mesh_fn: pseudo-normals point radially (|cos| vs exact normal
  high), saved query points sit in the [d_lo, d_hi] band;
- sample_mesh_rd: saved lens match the analytic ray->sphere hit distance
  and the occlusion filter rejects far-side intersections.
"""
import importlib.util
import os

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_sphere_off(path, radius=1.0, n_theta=24, n_phi=48):
    """UV-sphere OFF mesh (poles fan-triangulated)."""
    verts = [(0, 0, radius)]
    for i in range(1, n_theta):
        th = np.pi * i / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            verts.append((radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)))
    verts.append((0, 0, -radius))
    verts = np.asarray(verts, np.float64)

    faces = []
    def ring(i, j):
        return 1 + (i - 1) * n_phi + (j % n_phi)
    for j in range(n_phi):  # top cap
        faces.append((0, ring(1, j), ring(1, j + 1)))
    for i in range(1, n_theta - 1):
        for j in range(n_phi):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            faces.append((a, c, d))
            faces.append((a, d, b))
    bot = len(verts) - 1
    for j in range(n_phi):
        faces.append((bot, ring(n_theta - 1, j + 1), ring(n_theta - 1, j)))

    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n")


@pytest.fixture(scope="module")
def sphere_off(tmp_path_factory):
    p = tmp_path_factory.mktemp("mesh") / "sphere.off"
    _write_sphere_off(str(p))
    return str(p)


def test_sample_mesh_fn_pseudo_normals_radial(sphere_off, tmp_path):
    mod = _load("sample_mesh_fn")
    rng = np.random.default_rng(0)
    n_surface = 50000  # sample spacing ~ sqrt(area/n) ~ 0.008
    # Coarsen the candidate grid (fine 0.005 -> 0.015): the default grid
    # emits ~1.2M query candidates whose 50k-point kNN takes tens of
    # minutes on the 1-core CI CPU. Candidate DENSITY only sets how many
    # labels we get; label QUALITY is set by the surface sampling above,
    # which stays at full resolution. ~27x fewer queries, same assertions.
    # (Passed as a real argument — an earlier monkeypatched partial was
    # silently overridden once process_mesh forwarded fine= explicitly,
    # reverting this test to the tens-of-minutes path.)
    n = mod.process_mesh(sphere_off, str(tmp_path), n_surface=n_surface,
                         d_lo=0.003, d_hi=0.03, rng=rng, fine=0.015)
    assert n > 100
    data = np.load(os.path.join(
        tmp_path, os.path.basename(sphere_off).replace(".off", "_fn.npz")))
    q, pointing = data["points"], data["pointing"]
    # process_mesh normalizes the mesh into [-0.5, 0.5]^3 -> radius 0.5
    r = np.linalg.norm(q, axis=1)
    band = np.abs(r - 0.5)
    # 1-NN distance to a finite sample of the surface slightly exceeds the
    # true distance; allow mesh+sampling slack
    assert np.mean((band > 0.001) & (band < 0.04)) > 0.95
    radial = q / np.maximum(r[:, None], 1e-9)
    cos = np.sum(pointing * radial, axis=1)
    # The pseudo-normal (mean-of-10-NN minus query) is only meaningful for
    # queries whose surface offset exceeds the surface sampling spacing —
    # the same regime the reference's 800k-sample/0.003-band combination
    # puts ALL its labels in. Assert on the deep part of the band: inward
    # (cos<0) for outside queries, outward for inside ones.
    deep = band > 0.015
    assert deep.sum() > 50
    outside = r > 0.5
    assert np.mean(cos[deep & outside] < -0.8) > 0.9
    assert np.mean(cos[deep & ~outside] > 0.8) > 0.9
    assert np.mean(np.abs(cos[deep])) > 0.9


def test_sample_mesh_rd_lens_match_geometry(sphere_off, tmp_path):
    mod = _load("sample_mesh_rd")
    rng = np.random.default_rng(1)
    n = mod.process_mesh(sphere_off, str(tmp_path), n_samples=3000,
                         d_lo=0.003, d_hi=0.03, rng=rng)
    assert n > 100
    data = np.load(os.path.join(
        tmp_path, os.path.basename(sphere_off).replace(".off", "_fd.npz")))
    p, d, lens = data["points"], data["normals"], data["lens"]
    # analytic oracle: first hit of ray (p, -d) on the radius-0.5 sphere
    # |p - t d| = r -> t^2 - 2 t (p.d) + |p|^2 - r^2 = 0
    pd = np.sum(p * d, axis=1)
    disc = pd ** 2 - (np.sum(p * p, axis=1) - 0.5 ** 2)
    assert np.all(disc > -1e-6)
    sq = np.sqrt(np.maximum(disc, 0))
    roots = np.stack([pd - sq, pd + sq], 1)
    roots = np.where(roots > 0, roots, np.inf)
    t_first = roots.min(axis=1)
    # the kept labels' lens must be the FIRST intersection (the occlusion
    # filter rejects rays whose first hit is the sphere's far side or a
    # different face) — mesh facets flatten the sphere slightly, so allow
    # a small tolerance
    frac = np.mean(np.abs(t_first - lens) < 5e-3)
    assert frac > 0.95, frac
    # all kept offsets sit outside the surface by construction of the
    # first-hit test (distance along d is len)
    assert lens.min() >= 0.003 - 1e-6 and lens.max() <= 0.03 + 1e-6
