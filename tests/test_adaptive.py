"""Adaptive-radius raytracer tests: bucket policy, equivalence in the
top bucket, and bounded truncation for faint sources (the subbox
photon-loss criterion)."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer, stromgren_radius_cells
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.ops.raytrace_box import grey_bins

from test_raytrace import SIG, DR

ND = 1.0e-3


def _adaptive(N, R, **kw):
    return AdaptiveRaytracer(N, R, SIG, grey_bins(), batch_size=2,
                             dtype=jnp.float64, **kw)


def test_bucket_assignment_monotone():
    rt = _adaptive(32, 16.0)
    flux = np.array([1e-4, 1e-2, 1.0, 1e2])
    b = rt.assign_buckets(flux, DR, ND)
    assert np.all(np.diff(b) >= 0)          # brighter -> bigger bucket
    r_s = stromgren_radius_cells(flux, DR, ND)
    assert np.all(r_s[1:] > r_s[:-1])


def test_top_bucket_matches_single_engine():
    """Sources bright enough for the top bucket must give exactly the
    single-engine result."""
    N = 16
    R = 6.0
    rng = np.random.RandomState(1)
    nd = ND * np.ones((N, N, N))
    xh = rng.uniform(0, 0.3, (N, N, N))
    src = rng.randint(0, N, (4, 3))
    flux = 1e4 * np.ones(4)                 # huge: all in top bucket
    rt_a = _adaptive(N, R)
    phi_a, st = rt_a.trace(nd, xh, src, flux, DR, stats=True)
    assert st["bucket_counts"][-1] == 4
    assert sum(st["bucket_counts"][:-1]) == 0
    rt_s = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=2,
                         dtype=jnp.float64)
    phi_s = rt_s.trace(nd, xh, src, flux, DR)
    np.testing.assert_allclose(np.asarray(phi_a), np.asarray(phi_s),
                               rtol=1e-13)


def test_faint_source_truncation_bounded():
    """A faint source in a small bucket: the Gamma it loses vs the
    full-radius engine must be a small fraction of its photon budget
    (the reference's loss_fraction criterion, parameters.yml)."""
    N = 32
    R = 14.0
    nd = ND * np.ones((N, N, N))
    xh = np.zeros((N, N, N))
    src = np.array([[16, 16, 16]])
    flux = np.array([1e-2])                  # faint -> small Stromgren r
    rt_a = _adaptive(N, R, safety=2.0)
    phi_a, st = rt_a.trace(nd, xh, src, flux, DR, stats=True)
    assert st["bucket_counts"][-1] == 0       # did NOT use the top bucket
    rt_s = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=2,
                         dtype=jnp.float64)
    phi_s = np.asarray(rt_s.trace(nd, xh, src, flux, DR))
    # absorbed-photon deficit = sum (Gamma_full - Gamma_trunc) nHI dr^3
    nhi = nd * (1 - xh)
    deficit = float(((phi_s - np.asarray(phi_a)) * nhi).sum()) * DR ** 3
    emitted = 1e48 * float(flux[0])
    assert deficit >= -1e-40                  # truncation only removes
    assert deficit / emitted < 1e-2           # reference loss_fraction


def test_mixed_catalog_additivity():
    """Mixed bright+faint catalog: adaptive == sum of per-bucket
    single-engine traces (pure superposition)."""
    N = 24
    R = 10.0
    rng = np.random.RandomState(3)
    nd = ND * np.ones((N, N, N))
    xh = rng.uniform(0, 0.2, (N, N, N))
    src = rng.randint(0, N, (6, 3))
    flux = np.array([1e3, 1e3, 1e-1, 1e-1, 1e-1, 1e3])
    rt_a = _adaptive(N, R)
    phi_a, st = rt_a.trace(nd, xh, src, flux, DR, stats=True)
    total = np.zeros((N, N, N))
    b = rt_a.assign_buckets(flux, DR, ND)
    for k, eng in enumerate(rt_a.engines):
        sel = np.nonzero(b == k)[0]
        if sel.size:
            total += np.asarray(eng.trace(nd, xh, src[sel], flux[sel], DR))
    np.testing.assert_allclose(np.asarray(phi_a), total, rtol=1e-13)
    assert sum(st["bucket_counts"]) == 6


def _mk_adaptive_sim(tmp_path, mesh):
    import os
    import pyc2ray_tpu as pc2r
    os.makedirs(tmp_path, exist_ok=True)
    src = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "single_source_test", "parameters.yml")
    params = open(src).read().replace("NumTau: 2000", "NumTau: 200")
    params = params.replace("dtype: float64",
                            "dtype: float64\n  engine: adaptive")
    params = params.replace("results_basename: ./results/",
                            f"results_basename: {tmp_path}/")
    pfile = str(tmp_path / "p.yml")
    open(pfile, "w").write(params)
    N = 8
    sim = pc2r.C2Ray_Test(pfile, N, use_gpu=True, mesh=mesh)
    sim.ndens = 1e-3 * np.ones((N, N, N))
    return sim


def test_adaptive_model_source_mesh_matches_single(tmp_path):
    """engine: adaptive under the ("src","space") mesh (bucket-major
    sharding) must reproduce the single-device evolve exactly — the
    production EoR configuration is no longer single-chip."""
    import jax
    import pytest
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from pyc2ray_tpu.parallel import make_mesh

    dt = 1e13
    flux = np.ones(3)
    pos = np.array([[4.0, 2.0, 7.0], [4.0, 6.0, 1.0], [4.0, 3.0, 5.0]])
    sim_s = _mk_adaptive_sim(tmp_path / "single", None)
    sim_s.evolve3D(dt, flux, pos)
    sim_p = _mk_adaptive_sim(tmp_path / "mesh",
                             make_mesh(n_src=4, n_space=2))
    sim_p.evolve3D(dt, flux, pos)
    np.testing.assert_allclose(np.asarray(sim_p.xh),
                               np.asarray(sim_s.xh), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(sim_p.phi_ion),
                               np.asarray(sim_s.phi_ion), rtol=1e-11)


def test_adaptive_model_domain_mesh_matches_single(tmp_path):
    """engine: adaptive under the ("di","dj","dk") domain mesh
    (owner-local bucketing — was a capability error through round 4)
    must reproduce the single-device evolve."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.parallel import make_domain_mesh

    dt = 1e13
    flux = np.ones(3)
    pos = np.array([[4.0, 2.0, 7.0], [4.0, 6.0, 1.0], [4.0, 3.0, 5.0]])
    sim_s = _mk_adaptive_sim(tmp_path / "single", None)
    sim_s.evolve3D(dt, flux, pos)
    sim_d = _mk_adaptive_sim(tmp_path / "dmesh",
                             make_domain_mesh(2, 2, 2))
    sim_d.evolve3D(dt, flux, pos)
    np.testing.assert_allclose(np.asarray(sim_d.xh),
                               np.asarray(sim_s.xh), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sim_d.phi_ion),
                               np.asarray(sim_s.phi_ion), rtol=1e-10)


def test_subbox_keys_steer_bucket_policy(tmp_path):
    """Raytracing.subboxsize / max_subbox (the reference's CPU subbox
    knobs, raytracing.f90:183-226) are consumed by the adaptive engine:
    subboxsize -> minimum bucket radius, max_subbox -> radius cap, both
    clamped to R_max_LLS (round-3 gap: the keys were read and never
    consumed)."""
    import os
    import pyc2ray_tpu as pc2r

    src = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "single_source_test", "parameters.yml")
    base = open(src).read().replace("NumTau: 2000", "NumTau: 200")
    base = base.replace("dtype: float64",
                        "dtype: float64\n  engine: adaptive")

    def mk(params, sub):
        d = tmp_path / sub
        os.makedirs(d, exist_ok=True)
        params = params.replace("results_basename: ./results/",
                                f"results_basename: {d}/")
        pfile = str(d / "p.yml")
        open(pfile, "w").write(params)
        return pc2r.C2Ray_Test(pfile, 8, use_gpu=True)

    # the example ships subboxsize: 150 >> R_max -> clamped: a single
    # full-radius bucket (the reference's subbox covering the whole grid)
    sim = mk(base, "shipped")
    assert len(sim.raytracer.radii) == 1
    assert sim.raytracer.radii[0] == min(float(sim.R_max_LLS), 8.0)

    # a small user subboxsize floors the bucket ladder
    sim2 = mk(base.replace("subboxsize: 150", "subboxsize: 2"), "floor")
    assert len(sim2.raytracer.radii) > 1
    assert min(sim2.raytracer.radii) >= 2.0
    assert sim2.raytracer.R_min == 2.0

    # max_subbox caps the largest bucket radius below R_max_LLS
    sim3 = mk(base.replace("subboxsize: 150", "subboxsize: 2")
              .replace("max_subbox: 1000", "max_subbox: 6"), "cap")
    assert max(sim3.raytracer.radii) <= 6.0
