"""Box-engine raytracer tests: must reproduce the oracle (grey: exactly;
black-body: to the spectral-bin quadrature accuracy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyc2ray_tpu.ops.raytrace_box import BoxRaytracer, grey_bins
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.oracle import oracle_raytrace
from pyc2ray_tpu.constants import ev2fr

from test_raytrace import TABLES, SIG, DR


def _mk(N, R, bins=None, batch=2, dtype=jnp.float64, heating=False):
    if bins is None:
        bins = grey_bins()
    return BoxRaytracer(N, R, SIG, bins, batch_size=batch, dtype=dtype,
                        do_heating=heating)


def test_box_grey_single_source_full_box():
    N = 8
    ndens = 1.5e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk(N, R=1e9)
    src = np.array([[3, 4, 2]])
    flux = np.array([7.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, 1e9,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=2e-7)


def test_box_grey_random_density_multi_source():
    N = 10
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    rt = _mk(N, R=1e9, batch=2)
    src = np.array([[0, 9, 5], [4, 4, 4], [9, 0, 0]])
    flux = np.array([1.0, 2.0, 0.5])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, 1e9,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=2e-7)


def test_box_small_radius():
    """Partial octahedron (R < box) with the LLS cutoff."""
    N = 16
    R = 3.0
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk(N, R=R)
    src = np.array([[8, 8, 8], [1, 14, 3]])
    flux = np.array([1.0, 2.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, R,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=2e-7)


def test_box_matches_flat_engine_grey():
    """Box engine vs the flat-layout engine must agree closely."""
    from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
    N = 8
    rng = np.random.RandomState(9)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    src = np.array([[2, 5, 7], [6, 1, 0]])
    flux = np.array([3.0, 1.0])
    cfg = RaytraceConfig(N=N, R_max_LLS=1e9, sig=SIG, batch_size=2,
                         dtype=jnp.float64, grey_analytic=True)
    flat = Raytracer(cfg)
    phi_flat = np.asarray(flat.trace(ndens, xh, src, flux, DR))
    box = _mk(N, R=1e9)
    phi_box = np.asarray(box.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_box, phi_flat, rtol=2e-7)


def test_box_blackbody_bins_vs_tables():
    """Spectral-bin rates vs the table-based oracle.

    The comparison tolerance is set by the oracle's own piecewise-linear
    table interpolation error (~1e-4 at NumTau=2000), not by the bin
    quadrature (~1.5e-6 at 64 bins)."""
    from pyc2ray_tpu.radiation import make_tau_table
    N = 8
    ndens = 2e-3 * np.ones((N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))
    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    tau, dlogtau = make_tau_table(-20.0, 4.0, 2000)
    bb = BlackBodySource(5e4, False, fmin, 2.8)
    thin, thick = bb.make_photo_table(tau, fmin, fmax, 1e48)
    h_thin, h_thick = bb.make_heat_table(tau, fmin, fmax, 1e48)

    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, fmax, panels=8, nodes=8)
    rt = _mk(N, R=1e9, bins=bins, heating=True)
    src = np.array([[4, 4, 4]])
    flux = np.array([10.0])
    phi, heat = rt.trace(ndens, xh, src, flux, DR)
    phi_o, heat_o, _ = oracle_raytrace(
        ndens, xh, src, flux, DR, SIG, 1e9,
        tables=(thin, thick, h_thin, h_thick, -20.0, dlogtau))
    np.testing.assert_allclose(np.asarray(phi), phi_o, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(heat), heat_o, rtol=1e-3)


def test_box_f32_finite_and_close():
    N = 12
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    src = np.array([[6, 6, 6]])
    flux = np.array([5.0])
    phi64 = np.asarray(_mk(N, 1e9).trace(ndens, xh, src, flux, DR))
    phi32 = np.asarray(_mk(N, 1e9, dtype=jnp.float32).trace(
        ndens, xh, src, flux, DR))
    assert np.all(np.isfinite(phi32))
    rel = np.abs(phi32 - phi64) / np.maximum(np.abs(phi64), 1e-30)
    # expm1 formulation: no cancellation, errors stay at f32 roundoff scale
    assert np.median(rel) < 1e-4
    assert np.percentile(rel, 99) < 1e-2
