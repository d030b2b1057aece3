"""Raytracer tests: column densities and rates vs the sequential oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
from pyc2ray_tpu.oracle import oracle_raytrace
from pyc2ray_tpu.radiation import make_tau_table, BlackBodySource
from pyc2ray_tpu.constants import ev2fr

SIG = 6.30e-18
DR = 6.7e20  # ~0.2 kpc cells


def _tables(numtau=200):
    tau, dlogtau = make_tau_table(-20.0, 4.0, numtau)
    bb = BlackBodySource(5e4, False, ev2fr * 13.598, 2.8)
    thin, thick = bb.make_photo_table(tau, ev2fr * 13.598,
                                      10 * ev2fr * 54.416, 1e48)
    heat_thin, heat_thick = bb.make_heat_table(tau, ev2fr * 13.598,
                                               10 * ev2fr * 54.416, 1e48)
    return thin, thick, heat_thin, heat_thick, -20.0, dlogtau


TABLES = _tables()


def _mk_raytracer(N, R, grey=False, batch=2, heating=False):
    cfg = RaytraceConfig(N=N, R_max_LLS=R, sig=SIG, batch_size=batch,
                         dtype=jnp.float64, grey_analytic=grey,
                         do_heating=heating)
    return Raytracer(cfg, TABLES[0], TABLES[1], TABLES[4], TABLES[5],
                     TABLES[2], TABLES[3])


def test_coldens_single_source_uniform():
    """Column density sweep vs oracle, uniform density, full box."""
    N = 8
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))
    rt = _mk_raytracer(N, R=1e9)
    src = np.array([3, 4, 2])
    cd_tpu = rt.sweep_coldens(ndens, xh, src, DR)
    _, _, cd_ora = oracle_raytrace(ndens, xh, src[None, :],
                                   np.array([1.0]), DR, SIG, 1e9,
                                   grey=True)
    np.testing.assert_allclose(cd_tpu, cd_ora, rtol=1e-12)


def test_coldens_single_source_random_density():
    N = 10
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    rt = _mk_raytracer(N, R=1e9)
    src = np.array([0, 9, 5])  # source near the periodic edge
    cd_tpu = rt.sweep_coldens(ndens, xh, src, DR)
    _, _, cd_ora = oracle_raytrace(ndens, xh, src[None, :],
                                   np.array([1.0]), DR, SIG, 1e9, grey=True)
    np.testing.assert_allclose(cd_tpu, cd_ora, rtol=1e-11)


def test_phi_single_source_grey():
    """Grey-opacity analytic rates vs oracle."""
    N = 8
    ndens = 2e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk_raytracer(N, R=1e9, grey=True)
    src = np.array([[4, 4, 4]])
    flux = np.array([10.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, 1e9,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=1e-12)


def test_phi_single_source_tables():
    """Tabulated black-body rates vs oracle."""
    N = 8
    rng = np.random.RandomState(7)
    ndens = 10 ** rng.uniform(-3.5, -2.5, (N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))
    rt = _mk_raytracer(N, R=1e9)
    src = np.array([[2, 6, 3]])
    flux = np.array([10.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(
        ndens, xh, src, flux, DR, SIG, 1e9,
        tables=(TABLES[0], TABLES[1], TABLES[2], TABLES[3], TABLES[4],
                TABLES[5]))
    np.testing.assert_allclose(phi, phi_o, rtol=1e-11)


def test_phi_multi_source_accumulation():
    """Gamma from multiple sources adds up; batch padding is harmless."""
    N = 8
    ndens = 1.5e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk_raytracer(N, R=1e9, batch=2)
    src = np.array([[1, 2, 3], [6, 5, 4], [0, 0, 7]])
    flux = np.array([5.0, 7.0, 2.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(
        ndens, xh, src, flux, DR, SIG, 1e9,
        tables=(TABLES[0], TABLES[1], TABLES[2], TABLES[3], TABLES[4],
                TABLES[5]))
    np.testing.assert_allclose(phi, phi_o, rtol=1e-11)


def test_r_max_lls_cutoff():
    """Rates vanish beyond R_max_LLS but not within."""
    N = 16
    R = 3.0
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk_raytracer(N, R=R)
    src = np.array([[8, 8, 8]])
    phi = np.asarray(rt.trace(ndens, xh, src, np.array([1.0]), DR))
    ii = np.arange(N)
    DI, DJ, DK = np.meshgrid(ii - 8, ii - 8, ii - 8, indexing="ij")
    d2 = DI**2 + DJ**2 + DK**2
    assert np.all(phi[d2 > R * R] == 0.0)
    assert np.all(phi[d2 <= 1.0] > 0.0)


def test_photon_conservation_grey():
    """Total ionizations/s <= source emission rate; close for an
    optically thick box (photon conservation of the rate prescription)."""
    N = 16
    ndens = 1e-2 * np.ones((N, N, N))  # thick
    xh = np.zeros((N, N, N))
    rt = _mk_raytracer(N, R=1e9, grey=True)
    src = np.array([[8, 8, 8]])
    flux = np.array([1.0])  # 1e48 photons/s
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    nHI = ndens * (1.0 - xh)
    total_ionizations = (phi * nHI).sum() * DR ** 3
    emitted = 1e48
    assert total_ionizations <= emitted * (1 + 1e-10)
    assert total_ionizations > 0.95 * emitted


def test_determinism():
    """Same inputs -> bitwise identical Gamma (XLA functional semantics)."""
    N = 8
    rng = np.random.RandomState(11)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0, 0.5, (N, N, N))
    rt = _mk_raytracer(N, R=1e9)
    src = np.array([[1, 2, 3], [4, 5, 6]])
    flux = np.array([1.0, 2.0])
    phi1 = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi2 = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    assert np.array_equal(phi1, phi2)


def test_heating_rates():
    """Heating-rate accumulation mirrors the photo rates."""
    N = 8
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk_raytracer(N, R=1e9, heating=True)
    src = np.array([[4, 4, 4]])
    flux = np.array([10.0])
    phi, heat = rt.trace(ndens, xh, src, flux, DR)
    phi_o, heat_o, _ = oracle_raytrace(
        ndens, xh, src, flux, DR, SIG, 1e9,
        tables=(TABLES[0], TABLES[1], TABLES[2], TABLES[3], TABLES[4],
                TABLES[5]))
    np.testing.assert_allclose(np.asarray(phi), phi_o, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(heat), heat_o, rtol=1e-11)
