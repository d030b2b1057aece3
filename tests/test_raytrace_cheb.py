"""Chebyshev-face engine tests: must reproduce the oracle exactly (grey)
and the tables to bin-quadrature accuracy — same battery as the box
engine."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.ops.raytrace_box import grey_bins
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.oracle import oracle_raytrace
from pyc2ray_tpu.constants import ev2fr

from test_raytrace import SIG, DR


def _mk(N, R, bins=None, batch=2, dtype=jnp.float64, heating=False):
    if bins is None:
        bins = grey_bins()
    return ChebRaytracer(N, R, SIG, bins, batch_size=batch, dtype=dtype,
                         do_heating=heating)


def test_cheb_grey_single_source_full_box():
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


def test_cheb_grey_random_density_multi_source():
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


def test_cheb_small_radius_lls():
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


def test_cheb_blackbody_bins():
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


def test_cheb_f32():
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
    assert np.median(rel) < 1e-4
    assert np.percentile(rel, 99) < 1e-2


def test_cheb_pallas_sweep_matches():
    """The Pallas kernel (interpret mode on CPU) must reproduce the XLA
    engine through the full trace. The kernel fuses the rate pass, which
    reorders float ops vs the separate XLA rates, so agreement is to f32
    rounding (the un-fused kernel matched bitwise)."""
    N = 10
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = np.array([[0, 9, 5], [4, 4, 4]])
    flux = np.array([1.0, 2.0])
    rt_x = _mk(N, R=1e9, batch=2, dtype=jnp.float32)
    rt_p = ChebRaytracer(N, 1e9, SIG, grey_bins(), batch_size=2,
                         dtype=jnp.float32, use_pallas=True)
    phi_x = np.asarray(rt_x.trace(ndens, xh, src, flux, DR))
    phi_p = np.asarray(rt_p.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_p, phi_x, rtol=2e-5, atol=0)
