"""Thermal (non-isothermal) solver tests — the beyond-reference channel.

The reference never consumes its heating tables (README.md:81-87); these
tests pin the new solver against closed forms and a dense reference
integration, then exercise the full model path.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import pyc2ray_tpu as pc2r
from pyc2ray_tpu.ops.thermal import (ThermalParams, cooling_rate,
                                     update_temperature, KB)

P = ThermalParams(bh00=2.59e-13, albpow=-0.7,
                  colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                  temph0=13.598 / 8.617e-05, abu_c=7.1e-7,
                  compton=False)


def test_pure_heating_linear():
    """With cooling negligible (cold neutral gas) T rises at the
    analytic slope dT/dt = 2 n_HI H / (3 k_B n_tot)."""
    nd = jnp.full((100,), 1e-3)
    xh = jnp.full((100,), 1e-5)
    T0 = jnp.full((100,), 10.0)
    H = jnp.full((100,), 1e-26)          # erg/s per HI atom
    dt = 1e10
    T1 = update_temperature(dt, T0, nd, xh, H, P, nsub=64)
    ntot = 1e-3 * (1 + 1e-5 + P.abu_c)
    slope = (1e-3 * (1 - 1e-5) * 1e-26) / (1.5 * KB * ntot)
    expected = 10.0 + slope * dt
    # cooling at 10..expected K is tiny but not exactly zero
    np.testing.assert_allclose(np.asarray(T1), expected, rtol=2e-2)


def test_equilibrium_holds():
    """Starting at the equilibrium temperature (H == Lambda/n_HI), T must
    stay put."""
    nd = jnp.full((4,), 1e-3)
    xh = jnp.full((4,), 0.5)
    Teq = jnp.full((4,), 2.0e4)
    lam = cooling_rate(Teq, nd, xh, P)
    H = lam / (nd * (1.0 - xh))          # per-atom heating balancing it
    T1 = update_temperature(3e13, Teq, nd, xh, H, P, nsub=32)
    np.testing.assert_allclose(np.asarray(T1), 2.0e4, rtol=1e-6)


def test_cooling_decay_matches_dense_integration():
    """No heating: the exponential-Euler update must match a dense explicit
    integration of the same ODE (case 2 is stiff: ~283 cooling
    times per step — the exact-relaxation substep lands on the Ly-alpha
    thermostat equilibrium the dense integration finds)."""
    nd = np.array([1e-3, 1e-2, 1e-4])
    xh = np.array([0.9, 0.5, 0.99])
    T0 = np.array([3e4, 1e5, 5e4])
    dt = 3.0e13

    T1 = np.asarray(update_temperature(
        dt, jnp.asarray(T0), jnp.asarray(nd), jnp.asarray(xh),
        jnp.zeros(3), P, nsub=64))

    # dense reference: 20000 explicit Euler steps in numpy
    T = T0.copy()
    ntot = nd * (1 + xh + P.abu_c)
    h = dt / 20000
    for _ in range(20000):
        lam = np.asarray(cooling_rate(jnp.asarray(T), jnp.asarray(nd),
                                      jnp.asarray(xh), P))
        T = np.maximum(T - h * lam / (1.5 * KB * ntot), P.t_floor)
    np.testing.assert_allclose(T1, T, rtol=2e-2)


def test_compton_pushes_to_cmb():
    """Compton-only limit: fully neutral gas except trace electrons,
    T relaxes toward T_cmb(z)."""
    p = P._replace(compton=True)
    nd = jnp.full((2,), 1e-7)            # tenuous: other channels off
    xh = jnp.full((2,), 1.0)
    z = 20.0
    T0 = jnp.asarray([1e3, 10.0])
    T1 = np.asarray(update_temperature(1e17, T0, nd, xh,
                                       jnp.zeros(2), p, z=z, nsub=64))
    tcmb = 2.725 * (1 + z)
    assert abs(T1[0] - tcmb) < abs(float(T0[0]) - tcmb)
    assert abs(T1[1] - tcmb) < abs(float(T0[1]) - tcmb)


def test_nonisothermal_model_evolve(tmp_path):
    """Full model path: Material.isothermal false + heating rates on;
    the temperature near the source must rise above temp0."""
    src = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "single_source_test", "parameters.yml")
    params = open(src).read()
    params = params.replace("NumTau: 2000", "NumTau: 300")
    params = params.replace("compute_heating_rates: 0",
                            "compute_heating_rates: 1")
    params = params.replace("temp0: 1e4", "temp0: 1e2")
    params = params.replace("Material:", "Material:\n  isothermal: false")
    params = params.replace("results_basename: ./results/",
                            f"results_basename: {tmp_path}/")
    pfile = str(tmp_path / "parameters.yml")
    open(pfile, "w").write(params)

    N = 12
    sim = pc2r.C2Ray_Test(pfile, N, use_gpu=True)
    assert sim.thermal is not None
    sim.ndens = 1e-3 * np.ones((N, N, N))
    srcpos = np.array([[N // 2], [N // 2], [N // 2]], dtype=float)
    srcflux = np.array([10.0])
    zreds = sim.generate_redshift_array(2, 1e6)
    dt = sim.set_timestep(zreds[0], zreds[1], 2)
    t_before = np.asarray(sim.temp).copy()
    sim.evolve3D(dt, srcflux, srcpos)
    t_after = np.asarray(sim.temp)
    assert t_after.shape == t_before.shape
    c = N // 2
    assert t_after[c, c, c] > t_before[c, c, c]   # photoheated
    assert np.all(np.isfinite(t_after))
    assert t_after.max() < 1e6                     # sane scale


def test_nonisothermal_domain_matches_single():
    """Thermal evolution composes with domain decomposition: sharded
    (ionization + temperature) must match the single-device path."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins
    from pyc2ray_tpu.ops.chemistry import ChemistryParams
    from pyc2ray_tpu.parallel import (make_domain_mesh, DomainDecomposition,
                                      evolve3D_domain)
    from pyc2ray_tpu.evolve import evolve3D

    N = 8
    chem = ChemistryParams(bh00=P.bh00, albpow=P.albpow, colh0=P.colh0,
                           temph0=P.temph0, abu_c=P.abu_c)
    ndens = 1e-3 * np.ones((N, N, N))
    temp = 1e2 * np.ones(N ** 3)
    xh = 1.2e-3 * np.ones(N ** 3)
    src = np.array([[4, 4, 4], [1, 6, 2]])
    flux = np.array([1.0, 0.5])
    dt, dr, sig = 3.0e13, 2.0e21, 6.30e-18

    def mk():
        return ChebRaytracer(N, 1e9, sig, grey_bins(), batch_size=2,
                             dtype=jnp.float64, do_heating=True)

    xh_s, phi_s, t_s = evolve3D(dt, dr, flux, src, mk(), chem,
                                temp, ndens.reshape(-1), xh, quiet=True,
                                thermal=P, zred=9.0)
    dd = DomainDecomposition(mk(), make_domain_mesh(2, 4))
    xh_d, phi_d, t_d = evolve3D_domain(dt, dr, flux, src, dd, chem,
                                       temp, ndens, xh, quiet=True,
                                       thermal=P, zred=9.0)
    np.testing.assert_allclose(t_d, t_s, rtol=1e-11)
    np.testing.assert_allclose(xh_d, xh_s, rtol=1e-12)
    assert t_d.std() > 0  # temperature actually evolved (non-uniform)


def test_nonisothermal_source_parallel_matches_single():
    """Thermal evolution composes with the source-parallel mesh: the
    psum'd heating rates feed the same post-convergence update."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins
    from pyc2ray_tpu.ops.chemistry import ChemistryParams
    from pyc2ray_tpu.parallel import make_mesh, evolve3D_sharded
    from pyc2ray_tpu.evolve import evolve3D

    N = 8
    chem = ChemistryParams(bh00=P.bh00, albpow=P.albpow, colh0=P.colh0,
                           temph0=P.temph0, abu_c=P.abu_c)
    ndens = 1e-3 * np.ones((N, N, N))
    temp = 1e2 * np.ones(N ** 3)
    xh = 1.2e-3 * np.ones(N ** 3)
    src = np.array([[4, 4, 4], [1, 6, 2], [7, 0, 5]])
    flux = np.array([1.0, 0.5, 2.0])
    dt, dr, sig = 3.0e13, 2.0e21, 6.30e-18

    def mk():
        return ChebRaytracer(N, 1e9, sig, grey_bins(), batch_size=2,
                             dtype=jnp.float64, do_heating=True)

    xh_s, phi_s, t_s = evolve3D(dt, dr, flux, src, mk(), chem,
                                temp, ndens.reshape(-1), xh, quiet=True,
                                thermal=P, zred=9.0)
    mesh = make_mesh(n_src=4, n_space=2)
    xh_m, phi_m, t_m = evolve3D_sharded(dt, dr, flux, src, mk(), mesh,
                                        chem, temp, ndens, xh, quiet=True,
                                        thermal=P, zred=9.0)
    np.testing.assert_allclose(t_m, t_s, rtol=1e-11)
    np.testing.assert_allclose(xh_m, xh_s, rtol=1e-12)
    assert t_m.std() > 0
