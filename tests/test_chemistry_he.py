"""Helium chemistry tests: the 2x2 exact solver against dense numerical
integration, physical limits, and exact reduction to the H-only pass."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.chemistry import ChemistryParams, global_pass
from pyc2ray_tpu.ops.chemistry_he import (HeChemistryParams, _expm2,
                                          he_update, global_pass_he)

CHEM = ChemistryParams(bh00=2.59e-13, albpow=-0.7,
                       colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                       temph0=13.598 / 8.617e-05, abu_c=7.1e-7)
PHE = HeChemistryParams(chem=CHEM, abu_he=0.074)


def _dense_reference(A, b, u0, dt, nstep=200000):
    """Dense RK4 integration of du/dt = A u + b; returns (u(dt), <u>)."""
    h = dt / nstep
    u = u0.copy()
    acc = np.zeros_like(u0)
    for _ in range(nstep):
        k1 = A @ u + b
        k2 = A @ (u + 0.5 * h * k1) + b
        k3 = A @ (u + 0.5 * h * k2) + b
        k4 = A @ (u + h * k3) + b
        acc += h * (u + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)) / dt * 0 \
            + h * u / dt  # left Riemann on the fine grid
        u = u + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    return u, acc


def test_expm2_matches_dense():
    rng = np.random.RandomState(0)
    for trial in range(6):
        # random stable compartmental-like system
        G1, G2, R2, R3 = 10 ** rng.uniform(-3, 1, 4)
        A = np.array([[-(G1 + G2 + R2), -G1 + R3], [G2, -R3]])
        b = np.array([G1, 0.0])
        u0 = rng.uniform(0, 0.5, 2)
        dt = 10 ** rng.uniform(-1, 1)
        ut, ua = _dense_reference(A, b, u0, dt)
        jt1, jt2, ja1, ja2 = _expm2(
            *[jnp.asarray(v) for v in
              (A[0, 0], A[0, 1], A[1, 0], A[1, 1], b[0], b[1],
               u0[0], u0[1])], jnp.asarray(dt))
        np.testing.assert_allclose([float(jt1), float(jt2)], ut, rtol=1e-8)
        np.testing.assert_allclose([float(ja1), float(ja2)], ua,
                                   rtol=1e-4)  # Riemann avg is O(h)


def test_he_update_limits():
    T = jnp.full((3,), 1.0e4)
    ne = jnp.full((3,), 1e-3)
    y1 = jnp.asarray([0.1, 0.1, 0.0])
    y2 = jnp.asarray([0.05, 0.05, 0.0])
    # no radiation, long time: recombination drives y -> ~0
    y1t, y2t, _, _ = he_update(y1, y2, 1e25, T, ne,
                               jnp.zeros(3), jnp.zeros(3), PHE)
    assert float(y1t.max()) < 1e-2 or float(y1t[2]) < 1e-2
    assert float(y2t.max()) < 1e-3
    # overwhelming HeII photoionization: everything -> HeIII
    y1t, y2t, _, _ = he_update(y1, y2, 1e20, T, ne,
                               jnp.full((3,), 1e-6), jnp.full((3,), 1e-6),
                               PHE)
    assert float(y2t.min()) > 0.99
    # bounds always hold
    assert float((y1t + y2t).max()) <= 1.0 + 1e-12


def test_he_equilibrium_fixed_point():
    """Starting at the analytic equilibrium, the update stays there."""
    T = jnp.full((1,), 2e4)
    ne = jnp.full((1,), 1e-3)
    g1, g2 = 1e-12, 3e-13
    # compute u_eq by solving A u = -b densely
    import numpy.linalg as la
    damp = 1.0 / (1.0 + np.sqrt(2e4 / 1e5))
    c1 = PHE.colhe0 * np.sqrt(2e4) * np.exp(-PHE.temphe0 / 2e4) * damp
    c2 = PHE.colhe1 * np.sqrt(2e4) * np.exp(-PHE.temphe1 / 2e4) * damp
    a2 = PHE.bhe00 * (2e4 / 1e4) ** PHE.alhepow
    a3 = 2 * CHEM.bh00 * (2e4 / 4e4) ** CHEM.albpow
    G1, G2 = g1 + 1e-3 * c1, g2 + 1e-3 * c2
    R2, R3 = 1e-3 * a2, 1e-3 * a3
    A = np.array([[-(G1 + G2 + R2), -G1 + R3], [G2, -R3]])
    ueq = la.solve(A, [-G1, 0.0])
    y1t, y2t, y1a, y2a = he_update(
        jnp.asarray([ueq[0]]), jnp.asarray([ueq[1]]), 1e16, T, ne,
        jnp.full((1,), g1), jnp.full((1,), g2), PHE)
    np.testing.assert_allclose(float(y1t[0]), ueq[0], rtol=1e-10)
    np.testing.assert_allclose(float(y2t[0]), ueq[1], rtol=1e-10)
    np.testing.assert_allclose(float(y1a[0]), ueq[0], rtol=1e-10)


def test_global_pass_he_reduces_to_hydrogen():
    """abu_he = 0 and zero He state/rates: xh must match the H-only
    global_pass exactly (same iteration, same ne)."""
    rng = np.random.RandomState(5)
    n = 500
    ndens = 10 ** rng.uniform(-4, -2, n)
    temp = 10 ** rng.uniform(2, 4.5, n)
    xh = rng.uniform(1e-4, 0.9, n)
    phi = 10 ** rng.uniform(-14, -9, n)
    dt = 3e13
    args = [jnp.asarray(v) for v in (ndens, temp, xh, xh, phi)]
    xi_h, xav_h, cf_h = global_pass(dt, args[0], args[1], args[2],
                                    args[3], args[4], CHEM)
    z = jnp.zeros(n)
    p0 = PHE._replace(abu_he=0.0)
    out = global_pass_he(dt, args[0], args[1], args[2], args[3],
                         z, z, z, z, args[4], z, z, p0)
    xi, xav = out[0], out[1]
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_h), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(xav), np.asarray(xav_h),
                               rtol=1e-13)
    assert int(out[6]) == int(cf_h)


def test_global_pass_he_full_coupling():
    """With He present the pass converges, conserves bounds, and the
    electron feedback changes xh vs the He-free case."""
    rng = np.random.RandomState(7)
    n = 300
    ndens = 10 ** rng.uniform(-4, -2, n)
    temp = 10 ** rng.uniform(3.5, 4.5, n)
    xh = rng.uniform(1e-3, 0.5, n)
    y1 = rng.uniform(1e-3, 0.3, n)
    y2 = rng.uniform(0.0, 0.2, n)
    phi = 10 ** rng.uniform(-13, -10, n)
    g1 = 10 ** rng.uniform(-14, -11, n)
    g2 = 10 ** rng.uniform(-16, -13, n)
    dt = 3e13
    a = [jnp.asarray(v) for v in
         (ndens, temp, xh, xh, y1, y1, y2, y2, phi, g1, g2)]
    out = global_pass_he(dt, *a, PHE)
    xi, xav, y1i, y1a, y2i, y2a, cf = [np.asarray(o) for o in out]
    for arr in (xi, xav):
        assert np.all(arr > 0) and np.all(arr <= 1.0)
    assert np.all(y1i >= 0) and np.all(y2i >= 0)
    assert np.all(y1i + y2i <= 1.0 + 1e-12)
    assert np.all(np.isfinite(y1a + y2a))
    # coupling check: He electrons shift the hydrogen solution
    p0 = PHE._replace(abu_he=0.0)
    z = jnp.zeros(n)
    out0 = global_pass_he(dt, a[0], a[1], a[2], a[3], z, z, z, z,
                          a[8], z, z, p0)
    assert not np.allclose(xi, np.asarray(out0[0]), rtol=1e-6)


def test_expm2_singular_matrix_no_nan():
    """Regression (review finding): ne=0 makes A singular (det=0); the
    phi-function formulation must return the exact limit, not NaN.
    A = [[-G1, -G1], [0, 0]], b = (G1, 0): y2 is conserved and
    y1 -> 1 - y2 exponentially."""
    import jax.numpy as jnp
    G1 = 1e-12
    for dt in (1e10, 1e16, 1e25):
        ut1, ut2, ua1, ua2 = _expm2(
            jnp.float64(-G1), jnp.float64(-G1), jnp.float64(0.0),
            jnp.float64(0.0), jnp.float64(G1), jnp.float64(0.0),
            jnp.float64(0.0), jnp.float64(0.0), jnp.float64(dt))
        vals = [float(v) for v in (ut1, ut2, ua1, ua2)]
        assert all(np.isfinite(vals)), vals
        expect = -np.expm1(-G1 * dt)          # 1 - e^{-G1 dt}
        np.testing.assert_allclose(vals[0], expect, rtol=1e-6)
        assert vals[1] == 0.0
    # fully zero system: u unchanged
    z = jnp.float64(0.0)
    out = _expm2(z, z, z, z, z, z, jnp.float64(0.3), jnp.float64(0.1),
                 jnp.float64(1e20))
    np.testing.assert_allclose([float(v) for v in out],
                               [0.3, 0.1, 0.3, 0.1], rtol=1e-10)


def test_he_update_zero_density_cells():
    """Cells with ne=0 and zero rates must come out finite/unchanged
    through he_update and global_pass_he (the NaN poisoning path)."""
    import jax.numpy as jnp
    T = jnp.full((4,), 1e4)
    ne = jnp.zeros(4)
    y1 = jnp.asarray([0.0, 0.2, 0.0, 0.5])
    y2 = jnp.asarray([0.0, 0.1, 0.0, 0.2])
    y1t, y2t, y1a, y2a = he_update(y1, y2, 1e16, T, ne,
                                   jnp.zeros(4), jnp.zeros(4), PHE)
    for v in (y1t, y2t, y1a, y2a):
        assert np.all(np.isfinite(np.asarray(v)))
    # with T=1e4 collisional He rates are ~0 and ne=0: nothing moves
    np.testing.assert_allclose(np.asarray(y2t), np.asarray(y2), atol=1e-12)


def test_svs_fractions_limits():
    """Shull & van Steenberg (1985) fractions: published limits and
    monotonicity over the ionized fraction."""
    from pyc2ray_tpu.ops.chemistry_he import (
        secondary_ionization_fractions, secondary_heating_fraction)
    x = jnp.asarray(np.linspace(0.0, 1.0, 101), jnp.float64)
    f_hi, f_hei = secondary_ionization_fractions(x)
    f_heat = secondary_heating_fraction(x)
    f_hi, f_hei, f_heat = map(np.asarray, (f_hi, f_hei, f_heat))
    # neutral-gas limits: the fit constants
    np.testing.assert_allclose(f_hi[0], 0.3908, rtol=1e-12)
    np.testing.assert_allclose(f_hei[0], 0.0554, rtol=1e-12)
    assert f_heat[0] == 0.0
    # fully ionized: everything thermalizes
    assert f_hi[-1] == 0.0 and f_hei[-1] == 0.0
    np.testing.assert_allclose(f_heat[-1], 0.9971, rtol=1e-12)
    # monotone: ionization fractions fall, heat fraction rises
    assert np.all(np.diff(f_hi) <= 0) and np.all(np.diff(f_heat) >= 0)
    # known intermediate value: ~11% to heat at x ~ 1e-4
    f_low = float(secondary_heating_fraction(jnp.float64(1e-4)))
    assert 0.09 < f_low < 0.13
    # energy split never exceeds unity
    assert np.all(f_hi + f_hei + f_heat <= 1.0 + 1e-12)


def test_global_pass_he_secondary_rate():
    """With photoionization off, low density (negligible recombination)
    and cold gas (no collisional ionization), the secondary channel must
    reproduce dx/dt = f_HI(x) heat / E_th,HI (1-x) and the HeI analog
    over a tiny timestep."""
    from pyc2ray_tpu.ops.chemistry_he import (
        secondary_ionization_fractions, _ETH_ERG)
    sh = (8,)
    dt = 1e4
    ndens = jnp.full(sh, 1e-12, jnp.float64)   # recombination ~ 0
    temp = jnp.full(sh, 100.0, jnp.float64)    # collisional ~ 0
    x0 = jnp.full(sh, 0.01, jnp.float64)
    y10 = jnp.full(sh, 0.005, jnp.float64)
    y20 = jnp.zeros(sh, jnp.float64)
    zero = jnp.zeros(sh, jnp.float64)
    heat = jnp.full(sh, 1e-26, jnp.float64)    # erg/s per HI atom

    out = global_pass_he(dt, ndens, temp, x0, x0, y10, y10, y20, y20,
                         zero, zero, zero, PHE, heat=heat)
    xh_t, xh_av = np.asarray(out[0]), np.asarray(out[1])
    y1_t = np.asarray(out[2])

    f_hi, f_hei = secondary_ionization_fractions(xh_av)
    rate_h = np.asarray(f_hi) * 1e-26 / _ETH_ERG[0]
    expect_dx = rate_h * (1.0 - 0.01) * dt
    np.testing.assert_allclose(xh_t - 0.01, expect_dx, rtol=2e-2)

    # HeI: per-atom rate rescaled by n_HI / n_HeI at the entry state
    nhi_over_nhei = (1.0 - 0.01) / (PHE.abu_he * (1.0 - 0.005))
    rate_he = np.asarray(f_hei) * 1e-26 * nhi_over_nhei / _ETH_ERG[1]
    expect_dy1 = rate_he * (1.0 - 0.005) * dt
    np.testing.assert_allclose(y1_t - 0.005, expect_dy1, rtol=2e-2)

    # without the heat channel nothing moves (no other process is on)
    out0 = global_pass_he(dt, ndens, temp, x0, x0, y10, y10, y20, y20,
                          zero, zero, zero, PHE)
    np.testing.assert_allclose(np.asarray(out0[0]), 0.01, rtol=1e-10)


def test_global_pass_he_secondary_zero_helium():
    """abu_he = 0: the HeI secondary denominator floor must keep the
    pass finite and hydrogen must still receive its secondaries."""
    phe0 = HeChemistryParams(chem=CHEM, abu_he=0.0, secondary=True)
    sh = (4,)
    zero = jnp.zeros(sh, jnp.float64)
    out = global_pass_he(1e10, jnp.full(sh, 1e-7, jnp.float64),
                         jnp.full(sh, 1e2, jnp.float64),
                         jnp.full(sh, 0.1, jnp.float64),
                         jnp.full(sh, 0.1, jnp.float64),
                         zero, zero, zero, zero,
                         zero, zero, zero, phe0,
                         heat=jnp.full(sh, 1e-25, jnp.float64))
    for v in out[:6]:
        assert np.all(np.isfinite(np.asarray(v)))
    assert np.all(np.asarray(out[0]) > 0.1)    # H ionized further


def test_recombination_photons_rate_identity():
    """OTS recycling must equal a manual augmentation of the per-atom
    photoionization rates by (absorption fraction x volumetric case-B
    recombination photon rate / absorber density), evaluated at the
    entry state (dt is tiny so the iterated averages stay there), and
    must be photon-conserving: every recycled photon ionizes exactly
    one atom, so the total new ionizations (H + He, per volume) added
    by the switch equal (rec2 + rec3) dt."""
    sh = (6,)
    # dt small vs every process timescale (recombination factor
    # alpha*ne*dt ~ 0.08) so rates stay frozen at the entry state to
    # first order, but large enough that the recycling-induced change
    # (~1e-8 in x) is far above f64 resolution of x ~ 0.3
    dt = 1e12
    ndens = jnp.full(sh, 1e-3, jnp.float64)
    temp = jnp.full(sh, 2e4, jnp.float64)
    x0 = jnp.full(sh, 0.3, jnp.float64)
    y10 = jnp.full(sh, 0.4, jnp.float64)
    y20 = jnp.full(sh, 0.3, jnp.float64)
    zero = jnp.zeros(sh, jnp.float64)

    on = global_pass_he(dt, ndens, temp, x0, x0, y10, y10, y20, y20,
                        zero, zero, zero, PHE,
                        recombination_photons=True)
    off = global_pass_he(dt, ndens, temp, x0, x0, y10, y10, y20, y20,
                         zero, zero, zero, PHE)

    # manual rates at the entry state
    nhe = PHE.abu_he * 1e-3
    ne = 1e-3 * (0.3 + CHEM.abu_c) + nhe * (0.4 + 2 * 0.3)
    a2 = PHE.bhe00 * (2e4 / 1e4) ** PHE.alhepow
    a3 = 2.0 * CHEM.bh00 * (2e4 / 4e4) ** CHEM.albpow
    rec2 = ne * a2 * nhe * 0.4
    rec3 = ne * a3 * nhe * 0.3
    nhi = 1e-3 * (1 - 0.3)
    nhei = nhe * (1 - 0.4 - 0.3)
    y_f = nhi * PHE.sig_h_he1 / (nhi * PHE.sig_h_he1
                                 + nhei * PHE.sig_he1_he1)
    z_f = nhi * PHE.sig_h_lya2 / (nhi * PHE.sig_h_lya2
                                  + nhei * PHE.sig_he1_lya2)
    gh = (y_f * rec2 + z_f * rec3) / nhi
    ghe1 = ((1 - y_f) * rec2 + (1 - z_f) * rec3) / nhei
    manual = global_pass_he(
        dt, ndens, temp, x0, x0, y10, y10, y20, y20,
        jnp.full(sh, gh, jnp.float64), jnp.full(sh, ghe1, jnp.float64),
        zero, PHE)
    np.testing.assert_allclose(np.asarray(on[0]), np.asarray(manual[0]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(on[2]), np.asarray(manual[2]),
                               rtol=1e-4)

    # photon conservation: recycling-added ionizations = (rec2+rec3) dt
    # to first order in dt
    def total_ion(res):
        return (1e-3 * np.asarray(res[0])
                + nhe * (np.asarray(res[2]) + np.asarray(res[4])))
    added = total_ion(on) - total_ion(off)
    np.testing.assert_allclose(added, (rec2 + rec3) * dt, rtol=3e-2)


def test_recombination_photons_off_identity():
    """recombination_photons=False (default) is bit-identical to the
    plain pass even when the params carry the host-level flag."""
    sh = (5,)
    ndens = jnp.full(sh, 1e-3, jnp.float64)
    temp = jnp.full(sh, 1e4, jnp.float64)
    x0 = jnp.full(sh, 0.2, jnp.float64)
    y10 = jnp.full(sh, 0.2, jnp.float64)
    y20 = jnp.full(sh, 0.1, jnp.float64)
    zero = jnp.zeros(sh, jnp.float64)
    p_flag = PHE._replace(recombination_photons=True)
    a = global_pass_he(1e10, ndens, temp, x0, x0, y10, y10, y20, y20,
                       zero, zero, zero, p_flag)
    b = global_pass_he(1e10, ndens, temp, x0, x0, y10, y10, y20, y20,
                       zero, zero, zero, PHE)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_recycling_fractions_vs_dense_spectrum_integration():
    """The single-energy absorption-competition fractions are the
    spectrum-weighted dense-frequency integrals to a few percent: the
    case-B recombination continuum is only ~kT wide above the edge, so
    evaluating the competition at the edge is accurate. Integrates
    p_H(nu) = n_HI sig_H(nu) / (n_HI sig_H + n_HeI sig_He) over
    phi(nu) ~ exp(-h(nu - nu_th)/kT) with the real frequency-dependent
    cross sections."""
    from pyc2ray_tpu.radiation.helium import cross_section, HE_EDGES_EV
    from pyc2ray_tpu.constants import ev2fr, hplanck

    kT_erg = 1.380649e-16 * 2e4                 # T = 2e4 K
    nu_th = ev2fr * HE_EDGES_EV[1]
    nhi, nhei = 1e-3 * 0.7, 1e-3 * 0.074 * 0.3
    nu = nu_th * (1.0 + np.linspace(0, 8, 4000) * kT_erg
                  / (hplanck * nu_th))
    phi_nu = np.exp(-hplanck * (nu - nu_th) / kT_erg)
    wh = nhi * cross_section(nu, 0)
    whe = nhei * cross_section(nu, 1)
    p_h = wh / (wh + whe)
    y_dense = np.trapezoid(phi_nu * p_h, nu) / np.trapezoid(phi_nu, nu)
    y_single = nhi * PHE.sig_h_he1 / (nhi * PHE.sig_h_he1
                                      + nhei * PHE.sig_he1_he1)
    assert abs(y_single - y_dense) / y_dense < 0.05


def test_secondary_ramp_limits_and_monotonicity():
    """radiation.helium.secondary_ramps: exactly zero when every
    photoelectron is below the target threshold, -> 1 for a very hard
    SED, and monotone in SED hardness."""
    from pyc2ray_tpu.radiation.helium import (make_spectral_bins_he,
                                              secondary_ramps)
    from pyc2ray_tpu.radiation import BlackBodySource
    from pyc2ray_tpu.constants import ev2fr

    ramps = []
    for T in (3e4, 5e4, 1e5, 1e6):
        bins = make_spectral_bins_he(
            BlackBodySource(T, False, ev2fr * 13.598, 2.8))
        r = secondary_ramps(bins, 0.074)
        assert 0.0 <= r[1] <= r[0] <= 1.0   # HeI threshold is higher
        ramps.append(r)
    for a, b in zip(ramps, ramps[1:]):      # harder SED -> larger ramp
        assert b[0] > a[0] and b[1] > a[1]
    assert ramps[-1][0] > 0.85              # asymptotic regime
    assert ramps[0][0] < 0.02               # soft SED: suppressed

    # synthetic monochromatic bin just above the HI edge: every
    # photoelectron carries 1 eV < E_th -> both ramps exactly zero
    from pyc2ray_tpu.radiation.helium import HE_EDGES_EV, HeSpectralBins
    import numpy as _np
    nu = _np.array([ev2fr * (HE_EDGES_EV[0] + 1.0)])
    soft = HeSpectralBins(s=_np.array([[1.0], [0.0], [0.0]]),
                          w_photo=_np.ones(1),
                          w_heat=_np.array([[1.0], [0.0], [0.0]]),
                          num_bins=1, sigma_th=(1e-18,) * 3, nu=nu)
    r = secondary_ramps(soft, 0.074)
    assert r == (0.0, 0.0)


def test_global_pass_he_secondary_ramp_scales_rate():
    """sec_ramp_* scale the secondary ionization rates linearly; ramp=1
    reproduces the plain SvS behavior bit-for-bit."""
    sh = (8,)
    dt = 1e4
    ndens = jnp.full(sh, 1e-12, jnp.float64)
    temp = jnp.full(sh, 100.0, jnp.float64)
    x0 = jnp.full(sh, 0.01, jnp.float64)
    y10 = jnp.full(sh, 0.005, jnp.float64)
    y20 = jnp.zeros(sh, jnp.float64)
    zero = jnp.zeros(sh, jnp.float64)
    heat = jnp.full(sh, 1e-26, jnp.float64)

    base = global_pass_he(dt, ndens, temp, x0, x0, y10, y10, y20, y20,
                          zero, zero, zero, PHE, heat=heat)
    one = global_pass_he(
        dt, ndens, temp, x0, x0, y10, y10, y20, y20, zero, zero, zero,
        PHE._replace(sec_ramp_hi=1.0, sec_ramp_hei=1.0), heat=heat)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(one[0]))

    half = global_pass_he(
        dt, ndens, temp, x0, x0, y10, y10, y20, y20, zero, zero, zero,
        PHE._replace(sec_ramp_hi=0.5, sec_ramp_hei=0.25), heat=heat)
    dx_base = np.asarray(base[0]) - 0.01
    dx_half = np.asarray(half[0]) - 0.01
    np.testing.assert_allclose(dx_half, 0.5 * dx_base, rtol=1e-3)
    dy_base = np.asarray(base[2]) - 0.005
    dy_half = np.asarray(half[2]) - 0.005
    np.testing.assert_allclose(dy_half, 0.25 * dy_base, rtol=1e-3)

    off = global_pass_he(
        dt, ndens, temp, x0, x0, y10, y10, y20, y20, zero, zero, zero,
        PHE._replace(sec_ramp_hi=0.0, sec_ramp_hei=0.0), heat=heat)
    np.testing.assert_allclose(np.asarray(off[0]), 0.01, rtol=1e-10)
