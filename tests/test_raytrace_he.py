"""Multi-species raytracer tests: exact reduction to the hydrogen-only
engine, photon conservation across species, and end-to-end He ionization
structure."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.helium import (make_spectral_bins_he,
                                          cross_section, HE_EDGES_EV,
                                          SIGMA_TH)
from pyc2ray_tpu.radiation.spectral_bins import SpectralBins
from pyc2ray_tpu.ops.raytrace_he import HeRaytracer
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.constants import ev2fr

DR = 2.0e21


def _he_bins(panels=3, nodes=4):
    bb = BlackBodySource(1e5, False, ev2fr * HE_EDGES_EV[0], 2.8)
    return make_spectral_bins_he(bb, panels_per_band=panels, nodes=nodes)


def test_cross_sections_thresholds():
    for sp in range(3):
        nu_th = ev2fr * HE_EDGES_EV[sp]
        assert abs(cross_section(nu_th, sp) - SIGMA_TH[sp]) < 1e-25
        assert cross_section(nu_th * 0.999, sp) == 0.0
        # declining with frequency
        assert cross_section(2 * nu_th, sp) < SIGMA_TH[sp]


def test_verner_cross_sections():
    """Verner et al. (1996) fits: published threshold values, zero below
    the edge, monotone decline, hydrogenic HeII/HI threshold ratio."""
    from pyc2ray_tpu.radiation.helium import verner_cross_section
    # threshold values from the fit (Mb): 6.35 / 7.42 / 1.59
    expect = (6.346e-18, 7.42e-18, 1.587e-18)
    for sp in range(3):
        nu_th = ev2fr * HE_EDGES_EV[sp]
        v = float(verner_cross_section(nu_th * (1 + 1e-12), sp))
        assert abs(v / expect[sp] - 1) < 5e-3, (sp, v)
        assert verner_cross_section(nu_th * 0.999, sp) == 0.0
        # decline over the band
        grid = nu_th * np.linspace(1.0 + 1e-9, 10.0, 50)
        sig = verner_cross_section(grid, sp)
        assert np.all(np.diff(sig) < 0)
    # He II is hydrogenic: threshold sigma ~ sigma_HI / Z^2
    r = expect[2] / expect[0]
    assert abs(r * 4 - 1) < 5e-3


def test_he_bins_verner_model():
    """Bins built with the Verner model keep the (s, sigma_th) contract:
    s normalized to 1 at each species edge, photon weights identical to
    the power-law build (the SED does not depend on the cross sections),
    and an unknown model name raises."""
    import pytest
    bb = BlackBodySource(1e5, False, ev2fr * HE_EDGES_EV[0], 2.8)
    bp = make_spectral_bins_he(bb, panels_per_band=3, nodes=4)
    bv = make_spectral_bins_he(bb, panels_per_band=3, nodes=4,
                               cross_section_model="verner")
    assert np.allclose(bv.w_photo, bp.w_photo)
    assert bv.s.shape == bp.s.shape
    # normalized opacities: below ~1 over the band, zero below the edge
    nb = bv.num_bins // 3
    assert np.all(bv.s[1][:nb] == 0.0) and np.all(bv.s[2][: 2 * nb] == 0.0)
    assert np.all(bv.s <= 1.0 + 1e-9)
    # sigma_th close to (but not identical to) the power-law anchors
    for sp in range(3):
        assert abs(bv.sigma_th[sp] / SIGMA_TH[sp] - 1) < 0.01
    with pytest.raises(ValueError, match="cross_section_model"):
        make_spectral_bins_he(bb, cross_section_model="nope")


def test_he_bins_structure():
    b = _he_bins()
    assert b.s.shape == (3, b.num_bins)
    # species opacity zero below its edge, positive above
    assert np.all(b.s[1][: b.num_bins // 3] == 0.0)
    assert np.all(b.s[2][: 2 * (b.num_bins // 3)] == 0.0)
    assert np.all(b.s[0] > 0)
    assert np.all(b.w_photo > 0)


def test_reduces_to_hydrogen_engine():
    """abu_he=0: Gamma_HI must equal an H-only ChebRaytracer built from
    the HI rows of the same bins."""
    N = 10
    bins = _he_bins()
    rng = np.random.RandomState(2)
    nd = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = np.array([[2, 7, 4], [5, 5, 5]])
    flux = np.array([1.0, 2.0])

    rt_he = HeRaytracer(N, 1e9, bins, abu_he=0.0, batch_size=2,
                        dtype=jnp.float64)
    g_hi, g_he1, g_he2 = [np.asarray(v) for v in
                          rt_he.trace(nd, xh, 0 * xh, 0 * xh,
                                      src, flux, DR)]
    assert np.all(g_he1 == 0) and np.all(g_he2 == 0)

    h_bins = SpectralBins(s=bins.s[0], w_photo=bins.w_photo,
                          w_heat=bins.w_heat[0], num_bins=bins.num_bins)
    rt_h = ChebRaytracer(N, 1e9, SIGMA_TH[0], h_bins, batch_size=2,
                         dtype=jnp.float64)
    g_ref = np.asarray(rt_h.trace(nd, xh, src, flux, DR))
    np.testing.assert_allclose(g_hi, g_ref, rtol=1e-12)


def test_photon_conservation_across_species():
    """In an opaque uniform medium the total absorption rate
    sum_cells sum_s Gamma_s n_s dr^3 must equal the emitted rate
    S_star * flux (photon-conserving split between species)."""
    N = 24
    bins = _he_bins()
    nd = 6e-2 * np.ones((N, N, N))     # opaque even in the hardest bin
    # (at 1e-2 the hardest ~2e-22 cm^2 bins leak ~0.5% through 12 cells —
    # physical photon escape, not a conservation error)
    xh = np.zeros((N, N, N))
    y1 = 0.1 * np.ones((N, N, N))
    y2 = np.zeros((N, N, N))
    src = np.array([[12, 12, 12]])
    flux = np.array([1.0])
    abu = 0.074
    rt = HeRaytracer(N, 1e9, bins, abu_he=abu, batch_size=1,
                     dtype=jnp.float64)
    g = [np.asarray(v) for v in rt.trace(nd, xh, y1, y2, src, flux, DR)]
    n_s = [nd * (1 - xh), abu * nd * (1 - y1 - y2), abu * nd * y1]
    absorbed = sum((g[s] * n_s[s]).sum() for s in range(3)) * DR ** 3
    emitted = 1e48 * flux[0]
    assert abs(absorbed / emitted - 1.0) < 1e-3


def test_species_share_follows_opacity():
    """Near a hard source the HeII ionization rate per atom exceeds the
    HI rate per atom above the HeII edge... check the simpler invariant:
    all three species get nonzero rates and HeI per-atom rate > HI
    per-atom rate close to the source (sigma_HeI > sigma_HI in band 2)."""
    N = 16
    bins = _he_bins()
    nd = 1e-3 * np.ones((N, N, N))
    xh = np.zeros((N, N, N))
    y1 = 0.2 * np.ones((N, N, N))
    y2 = np.zeros((N, N, N))
    src = np.array([[8, 8, 8]])
    flux = np.array([1.0])
    rt = HeRaytracer(N, 1e9, bins, abu_he=0.074, batch_size=1,
                     dtype=jnp.float64)
    g = [np.asarray(v) for v in rt.trace(nd, xh, y1, y2, src, flux, DR)]
    probe = (8, 8, 10)
    assert g[0][probe] > 0 and g[1][probe] > 0 and g[2][probe] > 0
    assert g[1][probe] > g[0][probe]


def test_evolve_he_front_ordering():
    """Short coupled evolution: the HeIII region sits inside the HeII
    region, which sits inside (or equals) the HII region."""
    from pyc2ray_tpu.evolve import evolve3D_he
    from pyc2ray_tpu.ops.chemistry import ChemistryParams
    from pyc2ray_tpu.ops.chemistry_he import HeChemistryParams

    N = 16
    bins = _he_bins()
    chem = ChemistryParams(bh00=2.59e-13, albpow=-0.7,
                           colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                           temph0=13.598 / 8.617e-05, abu_c=7.1e-7)
    phe = HeChemistryParams(chem=chem, abu_he=0.074)
    rt = HeRaytracer(N, 1e9, bins, abu_he=0.074, batch_size=1,
                     dtype=jnp.float64)
    nd = 1e-3 * np.ones((N, N, N))
    temp = 2e4 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    y1 = 1e-3 * np.ones((N, N, N))
    y2 = np.zeros((N, N, N))
    src = np.array([[8, 8, 8]])
    flux = np.array([20.0])
    out = evolve3D_he(1.0e13, DR, flux, src, rt, phe, temp, nd,
                      xh, y1, y2, quiet=True)
    xh_n, y1_n, y2_n = out[0], out[2], out[3]
    line = lambda f: np.asarray(f)[8, 8, :]
    # front radii along a ray (cells with fraction > 0.5)
    r_h = np.sum(line(xh_n) > 0.5)
    r_he3 = np.sum(line(y2_n) > 0.5)
    r_he2 = np.sum(line(y1_n + y2_n) > 0.5)
    assert r_he3 <= r_he2
    # for a hard 1e5 K source the HeII front TRACKS the HII front
    # (sigma_HeI > sigma_HI: it may lead by a cell or two)
    assert abs(int(r_he2) - int(r_h)) <= 2
    assert r_he2 > 0                      # helium actually ionized
    assert np.all(np.isfinite(line(y1_n) + line(y2_n)))


# ---------------------------------------------------------------------------
# Helium under the meshes (domain + source-parallel) — capability parity
# ---------------------------------------------------------------------------

def _he_evolve_setup(N=12):
    from pyc2ray_tpu.ops.chemistry import ChemistryParams
    from pyc2ray_tpu.ops.chemistry_he import HeChemistryParams
    bins = _he_bins()
    chem = ChemistryParams(bh00=2.59e-13, albpow=-0.7,
                           colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                           temph0=13.598 / 8.617e-05, abu_c=7.1e-7)
    phe = HeChemistryParams(chem=chem, abu_he=0.074)
    nd = 1e-3 * np.ones((N, N, N))
    temp = 2e4 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    y1 = 1e-3 * np.ones((N, N, N))
    y2 = np.zeros((N, N, N))
    src = np.array([[6, 6, 6], [2, 9, 4]])
    flux = np.array([20.0, 5.0])
    return bins, phe, nd, temp, xh, y1, y2, src, flux


def test_he_domain_matches_single():
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.evolve import evolve3D_he
    from pyc2ray_tpu.parallel import (make_domain_mesh, DomainDecomposition,
                                      evolve3D_he_domain)
    N = 12
    bins, phe, nd, temp, xh, y1, y2, src, flux = _he_evolve_setup(N)

    def mk():
        return HeRaytracer(N, 1e9, bins, abu_he=0.074, batch_size=1,
                           dtype=jnp.float64)
    ref = evolve3D_he(1.0e13, DR, flux, src, mk(), phe, temp, nd,
                      xh, y1, y2, quiet=True)
    dd = DomainDecomposition(mk(), make_domain_mesh(2, 2, 2))
    out = evolve3D_he_domain(1.0e13, DR, flux, src, dd, phe, temp, nd,
                             xh, y1, y2, quiet=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11)
    assert np.asarray(out[2]).max() > 0.5  # helium actually ionized


def test_he_source_parallel_matches_single():
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.evolve import evolve3D_he
    from pyc2ray_tpu.parallel import make_mesh, evolve3D_he_sharded
    N = 12
    bins, phe, nd, temp, xh, y1, y2, src, flux = _he_evolve_setup(N)

    def mk():
        return HeRaytracer(N, 1e9, bins, abu_he=0.074, batch_size=1,
                           dtype=jnp.float64)
    ref = evolve3D_he(1.0e13, DR, flux, src, mk(), phe, temp, nd,
                      xh, y1, y2, quiet=True)
    mesh = make_mesh(n_src=4, n_space=2)
    out = evolve3D_he_sharded(1.0e13, DR, flux, src, mk(), mesh, phe,
                              temp, nd, xh, y1, y2, quiet=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11)


def test_he_thermal_domain_matches_single():
    """He + heating + thermal composes with the domain mesh."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.evolve import evolve3D_he
    from pyc2ray_tpu.ops.thermal import ThermalParams
    from pyc2ray_tpu.parallel import (make_domain_mesh, DomainDecomposition,
                                      evolve3D_he_domain)
    N = 12
    bins, phe, nd, temp, xh, y1, y2, src, flux = _he_evolve_setup(N)
    tp = ThermalParams(bh00=2.59e-13, albpow=-0.7,
                       colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                       temph0=13.598 / 8.617e-05, abu_c=7.1e-7)

    def mk():
        return HeRaytracer(N, 1e9, bins, abu_he=0.074, batch_size=1,
                           dtype=jnp.float64, do_heating=True)
    ref = evolve3D_he(1.0e13, DR, flux, src, mk(), phe, temp, nd,
                      xh, y1, y2, quiet=True, thermal=tp, zred=9.0)
    dd = DomainDecomposition(mk(), make_domain_mesh(2, 2, 2))
    out = evolve3D_he_domain(1.0e13, DR, flux, src, dd, phe, temp, nd,
                             xh, y1, y2, quiet=True, thermal=tp, zred=9.0)
    assert len(out) == 7
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10)
    assert np.asarray(out[6]).std() > 0  # temperature evolved


def test_he_thermal_source_parallel_matches_single():
    """He + heating + thermal composes with the source-parallel mesh."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    from pyc2ray_tpu.evolve import evolve3D_he
    from pyc2ray_tpu.ops.thermal import ThermalParams
    from pyc2ray_tpu.parallel import make_mesh, evolve3D_he_sharded
    N = 12
    bins, phe, nd, temp, xh, y1, y2, src, flux = _he_evolve_setup(N)
    tp = ThermalParams(bh00=2.59e-13, albpow=-0.7,
                       colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                       temph0=13.598 / 8.617e-05, abu_c=7.1e-7)

    def mk():
        return HeRaytracer(N, 1e9, bins, abu_he=0.074, batch_size=1,
                           dtype=jnp.float64, do_heating=True)
    ref = evolve3D_he(1.0e13, DR, flux, src, mk(), phe, temp, nd,
                      xh, y1, y2, quiet=True, thermal=tp, zred=9.0)
    mesh = make_mesh(n_src=4, n_space=2)
    out = evolve3D_he_sharded(1.0e13, DR, flux, src, mk(), mesh, phe,
                              temp, nd, xh, y1, y2, quiet=True,
                              thermal=tp, zred=9.0)
    assert len(out) == 7
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10)


def test_he_window_accumulate_matches_scan():
    """The He engine's window accumulate (all three Gamma channels plus
    heat through the host engine's placement matmuls) must match the
    per-source scan path."""
    N, R = 24, 5.0
    rng = np.random.default_rng(7)
    nd = 1e-3 * (1 + 0.5 * rng.random((N, N, N)))
    xh = 1e-3 * rng.random((N, N, N))
    y1 = 1e-3 * rng.random((N, N, N))
    y2 = 1e-4 * rng.random((N, N, N))
    ns = 40
    pos = rng.integers(0, N, (ns, 3))
    flux = 10 ** rng.uniform(-1, 1, ns)
    common = dict(batch_size=8, dtype=jnp.float32, do_heating=True)
    bins = _he_bins()
    e_scan = HeRaytracer(N, R, bins, 0.074, accumulate="scan", **common)
    e_win = HeRaytracer(N, R, bins, 0.074, accumulate="window", **common)
    assert e_win.accumulate == "window"
    out_s = e_scan.trace(nd, xh, y1, y2, pos, flux, DR)
    out_w = e_win.trace(nd, xh, y1, y2, pos, flux, DR)
    for a, b in zip(out_s, out_w):
        a, b = np.asarray(a), np.asarray(b)
        assert ((a != 0) == (b != 0)).all()
        big = np.abs(a) > 1e-30
        if big.any():
            assert (np.abs(a - b)[big] / np.abs(a)[big]).max() < 1e-5
