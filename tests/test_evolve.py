"""End-to-end evolve tests: full convergence loop vs an oracle-driven loop,
and the Stromgren-sphere analytic I-front (reference test1_Ifront analog)."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.evolve import evolve3D
from pyc2ray_tpu.ops.chemistry import ChemistryParams
from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
from pyc2ray_tpu.oracle import oracle_raytrace, oracle_chemistry_global

from test_raytrace import TABLES, SIG, DR

BH00 = 2.59e-13
ALBPOW = -0.7
COLH0 = 1.3e-8 * 0.83 / (13.598 ** 2)
TEMPH0 = 13.598 / 8.617e-05
ABU_C = 7.1e-7
CHEM = ChemistryParams(bh00=BH00, albpow=ALBPOW, colh0=COLH0,
                       temph0=TEMPH0, abu_c=ABU_C)


def _oracle_evolve(dt, dr, src_flux, src_pos, temp, ndens, xh,
                   conv_frac, tables, grey=False, R=1e9):
    """Reference evolve loop (evolve.py:38-245) using oracle kernels."""
    N = temp.shape[0]
    num_cells = N ** 3
    num_src = src_flux.shape[0]
    conv_criterion = min(int(conv_frac * num_cells), (num_src - 1) / 3)
    prev1, prev0 = 2.0 * num_cells, 2.0 * num_cells
    xh_av = xh.copy()
    xh_intermed = xh.copy()
    converged = False
    phi = None
    while not converged:
        phi, _, _ = oracle_raytrace(ndens, xh_av, src_pos, src_flux, dr,
                                    SIG, R, tables=tables, grey=grey)
        xh_intermed, xh_av, conv_flag = oracle_chemistry_global(
            dt, ndens, temp, xh, xh_av, phi, BH00, ALBPOW, COLH0, TEMPH0,
            ABU_C)
        s1 = xh_intermed.sum()
        s0 = (1.0 - xh_intermed).sum()
        rel1 = abs((s1 - prev1) / s1) if s1 > 0 else 1.0
        rel0 = abs((s0 - prev0) / s0) if s0 > 0 else 1.0
        converged = (conv_flag < conv_criterion) or (
            (rel1 < conv_frac) and (rel0 < conv_frac))
        prev1, prev0 = s1, s0
    return xh_intermed, phi


def test_evolve_matches_oracle_loop(tmp_path):
    """One full timestep (raytrace<->chemistry convergence) vs oracle."""
    N = 8
    ndens = 2e-3 * np.ones((N, N, N))
    temp = 1e4 * np.ones((N, N, N))
    xh0 = 1.2e-3 * np.ones((N, N, N))
    src_pos = np.array([[4, 4, 4]])
    src_flux = np.array([5.0])
    dt = 1e13

    cfg = RaytraceConfig(N=N, R_max_LLS=1e9, sig=SIG, batch_size=1,
                         dtype=jnp.float64)
    rt = Raytracer(cfg, TABLES[0], TABLES[1], TABLES[4], TABLES[5])
    log = str(tmp_path / "evolve.log")
    xh_new, phi = evolve3D(dt, DR, src_flux, src_pos, rt, CHEM,
                           temp, ndens, xh0, convergence_fraction=1e-4,
                           logfile=log, quiet=True)
    xh_ora, phi_ora = _oracle_evolve(
        dt, DR, src_flux, src_pos, temp, ndens, xh0.copy(), 1e-4,
        (TABLES[0], TABLES[1], TABLES[2], TABLES[3], TABLES[4], TABLES[5]))
    np.testing.assert_allclose(xh_new, xh_ora, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(phi, phi_ora, rtol=1e-9)


def test_stromgren_sphere_ifront(tmp_path):
    """I-front radius vs the analytic Stromgren solution
    r(t) = R_S (1 - exp(-t/t_rec))^(1/3) (reference test1_Ifront)."""
    N = 24
    dr = 2.0e21
    nH = 1.0e-3
    temp_val = 1.0e4
    alphaB = BH00  # at T = 1e4 K, albpow scaling is 1
    t_rec = 1.0 / (alphaB * nH)
    R_S_cells = 6.0
    R_S = R_S_cells * dr
    ndot = (4.0 * np.pi / 3.0) * alphaB * nH ** 2 * R_S ** 3
    flux = np.array([ndot / 1e48])
    src_pos = np.array([[N // 2, N // 2, N // 2]])

    ndens = nH * np.ones((N, N, N))
    temp = temp_val * np.ones((N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))

    cfg = RaytraceConfig(N=N, R_max_LLS=1e9, sig=SIG, batch_size=1,
                         dtype=jnp.float64, grey_analytic=True)
    rt = Raytracer(cfg)
    log = str(tmp_path / "stromgren.log")

    t_end = t_rec
    n_steps = 10
    dt = t_end / n_steps
    for _ in range(n_steps):
        xh, phi = evolve3D(dt, dr, flux, src_pos, rt, CHEM, temp, ndens,
                           xh, convergence_fraction=1e-4, logfile=log,
                           quiet=True)

    # effective ionized radius from the total ionized volume
    V_ion = xh.sum() * dr ** 3
    r_eff = (3.0 * V_ion / (4.0 * np.pi)) ** (1.0 / 3.0)
    r_analytic = R_S * (1.0 - np.exp(-t_end / t_rec)) ** (1.0 / 3.0)
    err = abs(r_eff - r_analytic) / r_analytic
    assert err < 0.05, f"I-front error {err:.3f} (r_eff={r_eff/dr:.2f} " \
                       f"cells, analytic={r_analytic/dr:.2f} cells)"
    # front is sharp: center ionized, corners neutral
    assert xh[N // 2, N // 2, N // 2] > 0.99
    assert xh[0, 0, 0] < 0.01


def test_nonfinite_state_detected():
    """The convergence loop must abort on NaN global sums instead of
    silently spinning to max_iterations (failure detection — the
    reference has none, SURVEY section 5)."""
    import pytest
    from pyc2ray_tpu.evolve_loop import IterationResult, \
        run_convergence_loop

    def bad_iteration(niter):
        return IterationResult(10, float("nan"), 1.0)

    with pytest.raises(FloatingPointError, match="non-finite"):
        run_convergence_loop(bad_iteration, 1000, 5, quiet=True)
