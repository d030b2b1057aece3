"""Native C++ component tests: must agree with the numpy builder/oracle."""

import numpy as np
import pytest

from pyc2ray_tpu.native_ext import (native_available,
                                    build_geometry_tables_native,
                                    oracle_sweep_native,
                                    chemistry_global_native)
from pyc2ray_tpu.ops.geometry import build_geometry, max_q_for
from pyc2ray_tpu.oracle import oracle_raytrace, oracle_chemistry_global

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def test_native_geometry_matches_numpy():
    N = 12
    mq = max_q_for(1e9, N)
    g = build_geometry(N, mq)
    C = g.num_cells
    out = build_geometry_tables_native(N, mq)
    offsets, nbr, sw, path, diag, dist2, shell_start, shell_size = out
    assert offsets.shape[1] == C
    np.testing.assert_array_equal(offsets, g.offsets[:, :C])
    np.testing.assert_array_equal(nbr, g.nbr[:, :C])
    np.testing.assert_allclose(sw, g.sw[:, :C], rtol=0, atol=0)
    np.testing.assert_allclose(path, g.path[:C], rtol=0, atol=0)
    np.testing.assert_allclose(diag, g.diag[:C], rtol=0, atol=0)
    np.testing.assert_array_equal(shell_start, g.shell_start)
    np.testing.assert_array_equal(shell_size, g.shell_size)


def test_native_sweep_matches_python_oracle():
    N = 8
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = np.array([[0, 7, 5], [3, 3, 3]])
    flux = np.array([1.0, 2.5])
    phi_n, heat_n, cdh_n = oracle_sweep_native(
        ndens, xh, src, flux, 6.7e20, 6.3e-18, 1e9, grey=True)
    phi_p, heat_p, cdh_p = oracle_raytrace(
        ndens, xh, src, flux, 6.7e20, 6.3e-18, 1e9, grey=True)
    np.testing.assert_allclose(phi_n, phi_p, rtol=1e-13)
    np.testing.assert_allclose(cdh_n, cdh_p, rtol=1e-13)


def test_native_chemistry_matches_python_oracle():
    rng = np.random.RandomState(4)
    shape = (6, 6, 6)
    ndens = 10 ** rng.uniform(-4, -2, shape)
    temp = 1e4 * np.ones(shape)
    xh = 1.2e-3 * np.ones(shape)
    phi = 10 ** rng.uniform(-16, -8, shape)
    dt = 3.15e13
    xi_n, xav_n, cf_n = chemistry_global_native(
        dt, ndens, temp, xh, xh.copy(), phi,
        2.59e-13, -0.7, 1.3e-8 * 0.83 / 13.598 ** 2, 13.598 / 8.617e-05,
        7.1e-7)
    xi_p, xav_p, cf_p = oracle_chemistry_global(
        dt, ndens, temp, xh, xh.copy(), phi,
        2.59e-13, -0.7, 1.3e-8 * 0.83 / 13.598 ** 2, 13.598 / 8.617e-05,
        7.1e-7)
    np.testing.assert_allclose(xi_n, xi_p, rtol=1e-10)
    np.testing.assert_allclose(xav_n, xav_p, rtol=1e-10)
    assert cf_n == cf_p
