"""Cosmology tests: analytic limits and inverse consistency."""

import numpy as np

from pyc2ray_tpu.cosmology import (FlatLambdaCDM, matter_dominated_age,
                                   matter_dominated_zred)
from pyc2ray_tpu.constants import KM

_MPC_EXACT = 3.0856775814913673e24


def test_eds_analytic_age():
    """Om=1, no radiation: age(z) = 2/(3 H0) (1+z)^-1.5 exactly."""
    H0 = 70.0
    cosmo = FlatLambdaCDM(H0, 1.0, Tcmb0=0.0)
    H0_s = H0 * KM / _MPC_EXACT
    for z in [0.0, 1.0, 9.0, 20.0]:
        expected = 2.0 / (3.0 * H0_s) * (1 + z) ** -1.5
        np.testing.assert_allclose(cosmo.age(z), expected, rtol=1e-10)


def test_age_zred_inverse():
    cosmo = FlatLambdaCDM(70.0, 0.27, Tcmb0=2.726, Ob0=0.044)
    for z in [0.5, 3.0, 9.0, 15.0]:
        t = cosmo.age(z)
        np.testing.assert_allclose(cosmo.z_at_age(t), z, rtol=1e-8)


def test_lookback_consistency():
    cosmo = FlatLambdaCDM(70.0, 0.27, Tcmb0=2.726, Ob0=0.044)
    np.testing.assert_allclose(
        cosmo.lookback_time(9.0), cosmo.age(0.0) - cosmo.age(9.0),
        rtol=1e-12)
    assert cosmo.lookback_time(0.0) == 0.0


def test_radiation_density():
    """Omega_gamma for Tcmb=2.726 is ~5e-5; neutrinos add 68.13%."""
    cosmo = FlatLambdaCDM(70.0, 0.27, Tcmb0=2.726)
    assert 4.5e-5 < cosmo.Ogamma0 < 5.5e-5
    np.testing.assert_allclose(cosmo.Onu0 / cosmo.Ogamma0,
                               3.04 * (7 / 8) * (4 / 11) ** (4 / 3),
                               rtol=1e-12)


def test_matter_dominated_relations():
    z0 = 21.062
    age0 = matter_dominated_age(z0, z0, 70.0, 0.27)
    z_back = matter_dominated_zred(age0, z0, age0)
    np.testing.assert_allclose(z_back, z0, rtol=1e-12)
    # later time -> lower redshift
    assert matter_dominated_zred(2 * age0, z0, age0) < z0
