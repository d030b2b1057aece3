"""Chemistry kernel tests: doric closed form + global pass vs oracle."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.chemistry import ChemistryParams, doric, global_pass
from pyc2ray_tpu.oracle import oracle_doric, oracle_chemistry_global

# Standard C2Ray parameter values (test parameters.yml)
BH00 = 2.59e-13
ALBPOW = -0.7
COLH0 = 1.3e-8 * 0.83 * 1.0 / (13.598 ** 2)
TEMPH0 = 13.598 / 8.617e-05
ABU_C = 7.1e-7
P = ChemistryParams(bh00=BH00, albpow=ALBPOW, colh0=COLH0, temph0=TEMPH0,
                    abu_c=ABU_C)


def test_doric_matches_oracle():
    rng = np.random.RandomState(0)
    n = 1000
    xh0 = rng.uniform(1e-5, 0.999, n)
    temp = rng.uniform(5e3, 5e4, n)
    rhe = rng.uniform(1e-7, 1e-1, n)
    phi = 10 ** rng.uniform(-20, -8, n)
    dt = 3.15e13

    xh_j, xav_j = doric(jnp.asarray(xh0), dt, jnp.asarray(temp),
                        jnp.asarray(rhe), jnp.asarray(phi), P)
    xh_o, xav_o = oracle_doric(xh0, dt, temp, rhe, phi,
                               BH00, ALBPOW, COLH0, TEMPH0)
    np.testing.assert_allclose(np.asarray(xh_j), xh_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xav_j), xav_o, rtol=1e-12)


def test_doric_equilibrium_limit():
    """For dt -> infinity, x approaches the photoionization equilibrium."""
    phi = 1e-10
    temp = 1e4
    rhe = 1e-3
    brech0 = BH00 * (temp / 1e4) ** ALBPOW
    acolh0 = COLH0 * np.sqrt(temp) * np.exp(-TEMPH0 / temp)
    aih0 = phi + rhe * acolh0
    eq = aih0 / (aih0 + rhe * brech0)
    xh, _ = doric(jnp.asarray([0.01]), 1e25, jnp.asarray([temp]),
                  jnp.asarray([rhe]), jnp.asarray([phi]), P)
    np.testing.assert_allclose(float(xh[0]), eq, rtol=1e-12)


def test_doric_no_radiation_recombination():
    """With no radiation and negligible collisions, x decays by
    recombination: dx/dt = -ne alphaB x."""
    xh0 = 0.5
    temp = 100.0  # cold -> no collisional ionization
    ne = 1e-3
    dt = 1e14
    xh, _ = doric(jnp.asarray([xh0]), dt, jnp.asarray([temp]),
                  jnp.asarray([ne]), jnp.asarray([0.0]), P)
    brech0 = BH00 * (temp / 1e4) ** ALBPOW
    acolh0 = COLH0 * np.sqrt(temp) * np.exp(-TEMPH0 / temp)
    aih0 = ne * acolh0
    delth = aih0 + ne * brech0
    eq = aih0 / delth
    expected = (xh0 - eq) * np.exp(-delth * dt) + eq
    np.testing.assert_allclose(float(xh[0]), expected, rtol=1e-12)


def test_global_pass_matches_oracle():
    rng = np.random.RandomState(1)
    shape = (8, 8, 8)
    ndens = 10 ** rng.uniform(-4, -2, shape)
    temp = 1e4 * np.ones(shape)
    xh = 1.2e-3 * np.ones(shape)
    phi = 10 ** rng.uniform(-16, -6, shape)
    dt = 3.15e13

    xi_j, xav_j, cf_j = global_pass(
        dt, jnp.asarray(ndens.ravel()), jnp.asarray(temp.ravel()),
        jnp.asarray(xh.ravel()), jnp.asarray(xh.ravel()),
        jnp.asarray(phi.ravel()), P)
    xi_o, xav_o, cf_o = oracle_chemistry_global(
        dt, ndens.ravel(), temp.ravel(), xh.ravel(), xh.ravel().copy(),
        phi.ravel(), BH00, ALBPOW, COLH0, TEMPH0, ABU_C)
    np.testing.assert_allclose(np.asarray(xi_j), xi_o, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(xav_j), xav_o, rtol=1e-10)
    assert int(cf_j) == cf_o


def test_hydrogenODE_api():
    from pyc2ray_tpu import hydrogenODE
    # Gentle regime: the non-convergence flag counts cells whose x_av
    # changed by >1e-3 during the pass (chemistry.f90:100-104), so a
    # standalone call needs a modest Gamma*dt
    shape = (8, 8, 8)
    xh = hydrogenODE(3.15e12, 1e-3 * np.ones(shape), 1e4 * np.ones(shape),
                     1.2e-3 * np.ones(shape), 1e-16 * np.ones(shape))
    assert xh.shape == shape
    assert np.all(xh > 1.2e-3) and np.all(xh <= 1.0)
