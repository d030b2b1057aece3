"""Standalone chemistry API.

Equivalent of the reference's pyc2ray/chemistry.py:43-95 (``hydrogenODE``):
apply the chemistry solver for a single timestep given precomputed
photoionization rates, without raytracing. Useful for testing and notebook
use (reference tutorials/chemistry_solver.ipynb).
"""

import numpy as np
import jax.numpy as jnp

from .ops.chemistry import ChemistryParams, global_pass

__all__ = ["hydrogenODE"]


def hydrogenODE(dt, ndens, temp, xh, phi_ion,
                bh00=2.59e-13, albpow=-0.7,
                colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                temph0=13.598 * 1.0 / 8.617e-05,
                abu_c=7.1e-7, max_nonconverged_fraction=0.01):
    """Evolve the ionized fraction over dt with fixed Gamma.

    Defaults match the standard C2Ray parameter file values
    (reference chemistry.py:43-95). Asserts that less than
    ``max_nonconverged_fraction`` of the cells failed to converge
    (chemistry.py:91-94).
    """
    p = ChemistryParams(bh00=bh00, albpow=albpow, colh0=colh0,
                        temph0=temph0, abu_c=abu_c)
    shape = np.asarray(xh).shape
    xh_d = jnp.asarray(np.asarray(xh, dtype=np.float64))
    xh_int, xh_av, conv_flag = global_pass(
        jnp.float64(dt), jnp.asarray(np.asarray(ndens, dtype=np.float64)),
        jnp.asarray(np.asarray(temp, dtype=np.float64)), xh_d, xh_d,
        jnp.asarray(np.asarray(phi_ion, dtype=np.float64)), p)
    frac = float(conv_flag) / np.prod(shape)
    assert frac < max_nonconverged_fraction, (
        f"{frac*100:.2f}% of cells did not converge")
    return np.asarray(xh_int)
