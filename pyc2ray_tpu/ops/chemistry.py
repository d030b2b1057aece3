"""Ionization chemistry: analytic single-zone solution + global grid pass.

TPU-native equivalent of the reference's Fortran chemistry module
(src/c2ray/chemistry.f90). The physics is identical:

* ``doric`` (chemistry.f90:221-316) is the closed-form solution of the
  hydrogen ionization ODE with constant rates over the timestep:
      x(t)   = (x0 - xeq) exp(-dt*delth) + xeq
      <x>    = xeq + (x0 - xeq) (1 - exp(-dt*delth)) / (dt*delth)
  with ionization rate aih0 = Gamma + ne*A_col(T) and
  delth = aih0 + ne*alpha_B(T)*clumping.

* ``global_pass`` (chemistry.f90:13-110) iterates doric per cell on the
  time-averaged electron density ne = n_H (<x> + abu_c) until <x> converges
  (rel. change < 1e-3), up to 400 iterations, and counts cells whose <x>
  changed significantly since entry (the non-convergence flag used by the
  outer evolve loop).

Design difference vs the reference: instead of a per-cell sequential loop,
the whole grid is updated as masked dense vector operations inside a single
``lax.while_loop`` — converged cells freeze (their values stop updating),
which reproduces the per-cell iteration semantics exactly while keeping the
computation on-device and XLA-fusible. This removes the reference's
device->host->device round trip per convergence iteration (evolve.py:198-210).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import EPSILON

__all__ = ["ChemistryParams", "doric", "global_pass"]

# Convergence constants (chemistry.f90:9-10)
MIN_FRACTIONAL_CHANGE = 1.0e-3
MIN_FRACTION_OF_ATOMS = 1.0e-8
MAX_INNER_ITER = 400


class ChemistryParams(NamedTuple):
    """Scalar chemistry parameters (see c2ray_base.py:329-352)."""
    bh00: float       # case-B recombination coefficient at 1e4 K
    albpow: float     # recombination temperature power-law index
    colh0: float      # collisional ionization coefficient
    temph0: float     # HI ionization energy in K
    abu_c: float      # carbon abundance (electron contribution)
    clumping: float = 1.0


def doric(xh_old, dt, temp, rhe, phi, p: ChemistryParams):
    """Analytic ionization update for one timestep (vectorized over cells).

    Parameters mirror chemistry.f90:221-316. ``rhe`` is the (time-averaged)
    electron density; ``phi`` the photoionization rate Gamma.

    Returns
    -------
    xh : ionized fraction at end of timestep
    xh_av : time-averaged ionized fraction over the timestep
    """
    dtype = jnp.result_type(xh_old, temp)
    brech0 = p.clumping * p.bh00 * (temp / 1e4) ** p.albpow
    sqrtt0 = jnp.sqrt(temp)
    acolh0 = p.colh0 * sqrtt0 * jnp.exp(-p.temph0 / temp)

    aih0 = phi + rhe * acolh0
    delth = aih0 + rhe * brech0
    eqxh = aih0 / delth
    deltht = delth * dt
    ee = jnp.exp(-deltht)
    xh = (xh_old - eqxh) * ee + eqxh
    xh = jnp.maximum(xh, jnp.asarray(EPSILON, dtype))

    # (1-ee)/deltht -> 1 for small deltht; guard precision (chemistry.f90:299-306)
    avg_factor = jnp.where(deltht < 1.0e-8, 1.0, (1.0 - ee) / deltht)
    xh_av = eqxh + (xh_old - eqxh) * avg_factor
    xh_av = jnp.maximum(xh_av, jnp.asarray(EPSILON, dtype))
    return xh, xh_av


@partial(jax.jit, static_argnames=())
def global_pass(dt, ndens, temp, xh, xh_av, phi_ion, p: ChemistryParams,
                mask=None):
    """Chemistry pass over the whole grid (chemistry.f90:13-110).

    All array arguments are same-shape (any shape; treated elementwise).
    ``mask`` (optional bool array, same shape) excludes cells from the
    non-convergence count — used for the dead padding rows of
    non-divisible domain shards (parallel/domain.py).

    Returns
    -------
    xh_intermed : ionized fraction at end of timestep (x(t), latest iterate)
    xh_av_new : converged time-averaged ionized fraction
    conv_flag : int32 count of cells that changed significantly since entry
    """
    xh_av_entry = xh_av

    def cond(state):
        _, _, active, nit = state
        return jnp.logical_and(nit < MAX_INNER_ITER, jnp.any(active))

    def body(state):
        xh_av_cur, xh_int, active, nit = state
        de = ndens * (xh_av_cur + p.abu_c)  # chemistry.f90:162
        xh_new, xh_av_new = doric(xh, dt, temp, de, phi_ion, p)
        # per-cell convergence (chemistry.f90:182-189)
        rel = jnp.abs((xh_av_new - xh_av_cur) / (1.0 - xh_av_new))
        done = jnp.logical_or(rel < MIN_FRACTIONAL_CHANGE,
                              (1.0 - xh_av_new) < MIN_FRACTION_OF_ATOMS)
        # freeze converged cells: only active cells update
        xh_av_out = jnp.where(active, xh_av_new, xh_av_cur)
        xh_int_out = jnp.where(active, xh_new, xh_int)
        active_out = jnp.logical_and(active, jnp.logical_not(done))
        return xh_av_out, xh_int_out, active_out, nit + 1

    # first iteration always runs (Fortran do-loop bottom test)
    active0 = jnp.ones(xh.shape, dtype=bool)
    xh_av_fin, xh_int_fin, _, _ = jax.lax.while_loop(
        cond, body, (xh_av, xh, active0, jnp.int32(0)))

    # global non-convergence count (chemistry.f90:99-104): compare against
    # the value at entry of the pass
    yh_entry = 1.0 - xh_av_entry
    delta = xh_av_fin - xh_av_entry
    not_conv = ((jnp.abs(delta) > MIN_FRACTIONAL_CHANGE)
                & (jnp.abs(delta / yh_entry) > MIN_FRACTIONAL_CHANGE)
                & (yh_entry > MIN_FRACTION_OF_ATOMS))
    if mask is not None:
        not_conv = not_conv & mask
    conv_flag = jnp.sum(not_conv.astype(jnp.int32))
    return xh_int_fin, xh_av_fin, conv_flag
