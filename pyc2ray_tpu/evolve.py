"""Timestep evolution: the raytrace/chemistry convergence loop.

TPU-native equivalent of the reference's evolve3D (pyc2ray/evolve.py:38-245).
Structure is the same — iterate (raytrace -> chemistry -> global convergence
test) until the time-averaged ionization field stops changing — but all grid
state lives on device as JAX arrays for the duration of the loop; only the
scalar convergence metrics are fetched to the host each iteration (the
reference round-trips the full N^3 Gamma and xh grids between GPU and CPU
every iteration, evolve.py:193-210).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from .ops.chemistry import ChemistryParams, global_pass
from .ops.raytrace import Raytracer
from .utils.logutils import printlog

__all__ = ["evolve3D", "evolve3D_he", "EvolveResult"]


def evolve3D(dt, dr, src_flux, src_pos, raytracer,
             chem: ChemistryParams, temp, ndens, xh,
             convergence_fraction=1e-4, logfile=None, quiet=False,
             max_iterations=100, thermal=None, zred=0.0):
    """Evolve the ionized fraction over one timestep until convergence.

    Parameters
    ----------
    dt : timestep in seconds
    dr : proper cell size in cm
    src_flux : (NumSrc,) normalized fluxes (units of S_star)
    src_pos : (NumSrc, 3) int 0-indexed grid positions
    raytracer : configured Raytracer for this mesh
    chem : ChemistryParams
    temp, ndens, xh : (N,N,N) grids (K, cm^-3, ionized fraction)
    convergence_fraction : fraction of cells allowed to remain unconverged
        (reference evolve.py:127)
    thermal : ops.thermal.ThermalParams, optional
        Non-isothermal mode (beyond reference): after the ionization
        convergence loop the temperature advances over dt using the
        converged photoheating rates (requires a raytracer built with
        do_heating). zred enters the Compton cooling term.

    Returns
    -------
    xh_new : (N,N,N) updated ionized fraction
    phi_ion : (N,N,N) photoionization rates of the last iteration
    temp_new : (N,N,N), only when ``thermal`` is given
    """
    cfg = raytracer.config
    N = cfg.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    conv_criterion = min(int(convergence_fraction * num_cells),
                         (num_src - 1) / 3)

    dtype = cfg.dtype
    temp_d = jnp.asarray(np.asarray(temp), dtype=dtype).reshape(-1)
    ndens_d = jnp.asarray(np.asarray(ndens), dtype=dtype).reshape(-1)
    xh_d = jnp.asarray(np.asarray(xh), dtype=dtype).reshape(-1)
    xh_av = xh_d
    xh_intermed = xh_d
    pos_b, flux_b = raytracer.prepare_sources(src_pos, src_flux)
    dr_d = jnp.asarray(dr, dtype)
    dt_d = jnp.asarray(dt, dtype)

    prev_sum_xh1 = 2.0 * num_cells
    prev_sum_xh0 = 2.0 * num_cells
    converged = False
    niter = 0

    printlog("Calling evolve3D...", logfile, quiet)
    printlog(f"dr [Mpc]: {dr/3.086e24:.3e}", logfile, quiet)
    printlog(f"dt [years]: {dt/3.15576e7:.3e}", logfile, quiet)
    printlog(f"Running on {num_src:n} source(s), total normalized flux: "
             f"{float(np.sum(src_flux)):.2e}", logfile, quiet)
    printlog(f"Convergence criterion (number of points): {conv_criterion:n}",
             logfile, quiet, end="\n\n")

    if thermal is not None and not raytracer.config.do_heating:
        raise ValueError("thermal evolution requires a raytracer with "
                         "do_heating=True (Photo.compute_heating_rates)")

    phi_ion = None
    phi_heat = None
    while not converged and niter < max_iterations:
        niter += 1

        t0 = time.time()
        phi_ion, phi_heat = raytracer.trace_batches(ndens_d, xh_av, pos_b,
                                                    flux_b, dr_d)
        phi_ion.block_until_ready()
        printlog(f"Raytracing took {time.time()-t0:.3f} s.", logfile, quiet)

        t0 = time.time()
        xh_intermed, xh_av, conv_flag = global_pass(
            dt_d, ndens_d, temp_d, xh_d, xh_av, phi_ion, chem)
        sum_xh1 = jnp.sum(xh_intermed)
        sum_xh0 = jnp.sum(1.0 - xh_intermed)
        conv_flag, sum_xh1, sum_xh0 = jax.device_get(
            (conv_flag, sum_xh1, sum_xh0))
        printlog(f"Chemistry took {time.time()-t0:.3f} s.", logfile, quiet)

        # global convergence test (evolve.py:216-232)
        rel1 = abs((sum_xh1 - prev_sum_xh1) / sum_xh1) if sum_xh1 > 0 else 1.0
        rel0 = abs((sum_xh0 - prev_sum_xh0) / sum_xh0) if sum_xh0 > 0 else 1.0
        printlog(f"Non-converged points: {int(conv_flag)} of {num_cells} "
                 f"({int(conv_flag)/num_cells*100:.3f} %), relative change "
                 f"in ionfrac: {rel1:.2e}", logfile, quiet)
        converged = (conv_flag < conv_criterion) or (
            (rel1 < convergence_fraction) and (rel0 < convergence_fraction))
        prev_sum_xh1, prev_sum_xh0 = sum_xh1, sum_xh0

    printlog("Multiple source convergence reached.", logfile, quiet)
    shape3 = (N, N, N)
    if thermal is not None:
        from .ops.thermal import update_temperature
        t0 = time.time()
        temp_new = update_temperature(dt_d, temp_d, ndens_d, xh_av,
                                      phi_heat, thermal, z=float(zred))
        temp_np = np.asarray(temp_new).reshape(shape3)
        printlog(f"Thermal update took {time.time()-t0:.3f} s "
                 f"(T range {temp_np.min():.1f}..{temp_np.max():.1f} K).",
                 logfile, quiet)
        return (np.asarray(xh_intermed).reshape(shape3),
                np.asarray(phi_ion).reshape(shape3), temp_np)
    return (np.asarray(xh_intermed).reshape(shape3),
            np.asarray(phi_ion).reshape(shape3))


def evolve3D_he(dt, dr, src_flux, src_pos, raytracer, phe,
                temp, ndens, xh, y1, y2, convergence_fraction=1e-4,
                logfile=None, quiet=False, max_iterations=100):
    """Coupled H+He evolve loop (beyond reference: helium is declared
    TODO there, README.md:81-87).

    Same convergence structure as evolve3D, but the raytracer is a
    three-species ops.raytrace_he.HeRaytracer and the chemistry is the
    coupled ops.chemistry_he.global_pass_he. Convergence is tested on
    the hydrogen field (the reference criterion) — helium shares the
    iteration through the electron density.

    Returns (xh, phi_HI, y1, y2, phi_HeI, phi_HeII), all (N,N,N).
    """
    from .ops.chemistry_he import global_pass_he

    N = raytracer.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    conv_criterion = min(int(convergence_fraction * num_cells),
                         (num_src - 1) / 3)
    dtype = raytracer.dtype
    sh3 = (N, N, N)
    as3 = lambda a: jnp.asarray(np.asarray(a), dtype).reshape(sh3)
    temp_d, ndens_d = as3(temp), as3(ndens)
    xh_d, y1_d, y2_d = as3(xh), as3(y1), as3(y2)
    xh_av, y1_av, y2_av = xh_d, y1_d, y2_d
    xh_int, y1_int, y2_int = xh_d, y1_d, y2_d
    pos_b, flux_b = raytracer.prepare_sources(src_pos, src_flux)
    dr_d = jnp.asarray(dr, dtype)
    dt_d = jnp.asarray(dt, dtype)

    prev1 = prev0 = 2.0 * num_cells
    converged = False
    niter = 0
    printlog(f"Calling evolve3D_he (H+He) on {num_src:n} source(s)...",
             logfile, quiet)
    g = (None,) * 3
    while not converged and niter < max_iterations:
        niter += 1
        t0 = time.time()
        g = raytracer._trace_jit(raytracer.eng.tables, raytracer.he_tables,
                                 ndens_d, xh_av, y1_av, y2_av,
                                 pos_b, flux_b, dr_d)
        printlog(f"Raytracing (3 species) took {time.time()-t0:.3f} s.",
                 logfile, quiet)
        t0 = time.time()
        (xh_int, xh_av, y1_int, y1_av, y2_int, y2_av,
         conv_flag) = global_pass_he(
            dt_d, ndens_d, temp_d, xh_d, xh_av,
            y1_d, y1_av, y2_d, y2_av, g[0], g[1], g[2], phe)
        sum1 = float(jnp.sum(xh_int))
        sum0 = float(jnp.sum(1.0 - xh_int))
        conv_flag = int(conv_flag)
        printlog(f"Chemistry (H+He) took {time.time()-t0:.3f} s; "
                 f"non-converged: {conv_flag}", logfile, quiet)
        rel1 = abs((sum1 - prev1) / sum1) if sum1 > 0 else 1.0
        rel0 = abs((sum0 - prev0) / sum0) if sum0 > 0 else 1.0
        converged = (conv_flag < conv_criterion) or (
            (rel1 < convergence_fraction) and (rel0 < convergence_fraction))
        prev1, prev0 = sum1, sum0

    return (np.asarray(xh_int).reshape(sh3), np.asarray(g[0]).reshape(sh3),
            np.asarray(y1_int).reshape(sh3), np.asarray(y2_int).reshape(sh3),
            np.asarray(g[1]).reshape(sh3), np.asarray(g[2]).reshape(sh3))


class EvolveResult:
    """Small container mirroring the reference's (xh, phi_ion) pair."""
    def __init__(self, xh, phi_ion):
        self.xh = xh
        self.phi_ion = phi_ion
