"""Timestep evolution: the raytrace/chemistry convergence loop.

TPU-native equivalent of the reference's evolve3D (pyc2ray/evolve.py:38-245).
Structure is the same — iterate (raytrace -> chemistry -> global convergence
test) until the time-averaged ionization field stops changing — but all grid
state lives on device as JAX arrays for the duration of the loop; only the
scalar convergence metrics are fetched to the host each iteration (the
reference round-trips the full N^3 Gamma and xh grids between GPU and CPU
every iteration, evolve.py:193-210).

The convergence criterion, per-iteration logging (including the photon-loss
fraction the reference logs at evolve.py:202) and the stage timing live in
evolve_loop.run_convergence_loop, shared with the helium and multi-chip
variants (parallel/source_parallel.py, parallel/domain.py).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from .constants import S_STAR_REF
from .evolve_loop import IterationResult, force, run_convergence_loop
from .ops.chemistry import ChemistryParams, global_pass
from .utils.logutils import printlog

__all__ = ["evolve3D", "evolve3D_he"]


def _absorbed_rate(phi_ion, ndens, xh_av):
    """sum(Gamma * nHI) — the absorbed photon rate WITHOUT the dr^3
    volume factor (inverse of the photon-conserving division,
    raytracing.f90:531). The caller applies dr^3 in host float64:
    dr^3 ~ 1e62 cm^3 overflows float32, so folding it into the device
    reduction would make the loss log +-inf in f32 runs."""
    nhi = ndens * (1.0 - xh_av)
    return jnp.sum((phi_ion.reshape(-1) * nhi.reshape(-1)).astype(
        jnp.float32))


_absorbed_rate_jit = jax.jit(_absorbed_rate)


def _absorbed_rate_he(gh, ghe1, ghe2, ndens, xh_av, y1_av, y2_av, abu_he):
    """Three-species sum(Gamma_s * n_s) over HI, HeI, HeII WITHOUT the
    dr^3 factor (applied host-side in float64 — see _absorbed_rate).
    ndens is the hydrogen density; n_He = abu_he * n_H."""
    r = lambda a: a.reshape(-1).astype(jnp.float32)
    nhi = r(ndens) * (1.0 - r(xh_av))
    nhe = abu_he.astype(jnp.float32) * r(ndens)
    nhe1 = nhe * (1.0 - r(y1_av) - r(y2_av))
    nhe2 = nhe * r(y1_av)
    return jnp.sum(r(gh) * nhi + r(ghe1) * nhe1 + r(ghe2) * nhe2)


_absorbed_rate_he_jit = jax.jit(_absorbed_rate_he)


def prepare_for_engine(raytracer, src_pos, src_flux, dr, ndens_d):
    """Uniform source staging: fixed-radius engines take (pos, flux);
    flux-bucketing engines (ops/adaptive.py) additionally need the cell
    size and the mean density for the Stromgren-radius policy."""
    if getattr(raytracer, "needs_flux_bucketing", False):
        avg_dens = float(jnp.mean(ndens_d))
        return raytracer.prepare_sources(src_pos, src_flux, dr=float(dr),
                                         avg_dens=avg_dens)
    return raytracer.prepare_sources(src_pos, src_flux)


def evolve3D(dt, dr, src_flux, src_pos, raytracer,
             chem: ChemistryParams, temp, ndens, xh,
             convergence_fraction=1e-4, logfile=None, quiet=False,
             max_iterations=100, thermal=None, zred=0.0,
             loss_fraction=None):
    """Evolve the ionized fraction over one timestep until convergence.

    Parameters
    ----------
    dt : timestep in seconds
    dr : proper cell size in cm
    src_flux : (NumSrc,) normalized fluxes (units of S_star)
    src_pos : (NumSrc, 3) int 0-indexed grid positions
    raytracer : configured engine (ops.raytrace.Raytracer,
        ops.raytrace_cheb.ChebRaytracer or ops.adaptive.AdaptiveRaytracer)
    chem : ChemistryParams
    temp, ndens, xh : (N,N,N) grids (K, cm^-3, ionized fraction)
    convergence_fraction : fraction of cells allowed to remain unconverged
        (reference evolve.py:127)
    thermal : ops.thermal.ThermalParams, optional
        Non-isothermal mode (beyond reference): after the ionization
        convergence loop the temperature advances over dt using the
        converged photoheating rates (requires a raytracer built with
        do_heating). zred enters the Compton cooling term.
    loss_fraction : float, optional
        Raytracing.loss_fraction — photon-loss bound for the adaptive
        engine; per-iteration loss above it logs a warning
        (the reference's subbox loss budget, raytracing.f90:193-221).

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

    dtype = cfg.dtype
    temp_d = jnp.asarray(np.asarray(temp), dtype=dtype).reshape(-1)
    ndens_d = jnp.asarray(np.asarray(ndens), dtype=dtype).reshape(-1)
    xh_d = jnp.asarray(np.asarray(xh), dtype=dtype).reshape(-1)
    pos_b, flux_b = prepare_for_engine(raytracer, src_pos, src_flux, dr,
                                       ndens_d)
    dr_d = jnp.asarray(dr, dtype)
    dt_d = jnp.asarray(dt, dtype)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF

    printlog("Calling evolve3D...", logfile, quiet)
    printlog(f"dr [Mpc]: {dr/3.086e24:.3e}", logfile, quiet)
    printlog(f"dt [years]: {dt/3.15576e7:.3e}", logfile, quiet)
    printlog(f"Running on {num_src:n} source(s), total normalized flux: "
             f"{float(np.sum(src_flux)):.2e}", logfile, quiet)
    if getattr(raytracer, "needs_flux_bucketing", False):
        printlog(raytracer.describe_buckets(pos_b), logfile, quiet)

    if thermal is not None and not raytracer.config.do_heating:
        raise ValueError("thermal evolution requires a raytracer with "
                         "do_heating=True (Photo.compute_heating_rates)")

    state = {"xh_av": xh_d, "xh_intermed": xh_d,
             "phi_ion": None, "phi_heat": None}

    def iteration(niter):
        t0 = time.time()
        xh_av_seen = state["xh_av"]
        phi_ion, phi_heat = raytracer.trace_batches(
            ndens_d, xh_av_seen, pos_b, flux_b, dr_d)
        force(phi_ion)
        printlog(f"Raytracing took {time.time()-t0:.3f} s.", logfile, quiet)
        state["phi_ion"], state["phi_heat"] = phi_ion, phi_heat

        t0 = time.time()
        xh_intermed, xh_av, conv_flag = global_pass(
            dt_d, ndens_d, temp_d, xh_d, xh_av_seen, phi_ion, chem)
        sum_xh1 = jnp.sum(xh_intermed)
        sum_xh0 = jnp.sum(1.0 - xh_intermed)
        absorbed = _absorbed_rate_jit(phi_ion, ndens_d, xh_av_seen)
        conv_flag, sum_xh1, sum_xh0, absorbed = jax.device_get(
            (conv_flag, sum_xh1, sum_xh0, absorbed))
        printlog(f"Chemistry took {time.time()-t0:.3f} s.", logfile, quiet)
        state["xh_av"], state["xh_intermed"] = xh_av, xh_intermed
        absorbed_rate = float(absorbed) * float(dr) ** 3
        loss = (1.0 - absorbed_rate / emitted) if emitted > 0 else 0.0
        return IterationResult(int(conv_flag), float(sum_xh1),
                               float(sum_xh0), photon_loss=loss)

    run_convergence_loop(iteration, num_cells, num_src,
                         convergence_fraction, max_iterations,
                         logfile, quiet, loss_fraction=loss_fraction)

    shape3 = (N, N, N)
    if thermal is not None:
        from .ops.thermal import update_temperature
        t0 = time.time()
        temp_new = update_temperature(dt_d, temp_d, ndens_d, state["xh_av"],
                                      state["phi_heat"], thermal,
                                      z=float(zred))
        temp_np = np.asarray(temp_new).reshape(shape3)
        printlog(f"Thermal update took {time.time()-t0:.3f} s "
                 f"(T range {temp_np.min():.1f}..{temp_np.max():.1f} K).",
                 logfile, quiet)
        return (np.asarray(state["xh_intermed"]).reshape(shape3),
                np.asarray(state["phi_ion"]).reshape(shape3), temp_np)
    return (np.asarray(state["xh_intermed"]).reshape(shape3),
            np.asarray(state["phi_ion"]).reshape(shape3))


def evolve3D_he(dt, dr, src_flux, src_pos, raytracer, phe,
                temp, ndens, xh, y1, y2, convergence_fraction=1e-4,
                logfile=None, quiet=False, max_iterations=100,
                thermal=None, zred=0.0, loss_fraction=None):
    """Coupled H+He evolve loop (beyond reference: helium is declared
    TODO there, README.md:81-87).

    Same convergence structure as evolve3D, but the raytracer is a
    three-species ops.raytrace_he.HeRaytracer and the chemistry is the
    coupled ops.chemistry_he.global_pass_he. Convergence is tested on
    the hydrogen field (the reference criterion) — helium shares the
    iteration through the electron density.

    With ``thermal`` (requires HeRaytracer(do_heating=True)) the
    temperature advances after convergence using the total three-species
    photoheating, and temp_new is appended to the return tuple.

    Returns (xh, phi_HI, y1, y2, phi_HeI, phi_HeII[, temp_new]),
    all (N,N,N).
    """
    from .ops.chemistry_he import global_pass_he

    N = raytracer.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    dtype = raytracer.dtype
    sh3 = (N, N, N)
    as3 = lambda a: jnp.asarray(np.asarray(a), dtype).reshape(sh3)
    temp_d, ndens_d = as3(temp), as3(ndens)
    xh_d, y1_d, y2_d = as3(xh), as3(y1), as3(y2)
    pos_b, flux_b = raytracer.prepare_sources(src_pos, src_flux)
    dr_d = jnp.asarray(dr, dtype)
    dt_d = jnp.asarray(dt, dtype)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF

    printlog(f"Calling evolve3D_he (H+He) on {num_src:n} source(s)...",
             logfile, quiet)
    if thermal is not None and not getattr(raytracer, "do_heating", False):
        raise ValueError("thermal evolution requires HeRaytracer("
                         "do_heating=True) (Photo.compute_heating_rates)")
    from .ops.chemistry_he import secondary_enabled
    secondary = secondary_enabled(phe, getattr(raytracer, "do_heating",
                                               False))
    state = {"xh_av": xh_d, "y1_av": y1_d, "y2_av": y2_d,
             "xh_int": xh_d, "y1_int": y1_d, "y2_int": y2_d,
             "g": (None,) * 3}

    def iteration(niter):
        t0 = time.time()
        xh_av_seen = state["xh_av"]
        g = raytracer.trace_batches(ndens_d, xh_av_seen, state["y1_av"],
                                    state["y2_av"], pos_b, flux_b, dr_d)
        force(g[0])
        printlog(f"Raytracing (3 species) took {time.time()-t0:.3f} s.",
                 logfile, quiet)
        state["g"] = g
        t0 = time.time()
        (xh_int, xh_av, y1_int, y1_av, y2_int, y2_av,
         conv_flag) = global_pass_he(
            dt_d, ndens_d, temp_d, xh_d, xh_av_seen,
            y1_d, state["y1_av"], y2_d, state["y2_av"],
            g[0], g[1], g[2], phe,
            heat=g[3] if secondary else None,
            recombination_photons=bool(
                getattr(phe, "recombination_photons", False)))
        sum1 = jnp.sum(xh_int)
        sum0 = jnp.sum(1.0 - xh_int)
        absorbed = _absorbed_rate_he_jit(
            g[0], g[1], g[2], ndens_d, xh_av_seen, state["y1_av"],
            state["y2_av"], jnp.asarray(phe.abu_he, dtype))
        conv_flag, sum1, sum0, absorbed = jax.device_get(
            (conv_flag, sum1, sum0, absorbed))
        printlog(f"Chemistry (H+He) took {time.time()-t0:.3f} s.",
                 logfile, quiet)
        state.update(xh_av=xh_av, y1_av=y1_av, y2_av=y2_av,
                     xh_int=xh_int, y1_int=y1_int, y2_int=y2_int)
        absorbed_rate = float(absorbed) * float(dr) ** 3
        loss = (1.0 - absorbed_rate / emitted) if emitted > 0 else None
        return IterationResult(int(conv_flag), float(sum1), float(sum0),
                               photon_loss=loss)

    run_convergence_loop(iteration, num_cells, num_src,
                         convergence_fraction, max_iterations,
                         logfile, quiet, loss_fraction=loss_fraction)

    g = state["g"]
    out = (np.asarray(state["xh_int"]).reshape(sh3),
           np.asarray(g[0]).reshape(sh3),
           np.asarray(state["y1_int"]).reshape(sh3),
           np.asarray(state["y2_int"]).reshape(sh3),
           np.asarray(g[1]).reshape(sh3), np.asarray(g[2]).reshape(sh3))
    if thermal is not None:
        from .ops.thermal import update_temperature
        from .ops.chemistry_he import thermal_heat_rate
        heat_rate = thermal_heat_rate(phe, g[3].reshape(-1),
                                      state["xh_av"].reshape(-1),
                                      secondary)
        temp_new = update_temperature(
            dt_d, temp_d.reshape(-1), ndens_d.reshape(-1),
            state["xh_av"].reshape(-1), heat_rate, thermal,
            z=float(zred))
        out = out + (np.asarray(temp_new).reshape(sh3),)
    return out
