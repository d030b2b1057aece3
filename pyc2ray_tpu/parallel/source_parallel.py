"""Multi-chip source-parallel raytracing + cell-parallel chemistry.

Replaces the reference's MPI path (pyc2ray/evolve.py:249-498):

=======================  =========================================
reference (mpi4py)       this module (jax mesh)
=======================  =========================================
source-range split       sources sharded over the whole mesh
Reduce(SUM)+Bcast Gamma  one psum over ("src","space")
chemistry on rank 0      chemistry shard-local over cells, all devices
xh/flag Bcasts           implicit (replicated outputs)
=======================  =========================================
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..constants import S_STAR_REF
from ..evolve_loop import IterationResult, run_convergence_loop
from ..ops.chemistry import ChemistryParams, global_pass
from ..ops.raytrace import Raytracer
from ..utils.logutils import printlog

__all__ = ["trace_sharded", "global_pass_sharded", "evolve3D_sharded",
           "evolve3D_he_sharded", "prepare_sources_sharded"]


def _pad_batches_to_devices(pos, flx, n_dev):
    """Pad (nb, B, ...) batch arrays to a multiple of n_dev batches.
    Padding batches repeat the last positions with zero flux (swept but
    contributing nothing), mirroring the remainder handling of the
    reference's per-rank split (evolve.py:361-371) without the imbalance
    of giving the remainder to the last rank. The batch width is read
    off the arrays (the catalog-adaptive tuner may have raised it past
    the engine's configured batch_size)."""
    nb = pos.shape[0]
    nbp = -(-nb // n_dev) * n_dev
    if nbp > nb:
        pos = np.concatenate(
            [pos, np.repeat(pos[-1:], nbp - nb, axis=0)], axis=0)
        flx = np.concatenate(
            [flx, np.zeros((nbp - nb, flx.shape[1]), flx.dtype)], axis=0)
    return pos, flx


def _prepare_adaptive_sharded(raytracer, mesh, src_pos, src_flux, dr,
                              avg_dens):
    """Bucket-major staging for the adaptive engine under a source mesh.

    Sources are bucketed by the Stromgren policy exactly as on one
    device, then EVERY bucket's batches are padded to a whole number per
    device — all devices process the same radius bucket in lockstep with
    that bucket's batches sharded, so per-device batches never mix radii
    (they would need different geometries) and never fragment. An empty
    bucket stages one zero-flux batch per device: its sweep cost is one
    batch, and keeping the structure static avoids re-tracing the jitted
    step when bucket occupancy changes between timesteps.
    """
    from ..ops.raytrace_cheb import PackedPositions
    if dr is None or avg_dens is None:
        raise ValueError(
            "adaptive engine staging needs dr and avg_dens (the mean of "
            "the traced density grid) for the Stromgren bucketing policy")
    n_dev = mesh.devices.size
    src_pos = np.asarray(src_pos)
    src_flux = np.asarray(src_flux)
    buckets = raytracer.assign_buckets(src_flux, float(dr), float(avg_dens))
    pos_t, flux_t = [], []
    for k, eng in enumerate(raytracer.engines):
        B = eng.batch_size
        sel = np.nonzero(buckets == k)[0]
        if sel.size:
            pb, fb = eng.prepare_sources(src_pos[sel], src_flux[sel])
            packed = isinstance(pb, PackedPositions)
            pos = np.asarray(pb.pos if packed else pb)
            flx = np.asarray(fb)
        else:
            packed = eng.accumulate == "window"
            pos = np.zeros((1, B, 3), np.int32)
            flx = np.zeros((1, B), np.float64)
        pos, flx = _pad_batches_to_devices(pos, flx, n_dev)
        pos_j = jnp.asarray(pos)
        spank = pb.span if (sel.size and packed) else 0
        pos_t.append(PackedPositions(pos_j, span=spank)
                     if packed else pos_j)
        flux_t.append(jnp.asarray(flx, dtype=eng.dtype))
    return tuple(pos_t), tuple(flux_t)


def prepare_sources_sharded(raytracer: Raytracer, mesh, src_pos, src_flux,
                            dr=None, avg_dens=None):
    """Pad sources so batches divide evenly over all mesh devices.

    Padding sources have zero flux (contribute nothing), mirroring the
    remainder handling of the reference's per-rank split (evolve.py:361-371)
    without the imbalance of giving the remainder to the last rank.

    Window-accumulate engines get their Morton-packed span-bounded
    batches (ChebRaytracer._prepare_sources_packed) padded to a multiple
    of the device count with zero-flux dummy batches, so every shard
    runs the one-RMW-per-batch fast path on its slice.

    The adaptive engine returns per-bucket tuples (bucket-major: all
    devices sweep the same radius bucket in lockstep); it requires
    ``dr`` and ``avg_dens`` for the Stromgren bucketing policy.
    """
    if getattr(raytracer, "needs_flux_bucketing", False):
        return _prepare_adaptive_sharded(raytracer, mesh, src_pos,
                                         src_flux, dr, avg_dens)
    # hydrogen engines carry (batch_size, dtype) on .config; the helium
    # engine exposes them directly
    cfg = getattr(raytracer, "config", raytracer)
    B = cfg.batch_size
    n_dev = mesh.devices.size
    if getattr(raytracer, "accumulate", None) == "window":
        from ..ops.raytrace_cheb import PackedPositions
        pb, fb = raytracer.prepare_sources(src_pos, src_flux)
        if isinstance(pb, PackedPositions):   # not the sparse fallback
            pos, flx = _pad_batches_to_devices(
                np.asarray(pb.pos), np.asarray(fb), n_dev)
            return (PackedPositions(jnp.asarray(pos), span=pb.span),
                    jnp.asarray(flx, dtype=cfg.dtype))
    ns = src_flux.shape[0]
    per_dev_batches = -(-ns // (B * n_dev))
    tot = per_dev_batches * B * n_dev
    pos = np.zeros((tot, 3), dtype=np.int32)
    flx = np.zeros((tot,), dtype=np.float64)
    pos[:ns] = np.asarray(src_pos, dtype=np.int32)
    flx[:ns] = np.asarray(src_flux, dtype=np.float64)
    nb = per_dev_batches * n_dev
    return (jnp.asarray(pos.reshape(nb, B, 3)),
            jnp.asarray(flx.reshape(nb, B), dtype=cfg.dtype))


def make_sharded_step(raytracer: Raytracer, mesh, chem: ChemistryParams):
    """Build a jitted, sharded (raytrace + chemistry) iteration step.

    Returns step(ndens, temp, xh, xh_av, pos_b, flux_b, dt, dr) ->
    (xh_intermed, xh_av_new, phi_ion, conv_flag, sum_xh1, sum_xh0),
    with sources sharded over both mesh axes for the sweep and grid cells
    sharded over both axes for the chemistry.
    """
    axes = ("src", "space")
    heating = bool(getattr(raytracer.config, "do_heating", False))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(axes), P(axes), P(), P()),
             out_specs=((P(),) * 8 if heating else (P(),) * 7),
             check_vma=False)
    def step(tb, ndens, temp, xh, xh_av, pos_b, flux_b, dt, dr):
        # --- raytrace local source shard, then allreduce Gamma over ICI
        phi_local, heat_local = raytracer.shard_trace(
            tb, ndens, xh_av, pos_b, flux_b, dr)
        phi_ion = jax.lax.psum(phi_local, axes)
        heat = jax.lax.psum(heat_local, axes) if heating else None

        # --- chemistry shard-local over cells (no rank-0 serialization)
        n_dev = mesh.devices.size
        idx = jax.lax.axis_index(axes)
        n_cells = ndens.shape[0]
        shard = n_cells // n_dev
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * shard, shard)
        xi_s, xav_s, cf_s = global_pass(dt, sl(ndens), sl(temp), sl(xh),
                                        sl(xh_av), sl(phi_ion), chem)
        s1_s = jnp.sum(xi_s)
        s0_s = jnp.sum(1.0 - xi_s)
        # absorbed photon rate for the photon-conservation log (each
        # device sums its cell shard of the replicated Gamma)
        # absorbed-rate sum WITHOUT dr^3 (dr^3 ~ 1e62 overflows f32;
        # the volume factor is applied host-side in float64)
        ab_s = jnp.sum(sl(phi_ion) * sl(ndens) * (1.0 - sl(xh_av)))
        # gather updated fields back to replicated form
        xi = jax.lax.all_gather(xi_s, axes, tiled=True)
        xav = jax.lax.all_gather(xav_s, axes, tiled=True)
        conv_flag = jax.lax.psum(cf_s, axes)
        sum1 = jax.lax.psum(s1_s, axes)
        sum0 = jax.lax.psum(s0_s, axes)
        absorbed = jax.lax.psum(ab_s, axes)
        if heating:
            return xi, xav, phi_ion, heat, conv_flag, sum1, sum0, absorbed
        return xi, xav, phi_ion, conv_flag, sum1, sum0, absorbed

    jstep = jax.jit(step)

    def step_with_tables(*args):
        return jstep(raytracer.tables, *args)
    return step_with_tables


def trace_sharded(raytracer: Raytracer, mesh, ndens, xh_av, src_pos,
                  src_flux, dr):
    """Standalone multi-chip Gamma computation (source-sharded psum)."""
    cfg = raytracer.config
    nd = jnp.asarray(np.asarray(ndens), dtype=cfg.dtype).reshape(-1)
    xh = jnp.asarray(np.asarray(xh_av), dtype=cfg.dtype).reshape(-1)
    pos_b, flux_b = prepare_sources_sharded(
        raytracer, mesh, src_pos, src_flux,
        dr=float(dr), avg_dens=float(jnp.mean(nd)))
    axes = ("src", "space")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(axes), P(axes), P()), out_specs=P(),
             check_vma=False)
    def f(tb, nd_, xh_, pos, flux, dr_):
        phi_local, _ = raytracer.shard_trace(tb, nd_, xh_, pos, flux, dr_)
        return jax.lax.psum(phi_local, axes)

    phi = f(raytracer.tables, nd, xh, pos_b, flux_b, jnp.asarray(dr, cfg.dtype))
    return phi.reshape((cfg.N,) * 3)


def global_pass_sharded(mesh, dt, ndens, temp, xh, xh_av, phi_ion,
                        chem: ChemistryParams):
    """Standalone cell-sharded chemistry pass over the mesh."""
    axes = ("src", "space")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axes), P(axes), P(axes), P(axes), P(axes)),
             out_specs=(P(axes), P(axes), P()),
             check_vma=False)
    def f(dt_, nd, tp, x0, xav, phi):
        xi, xa, cf = global_pass(dt_, nd, tp, x0, xav, phi, chem)
        return xi, xa, jax.lax.psum(cf, axes)

    return f(jnp.asarray(dt), ndens, temp, xh, xh_av, phi_ion)


def evolve3D_sharded(dt, dr, src_flux, src_pos, raytracer: Raytracer,
                     mesh, chem: ChemistryParams, temp, ndens, xh,
                     convergence_fraction=1e-4, logfile=None, quiet=False,
                     max_iterations=100, thermal=None, zred=0.0,
                     loss_fraction=None):
    """Multi-chip evolve3D: the reference's evolve3D_MPI (evolve.py:249)
    with mesh sharding instead of MPI. Same convergence semantics as the
    single-chip path. With ``thermal`` (requires a heating engine) the
    temperature advances after convergence — the update is elementwise
    and runs on the replicated fields — and temp_new is appended to the
    return tuple."""
    cfg = raytracer.config
    N = cfg.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    dtype = cfg.dtype
    temp_d = jnp.asarray(np.asarray(temp), dtype=dtype).reshape(-1)
    ndens_d = jnp.asarray(np.asarray(ndens), dtype=dtype).reshape(-1)
    xh_d = jnp.asarray(np.asarray(xh), dtype=dtype).reshape(-1)
    pos_b, flux_b = prepare_sources_sharded(
        raytracer, mesh, src_pos, src_flux,
        dr=float(dr), avg_dens=float(jnp.mean(ndens_d)))
    step = make_sharded_step(raytracer, mesh, chem)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF

    heating = bool(getattr(cfg, "do_heating", False))
    if thermal is not None and not heating:
        raise ValueError("thermal evolution requires a raytracer with "
                         "do_heating=True (Photo.compute_heating_rates)")

    printlog(f"Calling evolve3D over mesh "
             f"{dict(zip(mesh.axis_names, mesh.devices.shape))}...",
             logfile, quiet)
    state = {"xh_av": xh_d, "xh_intermed": xh_d, "phi_ion": None,
             "phi_heat": None}

    def iteration(niter):
        t0 = time.time()
        out = step(ndens_d, temp_d, xh_d, state["xh_av"], pos_b,
                   flux_b, jnp.asarray(dt, dtype), jnp.asarray(dr, dtype))
        if heating:
            (xh_intermed, xh_av, phi_ion, phi_heat, conv_flag, sum_xh1,
             sum_xh0, absorbed) = out
        else:
            (xh_intermed, xh_av, phi_ion, conv_flag, sum_xh1, sum_xh0,
             absorbed) = out
            phi_heat = None
        conv_flag, sum_xh1, sum_xh0, absorbed = jax.device_get(
            (conv_flag, sum_xh1, sum_xh0, absorbed))
        printlog(f"Iteration {niter} took {time.time()-t0:.3f} s.",
                 logfile, quiet)
        state.update(xh_av=xh_av, xh_intermed=xh_intermed,
                     phi_ion=phi_ion, phi_heat=phi_heat)
        absorbed_rate = float(absorbed) * float(dr) ** 3
        loss = (1.0 - absorbed_rate / emitted) if emitted > 0 else 0.0
        return IterationResult(int(conv_flag), float(sum_xh1),
                               float(sum_xh0), photon_loss=loss)

    run_convergence_loop(iteration, num_cells, num_src,
                         convergence_fraction, max_iterations,
                         logfile, quiet, loss_fraction=loss_fraction)

    shape3 = (N, N, N)
    if thermal is not None:
        from ..ops.thermal import update_temperature
        temp_new = update_temperature(
            jnp.asarray(dt, dtype), temp_d, ndens_d, state["xh_av"],
            state["phi_heat"], thermal, z=float(zred))
        return (np.asarray(state["xh_intermed"]).reshape(shape3),
                np.asarray(state["phi_ion"]).reshape(shape3),
                np.asarray(temp_new).reshape(shape3))
    return (np.asarray(state["xh_intermed"]).reshape(shape3),
            np.asarray(state["phi_ion"]).reshape(shape3))


# ---------------------------------------------------------------------------
# Helium (three-species) source-parallel path
# ---------------------------------------------------------------------------

def make_sharded_step_he(raytracer, mesh, phe):
    """Three-species source-parallel iteration (engine =
    ops.raytrace_he.HeRaytracer): each device sweeps its source shard of
    all three absorber fields (replicated), one psum per rate field, and
    the coupled H+He chemistry runs cell-sharded."""
    from ..ops.chemistry_he import global_pass_he, secondary_enabled
    axes = ("src", "space")
    heating = raytracer.do_heating
    secondary = secondary_enabled(phe, heating)
    n_g = 4 if heating else 3

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P()) + (P(),) * 8 + (P(axes), P(axes), P(), P()),
             out_specs=(P(),) * (6 + n_g + 4),
             check_vma=False)
    def step(tb, heb, ndens, temp, xh0, xh_av, y1_0, y1_av, y2_0, y2_av,
             pos_b, flux_b, dt, dr):
        sh = ndens.shape
        fields = raytracer.species_fields(ndens, xh_av, y1_av, y2_av)
        g = raytracer.eng.geom
        pads = tuple(jnp.pad(f, ((g.c, g.Dc - 1 - g.c),) * 3, mode="wrap")
                     for f in fields)
        phis = raytracer.trace_extended(tb, heb, pads, pos_b, flux_b, dr)
        gs = [jax.lax.psum(raytracer.eng._fold_padding(p), axes)
              for p in phis]

        # chemistry shard-local over cells
        n_dev = mesh.devices.size
        idx = jax.lax.axis_index(axes)
        n_cells = ndens.size
        shard = n_cells // n_dev
        sl = lambda a: jax.lax.dynamic_slice_in_dim(
            a.reshape(-1), idx * shard, shard)
        (xi_s, xav_s, y1i_s, y1a_s, y2i_s, y2a_s, cf_s) = global_pass_he(
            dt, sl(ndens), sl(temp), sl(xh0), sl(xh_av),
            sl(y1_0), sl(y1_av), sl(y2_0), sl(y2_av),
            sl(gs[0]), sl(gs[1]), sl(gs[2]), phe,
            heat=sl(gs[3]) if secondary else None,
            recombination_photons=bool(
                getattr(phe, "recombination_photons", False)))
        ga = lambda a: jax.lax.all_gather(a, axes, tiled=True).reshape(sh)
        abu = jnp.asarray(phe.abu_he, xi_s.dtype)
        nhe_s = abu * sl(ndens)
        ab_s = jnp.sum(sl(gs[0]) * sl(ndens) * (1.0 - sl(xh_av))
                       + sl(gs[1]) * nhe_s * (1.0 - sl(y1_av) - sl(y2_av))
                       + sl(gs[2]) * nhe_s * sl(y1_av))
        return ((ga(xi_s), ga(xav_s), ga(y1i_s), ga(y1a_s), ga(y2i_s),
                 ga(y2a_s)) + tuple(gs)
                + (jax.lax.psum(cf_s, axes), jax.lax.psum(jnp.sum(xi_s), axes),
                   jax.lax.psum(jnp.sum(1.0 - xi_s), axes),
                   jax.lax.psum(ab_s, axes)))

    jstep = jax.jit(step)

    def step_with_tables(*args):
        return jstep(raytracer.eng.tables, raytracer.he_tables, *args)
    return step_with_tables


def evolve3D_he_sharded(dt, dr, src_flux, src_pos, raytracer, mesh, phe,
                        temp, ndens, xh, y1, y2,
                        convergence_fraction=1e-4, logfile=None,
                        quiet=False, max_iterations=100, thermal=None,
                        zred=0.0, loss_fraction=None):
    """Source-parallel coupled H+He evolve loop: the reference's MPI
    source split (evolve.py:361-371) applied to the three-species
    engine. Returns (xh, phi_HI, y1, y2, phi_HeI, phi_HeII[, temp])."""
    N = raytracer.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    dtype = raytracer.dtype
    sh3 = (N, N, N)
    as3 = lambda a: jnp.asarray(np.asarray(a), dtype).reshape(sh3)
    temp_d, ndens_d = as3(temp), as3(ndens)
    xh_d, y1_d, y2_d = as3(xh), as3(y1), as3(y2)
    pos_b, flux_b = prepare_sources_sharded(raytracer, mesh, src_pos,
                                            src_flux)
    step = make_sharded_step_he(raytracer, mesh, phe)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF
    heating = raytracer.do_heating
    if thermal is not None and not heating:
        raise ValueError("thermal evolution requires HeRaytracer("
                         "do_heating=True)")
    from ..ops.chemistry_he import secondary_enabled
    secondary = secondary_enabled(phe, heating)
    ng = 10 if heating else 9

    printlog(f"Calling evolve3D_he over mesh "
             f"{dict(zip(mesh.axis_names, mesh.devices.shape))} on "
             f"{num_src:n} source(s)...", logfile, quiet)
    state = {"xh_av": xh_d, "y1_av": y1_d, "y2_av": y2_d,
             "xh_int": xh_d, "y1_int": y1_d, "y2_int": y2_d, "g": None}

    def iteration(niter):
        t0 = time.time()
        out = step(ndens_d, temp_d, xh_d, state["xh_av"], y1_d,
                   state["y1_av"], y2_d, state["y2_av"], pos_b, flux_b,
                   jnp.asarray(dt, dtype), jnp.asarray(dr, dtype))
        (xi, xav, y1i, y1a, y2i, y2a) = out[:6]
        g = out[6:ng]
        cf, s1, s0, ab = jax.device_get(out[ng:])
        printlog(f"Iteration {niter} took {time.time()-t0:.3f} s.",
                 logfile, quiet)
        state.update(xh_av=xav, y1_av=y1a, y2_av=y2a,
                     xh_int=xi, y1_int=y1i, y2_int=y2i, g=g)
        ab_rate = float(ab) * float(dr) ** 3
        loss = (1.0 - ab_rate / emitted) if emitted > 0 else None
        return IterationResult(int(cf), float(s1), float(s0),
                               photon_loss=loss)

    run_convergence_loop(iteration, num_cells, num_src,
                         convergence_fraction, max_iterations,
                         logfile, quiet, loss_fraction=loss_fraction)

    g = state["g"]
    o3 = lambda a: np.asarray(a).reshape(sh3)
    out = (o3(state["xh_int"]), o3(g[0]), o3(state["y1_int"]),
           o3(state["y2_int"]), o3(g[1]), o3(g[2]))
    if thermal is not None:
        from ..ops.thermal import update_temperature
        from ..ops.chemistry_he import thermal_heat_rate
        heat_rate = thermal_heat_rate(phe, jnp.asarray(g[3]).reshape(-1),
                                      state["xh_av"].reshape(-1),
                                      secondary)
        temp_new = update_temperature(
            jnp.asarray(dt, dtype), temp_d.reshape(-1),
            ndens_d.reshape(-1), state["xh_av"].reshape(-1),
            heat_rate, thermal, z=float(zred))
        out = out + (o3(temp_new),)
    return out
