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

from ..ops.chemistry import ChemistryParams, global_pass
from ..ops.raytrace import Raytracer
from ..utils.logutils import printlog

__all__ = ["trace_sharded", "global_pass_sharded", "evolve3D_sharded",
           "prepare_sources_sharded"]


def prepare_sources_sharded(raytracer: Raytracer, mesh, src_pos, src_flux):
    """Pad sources so batches divide evenly over all mesh devices.

    Padding sources have zero flux (contribute nothing), mirroring the
    remainder handling of the reference's per-rank split (evolve.py:361-371)
    without the imbalance of giving the remainder to the last rank.
    """
    B = raytracer.config.batch_size
    n_dev = mesh.devices.size
    ns = src_flux.shape[0]
    per_dev_batches = -(-ns // (B * n_dev))
    tot = per_dev_batches * B * n_dev
    pos = np.zeros((tot, 3), dtype=np.int32)
    flx = np.zeros((tot,), dtype=np.float64)
    pos[:ns] = np.asarray(src_pos, dtype=np.int32)
    flx[:ns] = np.asarray(src_flux, dtype=np.float64)
    nb = per_dev_batches * n_dev
    return (jnp.asarray(pos.reshape(nb, B, 3)),
            jnp.asarray(flx.reshape(nb, B), dtype=raytracer.config.dtype))


def make_sharded_step(raytracer: Raytracer, mesh, chem: ChemistryParams):
    """Build a jitted, sharded (raytrace + chemistry) iteration step.

    Returns step(ndens, temp, xh, xh_av, pos_b, flux_b, dt, dr) ->
    (xh_intermed, xh_av_new, phi_ion, conv_flag, sum_xh1, sum_xh0),
    with sources sharded over both mesh axes for the sweep and grid cells
    sharded over both axes for the chemistry.
    """
    axes = ("src", "space")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(axes), P(axes), P(), P()),
             out_specs=(P(), P(), P(), P(), P(), P()),
             check_vma=False)
    def step(tb, ndens, temp, xh, xh_av, pos_b, flux_b, dt, dr):
        # --- raytrace local source shard, then allreduce Gamma over ICI
        phi_local = raytracer.shard_trace(tb, ndens, xh_av, pos_b, flux_b, dr)
        phi_ion = jax.lax.psum(phi_local, axes)

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
        # gather updated fields back to replicated form
        xi = jax.lax.all_gather(xi_s, axes, tiled=True)
        xav = jax.lax.all_gather(xav_s, axes, tiled=True)
        conv_flag = jax.lax.psum(cf_s, axes)
        sum1 = jax.lax.psum(s1_s, axes)
        sum0 = jax.lax.psum(s0_s, axes)
        return xi, xav, phi_ion, conv_flag, sum1, sum0

    def step_with_tables(*args):
        return jax.jit(step)(raytracer.tables, *args)
    return step_with_tables


def trace_sharded(raytracer: Raytracer, mesh, ndens, xh_av, src_pos,
                  src_flux, dr):
    """Standalone multi-chip Gamma computation (source-sharded psum)."""
    cfg = raytracer.config
    nd = jnp.asarray(np.asarray(ndens), dtype=cfg.dtype).reshape(-1)
    xh = jnp.asarray(np.asarray(xh_av), dtype=cfg.dtype).reshape(-1)
    pos_b, flux_b = prepare_sources_sharded(raytracer, mesh, src_pos,
                                            src_flux)
    axes = ("src", "space")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(axes), P(axes), P()), out_specs=P(),
             check_vma=False)
    def f(tb, nd_, xh_, pos, flux, dr_):
        phi_local = raytracer.shard_trace(tb, nd_, xh_, pos, flux, dr_)
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
                     max_iterations=100):
    """Multi-chip evolve3D: the reference's evolve3D_MPI (evolve.py:249)
    with mesh sharding instead of MPI. Same convergence semantics as the
    single-chip path."""
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
    pos_b, flux_b = prepare_sources_sharded(raytracer, mesh, src_pos,
                                            src_flux)
    step = make_sharded_step(raytracer, mesh, chem)

    prev_sum_xh1 = 2.0 * num_cells
    prev_sum_xh0 = 2.0 * num_cells
    converged = False
    niter = 0
    phi_ion = None

    printlog(f"Calling evolve3D over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}...",
             logfile, quiet)
    while not converged and niter < max_iterations:
        niter += 1
        t0 = time.time()
        xh_intermed, xh_av, phi_ion, conv_flag, sum_xh1, sum_xh0 = step(
            ndens_d, temp_d, xh_d, xh_av, pos_b, flux_b,
            jnp.asarray(dt, dtype), jnp.asarray(dr, dtype))
        conv_flag, sum_xh1, sum_xh0 = jax.device_get(
            (conv_flag, sum_xh1, sum_xh0))
        printlog(f"Iteration {niter} took {time.time()-t0:.3f} s; "
                 f"non-converged: {int(conv_flag)}", logfile, quiet)
        rel1 = abs((sum_xh1 - prev_sum_xh1) / sum_xh1) if sum_xh1 > 0 else 1.0
        rel0 = abs((sum_xh0 - prev_sum_xh0) / sum_xh0) if sum_xh0 > 0 else 1.0
        converged = (conv_flag < conv_criterion) or (
            (rel1 < convergence_fraction) and (rel0 < convergence_fraction))
        prev_sum_xh1, prev_sum_xh0 = sum_xh1, sum_xh0

    shape3 = (N, N, N)
    return (np.asarray(xh_intermed).reshape(shape3),
            np.asarray(phi_ion).reshape(shape3))
