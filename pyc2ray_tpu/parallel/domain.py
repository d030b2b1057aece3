"""3D domain decomposition with halo exchange — beyond-reference scaling.

The reference never decomposes the grid: every MPI rank holds all N^3
cells and pays an O(N^3) Reduce+Bcast of Gamma per convergence iteration
(reference: pyc2ray/evolve.py:361-371,433-437). Here the grid is sharded
over a 2D device mesh along the (i, j) axes (k stays local so the minor
axis remains contiguous), and communication drops to the halo surface:

  1. ``halo_gather``: each device extends its (Li, Lj, N) slab with
     ``ceil(R)``-wide halos of neighbor data via ring ``ppermute`` along
     each decomposed axis (multi-hop when the halo exceeds the local
     extent); the k axis is wrap-padded locally. Global periodicity falls
     out of the ring topology.
  2. Every device sweeps the sources IT OWNS (a source's whole
     ``(2R+1)^3`` dependency cube lives in its extended slab — the
     short-characteristics causality never crosses devices mid-sweep).
  3. ``halo_reduce``: Gamma accumulated into halo cells is ppermuted back
     and added to the owning device's core — the exact adjoint of the
     gather.

Per iteration a device communicates O(Li*Lj*R) cells instead of O(N^3):
for N=256 on a 4x2 mesh with R=30 that is ~50x less traffic than the
reference's replicated reduce, and it rides nearest-neighbor ICI links.

Chemistry is elementwise and runs shard-local with no communication;
convergence reductions are two scalar psums.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import S_STAR_REF
from ..evolve_loop import IterationResult, run_convergence_loop
from ..ops.chemistry import ChemistryParams, global_pass
from ..utils.logutils import printlog

__all__ = ["make_domain_mesh", "DomainDecomposition", "evolve3D_domain"]


def make_domain_mesh(pi=None, pj=1, devices=None):
    """2D ("di", "dj") mesh decomposing the grid's (i, j) axes."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if pi is None:
        pi = n_dev // pj
    assert pi * pj <= n_dev, f"mesh {pi}x{pj} > {n_dev} devices"
    return Mesh(np.array(devices[:pi * pj]).reshape(pi, pj), ("di", "dj"))


def _ring_pull(x, axis_name, n, s):
    """Value of ``x`` on the device ``s`` hops LEFT (lower index, periodic)
    along ``axis_name``; s may be negative (right neighbor)."""
    if n == 1 or s % n == 0:
        return x
    perm = [((d - s) % n, d) for d in range(n)]
    return lax.ppermute(x, axis_name, perm)


def _halo_pieces(h, L):
    """Split a halo of width ``h`` into per-hop widths (hop 1 = adjacent
    neighbor). Hop s contributes min(L, h-(s-1)L) rows."""
    out = []
    s = 1
    while h > 0:
        w = min(L, h)
        out.append((s, w))
        h -= w
        s += 1
    return out


class DomainDecomposition:
    """Grid decomposition helper bound to a raytracing engine's geometry.

    Parameters
    ----------
    engine : ops.raytrace_cheb.ChebRaytracer
        Supplies N and the box geometry (halo widths = box padding).
    mesh : jax.sharding.Mesh with axes ("di", "dj").
    """

    def __init__(self, engine, mesh):
        if not hasattr(engine, "trace_extended"):
            raise TypeError(
                "domain decomposition requires the cheb/pallas engine "
                "(ops.raytrace_cheb.ChebRaytracer); got "
                f"{type(engine).__name__}. Set Raytracing.engine: cheb "
                "in the parameter file.")
        self.engine = engine
        self.mesh = mesh
        self.N = engine.N
        g = engine.geom
        self.hlo = g.c                 # low-side halo width
        self.hhi = g.Dc - 1 - g.c      # high-side halo width
        self.pi, self.pj = mesh.devices.shape
        assert self.N % self.pi == 0 and self.N % self.pj == 0, \
            f"N={self.N} not divisible by mesh {self.pi}x{self.pj}"
        self.Li = self.N // self.pi
        self.Lj = self.N // self.pj

    # -- halo exchange --------------------------------------------------
    def _gather_axis(self, f, axis, axis_name, n, L):
        """Extend local ``f`` along ``axis`` with halos from ring
        neighbors (low side ``self.hlo``, high side ``self.hhi``)."""
        lows, highs = [], []
        for s, w in _halo_pieces(self.hlo, L):
            # rows [-(s-1)L - w, -(s-1)L) relative to my start = the LAST
            # w rows of the neighbor s hops left
            piece = lax.slice_in_dim(f, L - w, L, axis=axis)
            lows.append(_ring_pull(piece, axis_name, n, s))
        for s, w in _halo_pieces(self.hhi, L):
            piece = lax.slice_in_dim(f, 0, w, axis=axis)
            highs.append(_ring_pull(piece, axis_name, n, -s))
        return jnp.concatenate(lows[::-1] + [f] + highs, axis=axis)

    def _reduce_axis(self, fx, axis, axis_name, n, L):
        """Adjoint of ``_gather_axis``: add my halo contributions into the
        neighbors' cores and return the (halo-stripped) local sum."""
        lo_pieces = _halo_pieces(self.hlo, L)
        hi_pieces = _halo_pieces(self.hhi, L)
        core = lax.slice_in_dim(fx, self.hlo, self.hlo + L, axis=axis)
        off = self.hlo
        for s, w in lo_pieces:
            off -= w
            # my rows [off, off+w) belong to the LAST w rows of the device
            # s hops left -> it receives them from s hops right
            piece = lax.slice_in_dim(fx, off, off + w, axis=axis)
            recv = _ring_pull(piece, axis_name, n, -s)
            pad_cfg = [(0, 0, 0)] * fx.ndim
            pad_cfg[axis] = (L - w, 0, 0)
            core = core + lax.pad(recv, jnp.zeros((), fx.dtype), pad_cfg)
        off = self.hlo + L
        for s, w in hi_pieces:
            piece = lax.slice_in_dim(fx, off, off + w, axis=axis)
            recv = _ring_pull(piece, axis_name, n, s)
            pad_cfg = [(0, 0, 0)] * fx.ndim
            pad_cfg[axis] = (0, L - w, 0)
            core = core + lax.pad(recv, jnp.zeros((), fx.dtype), pad_cfg)
            off += w
        return core

    def halo_gather(self, f):
        """(Li, Lj, N) local slab -> extended slab with neighbor halos in
        i/j and wrap padding in k."""
        fx = self._gather_axis(f, 0, "di", self.pi, self.Li)
        fx = self._gather_axis(fx, 1, "dj", self.pj, self.Lj)
        return jnp.pad(fx, ((0, 0), (0, 0), (self.hlo, self.hhi)),
                       mode="wrap")

    def halo_reduce(self, fx):
        """Extended accumulator -> (Li, Lj, N) local slab, halo
        contributions added to their owners."""
        # fold the k wrap locally first
        N = self.N
        core = fx[:, :, self.hlo:self.hlo + N]
        if self.hhi > 0:
            hi = fx[:, :, self.hlo + N:]
            core = core.at[:, :, :self.hhi].add(hi)
        lo = fx[:, :, :self.hlo]
        core = core.at[:, :, N - self.hlo:].add(lo)
        core = self._reduce_axis(core, 0, "di", self.pi, self.Li)
        core = self._reduce_axis(core, 1, "dj", self.pj, self.Lj)
        return core

    # -- source bucketing (host side) ------------------------------------
    def prepare_sources(self, src_pos, src_flux):
        """Bucket sources by owning device; return per-device batched
        (pos, flux) arrays with positions in extended-local coordinates
        (= unpadded local coordinates: box start i_loc-c+hlo = i_loc).

        Shapes: pos (n_dev*nb, B, 3) int32, flux (n_dev*nb, B) — leading
        axis shard_maps over ("di","dj"). All devices get the same batch
        count (max over devices); padding sources have zero flux."""
        B = self.engine.batch_size
        pos = np.asarray(src_pos, dtype=np.int64)
        flx = np.asarray(src_flux, dtype=np.float64)
        oi = pos[:, 0] // self.Li
        oj = pos[:, 1] // self.Lj
        owner = oi * self.pj + oj
        n_dev = self.pi * self.pj
        counts = np.bincount(owner, minlength=n_dev)
        nb = max(1, -(-int(counts.max()) // B))
        out_pos = np.zeros((n_dev, nb * B, 3), dtype=np.int32)
        out_flx = np.zeros((n_dev, nb * B), dtype=np.float64)
        for d in range(n_dev):
            sel = np.nonzero(owner == d)[0]
            loc = pos[sel].copy()
            loc[:, 0] -= (d // self.pj) * self.Li
            loc[:, 1] -= (d % self.pj) * self.Lj
            out_pos[d, :len(sel)] = loc
            out_flx[d, :len(sel)] = flx[sel]
        return (jnp.asarray(out_pos.reshape(n_dev * nb, B, 3)),
                jnp.asarray(out_flx.reshape(n_dev * nb, B),
                            dtype=self.engine.dtype))

    # -- sharded trace ----------------------------------------------------
    def _trace_shard(self, tb, nd_loc, xh_loc, pos_b, flux_b, dr):
        nhi_ext = self.halo_gather(nd_loc * (1.0 - xh_loc))
        phi_ext, heat_ext = self.engine.trace_extended(
            tb, nhi_ext, pos_b, flux_b, dr)
        phi = self.halo_reduce(phi_ext)
        heat = self.halo_reduce(heat_ext) if heat_ext is not None else None
        return phi, heat

    def trace(self, ndens, xh_av, src_pos, src_flux, dr):
        """Domain-decomposed multi-device Gamma. ndens/xh: (N,N,N) host or
        replicated arrays; returns (N,N,N) Gamma (replicated)."""
        eng = self.engine
        nd = jnp.asarray(np.asarray(ndens), eng.dtype).reshape((self.N,) * 3)
        xh = jnp.asarray(np.asarray(xh_av), eng.dtype).reshape((self.N,) * 3)
        pos_b, flux_b = self.prepare_sources(src_pos, src_flux)

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(), P("di", "dj", None), P("di", "dj", None),
                           P(("di", "dj")), P(("di", "dj")), P()),
                 out_specs=P("di", "dj", None), check_vma=False)
        def f(tb, nd_, xh_, pos, flux, dr_):
            phi, _ = self._trace_shard(tb, nd_, xh_, pos, flux, dr_)
            return phi

        phi = f(eng.tables, nd, xh, pos_b, flux_b,
                jnp.asarray(dr, eng.dtype))
        return phi

    # -- full sharded evolve step ----------------------------------------
    def make_step(self, chem: ChemistryParams):
        """Jitted domain-decomposed (raytrace + chemistry) iteration.

        All fields stay sharded (Li, Lj, N) across iterations — nothing
        is ever replicated or gathered; scalars are the only psums.
        With a heating engine the step also returns the local heating
        rates (for the post-convergence thermal update)."""
        eng = self.engine
        spec = P("di", "dj", None)
        heating = eng.do_heating

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(), spec, spec, spec, spec,
                           P(("di", "dj")), P(("di", "dj")), P(), P()),
                 out_specs=((spec, spec, spec, spec, P(), P(), P(), P())
                            if heating else
                            (spec, spec, spec, P(), P(), P(), P())),
                 check_vma=False)
        def step(tb, ndens, temp, xh, xh_av, pos_b, flux_b, dt, dr):
            phi, heat = self._trace_shard(tb, ndens, xh_av, pos_b,
                                          flux_b, dr)
            sh = phi.shape
            xi, xav, cf = global_pass(
                dt, ndens.reshape(-1), temp.reshape(-1), xh.reshape(-1),
                xh_av.reshape(-1), phi.reshape(-1), chem)
            s1 = jax.lax.psum(jnp.sum(xi), ("di", "dj"))
            s0 = jax.lax.psum(jnp.sum(1.0 - xi), ("di", "dj"))
            cf = jax.lax.psum(cf, ("di", "dj"))
            ab = jax.lax.psum(
                jnp.sum(phi * ndens * (1.0 - xh_av)), ("di", "dj")) * dr ** 3
            if heating:
                return (xi.reshape(sh), xav.reshape(sh), phi, heat,
                        cf, s1, s0, ab)
            return (xi.reshape(sh), xav.reshape(sh), phi, cf, s1, s0, ab)

        def step_with_tables(*args):
            return jax.jit(step)(eng.tables, *args)
        return step_with_tables

    def make_thermal_step(self, thermal, zred=0.0, nsub=16):
        """Sharded post-convergence temperature update (shard-local,
        zero communication — see ops/thermal.py)."""
        from ..ops.thermal import update_temperature
        spec = P("di", "dj", None)

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(), spec, spec, spec, spec),
                 out_specs=spec, check_vma=False)
        def tstep(dt, temp, ndens, xh_av, heat):
            return update_temperature(dt, temp, ndens, xh_av, heat,
                                      thermal, z=zred, nsub=nsub)
        return jax.jit(tstep)


def evolve3D_domain(dt, dr, src_flux, src_pos, decomp: DomainDecomposition,
                    chem: ChemistryParams, temp, ndens, xh,
                    convergence_fraction=1e-4, logfile=None, quiet=False,
                    max_iterations=100, thermal=None, zred=0.0):
    """Domain-decomposed evolve3D: the convergence loop of the reference's
    evolve3D_MPI (evolve.py:249) with halo exchange instead of replicated
    Reduce+Bcast, and chemistry shard-local. With ``thermal`` the
    temperature advances after convergence (shard-local, zero comms) and
    a third array is returned."""
    eng = decomp.engine
    N = decomp.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    dtype = eng.dtype
    sh3 = (N, N, N)
    temp_d = jnp.asarray(np.asarray(temp), dtype).reshape(sh3)
    ndens_d = jnp.asarray(np.asarray(ndens), dtype).reshape(sh3)
    xh_d = jnp.asarray(np.asarray(xh), dtype).reshape(sh3)
    pos_b, flux_b = decomp.prepare_sources(src_pos, src_flux)
    step = decomp.make_step(chem)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF

    heating = decomp.engine.do_heating
    if thermal is not None and not heating:
        raise ValueError("thermal evolution requires a heating engine")

    printlog(f"Calling evolve3D over domain mesh "
             f"{decomp.pi}x{decomp.pj} (halo {decomp.hlo}/{decomp.hhi})...",
             logfile, quiet)
    state = {"xh_av": xh_d, "xh_intermed": xh_d,
             "phi_ion": None, "phi_heat": None}

    def iteration(niter):
        t0 = time.time()
        out = step(ndens_d, temp_d, xh_d, state["xh_av"], pos_b, flux_b,
                   jnp.asarray(dt, dtype), jnp.asarray(dr, dtype))
        if heating:
            (xh_intermed, xh_av, phi_ion, phi_heat,
             conv_flag, sum_xh1, sum_xh0, absorbed) = out
        else:
            (xh_intermed, xh_av, phi_ion,
             conv_flag, sum_xh1, sum_xh0, absorbed) = out
            phi_heat = None
        conv_flag, sum_xh1, sum_xh0, absorbed = jax.device_get(
            (conv_flag, sum_xh1, sum_xh0, absorbed))
        printlog(f"Iteration {niter} took {time.time()-t0:.3f} s.",
                 logfile, quiet)
        state.update(xh_av=xh_av, xh_intermed=xh_intermed,
                     phi_ion=phi_ion, phi_heat=phi_heat)
        loss = (1.0 - float(absorbed) / emitted) if emitted > 0 else 0.0
        return IterationResult(int(conv_flag), float(sum_xh1),
                               float(sum_xh0), photon_loss=loss)

    run_convergence_loop(iteration, num_cells, num_src,
                         convergence_fraction, max_iterations,
                         logfile, quiet)

    if thermal is not None:
        tstep = decomp.make_thermal_step(thermal, zred=float(zred))
        temp_new = tstep(jnp.asarray(dt, dtype), temp_d, ndens_d,
                         state["xh_av"], state["phi_heat"])
        return (np.asarray(state["xh_intermed"]).reshape(sh3),
                np.asarray(state["phi_ion"]).reshape(sh3),
                np.asarray(temp_new).reshape(sh3))
    return (np.asarray(state["xh_intermed"]).reshape(sh3),
            np.asarray(state["phi_ion"]).reshape(sh3))
