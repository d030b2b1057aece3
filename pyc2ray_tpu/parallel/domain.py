"""3D domain decomposition with halo exchange — beyond-reference scaling.

The reference never decomposes the grid: every MPI rank holds all N^3
cells and pays an O(N^3) Reduce+Bcast of Gamma per convergence iteration
(reference: pyc2ray/evolve.py:361-371,433-437). Here the grid is sharded
over a ("di", "dj", "dk") device mesh along the (i, j, k) axes and
communication drops to the halo surface:

  1. ``halo_gather``: each device extends its local block with
     ``ceil(R)``-wide halos of neighbor data via ring ``ppermute`` along
     each decomposed axis (multi-hop when the halo exceeds the local
     extent); axes with one device are wrap-padded locally. Global
     periodicity falls out of the ring topology.
  2. Every device sweeps the sources IT OWNS (a source's whole
     ``(2R+1)^3`` dependency cube lives in its extended block — the
     short-characteristics causality never crosses devices mid-sweep).
     Sources whose cube lies entirely inside the local block ("interior"
     sources) are swept from the un-exchanged local data CONCURRENTLY
     with the halo gather — the sweep has no data dependency on the
     collectives, so XLA overlaps communication with compute.
  3. ``halo_reduce``: Gamma accumulated into halo cells is ppermuted back
     and added to the owning device's core — the exact adjoint of the
     gather.

Per iteration a device communicates O(L^2 * R) cells instead of O(N^3):
for N=256 on a 2x2x2 mesh with R=30 that is ~40x less traffic than the
reference's replicated reduce, and it rides nearest-neighbor ICI links.

Mesh sizes do NOT need to divide N: a non-divisible axis stores
ceil(N/p) rows per device (the last device padded) and falls back to an
``all_gather`` + mod-N window for the halo exchange on that axis —
O(N * face) traffic instead of O(halo * face), still far below the
reference's O(N^3), so any pod-slice device count can be meshed.
Divisible axes (the production case) always take the optimal
multi-hop-ppermute path.

Chemistry is elementwise and runs shard-local with no communication;
convergence reductions are scalar psums.
"""

import time
from functools import partial
from typing import NamedTuple

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

__all__ = ["make_domain_mesh", "DomainDecomposition", "evolve3D_domain",
           "evolve3D_he_domain"]


def make_domain_mesh(pi=None, pj=1, pk=1, devices=None):
    """("di", "dj", "dk") mesh decomposing the grid's (i, j, k) axes.

    ``pi`` defaults to using all devices: pi = n_dev // (pj * pk)."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if pi is None:
        pi = n_dev // (pj * pk)
    assert pi * pj * pk <= n_dev, f"mesh {pi}x{pj}x{pk} > {n_dev} devices"
    return Mesh(np.array(devices[:pi * pj * pk]).reshape(pi, pj, pk),
                ("di", "dj", "dk"))


class _Axis(NamedTuple):
    name: str
    p: int          # devices along this axis
    Lp: int         # rows per device (ceil(N/p); last device padded)
    Np: int         # padded global extent = p * Lp
    divisible: bool


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
    mesh : jax.sharding.Mesh with axes from ("di", "dj", "dk"); axes may
        be absent (treated as size 1). Axis sizes need not divide N.
    """

    def __init__(self, engine, mesh):
        # adaptive engine: owner-local bucketing — every device buckets
        # the sources it owns by the Stromgren policy and sweeps
        # bucket-major locally; ONE halo exchange sized for the largest
        # bucket serves all buckets (reference role: subbox + MPI source
        # split compose freely in its CPU path, reference
        # evolve.py:361-371 + raytracing.f90:183-226)
        self._adaptive = bool(getattr(engine, "needs_flux_bucketing",
                                      False))
        probe = engine.engines[-1] if self._adaptive else engine
        if not hasattr(probe, "trace_extended"):
            raise TypeError(
                "domain decomposition requires the cheb/pallas engine "
                "(ops.raytrace_cheb.ChebRaytracer); got "
                f"{type(engine).__name__}. Set Raytracing.engine: cheb "
                "in the parameter file.")
        self.engine = engine
        self.mesh = mesh
        self.N = engine.N
        g = probe.geom                 # largest bucket sets the halo
        self.hlo = g.c                 # low-side halo width
        self.hhi = g.Dc - 1 - g.c      # high-side halo width
        N = self.N
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        self.axes = []
        for name in ("di", "dj", "dk"):
            p = int(sizes.get(name, 1))
            Lp = -(-N // p)
            self.axes.append(_Axis(name, p, Lp, p * Lp,
                                   divisible=(N % p == 0)))
        self.padded = any(not a.divisible for a in self.axes)
        # back-compat attributes
        self.pi, self.pj, self.pk = (a.p for a in self.axes)
        self.Li, self.Lj, self.Lk = (a.Lp for a in self.axes)
        self._axis_names = tuple(a.name for a in self.axes
                                 if a.name in mesh.axis_names)

    # -- helpers ---------------------------------------------------------
    def _spec(self, *extra_none):
        """Field PartitionSpec over the mesh's axes."""
        names = [a.name if a.name in self.mesh.axis_names else None
                 for a in self.axes]
        return P(*names, *extra_none)

    def _src_spec(self):
        return P(tuple(self._axis_names))

    def pad_global(self, arr, fill=0.0):
        """(N,N,N) -> (Np_i, Np_j, Np_k) with constant fill in dead rows."""
        if not self.padded:
            return arr
        pads = [(0, a.Np - self.N) for a in self.axes]
        return jnp.pad(arr, pads, constant_values=fill)

    def strip_global(self, arr):
        if not self.padded:
            return arr
        return arr[:self.N, :self.N, :self.N]

    def _valid_mask(self):
        """Per-cell validity of the local block (True where the cell is a
        real grid cell, False in the dead padding of the last shard).
        Returns None when no axis is padded."""
        if not self.padded:
            return None
        m = None
        for dim, ax in enumerate(self.axes):
            if ax.divisible:
                continue
            d = lax.axis_index(ax.name) if ax.p > 1 else 0
            rows = d * ax.Lp + jnp.arange(ax.Lp)
            v = rows < self.N
            shape = [1, 1, 1]
            shape[dim] = ax.Lp
            v = v.reshape(shape)
            m = v if m is None else m & v
        if m is None:
            return None
        return jnp.broadcast_to(m, tuple(a.Lp for a in self.axes))

    # -- halo exchange ---------------------------------------------------
    def _gather_axis_ring(self, f, axis, axis_name, n, L):
        """Extend local ``f`` along ``axis`` with halos from ring
        neighbors (low side ``self.hlo``, high side ``self.hhi``).
        Optimal multi-hop ppermute; requires N % n == 0."""
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

    def _reduce_axis_ring(self, fx, axis, axis_name, n, L):
        """Adjoint of ``_gather_axis_ring``: add my halo contributions into
        the neighbors' cores and return the (halo-stripped) local sum."""
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

    def _gather_axis_compat(self, f, axis, ax: _Axis):
        """Halo extension for a NON-divisible axis: all_gather the padded
        global axis and take the mod-N window [g0-hlo, g0+Lp+hhi).
        O(N * face) traffic — the compat path; divisible meshes never
        use it."""
        ag = lax.all_gather(f, ax.name, axis=axis, tiled=True)  # Np rows
        d = lax.axis_index(ax.name)
        g0 = d * ax.Lp
        ext = self.hlo + ax.Lp + self.hhi
        idx = (g0 - self.hlo + jnp.arange(ext)) % self.N
        return jnp.take(ag, idx, axis=axis)

    def _reduce_axis_compat(self, fx, axis, ax: _Axis):
        """Adjoint of ``_gather_axis_compat``: scatter-add the extended
        rows into a global-length axis (mod N), psum over the axis ring,
        slice back my core rows."""
        d = lax.axis_index(ax.name)
        g0 = d * ax.Lp
        E = fx.shape[axis]
        idx = (g0 - self.hlo + jnp.arange(E)) % self.N
        moved = jnp.moveaxis(fx, axis, 0)
        glob = jnp.zeros((self.N,) + moved.shape[1:], fx.dtype)
        glob = glob.at[idx].add(moved)
        glob = lax.psum(glob, ax.name)
        if ax.Np > self.N:
            pad_cfg = [(0, 0)] * glob.ndim
            pad_cfg[0] = (0, ax.Np - self.N)
            glob = jnp.pad(glob, pad_cfg)
        core = lax.dynamic_slice_in_dim(glob, g0, ax.Lp, axis=0)
        return jnp.moveaxis(core, 0, axis)

    def _gather_axis(self, f, axis, ax: _Axis):
        if ax.p == 1:
            pad_cfg = [(0, 0)] * f.ndim
            pad_cfg[axis] = (self.hlo, self.hhi)
            return jnp.pad(f, pad_cfg, mode="wrap")
        if ax.divisible:
            return self._gather_axis_ring(f, axis, ax.name, ax.p, ax.Lp)
        return self._gather_axis_compat(f, axis, ax)

    def _reduce_axis(self, fx, axis, ax: _Axis):
        if ax.p == 1:
            # fold the wrap padding locally
            N = self.N
            sl = [slice(None)] * fx.ndim
            sl[axis] = slice(self.hlo, self.hlo + N)
            core = fx[tuple(sl)]
            if self.hhi > 0:
                sl[axis] = slice(self.hlo + N, None)
                hi = fx[tuple(sl)]
                pad_cfg = [(0, 0, 0)] * fx.ndim
                pad_cfg[axis] = (0, N - self.hhi, 0)
                core = core + lax.pad(hi, jnp.zeros((), fx.dtype), pad_cfg)
            if self.hlo > 0:
                sl[axis] = slice(0, self.hlo)
                lo = fx[tuple(sl)]
                pad_cfg = [(0, 0, 0)] * fx.ndim
                pad_cfg[axis] = (N - self.hlo, 0, 0)
                core = core + lax.pad(lo, jnp.zeros((), fx.dtype), pad_cfg)
            return core
        if ax.divisible:
            return self._reduce_axis_ring(fx, axis, ax.name, ax.p, ax.Lp)
        return self._reduce_axis_compat(fx, axis, ax)

    def halo_gather(self, f):
        """Local block -> extended block with neighbor halos along
        decomposed axes and wrap padding along single-device axes."""
        for dim, ax in enumerate(self.axes):
            f = self._gather_axis(f, dim, ax)
        return f

    def halo_reduce(self, fx):
        """Extended accumulator -> local block, halo contributions added
        to their owners (the exact adjoint of ``halo_gather``)."""
        for dim in (2, 1, 0):
            fx = self._reduce_axis(fx, dim, self.axes[dim])
        return fx

    def _pad_local(self, f):
        """Zero-extend the local block to the extended frame WITHOUT
        communication (wrap-pad single-device axes). Used for the
        interior-source sweep that overlaps the halo gather."""
        for dim, ax in enumerate(self.axes):
            pad_cfg = [(0, 0)] * f.ndim
            pad_cfg[dim] = (self.hlo, self.hhi)
            if ax.p == 1:
                f = jnp.pad(f, pad_cfg, mode="wrap")
            else:
                f = jnp.pad(f, pad_cfg)
        return f

    def _strip_local(self, fx):
        """Extended accumulator -> core block (drop halos, no comms).
        Adjoint of ``_pad_local`` for accumulators that never wrote into
        decomposed-axis halos (interior sweeps); single-device axes fold
        their wrap halos."""
        for dim in (2, 1, 0):
            ax = self.axes[dim]
            if ax.p == 1:
                fx = self._reduce_axis(fx, dim, ax)
            else:
                sl = [slice(None)] * fx.ndim
                sl[dim] = slice(self.hlo, self.hlo + ax.Lp)
                fx = fx[tuple(sl)]
        return fx

    # -- source bucketing (host side) ------------------------------------
    def prepare_sources(self, src_pos, src_flux, dr=None, avg_dens=None):
        """Bucket sources by owning device and split interior/boundary.

        Interior sources are those whose (2R+1)^3 dependency cube lies
        entirely inside the owner's block along every decomposed axis —
        they are swept from local data, overlapping the halo exchange.

        Returns ``(pos_int, flux_int, pos_bnd, flux_bnd)`` with shapes
        (n_dev*nb, B, 3) / (n_dev*nb, B); the leading axis shard_maps
        over the mesh. Either pair is ``(None, None)`` when that class is
        empty on every device. Positions are BOX-START positions in the
        extended frame (for the largest-bucket halo these coincide with
        unpadded local cell coordinates; smaller adaptive buckets carry
        the constant shift hlo - c_k). All devices get the same batch
        count; padding sources have zero flux.

        With the adaptive engine each of the four slots is a per-bucket
        tuple (owner-local bucketing: the Stromgren policy assigns radii
        exactly as on one device, then each bucket is staged per owner
        in lockstep); ``dr`` and ``avg_dens`` feed the policy."""
        if self._adaptive:
            if dr is None or avg_dens is None:
                raise ValueError(
                    "adaptive engine under the domain mesh needs dr and "
                    "avg_dens (mean of the traced density grid) for the "
                    "Stromgren bucketing policy")
            buckets = self.engine.assign_buckets(
                np.asarray(src_flux), float(dr), float(avg_dens))
            pos = np.asarray(src_pos)
            flx = np.asarray(src_flux)
            slots = [[], [], [], []]
            n_dev = int(np.prod([a.p for a in self.axes]))
            for k, eng in enumerate(self.engine.engines):
                sel = np.nonzero(buckets == k)[0]
                if sel.size == 0:
                    # empty bucket: one zero-flux interior batch per
                    # device keeps the jitted step's pytree structure
                    # static when occupancy changes between timesteps
                    # (the same reason the source-parallel staging does,
                    # source_parallel._prepare_adaptive_sharded)
                    from ..ops.raytrace_cheb import PackedPositions
                    B = eng.batch_size
                    shift = self.hlo - eng.geom.c
                    p0 = jnp.full((n_dev, B, 3), shift, jnp.int32)
                    if eng.accumulate == "window":
                        p0 = PackedPositions(p0, span=0)
                    out = (p0, jnp.zeros((n_dev, B), eng.dtype),
                           None, None)
                else:
                    out = self._prepare_engine_sources(eng, pos[sel],
                                                       flx[sel])
                for s, o in zip(slots, out):
                    s.append(o)
            return tuple(
                None if all(e is None for e in s) else tuple(s)
                for s in slots)
        return self._prepare_engine_sources(self.engine, src_pos, src_flux)

    def _prepare_engine_sources(self, engine, src_pos, src_flux):
        """Stage one engine's sources per owning device (see
        ``prepare_sources``). ``engine`` may be a smaller adaptive
        bucket than the one that sized the halo; its box starts carry
        the constant shift ``hlo - c_k`` into the max-halo frame."""
        B = engine.batch_size
        g = engine.geom
        c_k = g.c
        hhi_k = g.Dc - 1 - c_k
        shift = self.hlo - c_k
        pos = np.asarray(src_pos, dtype=np.int64)
        flx = np.asarray(src_flux, dtype=np.float64)
        ai, aj, ak = self.axes
        oi = pos[:, 0] // ai.Lp
        oj = pos[:, 1] // aj.Lp
        ok = pos[:, 2] // ak.Lp
        owner = (oi * aj.p + oj) * ak.p + ok
        loc = pos.copy()
        loc[:, 0] -= oi * ai.Lp
        loc[:, 1] -= oj * aj.Lp
        loc[:, 2] -= ok * ak.Lp
        # interior test per decomposed axis: the box [l-c_k, l+hhi_k]
        # must stay within [0, L_valid) of the local block, i.e.
        # c_k <= l <= L_valid - 1 - hhi_k (L_valid < Lp on the last
        # shard)
        interior = np.ones(len(pos), dtype=bool)
        for dim, ax in enumerate(self.axes):
            if ax.p == 1:
                continue
            o = pos[:, dim] // ax.Lp
            l = loc[:, dim]
            L_valid = np.minimum(ax.Lp, self.N - o * ax.Lp)
            interior &= (l >= c_k) & (l <= L_valid - 1 - hhi_k)
        loc += shift

        n_dev = ai.p * aj.p * ak.p

        window = getattr(engine, "accumulate", None) == "window"

        def bucket_plain(sel_all):
            counts = np.bincount(owner[sel_all], minlength=n_dev)
            nb = max(1, -(-int(counts.max()) // B))
            out_pos = np.full((n_dev, nb * B, 3), shift, dtype=np.int32)
            out_flx = np.zeros((n_dev, nb * B), dtype=np.float64)
            for d in range(n_dev):
                sel = sel_all[owner[sel_all] == d]
                out_pos[d, :len(sel)] = loc[sel]
                out_flx[d, :len(sel)] = flx[sel]
            return (jnp.asarray(out_pos.reshape(n_dev * nb, B, 3)),
                    jnp.asarray(out_flx.reshape(n_dev * nb, B),
                                dtype=engine.dtype))

        def bucket(sel_mask):
            sel_all = np.nonzero(sel_mask)[0]
            if len(sel_all) == 0:
                return None, None
            if window:
                return bucket_window(sel_all)
            return bucket_plain(sel_all)

        def bucket_window(sel_all):
            """Window-accumulate engines: Morton-pack each device's
            owned sources into span-bounded batches (the engine's
            packing, in extended-local coordinates) and pad every
            device to the same batch count with zero-flux dummies, so
            each shard runs the one-RMW-per-batch path."""
            from ..ops.raytrace_cheb import PackedPositions
            # pack for the extended LOCAL frame (hlo + Lp + hhi per
            # axis); window_for_ext is the same function the trace
            # applies to that frame, so packing span and trace window
            # always agree (a mismatch would misplace boxes)
            ext_dims = tuple(self.hlo + ax.Lp + self.hhi
                             for ax in self.axes)
            W_eff = engine.window_for_ext(ext_dims)
            if W_eff is None:
                # the extended frame is too small for a productive
                # window — the trace will take the scan path, so skip
                # the span packing too
                return bucket_plain(sel_all)
            per_pos, per_flx = [], []
            for d in range(n_dev):
                sel = sel_all[owner[sel_all] == d]
                if len(sel) == 0:
                    per_pos.append(np.full((1, B, 3), shift, np.int32))
                    per_flx.append(np.zeros((1, B)))
                    continue
                pb, fb = engine._prepare_sources_packed(
                    loc[sel], flx[sel], W=W_eff, allow_fallback=False)
                per_pos.append(np.asarray(pb.pos))
                per_flx.append(np.asarray(fb, dtype=np.float64))
            nb = max(p.shape[0] for p in per_pos)
            # global fill guard: padded slots cost full sweeps (see
            # _prepare_sources_packed); sparse catalogs do better on
            # the plain scan-path batches
            if len(sel_all) < 0.5 * n_dev * nb * B:
                return bucket_plain(sel_all)
            for d in range(n_dev):
                pad = nb - per_pos[d].shape[0]
                if pad:
                    per_pos[d] = np.concatenate(
                        [per_pos[d],
                         np.repeat(per_pos[d][-1:], pad, axis=0)], axis=0)
                    per_flx[d] = np.concatenate(
                        [per_flx[d], np.zeros((pad, B))], axis=0)
            return (PackedPositions(jnp.asarray(
                        np.concatenate(per_pos, axis=0)),
                        span=W_eff - engine.geom.Dc),
                    jnp.asarray(np.concatenate(per_flx, axis=0),
                                dtype=engine.dtype))

        pos_i, flux_i = bucket(interior)
        pos_b, flux_b = bucket(~interior)
        return pos_i, flux_i, pos_b, flux_b

    def _bucket_views(self, tb, pos, flux):
        """Normalize a source slot to aligned (engine, tables, pos,
        flux) quadruples — per-bucket for the adaptive engine, a single
        entry otherwise."""
        if not self._adaptive:
            return [(self.engine, tb, pos, flux)]
        return [(eng, tbk, pk, fk)
                for eng, tbk, pk, fk
                in zip(self.engine.engines, tb, pos, flux)
                if pk is not None]

    # -- sharded trace ----------------------------------------------------
    def _trace_shard(self, tb, nd_loc, xh_loc, srcs, dr):
        """Raytrace the local block's owned sources.

        Interior sources sweep the un-exchanged local data; they carry no
        data dependency on the halo-gather collectives, so XLA overlaps
        the exchange with their compute. With the adaptive engine every
        bucket sweeps the SAME extended frame (one halo exchange sized
        for the largest bucket; smaller buckets' box starts carry the
        constant hlo - c_k shift applied by prepare_sources)."""
        pos_i, flux_i, pos_b, flux_b = srcs
        eng = self.engine
        nhi = nd_loc * (1.0 - xh_loc)
        do_heat = eng.do_heating

        def sweep_frame(frame, pos, flux):
            phi_e = heat_e = None
            for ek, tbk, pk, fk in self._bucket_views(tb, pos, flux):
                p, h = ek.trace_extended(tbk, frame, pk, fk, dr)
                phi_e = p if phi_e is None else phi_e + p
                if do_heat:
                    heat_e = h if heat_e is None else heat_e + h
            return phi_e, heat_e

        phi = heat = None
        if pos_i is not None:
            phi_ie, heat_ie = sweep_frame(self._pad_local(nhi),
                                          pos_i, flux_i)
            phi = self._strip_local(phi_ie)
            heat = self._strip_local(heat_ie) if heat_ie is not None \
                else None
        if pos_b is not None:
            phi_be, heat_be = sweep_frame(self.halo_gather(nhi),
                                          pos_b, flux_b)
            phi_b = self.halo_reduce(phi_be)
            phi = phi_b if phi is None else phi + phi_b
            if heat_be is not None:
                heat_b = self.halo_reduce(heat_be)
                heat = heat_b if heat is None else heat + heat_b
        if phi is None:
            phi = jnp.zeros(nhi.shape, dtype=eng.dtype)
            if do_heat:
                heat = jnp.zeros(nhi.shape, dtype=eng.dtype)
        return phi, heat

    def trace(self, ndens, xh_av, src_pos, src_flux, dr):
        """Domain-decomposed multi-device Gamma. ndens/xh: (N,N,N) host or
        replicated arrays; returns (N,N,N) Gamma."""
        eng = self.engine
        nd = jnp.asarray(np.asarray(ndens), eng.dtype).reshape((self.N,) * 3)
        xh = jnp.asarray(np.asarray(xh_av), eng.dtype).reshape((self.N,) * 3)
        avg_dens = float(jnp.mean(nd)) if self._adaptive else None
        nd = self.pad_global(nd, 1.0)
        xh = self.pad_global(xh, 0.5)
        srcs = self.prepare_sources(src_pos, src_flux, dr=float(dr),
                                    avg_dens=avg_dens)
        spec = self._spec(); sspec = self._src_spec()
        in_specs = [P(), spec, spec]
        args = [eng.tables, nd, xh]
        for s in srcs:
            if s is not None:
                in_specs.append(sspec)
                args.append(s)
        in_specs.append(P())
        args.append(jnp.asarray(dr, eng.dtype))
        n_src_args = len(args) - 4

        @partial(shard_map, mesh=self.mesh, in_specs=tuple(in_specs),
                 out_specs=spec, check_vma=False)
        def f(tb, nd_, xh_, *rest):
            sa = list(rest[:n_src_args])
            dr_ = rest[n_src_args]
            it = iter(sa)
            full = [next(it) if s is not None else None for s in srcs]
            phi, _ = self._trace_shard(tb, nd_, xh_, tuple(full), dr_)
            return phi

        phi = f(*args)
        return self.strip_global(phi)

    # -- full sharded evolve step ----------------------------------------
    def make_step(self, chem: ChemistryParams, srcs):
        """Jitted domain-decomposed (raytrace + chemistry) iteration.

        All fields stay sharded across iterations — nothing is ever
        replicated or gathered; scalars are the only psums. With a
        heating engine the step also returns the local heating rates
        (for the post-convergence thermal update). ``srcs`` is the tuple
        from ``prepare_sources`` (the step is specialized on which of
        the interior/boundary sets are present)."""
        eng = self.engine
        spec = self._spec()
        sspec = self._src_spec()
        heating = eng.do_heating
        names = self._axis_names
        have = [s is not None for s in srcs[0::2]]  # pos_int, pos_bnd

        src_specs = tuple(sspec for s in srcs if s is not None)

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(), spec, spec, spec, spec) + src_specs
                 + (P(), P()),
                 out_specs=((spec, spec, spec, spec, P(), P(), P(), P())
                            if heating else
                            (spec, spec, spec, P(), P(), P(), P())),
                 check_vma=False)
        def step(tb, ndens, temp, xh, xh_av, *rest):
            ns = len(src_specs)
            sa = list(rest[:ns])
            dt, dr = rest[ns], rest[ns + 1]
            it = iter(sa)
            full = []
            for k in range(2):
                if have[k]:
                    full += [next(it), next(it)]
                else:
                    full += [None, None]
            phi, heat = self._trace_shard(tb, ndens, xh_av, tuple(full), dr)
            sh = phi.shape
            mask = self._valid_mask()
            xi, xav, cf = global_pass(
                dt, ndens.reshape(-1), temp.reshape(-1), xh.reshape(-1),
                xh_av.reshape(-1), phi.reshape(-1), chem,
                mask=None if mask is None else mask.reshape(-1))
            xi3 = xi.reshape(sh)
            w = 1.0 if mask is None else mask.astype(xi.dtype).reshape(sh)
            s1 = lax.psum(jnp.sum(xi3 * w), names)
            s0 = lax.psum(jnp.sum((1.0 - xi3) * w), names)
            cf = lax.psum(cf, names)
            # absorbed-rate sum WITHOUT dr^3 (dr^3 ~ 1e62 overflows
            # f32; the volume factor is applied host-side in float64)
            ab = lax.psum(jnp.sum(phi * ndens * (1.0 - xh_av)), names)
            if heating:
                return (xi3, xav.reshape(sh), phi, heat, cf, s1, s0, ab)
            return (xi3, xav.reshape(sh), phi, cf, s1, s0, ab)

        jstep = jax.jit(step)

        def step_with_tables(ndens, temp, xh, xh_av, dt, dr):
            sargs = []
            for k in range(2):
                if have[k]:
                    sargs += [srcs[2 * k], srcs[2 * k + 1]]
            return jstep(eng.tables, ndens, temp, xh, xh_av,
                         *sargs, dt, dr)
        # introspection hooks (tests assert the compiled collective
        # traffic matches the O(surface * R) halo model)
        step_with_tables._jitted = jstep
        step_with_tables._tables = eng.tables
        step_with_tables._srcs = [s for s in srcs if s is not None]
        return step_with_tables

    # -- helium (three-species) sharded paths -----------------------------
    def _trace_shard_he(self, tb, heb, nd, xh, y1, y2, srcs, dr):
        """Three-species domain trace of the local block's owned sources
        (engine = ops.raytrace_he.HeRaytracer). Same interior-overlap
        structure as the hydrogen ``_trace_shard``; the halos of the
        three absorber fields ride one fused exchange each."""
        pos_i, flux_i, pos_b, flux_b = srcs
        eng = self.engine
        fields = eng.species_fields(nd, xh, y1, y2)
        n_out = 4 if eng.do_heating else 3
        outs = None
        if pos_i is not None:
            exts = tuple(self._pad_local(f) for f in fields)
            phis = eng.trace_extended(tb, heb, exts, pos_i, flux_i, dr)
            outs = [self._strip_local(p) for p in phis]
        if pos_b is not None:
            exts = tuple(self.halo_gather(f) for f in fields)
            phis = eng.trace_extended(tb, heb, exts, pos_b, flux_b, dr)
            red = [self.halo_reduce(p) for p in phis]
            outs = red if outs is None else [a + b
                                             for a, b in zip(outs, red)]
        if outs is None:
            outs = [jnp.zeros(nd.shape, dtype=eng.dtype)
                    for _ in range(n_out)]
        return tuple(outs)

    def make_step_he(self, phe, srcs):
        """Jitted domain-decomposed three-species iteration
        (raytrace_he + chemistry_he), mirror of ``make_step``.

        step(ndens, temp, xh0, xh_av, y1_0, y1_av, y2_0, y2_av, dt, dr)
        -> (xi, xav, y1i, y1a, y2i, y2a, gH, gHe1, gHe2[, heat],
            cf, s1, s0, absorbed)."""
        eng = self.engine
        spec = self._spec()
        sspec = self._src_spec()
        heating = eng.do_heating
        from ..ops.chemistry_he import secondary_enabled
        secondary = secondary_enabled(phe, heating)
        names = self._axis_names
        have = [s is not None for s in srcs[0::2]]
        src_specs = tuple(sspec for s in srcs if s is not None)
        from ..ops.chemistry_he import global_pass_he

        n_grid_out = 10 if heating else 9

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(), P()) + (spec,) * 8 + src_specs
                 + (P(), P()),
                 out_specs=(spec,) * n_grid_out + (P(),) * 4,
                 check_vma=False)
        def step(tb, heb, ndens, temp, xh0, xh_av, y1_0, y1_av,
                 y2_0, y2_av, *rest):
            ns = len(src_specs)
            sa = list(rest[:ns])
            dt, dr = rest[ns], rest[ns + 1]
            it = iter(sa)
            full = []
            for k in range(2):
                if have[k]:
                    full += [next(it), next(it)]
                else:
                    full += [None, None]
            g = self._trace_shard_he(tb, heb, ndens, xh_av, y1_av, y2_av,
                                     tuple(full), dr)
            sh = g[0].shape
            mask = self._valid_mask()
            r = lambda a: a.reshape(-1)
            (xi, xav, y1i, y1a, y2i, y2a, cf) = global_pass_he(
                dt, r(ndens), r(temp), r(xh0), r(xh_av),
                r(y1_0), r(y1_av), r(y2_0), r(y2_av),
                r(g[0]), r(g[1]), r(g[2]), phe,
                mask=None if mask is None else mask.reshape(-1),
                heat=r(g[3]) if secondary else None,
                recombination_photons=bool(
                    getattr(phe, "recombination_photons", False)))
            xi3 = xi.reshape(sh)
            w = 1.0 if mask is None else mask.astype(xi.dtype).reshape(sh)
            s1 = lax.psum(jnp.sum(xi3 * w), names)
            s0 = lax.psum(jnp.sum((1.0 - xi3) * w), names)
            cf = lax.psum(cf, names)
            abu = jnp.asarray(phe.abu_he, xi.dtype)
            nhe = abu * ndens
            ab = lax.psum(jnp.sum(
                g[0] * ndens * (1.0 - xh_av)
                + g[1] * nhe * (1.0 - y1_av - y2_av)
                + g[2] * nhe * y1_av), names)
            outs = (xi3, xav.reshape(sh), y1i.reshape(sh),
                    y1a.reshape(sh), y2i.reshape(sh), y2a.reshape(sh))
            outs = outs + tuple(g)
            return outs + (cf, s1, s0, ab)

        jstep = jax.jit(step)

        def step_with_tables(ndens, temp, xh0, xh_av, y1_0, y1_av,
                             y2_0, y2_av, dt, dr):
            sargs = []
            for k in range(2):
                if have[k]:
                    sargs += [srcs[2 * k], srcs[2 * k + 1]]
            return jstep(eng.eng.tables, eng.he_tables, ndens, temp, xh0,
                         xh_av, y1_0, y1_av, y2_0, y2_av, *sargs, dt, dr)
        return step_with_tables

    def make_thermal_step(self, thermal, zred=0.0, nsub=16):
        """Sharded post-convergence temperature update (shard-local,
        zero communication — see ops/thermal.py)."""
        from ..ops.thermal import update_temperature
        spec = self._spec()

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
                    max_iterations=100, thermal=None, zred=0.0,
                    loss_fraction=None):
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
    ndens_j = jnp.asarray(np.asarray(ndens), dtype).reshape(sh3)
    avg_dens = float(jnp.mean(ndens_j)) if decomp._adaptive else None
    temp_d = decomp.pad_global(
        jnp.asarray(np.asarray(temp), dtype).reshape(sh3), 1e4)
    ndens_d = decomp.pad_global(ndens_j, 1.0)
    xh_d = decomp.pad_global(
        jnp.asarray(np.asarray(xh), dtype).reshape(sh3), 0.5)
    srcs = decomp.prepare_sources(src_pos, src_flux, dr=float(dr),
                                  avg_dens=avg_dens)
    step = decomp.make_step(chem, srcs)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF

    heating = decomp.engine.do_heating
    if thermal is not None and not heating:
        raise ValueError("thermal evolution requires a heating engine")

    def _count_src(f):
        if f is None:
            return 0
        if isinstance(f, tuple):
            return sum(_count_src(e) for e in f)
        return int((np.asarray(f) > 0).sum())

    n_int = _count_src(srcs[1])
    printlog(f"Calling evolve3D over domain mesh "
             f"{decomp.pi}x{decomp.pj}x{decomp.pk} "
             f"(halo {decomp.hlo}/{decomp.hhi}, "
             f"{n_int}/{num_src} interior sources overlap the exchange)...",
             logfile, quiet)
    state = {"xh_av": xh_d, "xh_intermed": xh_d,
             "phi_ion": None, "phi_heat": None}

    def iteration(niter):
        t0 = time.time()
        out = step(ndens_d, temp_d, xh_d, state["xh_av"],
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
        absorbed_rate = float(absorbed) * float(dr) ** 3
        loss = (1.0 - absorbed_rate / emitted) if emitted > 0 else 0.0
        return IterationResult(int(conv_flag), float(sum_xh1),
                               float(sum_xh0), photon_loss=loss)

    run_convergence_loop(iteration, num_cells, num_src,
                         convergence_fraction, max_iterations,
                         logfile, quiet, loss_fraction=loss_fraction)

    def out3(arr):
        return np.asarray(decomp.strip_global(arr)).reshape(sh3)

    if thermal is not None:
        tstep = decomp.make_thermal_step(thermal, zred=float(zred))
        temp_new = tstep(jnp.asarray(dt, dtype), temp_d, ndens_d,
                         state["xh_av"], state["phi_heat"])
        return (out3(state["xh_intermed"]), out3(state["phi_ion"]),
                out3(temp_new))
    return out3(state["xh_intermed"]), out3(state["phi_ion"])


def evolve3D_he_domain(dt, dr, src_flux, src_pos,
                       decomp: DomainDecomposition, phe, temp, ndens,
                       xh, y1, y2, convergence_fraction=1e-4,
                       logfile=None, quiet=False, max_iterations=100,
                       thermal=None, zred=0.0, loss_fraction=None):
    """Domain-decomposed coupled H+He evolve loop (engine =
    ops.raytrace_he.HeRaytracer bound to the decomposition). Same
    convergence semantics as evolve.evolve3D_he; the three absorber
    fields are halo-exchanged per iteration and the coupled chemistry
    runs shard-local.

    Returns (xh, phi_HI, y1, y2, phi_HeI, phi_HeII[, temp_new])."""
    eng = decomp.engine
    N = decomp.N
    num_cells = N ** 3
    num_src = int(np.asarray(src_flux).shape[0])
    dtype = eng.dtype
    sh3 = (N, N, N)

    def pad3(a, fill):
        return decomp.pad_global(
            jnp.asarray(np.asarray(a), dtype).reshape(sh3), fill)

    temp_d = pad3(temp, 1e4)
    ndens_d = pad3(ndens, 1.0)
    xh_d = pad3(xh, 0.5)
    y1_d = pad3(y1, 0.1)
    y2_d = pad3(y2, 0.1)
    srcs = decomp.prepare_sources(src_pos, src_flux)
    step = decomp.make_step_he(phe, srcs)
    emitted = float(np.sum(np.asarray(src_flux, dtype=np.float64))) \
        * S_STAR_REF
    heating = eng.do_heating
    if thermal is not None and not heating:
        raise ValueError("thermal evolution requires HeRaytracer("
                         "do_heating=True)")
    from ..ops.chemistry_he import secondary_enabled
    secondary = secondary_enabled(phe, heating)

    printlog(f"Calling evolve3D_he over domain mesh "
             f"{decomp.pi}x{decomp.pj}x{decomp.pk} on {num_src:n} "
             f"source(s)...", logfile, quiet)
    state = {"xh_av": xh_d, "y1_av": y1_d, "y2_av": y2_d,
             "xh_int": xh_d, "y1_int": y1_d, "y2_int": y2_d, "g": None}

    def iteration(niter):
        t0 = time.time()
        out = step(ndens_d, temp_d, xh_d, state["xh_av"], y1_d,
                   state["y1_av"], y2_d, state["y2_av"],
                   jnp.asarray(dt, dtype), jnp.asarray(dr, dtype))
        ng = 10 if heating else 9
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

    def out3(arr):
        return np.asarray(decomp.strip_global(arr)).reshape(sh3)

    g = state["g"]
    out = (out3(state["xh_int"]), out3(g[0]), out3(state["y1_int"]),
           out3(state["y2_int"]), out3(g[1]), out3(g[2]))
    if thermal is not None:
        from ..ops.chemistry_he import thermal_heat_rate
        tstep = decomp.make_thermal_step(thermal, zred=float(zred))
        heat_rate = thermal_heat_rate(phe, g[3], state["xh_av"],
                                      secondary)
        temp_new = tstep(jnp.asarray(dt, dtype), temp_d, ndens_d,
                         state["xh_av"], heat_rate)
        out = out + (out3(temp_new),)
    return out
