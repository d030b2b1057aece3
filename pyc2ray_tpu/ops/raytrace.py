"""TPU-native octahedral short-characteristics raytracer.

This is the functional equivalent of the ASORA CUDA raytracer
(reference: src/asora/raytracing.cu:79-339, rates.cu:16-83) redesigned for
XLA/TPU semantics:

* Per source, cells are traversed in octahedral shells of constant L1
  distance q; a ``lax.fori_loop`` over shells replaces the CUDA
  ``__syncthreads`` barrier (raytracing.cu:334-336): each iteration is a
  dense vector op over all cells of a shell (gather 4 corner column
  densities, interpolate, extend). Shells are grouped into a few
  fixed-padded-size buckets so every loop has static shapes.

* Sources are batched along a leading axis (the analog of ASORA's
  one-block-per-source batching, raytracing.cu:105-131). Each source in
  the batch owns a private flat column-density buffer in the octahedral
  layout (the analog of the per-block N^3 slab, memory.cu:65). Rate
  accumulation across sources is a scatter-add after the whole octahedron
  is swept — no atomics exist or are needed under XLA.

* The photoionization-rate computation is *hoisted out of the sequential
  shell loop* into a single dense pass over the whole octahedron (the
  incoming column density is recovered from the outgoing buffer), so the
  sequential part does the minimum possible work. The reference computes
  rates inside the causality loop (raytracing.cu:320-328).

* An outer ``lax.scan`` accumulates the rate grid over source batches
  (the analog of the batch loop, raytracing.cu:126-143).

Everything runs under one ``jax.jit`` call per (mesh, batch, source-count)
signature; grids stay on device across convergence iterations, removing
the reference's per-iteration host<->device copies (evolve.py:193-201).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..constants import S_STAR_REF, TAU_PHOTO_LIMIT, MAX_COLDENSH
from .geometry import OctaGeometry, build_geometry, max_q_for

__all__ = ["RaytraceConfig", "Raytracer"]

FOURPI = 12.566370614359172463991853874177  # value used by raytracing.cu:12


class RaytraceConfig(NamedTuple):
    """Static raytracer configuration.

    Attributes
    ----------
    N : mesh size (N^3 periodic grid)
    R_max_LLS : maximum photon travel distance in cell units (type-3 LLS,
        c2ray_base.py:460-462); also sets the octahedron size.
    sig : HI photoionization cross section at the threshold (cm^2)
    batch_size : number of sources swept concurrently (ASORA's
        ``source_batch_size``)
    dtype : working dtype for grid fields (jnp.float64 or jnp.float32)
    grey_analytic : use the analytic grey-opacity rate expression instead
        of tables (reference GREY_NOTABLES compile flag, rates.cu:48-64)
    do_heating : also accumulate photo-heating rates
    """
    N: int
    R_max_LLS: float
    sig: float
    batch_size: int = 8
    dtype: object = jnp.float64
    grey_analytic: bool = False
    do_heating: bool = False




class FlatTables(NamedTuple):
    """Device-resident traversal tables for the flat engine, passed as an
    explicit jit argument (closure-captured arrays poison execution on the
    target TPU stack — see raytrace_box.BoxTables)."""
    offsets: object
    nbr: object
    sw: object
    path: object
    diag: object
    dist2: object
    shell_start: object
    shell_size: object
    valid: object
    photo_thin: object
    photo_thick: object
    heat_thin: object
    heat_thick: object

class Raytracer:
    """Batched multi-source raytracer over a periodic N^3 grid.

    Usage::

        rt = Raytracer(config, photo_thin, photo_thick, minlogtau, dlogtau)
        phi_ion = rt.trace(ndens, xh_av, src_pos, src_flux, dr)

    ``src_pos`` is (NumSrc, 3) 0-indexed; ``src_flux`` is the source rate
    normalized by S_star = 1e48 photons/s (reference convention).
    """

    def __init__(self, config: RaytraceConfig,
                 photo_thin_table=None, photo_thick_table=None,
                 minlogtau=None, dlogtau=None,
                 heat_thin_table=None, heat_thick_table=None):
        self.config = config
        dt = config.dtype
        self.geom_np: OctaGeometry = build_geometry(
            config.N, max_q_for(config.R_max_LLS, config.N))
        g = self.geom_np

        C = g.num_cells
        Cp = g.offsets.shape[1]
        zeros_t = jnp.zeros(1, dtype=dt)
        self._tb_kw = dict(
            offsets=jnp.asarray(g.offsets),
            nbr=jnp.asarray(g.nbr),
            sw=jnp.asarray(g.sw, dtype=dt),
            path=jnp.asarray(g.path, dtype=dt),
            diag=jnp.asarray(g.diag, dtype=dt),
            dist2=jnp.asarray(g.dist2, dtype=dt),
            shell_start=jnp.asarray(g.shell_start),
            shell_size=jnp.asarray(g.shell_size),
            valid=jnp.arange(Cp, dtype=jnp.int32) < C,
            photo_thin=zeros_t, photo_thick=zeros_t,
            heat_thin=zeros_t, heat_thick=zeros_t)

        # Tables are stored normalized by S_star so they are O(1) and fit
        # float32; the S_star factor is restored in the volume prefactor
        # (see _rates). The reference stores raw ~1e48-scale values
        # (blackbody.py:71-85), which only works in float64.
        if not config.grey_analytic:
            assert photo_thin_table is not None and photo_thick_table is not None
            self._tb_kw["photo_thin"] = jnp.asarray(
                np.asarray(photo_thin_table) / S_STAR_REF, dtype=dt)
            self._tb_kw["photo_thick"] = jnp.asarray(
                np.asarray(photo_thick_table) / S_STAR_REF, dtype=dt)
            self.num_tau = photo_thin_table.shape[0] - 1
            self.minlogtau = float(minlogtau)
            self.dlogtau = float(dlogtau)
        if config.do_heating:
            self._tb_kw["heat_thin"] = jnp.asarray(
                np.asarray(heat_thin_table) / S_STAR_REF, dtype=dt)
            self._tb_kw["heat_thick"] = jnp.asarray(
                np.asarray(heat_thick_table) / S_STAR_REF, dtype=dt)
        self.tables = FlatTables(**self._tb_kw)

        self._trace_jit = jax.jit(self._trace_impl)
        self._sweep_jit = jax.jit(self._sweep)

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------
    def _lin_idx(self, tb, src_pos):
        """Flat C-order grid indices of the octahedron cells of each source.

        src_pos: (B, 3) int32, 0-indexed. Applies the periodic wrap
        (raytracing.cu:269-272); offsets are pre-clipped to one periodic
        image (raytracing.cu:241).
        """
        N = self.config.N
        p = src_pos[:, :, None] + tb.offsets[None, :, :]   # (B, 3, Cp)
        p = jnp.where(p < 0, p + N, p)
        p = jnp.where(p >= N, p - N, p)
        return (p[:, 0] * N + p[:, 1]) * N + p[:, 2]          # (B, Cp)

    def _sweep(self, tb, nhi_octa, dr):
        """Causal shell sweep: outgoing HI column density per cell.

        nhi_octa: (B, Cp) neutral hydrogen density in octahedral layout.
        Returns cdo (B, Cp): coldensh_out (raytracing.cu:310-312).
        """
        cfg = self.config
        dt = cfg.dtype
        sig = jnp.asarray(cfg.sig, dt)
        B = nhi_octa.shape[0]
        cdo = jnp.zeros(nhi_octa.shape, dtype=dt)
        # source cell: coldensh_in = 0, path = dr/2 (raytracing.cu:285-294)
        cdo = cdo.at[:, 0].set(nhi_octa[:, 0] * (0.5 * dr))

        def make_body(S):
            def body(q, cdo):
                off = tb.shell_start[q]
                z = jnp.zeros((), dtype=off.dtype)
                nbr = lax.dynamic_slice(tb.nbr, (z, off), (4, S))
                sw = lax.dynamic_slice(tb.sw, (z, off), (4, S))
                dg = lax.dynamic_slice(tb.diag, (off,), (S,))
                pth = lax.dynamic_slice(tb.path, (off,), (S,))
                nhi = lax.dynamic_slice(nhi_octa, (z, off), (B, S))
                # gather the 4 corner column densities (cinterp_gpu reads,
                # raytracing.cu:416-419)
                c = cdo[:, nbr]                                 # (B, 4, S)
                w = sw[None] / jnp.maximum(jnp.asarray(0.6, dt), c * sig)
                cdin = dg * (c * w).sum(axis=1) / w.sum(axis=1)
                cdout = cdin + nhi * (pth * dr)
                lane = lax.broadcasted_iota(jnp.int32, (1, S), 1) < tb.shell_size[q]
                cur = lax.dynamic_slice(cdo, (z, off), (B, S))
                return lax.dynamic_update_slice(
                    cdo, jnp.where(lane, cdout, cur), (z, off))
            return body

        for (q_lo, q_hi, S) in self.geom_np.buckets:
            cdo = lax.fori_loop(q_lo, q_hi, make_body(S), cdo)
        return cdo

    def _lookup(self, table, tau):
        """Log-linear table interpolation (rates.cu:70-83)."""
        dt = self.config.dtype
        logtau = jnp.log10(jnp.maximum(jnp.asarray(1.0e-20, dt), tau))
        real_i = jnp.clip(1.0 + (logtau - self.minlogtau) / self.dlogtau,
                          0.0, float(self.num_tau))
        i0 = real_i.astype(jnp.int32)
        resid = real_i - i0.astype(dt)
        i1 = jnp.minimum(self.num_tau, i0 + 1)
        t0 = table[i0]
        t1 = table[i1]
        return t0 + resid * (t1 - t0)

    def _rates(self, tb, cdo, nhi_octa, flux, dr):
        """Dense photoionization(+heating)-rate pass over the octahedron.

        Implements photoion_rates / photoion_rates_test
        (src/c2ray/photorates.f90:13-149) vectorized over (B, Cp).
        Returns phi (B, Cp) [and heat (B, Cp)] already divided by nHI
        (photon-conserving prescription, raytracing.f90:531).
        """
        cfg = self.config
        dt = cfg.dtype
        sig = jnp.asarray(cfg.sig, dt)
        is_src = (jnp.arange(cdo.shape[1]) == 0)[None, :]

        dcol = nhi_octa * (tb.path * dr)       # exact nHI * path
        cdin = cdo - dcol
        tau_in = cdin * sig
        tau_out = cdo * sig
        dtau = dcol * sig

        # Volume prefactor S_star / vol_ph (raytracing.cu:290-307). dr^3 in
        # cgs (~1e62) overflows float32, so the S_star/dr^3 part is formed
        # in log space; the remaining geometric factor is O(1)..O(1e6).
        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        geom = jnp.where(is_src, 1.0,
                         1.0 / (tb.dist2 * tb.path * FOURPI))
        prefact = flux[:, None] * s_over_dr3 * geom
        thick_cell = dtau > TAU_PHOTO_LIMIT

        if cfg.grey_analytic:
            ein = jnp.exp(-tau_in)
            phi_thick = prefact * (ein - jnp.exp(-tau_out))
            phi_thin = prefact * dtau * ein
            phi_cell = jnp.where(thick_cell, phi_thick, phi_thin)
            heat_cell = None
        else:
            thick_in = self._lookup(tb.photo_thick, tau_in)
            thick_out = self._lookup(tb.photo_thick, tau_out)
            thin_in = self._lookup(tb.photo_thin, tau_in)
            phi_cell = jnp.where(thick_cell,
                                 prefact * (thick_in - thick_out),
                                 prefact * dtau * thin_in)
            heat_cell = None
            if cfg.do_heating:
                h_thick_in = self._lookup(tb.heat_thick, tau_in)
                h_thick_out = self._lookup(tb.heat_thick, tau_out)
                h_thin_in = self._lookup(tb.heat_thin, tau_in)
                heat_cell = jnp.where(thick_cell,
                                      prefact * (h_thick_in - h_thick_out),
                                      prefact * dtau * h_thin_in)

        # LLS / max-column-density cutoffs (raytracing.cu:315)
        R2 = jnp.asarray(cfg.R_max_LLS, dt) ** 2
        mask = ((cdin <= MAX_COLDENSH) & (tb.dist2 <= R2)
                & tb.valid[None, :])
        phi = jnp.where(mask, phi_cell / nhi_octa, 0.0)
        if heat_cell is not None:
            heat = jnp.where(mask, heat_cell / nhi_octa, 0.0)
            return phi, heat
        return phi, None

    # ------------------------------------------------------------------
    # full trace
    # ------------------------------------------------------------------
    def _trace_impl(self, tb, ndens_flat, xh_flat, src_pos_b, src_flux_b, dr):
        """Scan over source batches, accumulating the rate grid(s).

        src_pos_b: (nb, B, 3) int32; src_flux_b: (nb, B).
        """
        cfg = self.config
        nhi_flat = ndens_flat * (1.0 - xh_flat)

        def step(carry, xs):
            pos, flux = xs
            lin = self._lin_idx(tb, pos)                      # (B, Cp)
            nhi_octa = nhi_flat[lin]
            cdo = self._sweep(tb, nhi_octa, dr)
            phi, heat = self._rates(tb, cdo, nhi_octa, flux, dr)
            phi_grid, heat_grid = carry
            phi_grid = phi_grid.at[lin.ravel()].add(
                phi.ravel(), mode="promise_in_bounds")
            if heat is not None:
                heat_grid = heat_grid.at[lin.ravel()].add(
                    heat.ravel(), mode="promise_in_bounds")
            return (phi_grid, heat_grid), None

        zero = jnp.zeros_like(ndens_flat)
        (phi_grid, heat_grid), _ = lax.scan(
            step, (zero, zero), (src_pos_b, src_flux_b))
        return phi_grid, heat_grid


    # -- uniform engine API --------------------------------------------
    def trace_batches(self, nd, xh, pos_b, flux_b, dr):
        """Device-level batched trace on prepared sources; flat-grid IO."""
        phi, heat = self._trace_jit(self.tables, nd.reshape(-1),
                                    xh.reshape(-1), pos_b, flux_b, dr)
        return phi, heat

    def shard_trace(self, tb, nd_flat, xh_flat, pos_b, flux_b, dr):
        """Per-shard trace body for shard_map (tables passed explicitly).
        Returns (phi, heat); heat is None unless do_heating."""
        phi, heat = self._trace_impl(tb, nd_flat, xh_flat, pos_b, flux_b,
                                     dr)
        return phi, (heat if self.config.do_heating else None)

    def prepare_sources(self, src_pos, src_flux):
        """Pad and reshape sources to (nb, B, ...) batches.

        src_pos: (NumSrc, 3) int32 0-indexed; src_flux: (NumSrc,).
        Padding sources have zero flux and therefore contribute nothing.
        """
        B = self.config.batch_size
        ns = src_flux.shape[0]
        nb = -(-ns // B)
        pos = np.zeros((nb * B, 3), dtype=np.int32)
        flx = np.zeros((nb * B,), dtype=np.float64)
        pos[:ns] = np.asarray(src_pos, dtype=np.int32)
        flx[:ns] = np.asarray(src_flux, dtype=np.float64)
        return (jnp.asarray(pos.reshape(nb, B, 3)),
                jnp.asarray(flx.reshape(nb, B), dtype=self.config.dtype))

    def trace(self, ndens, xh_av, src_pos, src_flux, dr):
        """Compute the photoionization-rate grid for all sources.

        Parameters
        ----------
        ndens, xh_av : (N,N,N) or flat (N^3,) arrays
        src_pos : (NumSrc, 3) int array of 0-indexed grid positions
        src_flux : (NumSrc,) normalized source strengths (units of S_star)
        dr : cell size in cm

        Returns
        -------
        phi_ion : (N,N,N) photoionization rates [1/s]
        (and phi_heat if do_heating)
        """
        cfg = self.config
        shape3 = (cfg.N,) * 3
        nd = jnp.asarray(ndens, dtype=cfg.dtype).reshape(-1)
        xh = jnp.asarray(xh_av, dtype=cfg.dtype).reshape(-1)
        pos_b, flux_b = self.prepare_sources(src_pos, src_flux)
        phi, heat = self._trace_jit(self.tables, nd, xh, pos_b, flux_b,
                                    jnp.asarray(dr, cfg.dtype))
        if cfg.do_heating:
            return phi.reshape(shape3), heat.reshape(shape3)
        return phi.reshape(shape3)

    # -- debug / test helpers ------------------------------------------
    def sweep_coldens(self, ndens, xh_av, src_pos_single, dr):
        """Outgoing column density grid for a single source (testing)."""
        cfg = self.config
        nd = jnp.asarray(ndens, dtype=cfg.dtype).reshape(-1)
        xh = jnp.asarray(xh_av, dtype=cfg.dtype).reshape(-1)
        pos = jnp.asarray(np.asarray(src_pos_single, dtype=np.int32)[None, :])
        lin = jax.jit(self._lin_idx)(self.tables, pos)
        nhi = (nd * (1.0 - xh))[lin]
        cdo = self._sweep_jit(self.tables, nhi, jnp.asarray(dr, cfg.dtype))
        out = jnp.zeros(cfg.N ** 3, dtype=cfg.dtype)
        C = self.geom_np.num_cells
        out = out.at[lin[0, :C]].set(cdo[0, :C])
        return np.asarray(out).reshape((cfg.N,) * 3)
