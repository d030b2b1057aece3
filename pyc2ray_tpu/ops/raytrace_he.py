"""Multi-species (HI / HeI / HeII) raytracer — the helium extension.

Helium RT is declared TODO in the reference (README.md:81-87). Design:
the Chebyshev-face sweep is species-agnostic — a column-density sweep of
ANY absorber field with its own threshold cross section entering the
short-characteristics interpolation weights (1/max(0.6, cd*sigma),
raytracing.f90:807-813). So the He engine runs THREE sweeps per batch
(one per species, reusing the whole single-species machinery including
the Pallas kernel, each compiled with its sigma_th), and couples the
species only in the RATE pass, where the composite optical depth per
spectral bin e is

    tau_e = sum_s N_s sigma_s(nu_e)

and the photons absorbed in a cell are shared between species by
opacity fraction dtau_s/dtau — photon-conserving by construction
(summed over species, the absorbed rate equals the reference's
single-species form with the composite tau).

Cost: ~3x the sweeps + a 3-band bin sum (radiation/helium.py) vs the
hydrogen-only engine.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..constants import S_STAR_REF, MAX_COLDENSH
from ..radiation.helium import HeSpectralBins
from .raytrace_cheb import ChebRaytracer, PackedPositions

__all__ = ["HeRaytracer", "HeBinTables"]

FOURPI = 12.566370614359172463991853874177


class HeBinTables(NamedTuple):
    s: object          # (3, E)
    w: object          # (E,)
    w_heat: object     # (3, E)
    sigma_th: object   # (3,)


class HeRaytracer:
    """Batched multi-source, three-species raytracer.

    trace(nd, xh, y1, y2, pos, flux, dr) -> (G_HI, G_HeI, G_HeII),
    each (N,N,N) per-atom photoionization rates."""

    def __init__(self, N, R_max_LLS, bins: HeSpectralBins, abu_he,
                 batch_size=8, dtype=jnp.float32, use_pallas=False,
                 do_heating=False, accumulate="auto", window_size=None):
        from ..radiation.spectral_bins import SpectralBins
        self.abu_he = float(abu_he)
        self.do_heating = bool(do_heating)
        self.bins = bins
        st = bins.sigma_th
        # the host engine supplies geometry, sweeps, box machinery and
        # the window-accumulate staging (its own H-only bins/rates are
        # never used here)
        placeholder = SpectralBins(s=np.ones(1), w_photo=np.ones(1),
                                   w_heat=np.zeros(1), num_bins=1)
        self.eng = ChebRaytracer(N, R_max_LLS, st[0], placeholder,
                                 batch_size=batch_size, dtype=dtype,
                                 use_pallas=use_pallas,
                                 accumulate=accumulate,
                                 window_size=window_size)
        self.N = self.eng.N
        self.batch_size = self.eng.batch_size
        # catalog-adaptive (B, W) tuner: the three-species engine does
        # ~3x the H engine's per-source work (3 sweeps + 3 accumulate
        # channels + 3-species rates), so scale the per-source term of
        # the host engine's v5e cost model accordingly — with the H
        # constant the tuner over-raises B for He catalogs
        self.eng._WCOST_SRC = 3.0 * type(self.eng)._WCOST_SRC
        self.dtype = dtype
        # staging delegation: the parallel paths (prepare_sources_sharded,
        # DomainDecomposition.prepare_sources) drive the window packing
        # through these
        self.accumulate = self.eng.accumulate
        self.window_for_ext = self.eng.window_for_ext
        self._prepare_sources_packed = self.eng._prepare_sources_packed
        self.sigma_th = tuple(float(v) for v in st)
        self.he_tables = HeBinTables(
            s=jnp.asarray(bins.s, dtype),
            w=jnp.asarray(bins.w_photo, dtype),
            w_heat=jnp.asarray(bins.w_heat, dtype),
            sigma_th=jnp.asarray(st, dtype))
        self._trace_jit = jax.jit(self._trace_impl)

    def prepare_sources(self, src_pos, src_flux):
        return self.eng.prepare_sources(src_pos, src_flux)

    # ------------------------------------------------------------------
    def _rates_he(self, tb, heb, cds, nboxes, flux, dr):
        """Multi-species rate pass over the central rates SUBBOX.

        cds / nboxes: tuples of 3 arrays (B, Dc, Dc, Dc); returns
        (B, Ds, Ds, Ds) channels to accumulate at box position + rb0
        (same subbox contract as ChebRaytracer._rates — the pass is
        exp-compute-bound x 3 species, so shrinking the domain wins)."""
        eng = self.eng
        g = eng.geom
        dt = self.dtype
        b0, b1, Ds = eng._rb0, eng._rb1, eng.Ds
        sub = (slice(None),) + (slice(b0, b1),) * 3
        cds = [c[sub] for c in cds]
        nboxes = [n[sub] for n in nboxes]
        path3 = tb.rt_sub[0]
        geominv = tb.rt_sub[1]
        path = path3[None] * dr

        dcol = [nboxes[s] * path for s in range(3)]
        cdin = [cds[s] - dcol[s] for s in range(3)]

        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        prefact = flux[:, None, None, None] * s_over_dr3 * geominv[None]

        tiny = jnp.asarray(1e-30 if dt == jnp.float32 else 1e-280, dt)
        # Tensor form over bins (the unrolled 96-bin x 3-species python
        # loop compiled for ~8 minutes and ran far off the roofline):
        # per-cell composite tau becomes one (cells,3)x(3,E) matmul, the
        # transcendental core one big (cells,E) elementwise block, and
        # the per-species opacity-share reduction one (cells,E)x(E,)
        # matvec per output channel — MXU work plus a single fused VPU
        # pass instead of E unrolled read-modify-write chains.
        se_mat = heb.s * heb.sigma_th[:, None]          # (3, E)
        A = jnp.stack([c.reshape(-1) for c in cdin], 1)   # (n, 3)
        Dm = jnp.stack([d.reshape(-1) for d in dcol], 1)  # (n, 3)
        hp = lax.Precision.HIGHEST
        tau_in = jnp.einsum("ns,se->ne", A, se_mat, precision=hp)
        dtau_e = jnp.einsum("ns,se->ne", Dm, se_mat, precision=hp)
        core = jnp.exp(-tau_in) * (-jnp.expm1(-dtau_e))
        inv = core / jnp.maximum(dtau_e, tiny)            # (n, E)
        # acc_s = D_s * sum_e inv_e * w_e * se[s,e]
        wv = jnp.einsum("ne,se->ns", inv, heb.w[None] * se_mat,
                        precision=hp)                     # (n, 3)
        sh4 = cds[0].shape
        acc = [(Dm[:, s] * wv[:, s]).reshape(sh4) for s in range(3)]
        acc_heat = None
        if self.do_heating:
            wh = jnp.einsum("ne,se->ns", inv, heb.w_heat * se_mat,
                            precision=hp)
            acc_heat = jnp.sum(Dm * wh, axis=1).reshape(sh4)

        mask = ((tb.rt_sub[2] > 0.5)[None]
                & (cdin[0] <= jnp.asarray(MAX_COLDENSH, dt)))
        out = []
        for s in range(3):
            gam = prefact * acc[s] / jnp.maximum(nboxes[s], tiny)
            out.append(jnp.where(mask & (nboxes[s] > 0), gam, 0.0))
        if self.do_heating:
            # per-HI-atom equivalent of the TOTAL (all-species) volumetric
            # heating, so ops/thermal.update_temperature (which multiplies
            # by n_HI) recovers sum_s Gamma_heat_s * n_s exactly
            heat = prefact * acc_heat / jnp.maximum(nboxes[0], tiny)
            out.append(jnp.where(mask & (nboxes[0] > 0), heat, 0.0))
        return out

    # ------------------------------------------------------------------
    def species_fields(self, nd3, xh3, y13, y23):
        """Absorber number densities (n_HI, n_HeI, n_HeII) from the
        hydrogen density and the ionized fractions."""
        abu = jnp.asarray(self.abu_he, self.dtype)
        return (nd3 * (1.0 - xh3),                    # HI
                abu * nd3 * (1.0 - y13 - y23),        # HeI
                abu * nd3 * y13)                      # HeII

    @property
    def geom(self):
        return self.eng.geom

    def trace_extended(self, tb, heb, field_exts, pos_b, flux_b, dr):
        """Core batched three-species sweep over EXTENDED absorber fields
        (tuple of 3; same extended-frame contract as
        ChebRaytracer.trace_extended — wrap padding on one device, halo
        exchange under domain decomposition). Returns a tuple of
        extended accumulators (G_HI, G_HeI, G_HeII[, heat])."""
        eng = self.eng
        g = eng.geom
        pads = list(field_exts)
        n_out = 4 if self.do_heating else 3
        phi0 = [jnp.zeros(pads[0].shape, self.dtype) for _ in range(n_out)]
        packed = isinstance(pos_b, PackedPositions)
        if packed:
            pos_b = pos_b.pos
        W = eng.window_for_ext(pads[0].shape) if packed else None
        use_window = W is not None

        def batch_step(b, phis):
            z32 = jnp.zeros((), jnp.int32)
            pos = lax.dynamic_slice(pos_b, (b.astype(jnp.int32), z32, z32),
                                    (1,) + pos_b.shape[1:])[0]
            flux = lax.dynamic_slice(flux_b, (b.astype(jnp.int32), z32),
                                     (1,) + flux_b.shape[1:])[0]
            if use_window:
                hi = jnp.asarray([s - W for s in pads[0].shape], jnp.int32)
                origin = jnp.clip(jnp.min(pos, axis=0), 0, hi)
                off = pos - origin[None]
                oh = eng._axis_onehots(off, W)
                o3 = (origin[0], origin[1], origin[2])
                boxes = [eng._extract_from_window(
                    lax.dynamic_slice(p, o3, (W,) * 3), oh) for p in pads]
            else:
                boxes = [eng._extract_boxes(p, pos) for p in pads]
            sweep = eng._sweep_pallas if eng.use_pallas else eng._sweep
            cds = [sweep(tb, boxes[s], dr, sig=self.sigma_th[s])
                   for s in range(3)]
            gam = self._rates_he(tb, heb, cds, boxes, flux, dr)
            D = gam[0].shape[-1]
            shift = eng._rb0 if D == eng.Ds else 0

            if use_window:
                oh_p = oh if (D == g.Dc and shift == 0) else \
                    eng._axis_onehots(off + shift, W, D)

                def wacc(pad, box):
                    win = eng._place_boxes(box, oh_p)
                    cur = lax.dynamic_slice(pad, o3, (W,) * 3)
                    return lax.dynamic_update_slice(pad, cur + win, o3)

                return tuple(wacc(phis[s], gam[s])
                             for s in range(len(phis)))

            def accum(pad, boxes_v):
                def one(i, p_acc):
                    i32 = i.astype(jnp.int32)
                    pv = lax.dynamic_slice(pos, (i32, z32), (1, 3))[0]
                    box = lax.dynamic_slice(
                        boxes_v, (i32, z32, z32, z32),
                        (1,) + boxes_v.shape[1:])[0]
                    p0 = (pv[0] + shift, pv[1] + shift, pv[2] + shift)
                    cur = lax.dynamic_slice(p_acc, p0, (D,) * 3)
                    return lax.dynamic_update_slice(p_acc, cur + box, p0)
                return lax.fori_loop(0, pos.shape[0], one, pad)

            return tuple(accum(phis[s], gam[s]) for s in range(len(phis)))

        return lax.fori_loop(0, pos_b.shape[0], batch_step, tuple(phi0))

    def _trace_impl(self, tb, heb, nd3, xh3, y13, y23, pos_b, flux_b, dr):
        eng = self.eng
        g = eng.geom
        padL, padR = g.c, g.Dc - 1 - g.c
        fields = self.species_fields(nd3, xh3, y13, y23)
        pads = tuple(jnp.pad(f, ((padL, padR),) * 3, mode="wrap")
                     for f in fields)
        phis = self.trace_extended(tb, heb, pads, pos_b, flux_b, dr)
        return tuple(eng._fold_padding(p) for p in phis)

    # -- uniform engine API ----------------------------------------------
    def trace_batches(self, nd3, xh3, y13, y23, pos_b, flux_b, dr):
        """Device-level batched trace on prepared sources.

        Returns (Gamma_HI, Gamma_HeI, Gamma_HeII[, heat]) as (N,N,N)
        device arrays (heat only with do_heating: the per-HI-atom
        equivalent of the total three-species photoheating)."""
        return self._trace_jit(self.eng.tables, self.he_tables,
                               nd3, xh3, y13, y23, pos_b, flux_b, dr)

    def trace(self, ndens, xh, y1, y2, src_pos, src_flux, dr):
        """Public API: per-atom (Gamma_HI, Gamma_HeI, Gamma_HeII[, heat])."""
        sh = (self.N,) * 3
        dt = self.dtype
        args = [jnp.asarray(np.asarray(a), dt).reshape(sh)
                for a in (ndens, xh, y1, y2)]
        pos_b, flux_b = self.prepare_sources(src_pos, src_flux)
        return self._trace_jit(self.eng.tables, self.he_tables, *args,
                               pos_b, flux_b, jnp.asarray(dr, dt))
