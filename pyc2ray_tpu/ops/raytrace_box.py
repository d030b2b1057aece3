"""Gather-free "box" raytracing engine (TPU fast path).

Same physics as ops/raytrace.py (the ASORA-equivalent octahedral
short-characteristics sweep), reformulated so that every step uses only
TPU-friendly primitives — no arbitrary-index gathers or scatters:

1. the neutral-density grid is wrap-padded once per call and per-source
   boxes are cut with ``lax.dynamic_slice`` (periodicity handled by the
   pad);
2. the box is "sheared" into a stack of per-shell 2D sheets with one
   ``take_along_axis`` along z (a structured, vectorizable gather);
3. the causal shell sweep is a ``fori_loop`` whose body is dense 2D
   arithmetic: corner fetches are static +-1 shifts of the previous three
   sheets (see sheet_geometry.py), interpolation weights are precomputed
   host-side tables shared by the top/bottom sheets;
4. photoionization (and heating) rates are computed in one dense pass
   with the spectral-bin exponential-sum representation
   (radiation/spectral_bins.py) — cancellation-free, no table lookups;
5. the rate sheets are un-sheared back to the box with a second
   ``take_along_axis`` and accumulated into a wrap-padded rate grid with
   read-modify-write ``dynamic_update_slice``; the pad is folded back
   once per call.

The engine is exact for grey opacity (the single-bin sum reduces to the
reference's analytic expressions, rates.cu:48-64) and accurate to the
bin-quadrature error (~1e-6 for 64 bins) for black-body tables.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..constants import S_STAR_REF, MAX_COLDENSH
from ..radiation.spectral_bins import SpectralBins
from .geometry import max_q_for
from .sheet_geometry import SheetGeometry, build_sheet_geometry

__all__ = ["BoxRaytracer", "grey_bins"]

FOURPI = 12.566370614359172463991853874177


def grey_bins(dtype=np.float64):
    """Single-bin spectrum: exactly the reference grey test case
    (photoion_rates_test, photorates.f90:13-57)."""
    return SpectralBins(s=np.array([1.0]), w_photo=np.array([1.0]),
                        w_heat=np.array([0.0]), num_bins=1)




class BoxTables(NamedTuple):
    """Device-resident traversal/spectral tables.

    Passed as an explicit jit argument: on this TPU stack, arrays captured
    by closure (compiled as constants) push every op in the program onto a
    degraded execution path (measured ~1000x slower), so ALL device data
    must flow through the function signature."""
    sw: object
    path: object
    diag: object
    dist2: object
    in_z: object
    in_y: object
    valid: object
    rate_valid: object
    zidx: object
    qidx: object
    unshear_valid: object
    k_nonneg: object
    bins_s: object
    bins_w: object
    bins_wh: object

class BoxRaytracer:
    """Batched multi-source raytracer, box/sheet formulation.

    Parameters
    ----------
    N : mesh size
    R_max_LLS : photon horizon in cell units (sets the octahedron size)
    sig : HI cross section at threshold (cm^2)
    bins : SpectralBins (use grey_bins() for the grey test case)
    batch_size : sources swept concurrently
    dtype : jnp.float32 (TPU fast path) or jnp.float64
    do_heating : accumulate heating rates too
    """

    def __init__(self, N, R_max_LLS, sig, bins: SpectralBins,
                 batch_size=8, dtype=jnp.float32, do_heating=False):
        self.N = int(N)
        self.R_max_LLS = float(R_max_LLS)
        self.sig = float(sig)
        self.batch_size = int(batch_size)
        self.dtype = dtype
        self.do_heating = bool(do_heating)
        self.geom: SheetGeometry = build_sheet_geometry(
            self.N, max_q_for(R_max_LLS, N))
        g = self.geom
        dt = dtype
        self.num_bins = bins.num_bins
        self.tables = BoxTables(
            sw=jnp.asarray(g.sw, dt),
            path=jnp.asarray(g.path, dt),
            diag=jnp.asarray(g.diag, dt),
            dist2=jnp.asarray(g.dist2, dt),
            in_z=jnp.asarray(g.in_z),
            in_y=jnp.asarray(g.in_y),
            valid=jnp.asarray(np.stack([g.valid_top, g.valid_bot])),
            rate_valid=jnp.asarray(np.stack([g.rate_top, g.rate_bot])),
            zidx=jnp.asarray(g.zidx),
            qidx=jnp.asarray(g.qidx),
            unshear_valid=jnp.asarray(g.unshear_valid),
            k_nonneg=jnp.asarray(g.k_nonneg),
            bins_s=jnp.asarray(bins.s, dt),
            bins_w=jnp.asarray(bins.w_photo, dt),
            bins_wh=jnp.asarray(bins.w_heat, dt))

        self._trace_jit = jax.jit(self._trace_impl)
        # config shim so evolve3D and the models treat engines uniformly
        from .raytrace import RaytraceConfig
        self.config = RaytraceConfig(
            N=self.N, R_max_LLS=self.R_max_LLS, sig=self.sig,
            batch_size=self.batch_size, dtype=dtype,
            grey_analytic=(bins.num_bins == 1), do_heating=do_heating)

    # -- uniform engine API --------------------------------------------
    def trace_batches(self, nd, xh, pos_b, flux_b, dr):
        """Device-level batched trace on prepared sources; flat-grid IO."""
        sh = (self.N,) * 3
        phi, heat = self._trace_jit(self.tables, nd.reshape(sh),
                                    xh.reshape(sh), pos_b, flux_b, dr)
        return (phi.reshape(-1),
                heat.reshape(-1) if heat is not None else None)

    # ------------------------------------------------------------------
    def prepare_sources(self, src_pos, src_flux):
        """Pad to whole batches; returns ((nb,B,3) int32, (nb,B) dtype)."""
        B = self.batch_size
        ns = src_flux.shape[0]
        nb = -(-ns // B)
        pos = np.zeros((nb * B, 3), dtype=np.int32)
        flx = np.zeros((nb * B,), dtype=np.float64)
        pos[:ns] = np.asarray(src_pos, dtype=np.int32)
        flx[:ns] = np.asarray(src_flux, dtype=np.float64)
        return (jnp.asarray(pos.reshape(nb, B, 3)),
                jnp.asarray(flx.reshape(nb, B), dtype=self.dtype))

    # ------------------------------------------------------------------
    def _extract_boxes(self, padded, pos):
        """(B,3) source positions -> (B, Dc, Dc, Dc) boxes."""
        Dc = self.geom.Dc

        def one(p):
            return lax.dynamic_slice(padded, (p[0], p[1], p[2]),
                                     (Dc, Dc, Dc))
        return lax.map(one, pos)

    def _shear(self, tb, boxes):
        """(B, Dc, Dc, Dc) -> sheet stack (B, 2, Q, Dc, Dc).

        The take_along_axis is wrapped in optimization barriers: letting
        XLA fuse it with the following transpose pushes the gather off
        its vectorized path (measured ~200x slower)."""
        B = boxes.shape[0]
        g = self.geom
        idx = jnp.broadcast_to(tb.zidx[None],
                               (B, g.Dc, g.Dc, 2 * g.Q))
        boxes = lax.optimization_barrier(boxes)
        out = jnp.take_along_axis(boxes, idx, axis=3)    # (B,Dc,Dc,2Q)
        out = lax.optimization_barrier(out)
        out = out.reshape(B, g.Dc, g.Dc, 2, g.Q)
        return jnp.transpose(out, (0, 3, 4, 1, 2))       # (B,2,Q,Dc,Dc)

    def _unshear(self, tb, H):
        """Sheet stack (B, 2, Q, Dc, Dc) -> box (B, Dc_i, Dc_j, Dc_z).

        The gather must run along the minor axis to stay on the TPU
        vectorized path, so the stack is transposed to put the shell axis
        last before take_along_axis."""
        B = H.shape[0]
        g = self.geom
        Ht = jnp.transpose(H, (0, 1, 3, 4, 2))           # (B,2,Dc,Dc,Q)
        idx = jnp.broadcast_to(tb.qidx[None, None],
                               (B, 2, g.Dc, g.Dc, g.Dc))
        Ht = lax.optimization_barrier(Ht)
        out = jnp.take_along_axis(Ht, idx, axis=4)       # (B,2,Dc,Dc,Dz)
        out = lax.optimization_barrier(out)
        val = jnp.where(tb.k_nonneg[None], out[:, 0], out[:, 1])
        return jnp.where(tb.unshear_valid[None], val, 0.0)  # (B,i,j,z)

    # ------------------------------------------------------------------
    def _sweep(self, tb, H_nhi, dr):
        """Causal shell sweep over the sheet stack.

        H_nhi: (B, 2, Q, Dc, Dc); returns H_cd of the same shape."""
        g = self.geom
        B = H_nhi.shape[0]
        dt = self.dtype
        sig = jnp.asarray(self.sig, dt)
        c = g.c
        ai = lax.broadcasted_iota(jnp.int32, (g.Dc, g.Dc), 0)
        is_up_i = (ai >= c)[None, None]                  # (1,1,Dc,Dc)
        aj = lax.broadcasted_iota(jnp.int32, (g.Dc, g.Dc), 1)
        is_up_j = (aj >= c)[None, None]

        def shift_x(F):
            up = jnp.concatenate([F[:, :, :1], F[:, :, :-1]], axis=2)
            dn = jnp.concatenate([F[:, :, 1:], F[:, :, -1:]], axis=2)
            return jnp.where(is_up_i, up, dn)

        def shift_y(F):
            up = jnp.concatenate([F[:, :, :, :1], F[:, :, :, :-1]], axis=3)
            dn = jnp.concatenate([F[:, :, :, 1:], F[:, :, :, -1:]], axis=3)
            return jnp.where(is_up_j, up, dn)

        H_cd = jnp.zeros(H_nhi.shape, dtype=dt)
        # q = 0: the source cell, coldensh_out = nHI * dr/2 in both sheets
        src_mask = ((ai == c) & (aj == c))[None, None]
        H_cd = H_cd.at[:, :, 0].set(
            jnp.where(src_mask, H_nhi[:, :, 0] * (0.5 * dr), 0.0))

        def sheet_at(H, qq):
            z = jnp.zeros((), jnp.int32)
            return lax.dynamic_slice(
                H, (z, z, qq, z, z),
                (B, 2, 1, g.Dc, g.Dc))[:, :, 0]

        def geom_at(arr, qq, lead=()):
            z = jnp.zeros((), jnp.int32)
            starts = tuple(z for _ in lead) + (qq, z, z)
            sizes = tuple(arr.shape[i] for i in range(len(lead))) + \
                (1, g.Dc, g.Dc)
            out = lax.dynamic_slice(arr, starts, sizes)
            return out.reshape(tuple(arr.shape[i] for i in range(len(lead)))
                               + (g.Dc, g.Dc))

        def body(q, H_cd):
            qi = q.astype(jnp.int32)
            F1 = sheet_at(H_cd, jnp.maximum(qi - 1, 0))
            F2 = sheet_at(H_cd, jnp.maximum(qi - 2, 0))
            F3 = sheet_at(H_cd, jnp.maximum(qi - 3, 0))
            F1x, F1y = shift_x(F1), shift_y(F1)
            F2x, F2y = shift_x(F2), shift_y(F2)
            F2xy = shift_y(F2x)
            F3xy = shift_y(shift_x(F3))

            in_z = geom_at(tb.in_z, qi)[None, None]
            in_y = geom_at(tb.in_y, qi)[None, None]
            c1 = F3xy
            c2 = jnp.where(in_z | in_y, F2y, F2x)
            c3 = jnp.where(in_z, F2x, F2xy)
            c4 = jnp.where(in_z, F1, jnp.where(in_y, F1y, F1x))

            sw = geom_at(tb.sw, qi, lead=(0,))         # (4, Dc, Dc)
            pathq = geom_at(tb.path, qi)
            diagq = geom_at(tb.diag, qi)
            lim = jnp.asarray(0.6, dt)
            w1 = sw[0] / jnp.maximum(lim, c1 * sig)
            w2 = sw[1] / jnp.maximum(lim, c2 * sig)
            w3 = sw[2] / jnp.maximum(lim, c3 * sig)
            w4 = sw[3] / jnp.maximum(lim, c4 * sig)
            cdin = diagq * (c1 * w1 + c2 * w2 + c3 * w3 + c4 * w4) \
                / (w1 + w2 + w3 + w4)

            nhi_q = sheet_at(H_nhi, qi)
            cdout = cdin + nhi_q * (pathq * dr)
            vmask = geom_at(tb.valid, qi, lead=(0,))[None]  # (1,2,Dc,Dc)
            new = jnp.where(vmask, cdout, 0.0)
            z = jnp.zeros((), jnp.int32)
            return lax.dynamic_update_slice(
                H_cd, new[:, :, None], (z, z, qi, z, z))

        return lax.fori_loop(1, g.Q, body, H_cd)

    # ------------------------------------------------------------------
    def _rates(self, tb, H_cd, H_nhi, flux, dr):
        """Spectral-bin rate pass over the sheet stack.

        Gamma_cell = prefact * sum_e w_e e^(-tau_in s_e) (-expm1(-dtau s_e))
        (photon-conserving by construction; thin/thick branch unneeded).
        Returns (phi, heat) sheets, already divided by nHI.
        """
        g = self.geom
        dt = self.dtype
        sig = jnp.asarray(self.sig, dt)
        dcol = H_nhi * (tb.path[None, None] * dr)
        cdin = H_cd - dcol
        tau_in = cdin * sig
        dtau = dcol * sig

        ai = lax.broadcasted_iota(jnp.int32, (g.Dc, g.Dc), 0)
        aj = lax.broadcasted_iota(jnp.int32, (g.Dc, g.Dc), 1)
        is_src = ((ai == g.c) & (aj == g.c))[None, None, None] \
            & (lax.broadcasted_iota(jnp.int32, (1, 1, g.Q, 1, 1), 2) == 0)

        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        geom_fact = jnp.where(
            is_src, 1.0,
            1.0 / (tb.dist2[None, None] * tb.path[None, None] * FOURPI))
        prefact = flux[:, None, None, None, None] * s_over_dr3 * geom_fact

        acc = jnp.zeros_like(H_cd)
        acc_h = jnp.zeros_like(H_cd) if self.do_heating else None
        for e in range(self.num_bins):
            se = tb.bins_s[e]
            core = jnp.exp(-tau_in * se) * (-jnp.expm1(-dtau * se))
            acc = acc + tb.bins_w[e] * core
            if self.do_heating:
                acc_h = acc_h + tb.bins_wh[e] * core

        R2 = jnp.asarray(self.R_max_LLS ** 2, dt)
        mask = (tb.rate_valid[None]
                & (cdin <= jnp.asarray(MAX_COLDENSH, dt))
                & (tb.dist2[None, None] <= R2))
        phi = jnp.where(mask, prefact * acc / H_nhi, 0.0)
        heat = (jnp.where(mask, prefact * acc_h / H_nhi, 0.0)
                if self.do_heating else None)
        return phi, heat

    # ------------------------------------------------------------------
    def _fold_padding(self, padded):
        """Fold wrap-pad regions of a (N+padL+N?padR)^3 array back into
        the N^3 core (periodic accumulation), axis by axis."""
        g = self.geom
        N = self.N
        padL = g.c
        padR = g.Dc - 1 - g.c
        out = padded
        for axis in range(3):
            idx_core = [slice(None)] * 3
            idx_core[axis] = slice(padL, padL + N)
            core = out[tuple(idx_core)]
            if padR > 0:
                idx_hi = [slice(None)] * 3
                idx_hi[axis] = slice(padL + N, padL + N + padR)
                hi = out[tuple(idx_hi)]
                pad_hi = jnp.zeros_like(core)
                pad_hi = lax.dynamic_update_slice_in_dim(pad_hi, hi, 0, axis)
                core = core + pad_hi
            if padL > 0:
                idx_lo = [slice(None)] * 3
                idx_lo[axis] = slice(0, padL)
                lo = out[tuple(idx_lo)]
                pad_lo = jnp.zeros_like(core)
                pad_lo = lax.dynamic_update_slice_in_dim(
                    pad_lo, lo, N - padL, axis)
                core = core + pad_lo
            out = core
        return out

    def _trace_impl(self, tb, ndens3, xh3, pos_b, flux_b, dr):
        """Scan over source batches; returns (phi3, heat3) (N,N,N)."""
        g = self.geom
        N = self.N
        padL = g.c
        padR = g.Dc - 1 - g.c
        nhi3 = ndens3 * (1.0 - xh3)
        nhi_pad = jnp.pad(nhi3, ((padL, padR),) * 3, mode="wrap")
        phi_pad0 = jnp.zeros(nhi_pad.shape, dtype=self.dtype)
        heat_pad0 = jnp.zeros(nhi_pad.shape, dtype=self.dtype) \
            if self.do_heating else jnp.zeros((1,), dtype=self.dtype)

        def batch_step(carry, xs):
            phi_pad, heat_pad = carry
            pos, flux = xs
            boxes = self._extract_boxes(nhi_pad, pos)
            H_nhi = self._shear(tb, boxes)
            H_cd = self._sweep(tb, H_nhi, dr)
            phi_H, heat_H = self._rates(tb, H_cd, H_nhi, flux, dr)
            phi_box = self._unshear(tb, phi_H)

            def accum(pad, boxes_v):
                def one(p_acc, xs2):
                    pv, box = xs2
                    cur = lax.dynamic_slice(
                        p_acc, (pv[0], pv[1], pv[2]), (g.Dc,) * 3)
                    return lax.dynamic_update_slice(
                        p_acc, cur + box, (pv[0], pv[1], pv[2])), None
                pad, _ = lax.scan(one, pad, (pos, boxes_v))
                return pad

            phi_pad = accum(phi_pad, phi_box)
            if self.do_heating:
                heat_pad = accum(heat_pad, self._unshear(tb, heat_H))
            return (phi_pad, heat_pad), None

        (phi_pad, heat_pad), _ = lax.scan(
            batch_step, (phi_pad0, heat_pad0), (pos_b, flux_b))
        phi3 = self._fold_padding(phi_pad)
        heat3 = self._fold_padding(heat_pad) if self.do_heating else None
        return phi3, heat3

    # ------------------------------------------------------------------
    def trace(self, ndens, xh_av, src_pos, src_flux, dr):
        """Public API mirroring Raytracer.trace (0-indexed positions)."""
        nd = jnp.asarray(np.asarray(ndens), self.dtype).reshape((self.N,) * 3)
        xh = jnp.asarray(np.asarray(xh_av), self.dtype).reshape((self.N,) * 3)
        pos_b, flux_b = self.prepare_sources(src_pos, src_flux)
        phi, heat = self._trace_jit(self.tables, nd, xh, pos_b, flux_b,
                                    jnp.asarray(dr, self.dtype))
        if self.do_heating:
            return phi, heat
        return phi
