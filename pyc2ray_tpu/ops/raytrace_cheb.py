"""Chebyshev-face raytracing engine — the TPU production fast path.

Combines the cube-shell traversal of cheb_geometry.py (a gather-free
reformulation of the ASORA octahedral sweep: per shell, three masked
plane updates built from static +-1 shifts) with the spectral-bin rate
pass (radiation/spectral_bins.py) evaluated densely over the whole
per-source cartesian box. The only data movement primitives are
wrap-pad, dynamic plane/box slices and masked dense arithmetic — every
one verified to run at memory bandwidth on the target TPU stack (where
arbitrary-index gathers and scatters run ~10 ns/element).

All device tables flow through the jit signature (ChebTables pytree);
see raytrace_box.BoxTables for why closures must be avoided.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..constants import S_STAR_REF, MAX_COLDENSH
from ..radiation.spectral_bins import SpectralBins
from .geometry import max_q_for
from .cheb_geometry import ChebGeometry, build_cheb_geometry
from .raytrace_box import grey_bins

__all__ = ["ChebRaytracer", "ChebTables"]

FOURPI = 12.566370614359172463991853874177


class ChebTables(NamedTuple):
    sw: object          # (3, 4, R1, Dc, Dc)
    path: object        # (3, R1, Dc, Dc)
    diag: object        # (3, R1, Dc, Dc)
    mask_p: object      # (3, R1, Dc, Dc) bool
    mask_m: object      # (3, R1, Dc, Dc) bool
    path3: object       # (Dc, Dc, Dc)
    dist2: object       # (Dc, Dc, Dc)
    rate_valid: object  # (Dc, Dc, Dc) bool
    bins_s: object
    bins_w: object
    bins_wh: object


class ChebRaytracer:
    """Batched multi-source raytracer, Chebyshev-face formulation.

    Drop-in alternative to ops.raytrace.Raytracer / raytrace_box
    (same trace() contract)."""

    def __init__(self, N, R_max_LLS, sig, bins: SpectralBins,
                 batch_size=8, dtype=jnp.float32, do_heating=False):
        self.N = int(N)
        self.R_max_LLS = float(R_max_LLS)
        self.sig = float(sig)
        self.batch_size = int(batch_size)
        self.dtype = dtype
        self.do_heating = bool(do_heating)
        self.geom: ChebGeometry = build_cheb_geometry(
            self.N, max_q_for(R_max_LLS, N))
        g = self.geom
        dt = dtype
        self.num_bins = bins.num_bins
        self.tables = ChebTables(
            sw=jnp.asarray(g.sw, dt),
            path=jnp.asarray(g.path, dt),
            diag=jnp.asarray(g.diag, dt),
            mask_p=jnp.asarray(g.mask_p),
            mask_m=jnp.asarray(g.mask_m),
            path3=jnp.asarray(g.path3, dt),
            dist2=jnp.asarray(g.dist2, dt),
            rate_valid=jnp.asarray(g.rate_valid),
            bins_s=jnp.asarray(bins.s, dt),
            bins_w=jnp.asarray(bins.w_photo, dt),
            bins_wh=jnp.asarray(bins.w_heat, dt))
        self._trace_jit = jax.jit(self._trace_impl)

    # ------------------------------------------------------------------
    def prepare_sources(self, src_pos, src_flux):
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
    def _sweep(self, tb, nhi_box, dr):
        """Cube-shell sweep over the cartesian box.

        nhi_box: (B, Dc, Dc, Dc). Returns cd (B, Dc, Dc, Dc), the
        outgoing column densities (coldensh_out)."""
        g = self.geom
        dt = self.dtype
        sig = jnp.asarray(self.sig, dt)
        B = nhi_box.shape[0]
        c = g.c
        Dc = g.Dc
        lim = jnp.asarray(0.6, dt)

        ar = lax.broadcasted_iota(jnp.int32, (Dc, Dc), 0)
        br = lax.broadcasted_iota(jnp.int32, (Dc, Dc), 1)
        a_up = (ar >= c)[None, None]          # broadcast over (B, 2(+-))
        b_up = (br >= c)[None, None]

        def sa(P):
            up = jnp.concatenate([P[:, :, :1], P[:, :, :-1]], axis=2)
            dn = jnp.concatenate([P[:, :, 1:], P[:, :, -1:]], axis=2)
            return jnp.where(a_up, up, dn)

        def sb(P):
            up = jnp.concatenate([P[:, :, :, :1], P[:, :, :, :-1]], axis=3)
            dn = jnp.concatenate([P[:, :, :, 1:], P[:, :, :, -1:]], axis=3)
            return jnp.where(b_up, up, dn)

        cd0 = jnp.zeros(nhi_box.shape, dtype=dt)
        src_cd = nhi_box[:, c, c, c] * (0.5 * dr)        # (B,)
        cd0 = cd0.at[:, c, c, c].set(src_cd)

        z32 = jnp.zeros((), jnp.int32)

        def get_planes(arr, axis, idx_lo, idx_hi):
            """Two parallel planes of a (B,X,Y,Z) array -> (B,2,Dc,Dc)."""
            if axis == 0:
                lo = lax.dynamic_slice(arr, (z32, idx_lo, z32, z32),
                                       (B, 1, Dc, Dc))[:, 0]
                hi = lax.dynamic_slice(arr, (z32, idx_hi, z32, z32),
                                       (B, 1, Dc, Dc))[:, 0]
            elif axis == 1:
                lo = lax.dynamic_slice(arr, (z32, z32, idx_lo, z32),
                                       (B, Dc, 1, Dc))[:, :, 0]
                hi = lax.dynamic_slice(arr, (z32, z32, idx_hi, z32),
                                       (B, Dc, 1, Dc))[:, :, 0]
            else:
                lo = lax.dynamic_slice(arr, (z32, z32, z32, idx_lo),
                                       (B, Dc, Dc, 1))[..., 0]
                hi = lax.dynamic_slice(arr, (z32, z32, z32, idx_hi),
                                       (B, Dc, Dc, 1))[..., 0]
            return jnp.stack([lo, hi], axis=1)

        def put_planes(arr, axis, idx_lo, idx_hi, planes):
            lo = planes[:, 0]
            hi = planes[:, 1]
            if axis == 0:
                arr = lax.dynamic_update_slice(
                    arr, lo[:, None], (z32, idx_lo, z32, z32))
                arr = lax.dynamic_update_slice(
                    arr, hi[:, None], (z32, idx_hi, z32, z32))
            elif axis == 1:
                arr = lax.dynamic_update_slice(
                    arr, lo[:, :, None], (z32, z32, idx_lo, z32))
                arr = lax.dynamic_update_slice(
                    arr, hi[:, :, None], (z32, z32, idx_hi, z32))
            else:
                arr = lax.dynamic_update_slice(
                    arr, lo[..., None], (z32, z32, z32, idx_lo))
                arr = lax.dynamic_update_slice(
                    arr, hi[..., None], (z32, z32, z32, idx_hi))
            return arr

        def geom_r(arr, f, r, lead=0):
            """Slice [f, (4,)? r] -> (..., Dc, Dc) static-f dynamic-r."""
            if lead:
                out = lax.dynamic_slice(
                    arr, (jnp.int32(f), z32, r, z32, z32),
                    (1, arr.shape[1], 1, Dc, Dc))
                return out.reshape(arr.shape[1], Dc, Dc)
            out = lax.dynamic_slice(arr, (jnp.int32(f), r, z32, z32),
                                    (1, 1, Dc, Dc))
            return out.reshape(Dc, Dc)

        def body(r, cd):
            ri = r.astype(jnp.int32)
            for f in range(3):
                idx_lo_prev = c - ri + 1
                idx_hi_prev = c + ri - 1
                idx_lo = c - ri
                idx_hi = c + ri
                P = get_planes(cd, f, idx_lo_prev, idx_hi_prev)
                nhi = get_planes(nhi_box, f, idx_lo, idx_hi)
                Pa = sa(P)
                Pb = sb(P)
                Pab = sb(Pa)
                swf = geom_r(tb.sw, f, ri, lead=1)       # (4, Dc, Dc)
                pth = geom_r(tb.path, f, ri)
                dgf = geom_r(tb.diag, f, ri)
                w1 = swf[0] / jnp.maximum(lim, Pab * sig)
                w2 = swf[1] / jnp.maximum(lim, Pb * sig)
                w3 = swf[2] / jnp.maximum(lim, Pa * sig)
                w4 = swf[3] / jnp.maximum(lim, P * sig)
                cdin = dgf * (Pab * w1 + Pb * w2 + Pa * w3 + P * w4) \
                    / (w1 + w2 + w3 + w4)
                cdout = cdin + nhi * (pth * dr)
                mm = geom_r(tb.mask_m, f, ri)
                mp = geom_r(tb.mask_p, f, ri)
                mask = jnp.stack([mm, mp])[None]          # (1,2,Dc,Dc)
                old = get_planes(cd, f, idx_lo, idx_hi)
                cd = put_planes(cd, f, idx_lo, idx_hi,
                                jnp.where(mask, cdout, old))
            return cd

        return lax.fori_loop(1, g.r_max + 1, body, cd0)

    # ------------------------------------------------------------------
    def _rates(self, tb, cd, nhi_box, flux, dr):
        """Dense spectral-bin rate pass over the box (B, Dc, Dc, Dc)."""
        g = self.geom
        dt = self.dtype
        sig = jnp.asarray(self.sig, dt)
        dcol = nhi_box * (tb.path3[None] * dr)
        cdin = cd - dcol
        tau_in = cdin * sig
        dtau = dcol * sig

        c = g.c
        i3 = lax.broadcasted_iota(jnp.int32, (g.Dc,) * 3, 0)
        j3 = lax.broadcasted_iota(jnp.int32, (g.Dc,) * 3, 1)
        k3 = lax.broadcasted_iota(jnp.int32, (g.Dc,) * 3, 2)
        is_src = ((i3 == c) & (j3 == c) & (k3 == c))[None]

        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        geom_fact = jnp.where(
            is_src, 1.0,
            1.0 / (tb.dist2[None] * tb.path3[None] * FOURPI))
        prefact = flux[:, None, None, None] * s_over_dr3 * geom_fact

        acc = jnp.zeros_like(cd)
        acc_h = jnp.zeros_like(cd) if self.do_heating else None
        for e in range(self.num_bins):
            se = tb.bins_s[e]
            core = jnp.exp(-tau_in * se) * (-jnp.expm1(-dtau * se))
            acc = acc + tb.bins_w[e] * core
            if self.do_heating:
                acc_h = acc_h + tb.bins_wh[e] * core

        R2 = jnp.asarray(self.R_max_LLS ** 2, dt)
        mask = (tb.rate_valid[None]
                & (cdin <= jnp.asarray(MAX_COLDENSH, dt))
                & (tb.dist2[None] <= R2))
        phi = jnp.where(mask, prefact * acc / nhi_box, 0.0)
        heat = (jnp.where(mask, prefact * acc_h / nhi_box, 0.0)
                if self.do_heating else None)
        return phi, heat

    # ------------------------------------------------------------------
    def _extract_boxes(self, padded, pos):
        Dc = self.geom.Dc

        def one(p):
            return lax.dynamic_slice(padded, (p[0], p[1], p[2]),
                                     (Dc, Dc, Dc))
        return lax.map(one, pos)

    def _fold_padding(self, padded):
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
        g = self.geom
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
            cd = self._sweep(tb, boxes, dr)
            phi_box, heat_box = self._rates(tb, cd, boxes, flux, dr)

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
                heat_pad = accum(heat_pad, heat_box)
            return (phi_pad, heat_pad), None

        (phi_pad, heat_pad), _ = lax.scan(
            batch_step, (phi_pad0, heat_pad0), (pos_b, flux_b))
        phi3 = self._fold_padding(phi_pad)
        heat3 = self._fold_padding(heat_pad) if self.do_heating else None
        return phi3, heat3

    def trace(self, ndens, xh_av, src_pos, src_flux, dr):
        """Public API (0-indexed positions, (NumSrc,3))."""
        nd = jnp.asarray(np.asarray(ndens), self.dtype).reshape((self.N,) * 3)
        xh = jnp.asarray(np.asarray(xh_av), self.dtype).reshape((self.N,) * 3)
        pos_b, flux_b = self.prepare_sources(src_pos, src_flux)
        phi, heat = self._trace_jit(self.tables, nd, xh, pos_b, flux_b,
                                    jnp.asarray(dr, self.dtype))
        if self.do_heating:
            return phi, heat
        return phi
