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

        nhi_box: (B, Dc, Dc, Dc) in (i, j, k) order. Returns cd of the
        same shape (outgoing column densities).

        Layout strategy: x-faces (planes i = c+-r, axis 1) and y-faces
        (axis 2) are read/written directly in the box; z-faces live in a
        per-shell stack Z (B, 2, R1, Dc_i, Dc_j) because minor-axis plane
        updates of the box are ~100x more expensive on TPU tiling. The
        cross-face dependencies are stitched with 1D line patches:
          * the x/y stencil planes get their k = +-(r-1) lines from
            Z[r-1];
          * the z stencil plane Z[r-1] gets its i = +-r and j = +-r
            lines from the box (x/y faces of shell r, just written).
        The z-face values are folded back into the box after the loop."""
        g = self.geom
        dt = self.dtype
        sig = jnp.asarray(self.sig, dt)
        B = nhi_box.shape[0]
        c = g.c
        Dc = g.Dc
        R1 = g.r_max + 1
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

        src_cd = nhi_box[:, c, c, c] * (0.5 * dr)        # (B,)
        cd0 = jnp.zeros(nhi_box.shape, dtype=dt)
        cd0 = cd0.at[:, c, c, c].set(src_cd)
        Z0 = jnp.zeros((B, 2, R1, Dc, Dc), dtype=dt)
        Z0 = Z0.at[:, :, 0, c, c].set(src_cd[:, None])
        # nhi with k leading (for cheap z-plane reads): (B, k, i, j)
        nhi_zT = jnp.transpose(nhi_box, (0, 3, 1, 2))

        z32 = jnp.zeros((), jnp.int32)

        def get_planes(arr, axis, idx_lo, idx_hi):
            """Two parallel planes (axis 0 or 1) -> (B, 2, Dc, Dc)."""
            if axis == 0:
                lo = lax.dynamic_slice(arr, (z32, idx_lo, z32, z32),
                                       (B, 1, Dc, Dc))[:, 0]
                hi = lax.dynamic_slice(arr, (z32, idx_hi, z32, z32),
                                       (B, 1, Dc, Dc))[:, 0]
            else:
                lo = lax.dynamic_slice(arr, (z32, z32, idx_lo, z32),
                                       (B, Dc, 1, Dc))[:, :, 0]
                hi = lax.dynamic_slice(arr, (z32, z32, idx_hi, z32),
                                       (B, Dc, 1, Dc))[:, :, 0]
            return jnp.stack([lo, hi], axis=1)

        def put_planes(arr, axis, idx_lo, idx_hi, planes):
            lo, hi = planes[:, 0], planes[:, 1]
            if axis == 0:
                arr = lax.dynamic_update_slice(
                    arr, lo[:, None], (z32, idx_lo, z32, z32))
                arr = lax.dynamic_update_slice(
                    arr, hi[:, None], (z32, idx_hi, z32, z32))
            else:
                arr = lax.dynamic_update_slice(
                    arr, lo[:, :, None], (z32, z32, idx_lo, z32))
                arr = lax.dynamic_update_slice(
                    arr, hi[:, :, None], (z32, z32, idx_hi, z32))
            return arr

        def zstack_at(Z, r):
            return lax.dynamic_slice(Z, (z32, z32, r, z32, z32),
                                     (B, 2, 1, Dc, Dc))[:, :, 0]

        ai_line = lax.broadcasted_iota(jnp.int32, (Dc,), 0)

        def patch_k_lines(P, Zprev, ri, face):
            """Overwrite the k = c±(r-1) columns of an x/y stencil plane
            with z-face values from Z[r-1].

            face 0 (x): P over (j, k); the stencil plane is i = c±(f±)(r-1),
              so the z-line varies along j: slice Zprev on its i-axis.
            face 1 (y): P over (i, k); plane is j = c±(r-1): slice Zprev on
              its j-axis; the column endpoints |i'| >= r belong to x-faces
              already present in P (from the box) and must be preserved.
            """
            if face == 0:
                lo_ln = lax.dynamic_slice(Zprev, (z32, z32, c - ri + 1, z32),
                                          (B, 2, 1, Dc))[:, :, 0]
                hi_ln = lax.dynamic_slice(Zprev, (z32, z32, c + ri - 1, z32),
                                          (B, 2, 1, Dc))[:, :, 0]
            else:
                lo_ln = lax.dynamic_slice(Zprev, (z32, z32, z32, c - ri + 1),
                                          (B, 2, Dc, 1))[..., 0]
                hi_ln = lax.dynamic_slice(Zprev, (z32, z32, z32, c + ri - 1),
                                          (B, 2, Dc, 1))[..., 0]
            # lines[b, f±, z±, a]
            lines = jnp.stack([lo_ln, hi_ln], axis=1)
            col_lo = lines[:, :, 0, :]    # for column k = c-(r-1)
            col_hi = lines[:, :, 1, :]    # for column k = c+(r-1)
            if face == 1:
                # keep x-face values at the |i'-c| >= r endpoints
                keep = (jnp.abs(ai_line - c) >= ri)[None, None, :]
                cur_lo = lax.dynamic_slice(
                    P, (z32, z32, z32, c - ri + 1), (B, 2, Dc, 1))[..., 0]
                cur_hi = lax.dynamic_slice(
                    P, (z32, z32, z32, c + ri - 1), (B, 2, Dc, 1))[..., 0]
                col_lo = jnp.where(keep, cur_lo, col_lo)
                col_hi = jnp.where(keep, cur_hi, col_hi)
            P = lax.dynamic_update_slice(
                P, col_lo[..., None], (z32, z32, z32, c - ri + 1))
            P = lax.dynamic_update_slice(
                P, col_hi[..., None], (z32, z32, z32, c + ri - 1))
            return P

        def face_update(P, nhi, f, ri):
            Pa = sa(P)
            Pb = sb(P)
            Pab = sb(Pa)

            def geom_r(arr, lead=0):
                if lead:
                    out = lax.dynamic_slice(
                        arr, (jnp.int32(f), z32, ri, z32, z32),
                        (1, arr.shape[1], 1, Dc, Dc))
                    return out.reshape(arr.shape[1], Dc, Dc)
                out = lax.dynamic_slice(arr, (jnp.int32(f), ri, z32, z32),
                                        (1, 1, Dc, Dc))
                return out.reshape(Dc, Dc)

            swf = geom_r(tb.sw, lead=1)
            pth = geom_r(tb.path)
            dgf = geom_r(tb.diag)
            w1 = swf[0] / jnp.maximum(lim, Pab * sig)
            w2 = swf[1] / jnp.maximum(lim, Pb * sig)
            w3 = swf[2] / jnp.maximum(lim, Pa * sig)
            w4 = swf[3] / jnp.maximum(lim, P * sig)
            cdin = dgf * (Pab * w1 + Pb * w2 + Pa * w3 + P * w4) \
                / (w1 + w2 + w3 + w4)
            cdout = cdin + nhi * (pth * dr)
            mm = geom_r(tb.mask_m)
            mp = geom_r(tb.mask_p)
            mask = jnp.stack([mm, mp])[None]
            return jnp.where(mask, cdout, 0.0), mask

        def body(r, carry):
            cd, Z = carry
            ri = r.astype(jnp.int32)
            Zprev = zstack_at(Z, ri - 1)
            # ---- x faces (planes i = c±r, 2D over (j, k))
            P = get_planes(cd, 0, c - ri + 1, c + ri - 1)
            P = patch_k_lines(P, Zprev, ri, 0)
            nhi = get_planes(nhi_box, 0, c - ri, c + ri)
            new, mask = face_update(P, nhi, 0, ri)
            old = get_planes(cd, 0, c - ri, c + ri)
            cd = put_planes(cd, 0, c - ri, c + ri,
                            jnp.where(mask, new, old))
            # ---- y faces (planes j = c±r, 2D over (i, k))
            P = get_planes(cd, 1, c - ri + 1, c + ri - 1)
            P = patch_k_lines(P, Zprev, ri, 1)
            nhi = get_planes(nhi_box, 1, c - ri, c + ri)
            new, mask = face_update(P, nhi, 1, ri)
            old = get_planes(cd, 1, c - ri, c + ri)
            cd = put_planes(cd, 1, c - ri, c + ri,
                            jnp.where(mask, new, old))
            # ---- z faces (2D over (i, j)), stencil plane from the stack
            P = Zprev
            # Patched lines at c±r can fall outside the (asymmetric) box;
            # dynamic indices then CLAMP onto valid planes, so out-of-range
            # patches must be suppressed (the true out-of-clip values are
            # zeros that are never read with weight).
            ok_lo = (c - ri) >= 0
            ok_hi = (c + ri) <= Dc - 1

            def patched_line(where_ok, line, cur):
                return jnp.where(where_ok, line, cur)

            # patch i = ±r rows from the box x-planes (shell r, fresh):
            # cell (±r, j', c±(r-1)) = box[c±r, j', c±(r-1)]
            xlo = lax.dynamic_slice(cd, (z32, c - ri, z32, c - ri + 1),
                                    (B, 1, Dc, 1))[:, 0, :, 0]
            xlo_hi = lax.dynamic_slice(cd, (z32, c - ri, z32, c + ri - 1),
                                       (B, 1, Dc, 1))[:, 0, :, 0]
            xhi = lax.dynamic_slice(cd, (z32, c + ri, z32, c - ri + 1),
                                    (B, 1, Dc, 1))[:, 0, :, 0]
            xhi_hi = lax.dynamic_slice(cd, (z32, c + ri, z32, c + ri - 1),
                                       (B, 1, Dc, 1))[:, 0, :, 0]
            row_lo = jnp.stack([xlo, xlo_hi], axis=1)    # (B, 2(z±), Dc_j)
            row_hi = jnp.stack([xhi, xhi_hi], axis=1)
            cur_lo = lax.dynamic_slice(P, (z32, z32, c - ri, z32),
                                       (B, 2, 1, Dc))[:, :, 0]
            cur_hi = lax.dynamic_slice(P, (z32, z32, c + ri, z32),
                                       (B, 2, 1, Dc))[:, :, 0]
            P = lax.dynamic_update_slice(
                P, patched_line(ok_lo, row_lo, cur_lo)[:, :, None],
                (z32, z32, c - ri, z32))
            P = lax.dynamic_update_slice(
                P, patched_line(ok_hi, row_hi, cur_hi)[:, :, None],
                (z32, z32, c + ri, z32))
            # patch j = ±r columns from the box y-planes (shell r, fresh):
            ylo = lax.dynamic_slice(cd, (z32, z32, c - ri, c - ri + 1),
                                    (B, Dc, 1, 1))[:, :, 0, 0]
            ylo_hi = lax.dynamic_slice(cd, (z32, z32, c - ri, c + ri - 1),
                                       (B, Dc, 1, 1))[:, :, 0, 0]
            yhi = lax.dynamic_slice(cd, (z32, z32, c + ri, c - ri + 1),
                                    (B, Dc, 1, 1))[:, :, 0, 0]
            yhi_hi = lax.dynamic_slice(cd, (z32, z32, c + ri, c + ri - 1),
                                       (B, Dc, 1, 1))[:, :, 0, 0]
            col_lo = jnp.stack([ylo, ylo_hi], axis=1)    # (B, 2(z±), Dc_i)
            col_hi = jnp.stack([yhi, yhi_hi], axis=1)
            ccur_lo = lax.dynamic_slice(P, (z32, z32, z32, c - ri),
                                        (B, 2, Dc, 1))[..., 0]
            ccur_hi = lax.dynamic_slice(P, (z32, z32, z32, c + ri),
                                        (B, 2, Dc, 1))[..., 0]
            P = lax.dynamic_update_slice(
                P, patched_line(ok_lo, col_lo, ccur_lo)[..., None],
                (z32, z32, z32, c - ri))
            P = lax.dynamic_update_slice(
                P, patched_line(ok_hi, col_hi, ccur_hi)[..., None],
                (z32, z32, z32, c + ri))
            nhi = get_planes(nhi_zT, 0, c - ri, c + ri)  # (B,2,Dc_i,Dc_j)
            new, mask = face_update(P, nhi, 2, ri)
            Z = lax.dynamic_update_slice(
                Z, new[:, :, None], (z32, z32, ri, z32, z32))
            return cd, Z

        cd, Z = lax.fori_loop(1, g.r_max + 1, body, (cd0, Z0))

        # fold the z-face stack back into the box: plane k = c±r <- Z[r]
        zbox = jnp.zeros((B, Dc, Dc, Dc), dtype=dt)      # (B, k, i, j)
        def fold_body(r, zbox):
            ri = r.astype(jnp.int32)
            Zr = zstack_at(Z, ri)
            # guard against index clamping at the asymmetric box edges:
            # an out-of-range plane write would land on a clamped index
            # and overwrite valid data with masked zeros
            def rmw(zbox, plane, idx, ok):
                cur = lax.dynamic_slice(zbox, (z32, idx, z32, z32),
                                        (B, 1, Dc, Dc))
                new = jnp.where(ok, plane[:, None], cur)
                return lax.dynamic_update_slice(zbox, new,
                                                (z32, idx, z32, z32))
            zbox = rmw(zbox, Zr[:, 0], c - ri, c - ri >= 0)
            zbox = rmw(zbox, Zr[:, 1], c + ri, c + ri <= Dc - 1)
            return zbox
        zbox = lax.fori_loop(1, g.r_max + 1, fold_body, zbox)
        cd = cd + jnp.transpose(zbox, (0, 2, 3, 1))
        # center plane of zbox (r=0) only holds the duplicated source cell
        # (already present in cd), so it is excluded by starting at r=1.
        return cd

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
