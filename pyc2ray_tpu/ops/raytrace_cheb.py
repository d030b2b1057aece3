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
from .raytrace import RaytraceConfig


__all__ = ["ChebRaytracer", "ChebTables"]

FOURPI = 12.566370614359172463991853874177


class ChebTables(NamedTuple):
    sw: object          # (3, 4, R1, Dc, Dc)
    geom_x: object      # (R1, 8, Dc, 2*Dc) packed for the Pallas kernel;
    geom_y: object      # stored pre-split per face: slicing geom[f] from a
    geom_z: object      # (3,...) array inside the batch loop showed up in
                        # profiles as ~8 MB async copies PER BATCH that XLA
                        # does not hoist out of the fori_loop
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
                 batch_size=8, dtype=jnp.float32, do_heating=False,
                 use_pallas=False, fuse_rates=False):
        self.N = int(N)
        self.R_max_LLS = float(R_max_LLS)
        self.sig = float(sig)
        self.batch_size = int(batch_size)
        self.dtype = dtype
        self.do_heating = bool(do_heating)
        self.use_pallas = bool(use_pallas)
        # Fusing the rate pass into the kernel is supported but measured
        # SLOWER at 64 bins (the unrolled in-kernel exp chains cost more
        # than the separate dense XLA rates pass); default off.
        self.fuse_rates = bool(fuse_rates)
        # Mosaic kernels need real TPU hardware; fall back to the Pallas
        # interpreter elsewhere (tests on CPU)
        self._pallas_interpret = jax.default_backend() != "tpu"
        # config shim so evolve3D and the models treat engines uniformly
        self.config = RaytraceConfig(
            N=self.N, R_max_LLS=self.R_max_LLS, sig=self.sig,
            batch_size=self.batch_size, dtype=dtype,
            grey_analytic=(bins.num_bins == 1), do_heating=do_heating)
        # Box half-extent: ceil(R) in Chebyshev metric (every rated cell
        # and all its stencil parents live inside); the L1 octahedron
        # membership bound stays at the reference's sqrt(3)R.
        r_cube = int(np.ceil(min(float(R_max_LLS), float(N))))
        self.geom: ChebGeometry = build_cheb_geometry(
            self.N, max_q_for(R_max_LLS, N), r_cube=r_cube)
        g = self.geom
        dt = dtype
        self.num_bins = bins.num_bins
        # static (s, w) pairs for the fused-rates Pallas kernel
        self._bins_static = tuple(
            (float(s), float(w)) for s, w in zip(bins.s, bins.w_photo))
        from .pallas_sweep import pack_geometry
        np_dt = np.float32 if dt == jnp.float32 else np.float64
        geom_np = pack_geometry(g, np_dt)
        self.tables = ChebTables(
            geom_x=jnp.asarray(geom_np[0]),
            geom_y=jnp.asarray(geom_np[1]),
            geom_z=jnp.asarray(geom_np[2]),
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


    # -- uniform engine API --------------------------------------------
    def trace_batches(self, nd, xh, pos_b, flux_b, dr):
        """Device-level batched trace on prepared sources; flat-grid IO."""
        sh = (self.N,) * 3
        phi, heat = self._trace_jit(self.tables, nd.reshape(sh),
                                    xh.reshape(sh), pos_b, flux_b, dr)
        return (phi.reshape(-1),
                heat.reshape(-1) if heat is not None else None)

    def shard_trace(self, tb, nd_flat, xh_flat, pos_b, flux_b, dr):
        """Per-shard trace body for shard_map (tables passed explicitly).
        Returns (phi, heat); heat is None unless do_heating."""
        sh = (self.N,) * 3
        phi, heat = self._trace_impl(tb, nd_flat.reshape(sh),
                                     xh_flat.reshape(sh), pos_b, flux_b, dr)
        return (phi.reshape(-1),
                heat.reshape(-1) if self.do_heating else None)

    # ------------------------------------------------------------------
    def _fold_stacks(self, X, Y, Z, src_cd):
        """Fold the three (R1, B, 2, Dc, Dc) face stacks into the
        cartesian cd box (B, Dc, Dc, Dc)."""
        g = self.geom
        dt = self.dtype
        B = src_cd.shape[0]
        c = g.c
        Dc = g.Dc
        R1 = g.r_max + 1
        z32 = jnp.zeros((), jnp.int32)

        def fold(stack):
            box = jnp.zeros((B, Dc, Dc, Dc), dtype=dt)

            def fbody(r, box):
                ri = r.astype(jnp.int32)
                Sr = lax.dynamic_slice(stack, (ri, z32, z32, z32, z32),
                                       (1, B, 2, Dc, Dc))[0]

                def rmw(box, plane, idx, ok):
                    cur = lax.dynamic_slice(box, (z32, idx, z32, z32),
                                            (B, 1, Dc, Dc))
                    new = jnp.where(ok, plane[:, None], cur)
                    return lax.dynamic_update_slice(box, new,
                                                    (z32, idx, z32, z32))
                box = rmw(box, Sr[:, 0], c - ri, (c - ri) >= 0)
                box = rmw(box, Sr[:, 1], c + ri, (c + ri) <= Dc - 1)
                return box

            return lax.fori_loop(1, R1, fbody, box)

        cd = fold(X)                                      # (B, i, j, k)
        cd = cd + jnp.transpose(fold(Y), (0, 2, 1, 3))    # (B, j, i, k) -> T
        cd = cd + jnp.transpose(fold(Z), (0, 2, 3, 1))    # (B, k, i, j) -> T
        return cd.at[:, c, c, c].set(src_cd)

    def _fold_stacks_packed(self, X, Y, Z, src_cd):
        """Fold the lane-packed (R1, B, Dc, 2*Dc) face stacks from the
        Pallas kernel into the cartesian box (B, Dc, Dc, Dc).

        Pure static assembly (no per-shell loop): shell r's minus face is
        box plane c-r and its plus face c+r, so the whole stack maps to a
        contiguous plane range via one flip + transpose per sign."""
        g = self.geom
        dt = self.dtype
        B = src_cd.shape[0]
        c, Dc, R1 = g.c, g.Dc, g.r_max + 1

        def fold(S):
            Sm = S[:, :, :, :Dc]      # minus faces (shell-leading)
            Sp = S[:, :, :, Dc:]
            n_dn = min(c, R1 - 1)
            n_up = min(Dc - 1 - c, R1 - 1)
            dn = jnp.flip(Sm[1:n_dn + 1], 0).transpose(1, 0, 2, 3)
            up = Sp[1:n_up + 1].transpose(1, 0, 2, 3)
            parts = []
            pad_lo = c - n_dn
            if pad_lo > 0:
                parts.append(jnp.zeros((B, pad_lo, Dc, Dc), dt))
            parts += [dn, jnp.zeros((B, 1, Dc, Dc), dt), up]
            pad_hi = (Dc - 1 - c) - n_up
            if pad_hi > 0:
                parts.append(jnp.zeros((B, pad_hi, Dc, Dc), dt))
            return jnp.concatenate(parts, axis=1)

        cd = fold(X)                                      # (B, i, j, k)
        cd = cd + jnp.transpose(fold(Y), (0, 2, 1, 3))    # (B, j, i, k) -> T
        cd = cd + jnp.transpose(fold(Z), (0, 2, 3, 1))    # (B, k, i, j) -> T
        return cd.at[:, c, c, c].set(src_cd)

    def _sweep_pallas(self, tb, nhi_box, dr, fuse_rates=False, sig=None):
        """Sweep via the monolithic Pallas kernel (pallas_sweep.py).

        With fuse_rates the kernel also evaluates the spectral-bin rate
        pass per shell and the returned box holds flux-less Gamma (the
        per-source flux factor and the source-cell rate are applied by
        the caller); otherwise it holds coldensh_out."""
        from .pallas_sweep import cheb_sweep_pallas
        g = self.geom
        B = nhi_box.shape[0]
        nx = jnp.transpose(nhi_box, (1, 0, 2, 3))
        ny = jnp.transpose(nhi_box, (2, 0, 1, 3))
        nz = jnp.transpose(nhi_box, (3, 0, 1, 2))
        src_cd = nhi_box[:, g.c, g.c, g.c] * (0.5 * dr)
        ar = lax.broadcasted_iota(jnp.int32, (g.Dc, 2 * g.Dc), 0)
        br = lax.broadcasted_iota(jnp.int32, (g.Dc, 2 * g.Dc), 1)
        center = ((ar == g.c) & ((br == g.c) | (br == g.Dc + g.c)))[None]
        init_plane = jnp.broadcast_to(
            jnp.where(center, src_cd[:, None, None], 0.0),
            (B, g.Dc, 2 * g.Dc)).astype(self.dtype)
        X, Y, Z = cheb_sweep_pallas(
            (tb.geom_x, tb.geom_y, tb.geom_z), nx, ny, nz, dr, init_plane,
            B=B, Dc=g.Dc, R1=g.r_max + 1, c=g.c,
            sig=(self.sig if sig is None else float(sig)),
            bins=self._bins_static if fuse_rates else None,
            R2=self.R_max_LLS ** 2,
            interpret=self._pallas_interpret)
        center_val = jnp.zeros_like(src_cd) if fuse_rates else src_cd
        return self._fold_stacks_packed(X, Y, Z, center_val)

    def _source_cell_rate(self, nhi_box, flux, dr):
        """Gamma of the source cell itself (tau_in = 0, vol = dr^3;
        raytracing.cu:285-294)."""
        g = self.geom
        dt = self.dtype
        nhi_src = nhi_box[:, g.c, g.c, g.c]
        dtau = nhi_src * (0.5 * dr) * jnp.asarray(self.sig, dt)
        acc = jnp.zeros_like(dtau)
        for s_e, w_e in self._bins_static:
            acc = acc + w_e * -jnp.expm1(-dtau * s_e)
        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        return flux * s_over_dr3 * acc / nhi_src

    def _sweep(self, tb, nhi_box, dr, sig=None):
        """Cube-shell sweep; returns cd (B, Dc, Dc, Dc) coldensh_out.

        All sweep state lives in three per-shell face stacks with the
        shell index LEADING (X/Y/Z: (R1, B, 2, Dc, Dc)), so every stack
        read and write inside the loop is a contiguous plane — on this
        TPU, middle/minor-axis dynamic updates of a large box cost a
        full-buffer copy per shell (~2 ms), which dominated earlier
        formulations. Cross-face stencil dependencies are stitched with
        1D line patches between stacks; the stacks are folded into the
        cartesian box once after the loop.

        Stencil-plane composition (plane at distance r-1 from the source,
        read by face cells of shell r):
          x-stencil (over j,k): interior X[r-1]; rows j=+-(r-1) from
            Y[r-1]; cols k=+-(r-1) from Z[r-1] (corners (i,+-,+-) are
            z-class, so the Z patch is applied last).
          y-stencil (over i,k): interior Y[r-1] (incl. |i|=r-1 ties);
            cols k=+-(r-1) from Z[r-1]; rows i=+-r from X[r] (same
            shell, fresh; corners are x-class -> X patch last).
          z-stencil (over i,j): interior Z[r-1]; rows i=+-r from X[r];
            cols j=+-r from Y[r] (corners (+-r,+-r) are y-class ties ->
            Y patch last).
        """
        g = self.geom
        dt = self.dtype
        sig = jnp.asarray(self.sig if sig is None else sig, dt)
        B = nhi_box.shape[0]
        c = g.c
        Dc = g.Dc
        R1 = g.r_max + 1
        lim = jnp.asarray(0.6, dt)

        ar = lax.broadcasted_iota(jnp.int32, (Dc, Dc), 0)
        br = lax.broadcasted_iota(jnp.int32, (Dc, Dc), 1)
        a_up = (ar >= c)[None, None]
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

        def init_stack():
            # three DISTINCT buffers: aliased loop carries would force XLA
            # to copy every stack on every shell iteration (measured ~2/3
            # of the sweep time)
            s = jnp.zeros((R1, B, 2, Dc, Dc), dtype=dt)
            return s.at[0, :, :, c, c].set(src_cd[:, None])

        X0, Y0, Z0 = init_stack(), init_stack(), init_stack()
        # nhi in per-axis-leading layouts for cheap plane reads
        nhi_x = nhi_box                                   # (B, i, j, k)
        nhi_y = jnp.transpose(nhi_box, (0, 2, 1, 3))      # (B, j, i, k)
        nhi_z = jnp.transpose(nhi_box, (0, 3, 1, 2))      # (B, k, i, j)

        z32 = jnp.zeros((), jnp.int32)

        def stack_at(S, r):
            return lax.dynamic_slice(S, (r, z32, z32, z32, z32),
                                     (1, B, 2, Dc, Dc))[0]

        def nhi_planes(arr, idx_lo, idx_hi):
            lo = lax.dynamic_slice(arr, (z32, idx_lo, z32, z32),
                                   (B, 1, Dc, Dc))[:, 0]
            hi = lax.dynamic_slice(arr, (z32, idx_hi, z32, z32),
                                   (B, 1, Dc, Dc))[:, 0]
            return jnp.stack([lo, hi], axis=1)

        def row_line(S, apos):
            """(B, 2, Dc_b) line of a (B,2,Dc_a,Dc_b) plane at a=apos."""
            return lax.dynamic_slice(S, (z32, z32, apos, z32),
                                     (B, 2, 1, Dc))[:, :, 0]

        def col_line(S, bpos):
            return lax.dynamic_slice(S, (z32, z32, z32, bpos),
                                     (B, 2, Dc, 1))[..., 0]

        def put_row(P, row, apos, ok):
            cur = row_line(P, apos)
            return lax.dynamic_update_slice(
                P, jnp.where(ok, row, cur)[:, :, None],
                (z32, z32, apos, z32))

        def put_col(P, col, bpos, ok):
            cur = col_line(P, bpos)
            return lax.dynamic_update_slice(
                P, jnp.where(ok, col, cur)[..., None],
                (z32, z32, z32, bpos))

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
            return jnp.where(mask, cdout, 0.0)

        def put_shell(S, r, planes):
            return lax.dynamic_update_slice(
                S, planes[None], (r, z32, z32, z32, z32))

        def zsplit(lines):
            """(B, 2(z±), Dc) -> per-sign pair used as (lo_col, hi_col)."""
            return lines[:, 0:1], lines[:, 1:2]

        def body(r, carry):
            X, Y, Z = carry
            ri = r.astype(jnp.int32)
            rm1 = ri - 1
            Xp = stack_at(X, rm1)
            Yp = stack_at(Y, rm1)
            Zp = stack_at(Z, rm1)
            alo = c - ri + 1        # index of -(r-1)
            ahi = c + ri - 1
            ok_lo_r = (c - ri) >= 0
            ok_hi_r = (c + ri) <= Dc - 1

            # ---- x faces (plane over (j,k)); stencil from X/Y/Z[r-1]
            P = Xp
            # rows j=±(r-1) from Y[r-1] at (i-pos ±(r-1), k):
            # Yp layout (B, 2(y±), Dc_i, Dc_k) -> line over k at i-pos
            yl = row_line(Yp, alo)      # y- and y+ at i = -(r-1)
            yh = row_line(Yp, ahi)      # at i = +(r-1)
            # P is (B, 2(x±), Dc_j, Dc_k): for the x- plane (i=-(r-1))
            # take the i=-(r-1) lines; for x+ the +(r-1) lines.
            row_jlo = jnp.stack([yl[:, 0], yh[:, 0]], axis=1)
            row_jhi = jnp.stack([yl[:, 1], yh[:, 1]], axis=1)
            P = put_row(P, row_jlo, alo, True)
            P = put_row(P, row_jhi, ahi, True)
            # cols k=±(r-1) from Z[r-1] at (i-pos ±(r-1), j):
            zl = row_line(Zp, alo)      # z-/z+ planes, line over j, i=-(r-1)
            zh = row_line(Zp, ahi)
            col_klo = jnp.stack([zl[:, 0], zh[:, 0]], axis=1)
            col_khi = jnp.stack([zl[:, 1], zh[:, 1]], axis=1)
            P = put_col(P, col_klo, alo, True)
            P = put_col(P, col_khi, ahi, True)
            nhi = nhi_planes(nhi_x, c - ri, c + ri)
            Xnew = face_update(P, nhi, 0, ri)
            X = put_shell(X, ri, Xnew)

            # ---- y faces (plane over (i,k)); stencil Y[r-1] + Z[r-1] + X[r]
            P = Yp
            # cols k=±(r-1) from Z[r-1] at (j-pos ±(r-1), i): line over i
            zcl = col_line(Zp, alo)     # z± planes, line over i, j=-(r-1)
            zch = col_line(Zp, ahi)
            col_klo = jnp.stack([zcl[:, 0], zch[:, 0]], axis=1)
            col_khi = jnp.stack([zcl[:, 1], zch[:, 1]], axis=1)
            P = put_col(P, col_klo, alo, True)
            P = put_col(P, col_khi, ahi, True)
            # rows i=±r from X[r] at (j-pos ±(r-1), k): line over k
            xl = row_line(Xnew, alo)    # x± planes, line over k, j=-(r-1)
            xh2 = row_line(Xnew, ahi)
            row_ilo = jnp.stack([xl[:, 0], xh2[:, 0]], axis=1)
            row_ihi = jnp.stack([xl[:, 1], xh2[:, 1]], axis=1)
            P = put_row(P, row_ilo, c - ri, ok_lo_r)
            P = put_row(P, row_ihi, c + ri, ok_hi_r)
            nhi = nhi_planes(nhi_y, c - ri, c + ri)
            Ynew = face_update(P, nhi, 1, ri)
            Y = put_shell(Y, ri, Ynew)

            # ---- z faces (plane over (i,j)); stencil Z[r-1] + X[r] + Y[r]
            P = Zp
            # rows i=±r from X[r] at (k-pos ±(r-1), j): line over j
            xcl = col_line(Xnew, alo)   # x± planes, line over j, k=-(r-1)
            xch = col_line(Xnew, ahi)
            row_ilo = jnp.stack([xcl[:, 0], xch[:, 0]], axis=1)
            row_ihi = jnp.stack([xcl[:, 1], xch[:, 1]], axis=1)
            P = put_row(P, row_ilo, c - ri, ok_lo_r)
            P = put_row(P, row_ihi, c + ri, ok_hi_r)
            # cols j=±r from Y[r] at (k-pos ±(r-1), i): line over i
            ycl = col_line(Ynew, alo)
            ych = col_line(Ynew, ahi)
            col_jlo = jnp.stack([ycl[:, 0], ych[:, 0]], axis=1)
            col_jhi = jnp.stack([ycl[:, 1], ych[:, 1]], axis=1)
            P = put_col(P, col_jlo, c - ri, ok_lo_r)
            P = put_col(P, col_jhi, c + ri, ok_hi_r)
            nhi = nhi_planes(nhi_z, c - ri, c + ri)
            Znew = face_update(P, nhi, 2, ri)
            Z = put_shell(Z, ri, Znew)
            return X, Y, Z

        X, Y, Z = lax.fori_loop(1, R1, body, (X0, Y0, Z0))
        return self._fold_stacks(X, Y, Z, src_cd)

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

    def trace_extended(self, tb, nhi_ext, pos_b, flux_b, dr):
        """Core batched sweep over an EXTENDED field.

        ``nhi_ext`` is the local HI density extended by ``geom.c`` cells
        low / ``geom.Dc-1-geom.c`` cells high along every axis (via wrap
        padding on one device, or halo exchange under domain
        decomposition — parallel/domain.py). ``pos_b`` holds box-start
        positions in extended coordinates, which coincide with unpadded
        local cell coordinates. Returns (phi_ext, heat_ext) with Gamma
        accumulated into the same extended frame; the caller folds the
        halos back (``_fold_padding`` / ``halo_reduce``)."""
        g = self.geom
        nhi_pad = nhi_ext
        phi_pad0 = jnp.zeros(nhi_pad.shape, dtype=self.dtype)
        heat_pad0 = jnp.zeros(nhi_pad.shape, dtype=self.dtype) \
            if self.do_heating else jnp.zeros((1,), dtype=self.dtype)

        def batch_step(b, carry):
            phi_pad, heat_pad = carry
            z32 = jnp.zeros((), jnp.int32)
            pos = lax.dynamic_slice(
                pos_b, (b.astype(jnp.int32), z32, z32),
                (1,) + pos_b.shape[1:])[0]
            flux = lax.dynamic_slice(
                flux_b, (b.astype(jnp.int32), z32),
                (1,) + flux_b.shape[1:])[0]
            boxes = self._extract_boxes(nhi_pad, pos)
            if self.use_pallas and self.fuse_rates and not self.do_heating:
                gamma_nf = self._sweep_pallas(tb, boxes, dr, fuse_rates=True)
                phi_box = gamma_nf * flux[:, None, None, None]
                src_phi = self._source_cell_rate(boxes, flux, dr)
                phi_box = phi_box.at[:, g.c, g.c, g.c].set(src_phi)
                heat_box = None
            elif self.use_pallas:
                cd = self._sweep_pallas(tb, boxes, dr)
                phi_box, heat_box = self._rates(tb, cd, boxes, flux, dr)
            else:
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
            return (phi_pad, heat_pad)

        phi_pad, heat_pad = lax.fori_loop(
            0, pos_b.shape[0], batch_step, (phi_pad0, heat_pad0))
        return phi_pad, (heat_pad if self.do_heating else None)

    def _trace_impl(self, tb, ndens3, xh3, pos_b, flux_b, dr):
        g = self.geom
        padL = g.c
        padR = g.Dc - 1 - g.c
        nhi3 = ndens3 * (1.0 - xh3)
        nhi_pad = jnp.pad(nhi3, ((padL, padR),) * 3, mode="wrap")
        phi_pad, heat_pad = self.trace_extended(tb, nhi_pad, pos_b,
                                                flux_b, dr)
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
