"""Monolithic Pallas TPU kernel for the Chebyshev-face sweep.

The XLA formulation of the sweep (raytrace_cheb._sweep) is bandwidth-bound
on plane traffic: every one of the ~3*r_max face substeps streams ~25
plane-sized buffers through HBM (stencil planes, shifted copies, geometry,
masks, write-back). This kernel keeps the whole shell state in VMEM and
touches HBM only for (a) one geometry-slice DMA and two nhi-plane DMAs per
substep and (b) one output-plane DMA per substep — the irreducible traffic.

Formulation identical to raytrace_cheb._sweep (same dependency DAG as the
reference ASORA/Fortran traversals):

* three face stacks (x/y/z), shell-leading: out[f][r] = plane (B,2,Dc,Dc)
* stencil = previous parallel plane with +-1 shifts toward the source
* cross-face stitching via line patches, implemented here with masked
  selects/reductions (dynamic lane indexing is avoided entirely)

Geometry is packed host-side as geom[3, R1, 8, Dc, Dc] float:
channels = (s1, s2, s3, s4, path, diag, mask_minus, mask_plus).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cheb_sweep_pallas", "pack_geometry"]


def pack_geometry(g, dtype=np.float32):
    """ChebGeometry -> packed geom[3, R1, 8, Dc, Dc] array."""
    R1 = g.r_max + 1
    out = np.zeros((3, R1, 8, g.Dc, g.Dc), dtype=dtype)
    out[:, :, 0:4] = np.transpose(g.sw, (0, 2, 1, 3, 4))  # (3,4,R1,..)->(3,R1,4,..)
    out[:, :, 4] = g.path
    out[:, :, 5] = g.diag
    out[:, :, 6] = g.mask_m
    out[:, :, 7] = g.mask_p
    return out


def _kernel(dr_ref, geom_ref, nx_ref, ny_ref, nz_ref,
            xs_ref, ys_ref, zs_ref,
            Xp, Yp, Zp, Xn, Yn, Zn, nbuf, gbuf, sem,
            *, B, Dc, R1, c, sig):
    """Pallas kernel body.

    dr_ref: (1, 1) SMEM scalar.
    geom_ref: (3, R1, 8, Dc, Dc) HBM.
    n{x,y,z}_ref: (Dc, B, Dc, Dc) HBM — nhi pre-transposed face-leading.
    {x,y,z}s_ref: (R1, B, 2, Dc, Dc) HBM output stacks.
    Xp..Zn: (B, 2, Dc, Dc) VMEM scratch (prev/new planes).
    nbuf: (2, B, Dc, Dc) VMEM; gbuf: (8, Dc, Dc) VMEM; sem: DMA sems (4,).
    """
    f32 = Xp.dtype
    dr = dr_ref[0, 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (Dc, Dc), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (Dc, Dc), 0)
    a_up = (subl >= c)[None, None]
    b_up = (lane >= c)[None, None]

    def sa(P):
        # pltpu.roll requires non-negative shifts; Dc-1 == roll by -1
        return jnp.where(a_up, pltpu.roll(P, 1, 2),
                         pltpu.roll(P, Dc - 1, 2))

    def sb(P):
        return jnp.where(b_up, pltpu.roll(P, 1, 3),
                         pltpu.roll(P, Dc - 1, 3))

    def col_of(P, pos):
        """(B,2,Dc) column of P at lane index pos (masked reduce)."""
        m = (lane[None, None] == pos)
        return jnp.sum(jnp.where(m, P, 0.0), axis=3)

    def row_of(P, pos):
        m = (subl[None, None] == pos)
        return jnp.sum(jnp.where(m, P, 0.0), axis=2)

    def put_col(P, pos, col, ok):
        m = (lane[None, None] == pos) & ok
        return jnp.where(m, col[:, :, :, None], P)

    def put_row(P, pos, row, ok):
        m = (subl[None, None] == pos) & ok
        return jnp.where(m, row[:, :, None, :], P)

    # ---- init: zero prev planes, set the source cell ------------------
    # source column density: nhi at the center cell * dr/2
    cp = pltpu.make_async_copy(nx_ref.at[c], nbuf.at[0], sem.at[0])
    cp.start()
    cp.wait()
    src_cd = jnp.sum(jnp.where((subl == c) & (lane == c),
                               nbuf[0], 0.0), axis=(1, 2)) * (0.5 * dr)
    center = ((subl == c) & (lane == c))[None, None]
    init = jnp.broadcast_to(
        jnp.where(center, src_cd[:, None, None, None], 0.0),
        (B, 2, Dc, Dc))
    Xp[...] = init
    Yp[...] = init
    Zp[...] = init

    def shell(r, _):
        def face(f, nref, Pprev, Pnew, compose):
            # geometry slice (f, r)
            gcp = pltpu.make_async_copy(geom_ref.at[f, r], gbuf, sem.at[1])
            gcp.start()
            # nhi planes at c-r / c+r
            n1 = pltpu.make_async_copy(nref.at[c - r], nbuf.at[0], sem.at[2])
            n2 = pltpu.make_async_copy(nref.at[c + r], nbuf.at[1], sem.at[3])
            n1.start()
            n2.start()
            P = compose(Pprev[...])
            gcp.wait()
            n1.wait()
            n2.wait()
            nhi = jnp.stack([nbuf[0], nbuf[1]], axis=1)   # (B,2,Dc,Dc)
            Pa = sa(P)
            Pb = sb(P)
            Pab = sb(Pa)
            lim = jnp.asarray(0.6, f32)
            w1 = gbuf[0][None, None] / jnp.maximum(lim, Pab * sig)
            w2 = gbuf[1][None, None] / jnp.maximum(lim, Pb * sig)
            w3 = gbuf[2][None, None] / jnp.maximum(lim, Pa * sig)
            w4 = gbuf[3][None, None] / jnp.maximum(lim, P * sig)
            cdin = gbuf[5][None, None] \
                * (Pab * w1 + Pb * w2 + Pa * w3 + P * w4) \
                / (w1 + w2 + w3 + w4)
            cdout = cdin + nhi * (gbuf[4][None, None] * dr)
            mask = jnp.stack([gbuf[6], gbuf[7]])[None] > 0.5
            Pnew[...] = jnp.where(mask, cdout, 0.0)

        alo = c - r + 1
        ahi = c + r - 1
        ok_lo = (c - r) >= 0
        ok_hi = (c + r) <= Dc - 1

        # ---- x faces: stencil = Xp + rows j=+-(r-1) from Yp
        #                            + cols k=+-(r-1) from Zp
        def compose_x(P):
            yl = row_of(Yp[...], alo)      # (B, 2(y+-), Dc_k) at i=-(r-1)
            yh = row_of(Yp[...], ahi)
            P = put_row(P, alo, jnp.stack([yl[:, 0], yh[:, 0]], 1), True)
            P = put_row(P, ahi, jnp.stack([yl[:, 1], yh[:, 1]], 1), True)
            zl = row_of(Zp[...], alo)      # (B, 2(z+-), Dc_j) at i=-(r-1)
            zh = row_of(Zp[...], ahi)
            P = put_col(P, alo, jnp.stack([zl[:, 0], zh[:, 0]], 1), True)
            P = put_col(P, ahi, jnp.stack([zl[:, 1], zh[:, 1]], 1), True)
            return P
        face(0, nx_ref, Xp, Xn, compose_x)

        # ---- y faces: stencil = Yp + cols from Zp + rows i=+-r from Xn
        def compose_y(P):
            zcl = col_of(Zp[...], alo)     # (B, 2(z+-), Dc_i) at j=-(r-1)
            zch = col_of(Zp[...], ahi)
            P = put_col(P, alo, jnp.stack([zcl[:, 0], zch[:, 0]], 1), True)
            P = put_col(P, ahi, jnp.stack([zcl[:, 1], zch[:, 1]], 1), True)
            xl = row_of(Xn[...], alo)      # (B, 2(x+-), Dc_k) at j=-(r-1)
            xh2 = row_of(Xn[...], ahi)
            P = put_row(P, c - r, jnp.stack([xl[:, 0], xh2[:, 0]], 1), ok_lo)
            P = put_row(P, c + r, jnp.stack([xl[:, 1], xh2[:, 1]], 1), ok_hi)
            return P
        face(1, ny_ref, Yp, Yn, compose_y)

        # ---- z faces: stencil = Zp + rows i=+-r from Xn + cols j=+-r
        #      from Yn
        def compose_z(P):
            xcl = col_of(Xn[...], alo)     # (B, 2(x+-), Dc_j) at k=-(r-1)
            xch = col_of(Xn[...], ahi)
            P = put_row(P, c - r, jnp.stack([xcl[:, 0], xch[:, 0]], 1), ok_lo)
            P = put_row(P, c + r, jnp.stack([xcl[:, 1], xch[:, 1]], 1), ok_hi)
            ycl = col_of(Yn[...], alo)
            ych = col_of(Yn[...], ahi)
            P = put_col(P, c - r, jnp.stack([ycl[:, 0], ych[:, 0]], 1), ok_lo)
            P = put_col(P, c + r, jnp.stack([ycl[:, 1], ych[:, 1]], 1), ok_hi)
            return P
        face(2, nz_ref, Zp, Zn, compose_z)

        # write out the three new planes, then rotate prev <- new
        for S, ref in ((Xn, xs_ref), (Yn, ys_ref), (Zn, zs_ref)):
            out_cp = pltpu.make_async_copy(S, ref.at[r], sem.at[1])
            out_cp.start()
            out_cp.wait()
        Xp[...] = Xn[...]
        Yp[...] = Yn[...]
        Zp[...] = Zn[...]
        return 0

    jax.lax.fori_loop(1, R1, shell, 0)


@functools.partial(jax.jit,
                   static_argnames=("B", "Dc", "R1", "c", "sig", "interpret"))
def cheb_sweep_pallas(geom, nhi_x, nhi_y, nhi_z, dr,
                      B, Dc, R1, c, sig, interpret=False):
    """Run the sweep kernel.

    geom: (3, R1, 8, Dc, Dc); nhi_{x,y,z}: (Dc, B, Dc, Dc) face-leading;
    dr: scalar. Returns (X, Y, Z) stacks of shape (R1, B, 2, Dc, Dc).
    """
    dt = nhi_x.dtype
    kern = functools.partial(_kernel, B=B, Dc=Dc, R1=R1, c=c,
                             sig=float(sig))
    out_shape = [jax.ShapeDtypeStruct((R1, B, 2, Dc, Dc), dt)] * 3
    dr2d = jnp.asarray(dr, dt).reshape(1, 1)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        scratch_shapes=[
            pltpu.VMEM((B, 2, Dc, Dc), dt),   # Xp
            pltpu.VMEM((B, 2, Dc, Dc), dt),   # Yp
            pltpu.VMEM((B, 2, Dc, Dc), dt),   # Zp
            pltpu.VMEM((B, 2, Dc, Dc), dt),   # Xn
            pltpu.VMEM((B, 2, Dc, Dc), dt),   # Yn
            pltpu.VMEM((B, 2, Dc, Dc), dt),   # Zn
            pltpu.VMEM((2, B, Dc, Dc), dt),   # nhi planes
            pltpu.VMEM((8, Dc, Dc), dt),      # geometry slice
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(dr2d, geom, nhi_x, nhi_y, nhi_z)
