"""Monolithic Pallas TPU kernels for the Chebyshev-face sweep.

The XLA formulation of the sweep (raytrace_cheb._sweep) is bandwidth-bound
on plane traffic: every one of the ~3*r_max face substeps streams ~25
plane-sized buffers through HBM. These kernels keep the shell state in
VMEM scratch that persists across a sequential grid over shells; the
Pallas pipeline (BlockSpec index maps) streams in exactly one geometry
slice and two nhi planes per face per shell, double-buffered — the
irreducible traffic.

Lane packing: a face PAIR (the - and + faces of one axis) is stored as a
single (B, Dc, 2*Dc) plane with the sign packed into the LANE dimension
(lane = sign*Dc + b). With Dc = 64 that makes the minor dim 128 = exactly
one f32 vreg width, doubling VPU utilization vs the (B, 2, Dc, Dc)
layout whose 64-lane minor dim wastes half of every register. The +-1
b-shifts become full-lane rolls whose wrap/seam lanes are never selected
(a cell at b=0 always takes the b+1 branch, b=Dc-1 the b-1 branch), and
the sign dimension of the cross-face stitches becomes a static half-lane
select plus a roll by Dc (which swaps the halves).

Multi-source lane packing (G > 1): at small radii the face pair is much
narrower than a vreg ((24, 48) planes fill 37% of each (8, 128) f32
register at R <= 10), so G sources of the batch share one plane with the
SIGN-MAJOR lane layout  lane = sign*(G*Dc) + g*Dc + b  and the batch dim
shrunk to B/G. Sign-major keeps every property of the single-source
layout: the +-1 b-rolls only cross g-segment seams at b = 0 / b = Dc-1
lanes that are never selected (same argument as the sign seam), the
sign swap stays ONE roll by half the lane dim (G*Dc), and the nhi plane
is still concat(lo, hi) of two pre-packed inputs. Only the cross-face
line stitches become per-(g) masked patches (statically unrolled, G is
2-4). Geometry channels are replicated per g segment host-side.

Two kernels share the shell-update logic (_shell_update; formulation
identical to raytrace_cheb._sweep — same dependency DAG as the reference
ASORA/Fortran traversals):

* cheb_sweep_pallas — emits the three face STACKS (R1, B, Dc, 2*Dc) of
  coldensh_out (or, with fused bins, flux-less Gamma) for the XLA fold.
* cheb_sweep_rates_pallas — additionally ASSEMBLES the cartesian box in
  VMEM during the shell loop (x faces: dynamic dim-1 stores; y faces:
  dynamic SUBLANE stores; z faces: a k-leading scratch transposed per
  plane with an identity matmul on the MXU) and then evaluates the
  spectral-bin rate pass per canonical box plane in a second grid phase,
  emitting the phi (and heat) box directly. This removes the XLA fold
  (flip/transpose/concat materializations), the stack relayout copies,
  and the strided rate-pass reads in one kernel.

Cross-face stitching uses masked selects/reductions (no dynamic LANE
indexing, no in-kernel DMAs — both crash the Mosaic compiler on this
stack; dynamic SUBLANE indexing was probed and works).

Geometry is packed host-side as geom[3, R1, 8, Dc, 2*Dc] float:
channels = (s1..s4, path, diag, mask, dist2); the per-sign masks live in
the two lane halves of the single mask channel.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cheb_sweep_pallas", "cheb_sweep_seg_pallas",
           "cheb_sweep_rates_pallas", "pack_geometry",
           "pack_rates_tables"]


def pack_geometry(g, dtype=np.float32, G=1):
    """ChebGeometry -> packed geom[3, R1, 8, Dc, 2*G*Dc] array.

    Channels: s1..s4, path, diag, mask (minus half | plus half), dist2.
    Geometry is mirror-symmetric so all channels except the mask are the
    same in both lane halves. With G > 1 (multi-source lane packing) the
    geometry is identical for every source, so each channel is simply
    replicated into the G per-source segments of each sign half."""
    R1 = g.r_max + 1
    Dc, c = g.Dc, g.c
    GD = G * Dc
    out = np.zeros((3, R1, 8, Dc, 2 * GD), dtype=dtype)
    sw = np.transpose(g.sw, (0, 2, 1, 3, 4))          # (3, R1, 4, Dc, Dc)
    segs_m = [slice(gi * Dc, (gi + 1) * Dc) for gi in range(G)]
    segs_p = [slice(GD + gi * Dc, GD + (gi + 1) * Dc) for gi in range(G)]
    for seg in segs_m + segs_p:
        out[:, :, 0:4, :, seg] = sw
        out[:, :, 4, :, seg] = g.path
        out[:, :, 5, :, seg] = g.diag
    for seg in segs_m:
        out[:, :, 6, :, seg] = g.mask_m
    for seg in segs_p:
        out[:, :, 6, :, seg] = g.mask_p
    for r in range(R1):
        ihi = min(c + r, Dc - 1)
        for f, d2 in enumerate((g.dist2[ihi, :, :], g.dist2[:, ihi, :],
                                g.dist2[:, :, ihi])):
            for seg in segs_m + segs_p:
                out[f, r, 7, :, seg] = d2
    return out


def pack_rates_tables(g, R2, dtype=np.float32):
    """Per-box-plane tables for the fused rate phase:
    (Dc, 2, Dc, Dc) with channels (dist2, valid). valid excludes the
    source cell (its rate has a dedicated closed form applied by the
    caller) and applies the octahedron/clip mask and the Euclidean
    R_max_LLS cutoff (raytracing.f90:474, rates masked identically to
    raytrace_cheb._rates)."""
    Dc, c = g.Dc, g.c
    out = np.zeros((Dc, 2, Dc, Dc), dtype=dtype)
    valid = np.asarray(g.rate_valid) & (np.asarray(g.dist2) <= R2)
    valid[c, c, c] = False
    out[:, 0] = g.dist2
    out[:, 1] = valid
    return out


def _plane_ops(Dc, c, G=1):
    """Shared lane/sublane helpers over (B, Dc, 2*G*Dc) planes
    (lane = sign*(G*Dc) + g*Dc + b; G = 1 is the single-source layout)."""
    GD = G * Dc
    D2 = 2 * GD
    lane = jax.lax.broadcasted_iota(jnp.int32, (Dc, D2), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (Dc, D2), 0)
    b_idx = lane % Dc
    a_up = (subl >= c)[None]
    b_up = (b_idx >= c)[None]

    class Ops:
        pass

    ops = Ops()
    ops.lane = lane
    ops.subl = subl

    def sa(P):
        # pltpu.roll requires non-negative shifts; Dc-1 == roll by -1.
        # Sublane-axis shift; wrap rows are never selected (a=0 takes the
        # a+1 branch, a=Dc-1 the a-1 branch).
        # static python-int shifts so x64 mode cannot promote the shift
        # operand to i64 (tpu.dynamic_rotate requires i32)
        return jnp.where(a_up, pltpu.roll(P, np.int32(1), 1),
                         pltpu.roll(P, np.int32(Dc - 1), 1))

    def sb(P):
        # full-lane roll; the seam lanes (b=0 of one segment reading
        # b=Dc-1 of the previous — sign OR g boundary) are never
        # selected for the same reason.
        return jnp.where(b_up, pltpu.roll(P, np.int32(1), 2),
                         pltpu.roll(P, np.int32(D2 - 1), 2))

    def swap(line):
        # (B, 2*G*Dc) line: exchange the sign halves (the g segments
        # inside each half stay aligned — the roll is by half the dim)
        return pltpu.roll(line, np.int32(GD), 1)

    def row_of(P, apos):
        """(B, 2*G*Dc) line of the plane at sublane a = apos."""
        return jnp.sum(jnp.where(subl[None] == apos, P, 0.0), axis=1)

    def col_of(P, lpos):
        """(B, Dc) line of the plane at lane = lpos (one segment)."""
        return jnp.sum(jnp.where(lane[None] == lpos, P, 0.0), axis=2)

    def put_row(P, apos, row, ok):
        m = (subl[None] == apos) & ok
        return jnp.where(m, row[:, None, :], P)

    def put_lane(P, lpos, col, ok):
        m = (lane[None] == lpos) & ok
        return jnp.where(m, col[:, :, None], P)

    def seg(line, sign, gi):
        """(B, Dc) slice of a line at segment (sign, g)."""
        return line[:, sign * GD + gi * Dc: sign * GD + (gi + 1) * Dc]

    def put_lane_seg(P, sign_t, bpos, cols, ok=True):
        """Set lane (sign_t, g, bpos) <- cols[g] for every g segment
        (cols: G sublane-columns of shape (B, Dc))."""
        for gi in range(G):
            P = put_lane(P, sign_t * GD + gi * Dc + bpos, cols[gi], ok)
        return P

    def cols_of(Q, sign_s, bpos):
        """Per-g sublane-columns of Q at lane (sign_s, g, bpos)."""
        return [col_of(Q, sign_s * GD + gi * Dc + bpos)
                for gi in range(G)]

    ops.GD = GD
    ops.sa, ops.sb, ops.swap = sa, sb, swap
    ops.row_of, ops.col_of = row_of, col_of
    ops.put_row, ops.put_lane = put_row, put_lane
    ops.seg, ops.put_lane_seg, ops.cols_of = seg, put_lane_seg, cols_of
    return ops


def _face_update(ops, geom_ref, nlo_ref, nhi_ref, P, dr, sig, lim):
    """Interpolate the stencil plane P and advance one face pair.

    Returns (gb, cdin, dcol, mask, new, nhi) where new = masked
    coldensh_out (the value entering the shell state), cdin/dcol are
    unmasked."""
    gb = geom_ref[0]
    nhi = jnp.concatenate([nlo_ref[0], nhi_ref[0]], axis=-1)
    Pa = ops.sa(P)
    Pb = ops.sb(P)
    Pab = ops.sb(Pa)
    w1 = gb[0][None] / jnp.maximum(lim, Pab * sig)
    w2 = gb[1][None] / jnp.maximum(lim, Pb * sig)
    w3 = gb[2][None] / jnp.maximum(lim, Pa * sig)
    w4 = gb[3][None] / jnp.maximum(lim, P * sig)
    cdin = gb[5][None] \
        * (Pab * w1 + Pb * w2 + Pa * w3 + P * w4) \
        / (w1 + w2 + w3 + w4)
    dcol = nhi * (gb[4][None] * dr)
    mask = gb[6][None] > 0.5
    new = jnp.where(mask, cdin + dcol, 0.0)
    return gb, cdin, dcol, mask, new, nhi


def _shell_update(r, c, Dc, ops, dr, sig, lim,
                  gx_ref, gy_ref, gz_ref,
                  nx_lo, nx_hi, ny_lo, ny_hi, nz_lo, nz_hi,
                  Xp_v, Yp_v, Zp_v):
    """One shell of the Chebyshev-face traversal (three face sub-steps
    with cross-face line stitching). Takes the r-1 shell planes as
    VALUES, returns per-face (gb, cdin, dcol, mask, new)."""
    alo = c - r + 1
    ahi = c + r - 1
    ok_lo = (c - r) >= 0
    ok_hi = (c + r) <= Dc - 1
    GD = ops.GD
    G = GD // Dc
    lane0 = ops.lane[0]
    put_row, put_lane_seg = ops.put_row, ops.put_lane_seg
    row_of, cols_of, swap, seg = ops.row_of, ops.cols_of, ops.swap, ops.seg

    def segs(line, sign):
        return [seg(line, sign, gi) for gi in range(G)]

    # ---- x faces (plane (j, sign x k)); stencil from X/Y/Z[r-1]
    P = Xp_v
    yl = row_of(Yp_v, alo)     # [Y-(alo,k) | Y+(alo,k)] (per g segment)
    yh = row_of(Yp_v, ahi)
    P = put_row(P, alo, jnp.where(lane0 < GD, yl, swap(yh)), True)
    P = put_row(P, ahi, jnp.where(lane0 < GD, swap(yl), yh), True)
    zl = row_of(Zp_v, alo)     # [Z-(alo,j) | Z+(alo,j)]
    zh = row_of(Zp_v, ahi)
    P = put_lane_seg(P, 0, alo, segs(zl, 0))      # X- k=alo <- Z-(alo)
    P = put_lane_seg(P, 1, alo, segs(zh, 0))      # X+ k=alo <- Z-(ahi)
    P = put_lane_seg(P, 0, ahi, segs(zl, 1))      # X- k=ahi <- Z+(alo)
    P = put_lane_seg(P, 1, ahi, segs(zh, 1))      # X+ k=ahi <- Z+(ahi)
    fx = _face_update(ops, gx_ref, nx_lo, nx_hi, P, dr, sig, lim)
    Xn = fx[4]

    # ---- y faces (plane (i, sign x k)); stencil Y[r-1]+Z[r-1]+X[r]
    P = Yp_v
    P = put_lane_seg(P, 0, alo, cols_of(Zp_v, 0, alo))  # Y- k=alo <- Z-(j=alo)
    P = put_lane_seg(P, 1, alo, cols_of(Zp_v, 0, ahi))  # Y+ k=alo <- Z-(j=ahi)
    P = put_lane_seg(P, 0, ahi, cols_of(Zp_v, 1, alo))  # Y- k=ahi <- Z+(j=alo)
    P = put_lane_seg(P, 1, ahi, cols_of(Zp_v, 1, ahi))  # Y+ k=ahi <- Z+(j=ahi)
    xl = row_of(Xn, alo)          # [X-(alo,k) | X+(alo,k)]
    xh2 = row_of(Xn, ahi)
    P = put_row(P, c - r, jnp.where(lane0 < GD, xl, swap(xh2)), ok_lo)
    P = put_row(P, c + r, jnp.where(lane0 < GD, swap(xl), xh2), ok_hi)
    fy = _face_update(ops, gy_ref, ny_lo, ny_hi, P, dr, sig, lim)
    Yn = fy[4]

    # ---- z faces (plane (i, sign x j)); stencil Z[r-1]+X[r]+Y[r]
    P = Zp_v
    row_ilo = jnp.concatenate(cols_of(Xn, 0, alo) + cols_of(Xn, 0, ahi),
                              axis=-1)          # X-(k=alo)|X-(k=ahi) over j
    row_ihi = jnp.concatenate(cols_of(Xn, 1, alo) + cols_of(Xn, 1, ahi),
                              axis=-1)
    P = put_row(P, c - r, row_ilo, ok_lo)
    P = put_row(P, c + r, row_ihi, ok_hi)
    P = put_lane_seg(P, 0, c - r, cols_of(Yn, 0, alo), ok_lo)  # Z- j=c-r <- Y-(k=alo)
    P = put_lane_seg(P, 1, c - r, cols_of(Yn, 0, ahi), ok_lo)  # Z+ j=c-r <- Y-(k=ahi)
    P = put_lane_seg(P, 0, c + r, cols_of(Yn, 1, alo), ok_hi)  # Z- j=c+r <- Y+(k=alo)
    P = put_lane_seg(P, 1, c + r, cols_of(Yn, 1, ahi), ok_hi)  # Z+ j=c+r <- Y+(k=ahi)
    fz = _face_update(ops, gz_ref, nz_lo, nz_hi, P, dr, sig, lim)

    return fx, fy, fz


def _nexpm1(x):
    # -(expm1(-x)) for x >= 0; Mosaic has no expm1 primitive.
    # Taylor for x < 0.1 (rel err < 2e-8), else 1 - exp(-x)
    # (cancellation-free there since exp(-x) <= 0.905).
    small = x * (1.0 - x * (0.5 - x * (
        (1.0 / 6.0) - x * ((1.0 / 24.0) - x / 120.0))))
    return jnp.where(x < 0.1, small, 1.0 - jnp.exp(-x))


def _kernel(dr_ref, init_ref,
            gx_ref, gy_ref, gz_ref,
            nx_lo, nx_hi, ny_lo, ny_hi, nz_lo, nz_hi,
            xs_ref, ys_ref, zs_ref,
            Xp, Yp, Zp,
            *, B, Dc, c, sig, bins, R2, G=1):
    f32 = Xp.dtype
    r = pl.program_id(0)
    dr = dr_ref[0, 0]
    ops = _plane_ops(Dc, c, G)

    @pl.when(r == 0)
    def _():
        init = init_ref[...]
        Xp[...] = init
        Yp[...] = init
        Zp[...] = init
        xs_ref[...] = init[:, None]
        ys_ref[...] = init[:, None]
        zs_ref[...] = init[:, None]

    @pl.when(r > 0)
    def _():
        lim = jnp.asarray(0.6, f32)
        faces = _shell_update(r, c, Dc, ops, dr, sig, lim,
                              gx_ref, gy_ref, gz_ref,
                              nx_lo, nx_hi, ny_lo, ny_hi, nz_lo, nz_hi,
                              Xp[...], Yp[...], Zp[...])
        for (gb, cdin, dcol, mask, new, nhi), out_ref in zip(
                faces, (xs_ref, ys_ref, zs_ref)):
            if bins is None:
                out_ref[...] = new[:, None]
                continue
            # fused spectral-bin rate pass: Gamma (without the per-source
            # flux factor, applied outside) = S*/(dr^3 4 pi d^2 path nHI)
            # * sum_e w_e exp(-tau_in s_e) (-expm1(-dtau s_e))
            tau_in = cdin * sig
            dtau = dcol * sig
            acc = jnp.zeros_like(cdin)
            for s_e, w_e in bins:
                acc = acc + w_e * (jnp.exp(-tau_in * s_e)
                                   * _nexpm1(dtau * s_e))
            s_over_dr3 = jnp.exp(
                jnp.asarray(110.52408446371419, f32) - 3.0 * jnp.log(dr))
            d2 = gb[7][None]
            pref = s_over_dr3 / (d2 * gb[4][None]
                                 * 12.566370614359172)
            rmask = mask & (d2 <= R2) & (cdin <= 2.0e30)
            phi = jnp.where(rmask, pref * acc / nhi, 0.0)
            out_ref[...] = phi[:, None]
        Xp[...] = faces[0][4]
        Yp[...] = faces[1][4]
        Zp[...] = faces[2][4]


@functools.partial(jax.jit,
                   static_argnames=("B", "Dc", "R1", "c", "sig", "bins",
                                    "R2", "G", "interpret"))
def cheb_sweep_pallas(geom, nhi_x, nhi_y, nhi_z, dr, init_plane,
                      B, Dc, R1, c, sig, bins=None, R2=0.0, G=1,
                      interpret=False):
    """Run the sweep kernel over a sequential shell grid.

    geom: 3-tuple of (R1, 8, Dc, 2*G*Dc) per-face tables (pre-split so no
    per-call slice of a stacked array lands inside a caller's batch loop);
    nhi_{x,y,z}: (Dc, Bg, Dc, G*Dc) face-leading (Bg = B // G, G sources
    packed into the lane dim as g-major segments);
    init_plane: (Bg, Dc, 2*G*Dc) sheet with each source cell set in both
    sign halves of its g segment. With bins=None returns column-density
    stacks; with bins a static tuple of (s_e, w_e) pairs, the rate pass
    is fused and the outputs are flux-less Gamma stacks (multiply by the
    per-source flux outside). Returns (X, Y, Z) stacks of shape
    (Bg, R1, Dc, 2*G*Dc) with (sign, g) packed in the lane dimension —
    BATCH-LEADING, the layout the fold consumes, so no (R1,B)->(B,R1)
    transpose copies materialize between the kernel and the fold
    (measured ~44 us/batch at the R=10 window config).
    """
    dt = nhi_x.dtype
    Bg = B // G
    GD = G * Dc
    kern = functools.partial(_kernel, B=Bg, Dc=Dc, c=c, sig=float(sig),
                             bins=bins, R2=float(R2), G=G)
    dr2d = jnp.asarray(dr, dt).reshape(1, 1)

    nspec_lo = pl.BlockSpec((1, Bg, Dc, GD),
                            lambda r: (jnp.maximum(c - r, 0), 0, 0, 0),
                            memory_space=pltpu.VMEM)
    nspec_hi = pl.BlockSpec((1, Bg, Dc, GD),
                            lambda r: (jnp.minimum(c + r, Dc - 1), 0, 0, 0),
                            memory_space=pltpu.VMEM)
    g4 = pl.BlockSpec((1, 8, Dc, 2 * GD), lambda r: (r, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((Bg, 1, Dc, 2 * GD), lambda r: (0, r, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((Bg, R1, Dc, 2 * GD), dt)] * 3

    return pl.pallas_call(
        kern,
        grid=(R1,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # dr
            pl.BlockSpec((Bg, Dc, 2 * GD), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # init plane
            g4, g4, g4,                                       # geometry
            nspec_lo, nspec_hi,                               # nhi_x planes
            nspec_lo, nspec_hi,                               # nhi_y planes
            nspec_lo, nspec_hi,                               # nhi_z planes
        ],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((Bg, Dc, 2 * GD), dt),
            pltpu.VMEM((Bg, Dc, 2 * GD), dt),
            pltpu.VMEM((Bg, Dc, 2 * GD), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dr2d, init_plane, geom[0], geom[1], geom[2],
      nhi_x, nhi_x, nhi_y, nhi_y, nhi_z, nhi_z)


def _kernel_seg(r0_ref, dr_ref, x0_ref, y0_ref, z0_ref,
                gx_ref, gy_ref, gz_ref,
                nx_lo, nx_hi, ny_lo, ny_hi, nz_lo, nz_hi,
                xs_ref, ys_ref, zs_ref, xf_ref, yf_ref, zf_ref,
                Xp, Yp, Zp,
                *, Dc, c, sig, G):
    """One SEGMENT of the shell sweep: S grid steps computing shells
    r = r0 + s from carried-in r0-1 planes; emits the segment's stacks
    plus the final shell planes (the next segment's carry)."""
    f32 = Xp.dtype
    s = pl.program_id(0)
    r = r0_ref[0] + s
    dr = dr_ref[0, 0]
    ops = _plane_ops(Dc, c, G)

    @pl.when(s == 0)
    def _():
        Xp[...] = x0_ref[...]
        Yp[...] = y0_ref[...]
        Zp[...] = z0_ref[...]

    lim = jnp.asarray(0.6, f32)
    faces = _shell_update(r, c, Dc, ops, dr, sig, lim,
                          gx_ref, gy_ref, gz_ref,
                          nx_lo, nx_hi, ny_lo, ny_hi, nz_lo, nz_hi,
                          Xp[...], Yp[...], Zp[...])
    for f, (out_ref, fin_ref) in zip(
            faces, ((xs_ref, xf_ref), (ys_ref, yf_ref), (zs_ref, zf_ref))):
        out_ref[...] = f[4][:, None]
        fin_ref[...] = f[4]
    Xp[...] = faces[0][4]
    Yp[...] = faces[1][4]
    Zp[...] = faces[2][4]


@functools.partial(jax.jit,
                   static_argnames=("B", "Dc", "S", "c", "sig", "G",
                                    "interpret"))
def cheb_sweep_seg_pallas(geom, nhi_x, nhi_y, nhi_z, dr, planes, r0,
                          B, Dc, S, c, sig, G=1, interpret=False):
    """One radius segment of the sweep (shells r0 .. r0+S-1).

    Memory-bounded variant of ``cheb_sweep_pallas`` for large R: the
    face stacks of a full R=100 sweep are O(R^3) HBM (~1.4 GB at 250^3)
    and the monolithic kernel ties compile cost to R1; here the shell
    grid is cut into K segments of S shells that all share ONE compiled
    kernel — the segment offset ``r0`` is a scalar-prefetch operand
    consumed by the BlockSpec index maps, so changing segments changes
    data, not code. ``planes`` carries the r0-1 shell state between
    segments (the first segment receives the source-cell init plane).
    ``geom`` must be zero-padded to >= r0_max + S shells (zero geometry
    rows have all-false masks, so overrun shells write zeros).

    Returns (X, Y, Z, xf, yf, zf): segment stacks (B//G, S, Dc, 2*G*Dc)
    and the final shell planes for the next segment's ``planes``."""
    dt = nhi_x.dtype
    Bg = B // G
    GD = G * Dc
    kern = functools.partial(_kernel_seg, Dc=Dc, c=c, sig=float(sig), G=G)
    dr2d = jnp.asarray(dr, dt).reshape(1, 1)
    r0a = jnp.asarray(r0, jnp.int32).reshape(1)

    def lo_map(s, r0_ref):
        return (jnp.maximum(c - (r0_ref[0] + s), 0), 0, 0, 0)

    def hi_map(s, r0_ref):
        return (jnp.minimum(c + r0_ref[0] + s, Dc - 1), 0, 0, 0)

    nspec_lo = pl.BlockSpec((1, Bg, Dc, GD), lo_map,
                            memory_space=pltpu.VMEM)
    nspec_hi = pl.BlockSpec((1, Bg, Dc, GD), hi_map,
                            memory_space=pltpu.VMEM)
    g4 = pl.BlockSpec((1, 8, Dc, 2 * GD),
                      lambda s, r0_ref: (r0_ref[0] + s, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((Bg, Dc, 2 * GD),
                              lambda s, r0_ref: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_stack = pl.BlockSpec((Bg, 1, Dc, 2 * GD),
                             lambda s, r0_ref: (0, s, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # dr
            plane_spec, plane_spec, plane_spec,               # carry in
            g4, g4, g4,                                       # geometry
            nspec_lo, nspec_hi,
            nspec_lo, nspec_hi,
            nspec_lo, nspec_hi,
        ],
        out_specs=[out_stack] * 3 + [plane_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((Bg, Dc, 2 * GD), dt),
            pltpu.VMEM((Bg, Dc, 2 * GD), dt),
            pltpu.VMEM((Bg, Dc, 2 * GD), dt),
        ],
    )
    out_shape = ([jax.ShapeDtypeStruct((Bg, S, Dc, 2 * GD), dt)] * 3
                 + [jax.ShapeDtypeStruct((Bg, Dc, 2 * GD), dt)] * 3)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r0a, dr2d, planes[0], planes[1], planes[2],
      geom[0], geom[1], geom[2],
      nhi_x, nhi_x, nhi_y, nhi_y, nhi_z, nhi_z)


def _kernel_fold_rates(dr_ref, init_ref, flux_ref,
                       gx_ref, gy_ref, gz_ref, rt_ref,
                       nx_lo, nx_hi, ny_lo, ny_hi, nz_lo, nz_hi,
                       *refs,
                       B, Dc, c, R1, sig, bins, heat_bins):
    """Sweep + in-VMEM box assembly + per-plane rates (grid R1 + Dc).

    Phase A (steps 0..R1-1): the shell sweep; each face's masked
    (cdin, dcol) planes are RMW-ADDED into box scratches. x faces land
    in the (B, i, j, k) boxes at dynamic dim-1 i = c+-r; y faces at
    dynamic SUBLANE j = c+-r; z faces in separate (B, i, k, j)-layout
    boxes at dynamic sublane k = c+-r (the lane dim must stay static).
    Face masks make the contributions disjoint, so add-assembly equals
    the XLA fold exactly.

    Phase B (steps R1..R1+Dc-1, plane i = step-R1): merge the z-oriented
    plane via an identity matmul on the MXU ((B,k,j) -> (B,j,k)), then
    evaluate the spectral-bin rates densely on the canonical plane and
    write phi[:, i] (and heat[:, i]). Using dcol directly, the
    photon-conserving 1/nHI and the geometric 1/path cancel:
    phi = flux * S* dr / (dr^3 4 pi d2) * acc / dcol."""
    if heat_bins is not None:
        out_phi, out_heat = refs[0], refs[1]
        scr = refs[2:]
    else:
        out_phi = refs[0]
        out_heat = None
        scr = refs[1:]
    Xp, Yp, Zp, ci1, dc1, ciz, dcz = scr
    f32 = Xp.dtype
    step = pl.program_id(0)
    dr = dr_ref[0, 0]
    ops = _plane_ops(Dc, c)

    @pl.when(step == 0)
    def _():
        init = init_ref[...]
        Xp[...] = init
        Yp[...] = init
        Zp[...] = init
        zero = jnp.zeros((B, Dc, Dc, Dc), f32)
        ci1[...] = zero
        dc1[...] = zero
        ciz[...] = zero
        dcz[...] = zero

    @pl.when((step > 0) & (step < R1))
    def _():
        r = step
        lim = jnp.asarray(0.6, f32)
        fx, fy, fz = _shell_update(r, c, Dc, ops, dr, sig, lim,
                                   gx_ref, gy_ref, gz_ref,
                                   nx_lo, nx_hi, ny_lo, ny_hi,
                                   nz_lo, nz_hi,
                                   Xp[...], Yp[...], Zp[...])

        def halves(v):
            return v[..., :Dc], v[..., Dc:]

        def assemble(face, box_ci, box_dc, axis):
            _, cdin, dcol, mask, _, _ = face
            ci_m = jnp.where(mask, cdin, 0.0)
            dc_m = jnp.where(mask, dcol, 0.0)
            ci_lo, ci_hi = halves(ci_m)
            dc_lo, dc_hi = halves(dc_m)
            for idx, civ, dcv in ((c - r, ci_lo, dc_lo),
                                  (c + r, ci_hi, dc_hi)):
                ok = (idx >= 0) & (idx <= Dc - 1)
                # negative/overflow shells only occur when the box is
                # clipped by the mesh; their mask channels are all-false
                # so the clamped write adds zeros.
                j = jnp.clip(idx, 0, Dc - 1)
                if axis == 1:
                    sl = (slice(None), pl.ds(j, 1), slice(None),
                          slice(None))
                    civ = civ[:, None, :, :]
                    dcv = dcv[:, None, :, :]
                else:
                    sl = (slice(None), slice(None), pl.ds(j, 1),
                          slice(None))
                    civ = civ[:, :, None, :]
                    dcv = dcv[:, :, None, :]
                keep = jnp.where(ok, 1.0, 0.0).astype(f32)
                box_ci[sl] = box_ci[sl] + civ * keep
                box_dc[sl] = box_dc[sl] + dcv * keep

        assemble(fx, ci1, dc1, axis=1)   # x: (B, i=c+-r, j, k)
        assemble(fy, ci1, dc1, axis=2)   # y: (B, i, j=c+-r, k) sublane
        assemble(fz, ciz, dcz, axis=2)   # z in (B, i, k=c+-r, j) sublane
        Xp[...] = fx[4]
        Yp[...] = fy[4]
        Zp[...] = fz[4]

    @pl.when(step >= R1)
    def _():
        i = step - R1
        eye = (jax.lax.broadcasted_iota(jnp.int32, (Dc, Dc), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (Dc, Dc), 1)) \
            .astype(f32)

        def plane(box1, boxz):
            p1 = box1[:, pl.ds(i, 1), :, :][:, 0]        # (B, j, k)
            pz = boxz[:, pl.ds(i, 1), :, :][:, 0]        # (B, k, j)
            # transpose (B,k,j) -> (B,j,k) on the MXU: out[b,j,k] =
            # sum_m pz[b,m,j] eye[m,k]
            pzt = jax.lax.dot_general(
                pz, eye, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)              # (B, j, k)
            return p1 + pzt

        cdin = plane(ci1, ciz)
        dcol = plane(dc1, dcz)
        tau_in = cdin * sig
        dtau = dcol * sig
        acc = jnp.zeros_like(cdin)
        acc_h = jnp.zeros_like(cdin) if heat_bins is not None else None
        for e, (s_e, w_e) in enumerate(bins):
            core = jnp.exp(-tau_in * s_e) * _nexpm1(dtau * s_e)
            acc = acc + w_e * core
            if heat_bins is not None:
                acc_h = acc_h + heat_bins[e][1] * core
        s_fac = jnp.exp(jnp.asarray(110.52408446371419, f32)
                        - 3.0 * jnp.log(dr)) * dr
        d2 = rt_ref[0, 0]
        valid = rt_ref[0, 1] > 0.5
        fl = flux_ref[...][:, 0]
        pref = fl[:, None, None] * s_fac \
            / (d2[None] * 12.566370614359172)
        rmask = valid[None] & (cdin <= 2.0e30)
        phi = jnp.where(rmask, pref * acc / dcol, 0.0)
        out_phi[...] = phi[:, None, :, :]
        if heat_bins is not None:
            heat = jnp.where(rmask, pref * acc_h / dcol, 0.0)
            out_heat[...] = heat[:, None, :, :]


@functools.partial(jax.jit,
                   static_argnames=("B", "Dc", "R1", "c", "sig", "bins",
                                    "heat_bins", "interpret"))
def cheb_sweep_rates_pallas(geom, rates_tab, nhi_x, nhi_y, nhi_z, dr,
                            init_plane, flux,
                            B, Dc, R1, c, sig, bins, heat_bins=None,
                            interpret=False):
    """Fused sweep + fold + rates kernel.

    Same sweep inputs as cheb_sweep_pallas plus rates_tab (the
    pack_rates_tables output) and flux (B,). bins is a static tuple of
    (s_e, w_e); heat_bins, when given, a static tuple of (s_e, w_heat_e)
    with the SAME s_e order. Returns the flux-included phi box
    (B, Dc, Dc, Dc) in canonical layout (and the heat box when
    heat_bins is given); the SOURCE CELL is zero — the caller applies
    its closed form (raytracing.cu:285-294)."""
    dt = nhi_x.dtype
    kern = functools.partial(_kernel_fold_rates, B=B, Dc=Dc, c=c, R1=R1,
                             sig=float(sig), bins=bins,
                             heat_bins=heat_bins)
    dr2d = jnp.asarray(dr, dt).reshape(1, 1)

    def shell(s):
        return jnp.minimum(s, R1 - 1)

    nspec_lo = pl.BlockSpec(
        (1, B, Dc, Dc),
        lambda s: (jnp.maximum(c - shell(s), 0), 0, 0, 0),
        memory_space=pltpu.VMEM)
    nspec_hi = pl.BlockSpec(
        (1, B, Dc, Dc),
        lambda s: (jnp.minimum(c + shell(s), Dc - 1), 0, 0, 0),
        memory_space=pltpu.VMEM)
    g4 = pl.BlockSpec((1, 8, Dc, 2 * Dc), lambda s: (shell(s), 0, 0, 0),
                      memory_space=pltpu.VMEM)
    rt_spec = pl.BlockSpec(
        (1, 2, Dc, Dc),
        lambda s: (jnp.clip(s - R1, 0, Dc - 1), 0, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (B, 1, Dc, Dc),
        lambda s: (0, jnp.clip(s - R1, 0, Dc - 1), 0, 0),
        memory_space=pltpu.VMEM)
    n_out = 2 if heat_bins is not None else 1
    out_shape = [jax.ShapeDtypeStruct((B, Dc, Dc, Dc), dt)] * n_out

    return pl.pallas_call(
        kern,
        grid=(R1 + Dc,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # dr
            pl.BlockSpec((B, Dc, 2 * Dc), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # init plane
            pl.BlockSpec((B, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # flux
            g4, g4, g4,                                       # geometry
            rt_spec,                                          # rates tab
            nspec_lo, nspec_hi,                               # nhi_x
            nspec_lo, nspec_hi,                               # nhi_y
            nspec_lo, nspec_hi,                               # nhi_z
        ],
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((B, Dc, 2 * Dc), dt),   # Xp
            pltpu.VMEM((B, Dc, 2 * Dc), dt),   # Yp
            pltpu.VMEM((B, Dc, 2 * Dc), dt),   # Zp
            pltpu.VMEM((B, Dc, Dc, Dc), dt),   # cdin box (x+y faces)
            pltpu.VMEM((B, Dc, Dc, Dc), dt),   # dcol box (x+y faces)
            pltpu.VMEM((B, Dc, Dc, Dc), dt),   # cdin box (z, (B,i,k,j))
            pltpu.VMEM((B, Dc, Dc, Dc), dt),   # dcol box (z, (B,i,k,j))
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(dr2d, init_plane, flux.reshape(B, 1), geom[0], geom[1], geom[2],
      rates_tab, nhi_x, nhi_x, nhi_y, nhi_y, nhi_z, nhi_z)
