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


def _morton_code(pos):
    """Interleave the low 10 bits of each axis (grids up to 1024^3).
    Spatially close sources get close codes, so sorted order packs
    tight accumulation windows."""
    code = np.zeros(len(pos), dtype=np.uint64)
    p = np.asarray(pos, dtype=np.uint64)
    for bit in range(10):
        for ax in range(3):
            code |= ((p[:, ax] >> np.uint64(bit)) & np.uint64(1)) \
                << np.uint64(3 * bit + ax)
    return code


@jax.tree_util.register_pytree_node_class
class PackedPositions:
    """Marker pytree for span-packed source batches.

    Produced ONLY by ChebRaytracer._prepare_sources_packed, which
    guarantees every batch's box-start bounding box spans at most
    W - Dc cells per axis. The trace path dispatches on this STRUCTURE
    (a host-level fact, part of the jit signature): wrapped positions
    take the one-window-RMW-per-batch accumulate, bare arrays always
    take the per-source scan — so arbitrary externally built batches
    (e.g. the parallel staging paths) remain correct with no
    data-dependent lax.cond, which would copy the full padded
    accumulator through the conditional every batch (measured
    ~335 us/batch at 250^3).

    ``span`` records the packing's per-axis bound as STATIC aux data
    (part of the jit signature, not a traced array): the trace derives
    its window from the engine's CURRENT tuner state, which a later
    ``prepare_sources`` on a denser catalog may have shrunk — without
    the recorded span, stale batches whose offsets exceed the new
    window would get all-zero one-hot placement rows and silently drop
    sources. With it, the trace falls back to the (always-correct)
    scan accumulate whenever the recorded span no longer fits.
    ``span=None`` (externally built batches) keeps today's behavior."""

    def __init__(self, pos, span=None):
        self.pos = pos
        self.span = None if span is None else int(span)

    def tree_flatten(self):
        return (self.pos,), self.span

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def _pack_lane_groups(n_t, Dc, Bg, G):
    """(Dc_face, B, Dc, Dc) face-leading nhi -> (Dc_face, Bg, Dc, G*Dc):
    the G sources of each group land in g-major lane segments
    (b = bg*G + g — the order _unseg_stacks unpacks)."""
    if G == 1:
        return n_t
    return n_t.reshape(Dc, Bg, G, Dc, Dc) \
              .transpose(0, 1, 3, 2, 4) \
              .reshape(Dc, Bg, Dc, G * Dc)


def _unseg_stacks(Sh, Dc, G):
    """One sign half of a kernel stack, (Bg, S, Dc, G*Dc) ->
    (Bg*G, S, Dc, Dc): inverse of the _pack_lane_groups grouping."""
    if G == 1:
        return Sh
    Bg, S = Sh.shape[0], Sh.shape[1]
    return Sh.reshape(Bg, S, Dc, G, Dc) \
             .transpose(0, 3, 1, 2, 4) \
             .reshape(Bg * G, S, Dc, Dc)


def _lane_init_plane(src_cd, Dc, c, Bg, G, dtype):
    """(B,) source column densities -> the kernel's (Bg, Dc, 2*G*Dc)
    init plane with each source cell set in both sign halves of its
    g segment."""
    GD = G * Dc
    ar = lax.broadcasted_iota(jnp.int32, (Dc, 2 * GD), 0)
    br = lax.broadcasted_iota(jnp.int32, (Dc, 2 * GD), 1)
    center = (ar == c) & (br % Dc == c)
    gmap = (np.arange(2 * GD) % GD) // Dc           # lane -> g (static)
    vals = src_cd.reshape(Bg, G)[:, gmap]           # (Bg, 2GD)
    return jnp.where(center[None], vals[:, None, :], 0.0).astype(dtype)


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
    rt_sub: object      # (3, Ds, Ds, Ds) rates-subbox tables, pre-cut
                        # AND stacked: channels (path3, geominv, valid)
                        # where geominv = 1/(4 pi dist2 path3) with the
                        # source cell set to 1 and valid folds the
                        # octahedron/clip mask AND the R_max_LLS cutoff.
                        # Pre-cut because slicing the full tables inside
                        # the batch loop shows up as un-hoisted per-batch
                        # copies; stacked + precombined because every
                        # separate table array cost its own per-batch
                        # relayout copy-start in the profile
    rt_tab: object      # (Dc, 2, Dc, Dc) per-plane (dist2, valid) for
                        # the fused fold+rates kernel
    bins_s: object
    bins_w: object
    bins_wh: object


class ChebRaytracer:
    """Batched multi-source raytracer, Chebyshev-face formulation.

    Drop-in alternative to ops.raytrace.Raytracer / raytrace_box
    (same trace() contract)."""

    def __init__(self, N, R_max_LLS, sig, bins: SpectralBins,
                 batch_size=8, dtype=jnp.float32, do_heating=False,
                 use_pallas=False, fuse_rates=False, accumulate="auto",
                 window_size=None, fuse_fold=False, shell_segment="auto"):
        self.N = int(N)
        self.R_max_LLS = float(R_max_LLS)
        self.sig = float(sig)
        self.batch_size = int(batch_size)
        self._batch_size0 = int(batch_size)   # configured base; the
        # catalog-adaptive tuner (_adapt_window) may raise batch_size to
        # a multiple of this per catalog-density regime
        self.dtype = dtype
        self.do_heating = bool(do_heating)
        self.use_pallas = bool(use_pallas)
        if accumulate not in ("auto", "scan", "window"):
            raise ValueError(
                f"Raytracing.accumulate must be one of 'auto', 'scan', "
                f"'window' (got {accumulate!r})")
        # Fusing the rate pass into the kernel PER SHELL is supported but
        # measured SLOWER (the stacks hold ~3x the box's cells, so fused
        # rates do 3x the exp work); default off.
        self.fuse_rates = bool(fuse_rates)
        # fuse_fold: the sweep kernel assembles the cd box in VMEM and
        # rates run per canonical box plane in a second grid phase —
        # replaces the XLA fold + stack relayouts + strided rate reads.
        # Measured SLOWER on v5e in both regimes (R=30: 2.58 vs 1.80
        # ns/cell; R=8: 19.5 vs 12.1) and degrading with B — the
        # dynamic-SUBLANE RMW stores of the y/z assembly traverse full
        # tiles. Kept as a validated experimental variant (checksums
        # match the production path on hardware); default off.
        self.fuse_fold = bool(fuse_fold) and use_pallas
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
        # static (s, w) pairs for the fused-rates Pallas kernels
        self._bins_static = tuple(
            (float(s), float(w)) for s, w in zip(bins.s, bins.w_photo))
        self._bins_heat_static = tuple(
            (float(s), float(w)) for s, w in zip(bins.s, bins.w_heat))
        # --- Gamma accumulation strategy ------------------------------
        # "scan": per-source dynamic_slice + dynamic_update_slice RMW on
        # the padded accumulator. On this stack each sequential DUS costs
        # a FIXED ~20 us regardless of window size (TPU_PERFORMANCE_NOTES
        # "small-box cost floor"), i.e. ~40-47 us/source — the dominant
        # cost of the production small-R regime (the reference's subbox
        # regime, raytracing.f90:183-226).
        # "window": sources are packed into spatially local batches
        # (prepare_sources), each batch's phi boxes are placed into one
        # shared (W,W,W) window via one-hot batched matmuls (MXU work,
        # no scatter), and the padded accumulator takes ONE RMW pair per
        # batch instead of per source. Batches not marked as span-packed
        # (bare arrays from the parallel staging paths) always take the
        # scan path — see PackedPositions.
        pad_full = self.N + g.Dc - 1     # single-device padded extent
        if window_size is not None:
            W = int(window_size)
        else:
            # span = 32 cells beyond the box: fill stays ~0.96 at the
            # R=10/1e5-source probe while the W^3-scaling placement
            # einsums shrink (W=56: 3.96 vs W=64: 4.15 vs W=48: 4.87
            # ns/cell — at W-Dc=24 the fill collapses to 0.75).
            # prepare_sources re-tunes this per catalog (_adapt_window):
            # at 1e6 sources B=32 packs into a ~8-cell span, and every
            # cell of window width costs W^3-scaling einsum+RMW volume.
            W = -(-(g.Dc + 32) // 8) * 8
        W = min(W, pad_full)
        W = max(W, g.Dc)
        self._auto_window = window_size is None
        if accumulate == "auto":
            # pays off when the box is small vs the window (per-source
            # placement cost ~ Dc*W^2 words streamed vs the fixed ~40 us
            # DUS pair). Measured on v5e at 250^3: R=8/Dc=24 1.27x,
            # R=12/Dc=32 1.14x, R=16/Dc=40 0.88x (fill-dependent) —
            # window wins through Dc = 32.
            accumulate = "window" if (g.Dc <= 32 and W - g.Dc >= 16) \
                else "scan"
        self.accumulate = accumulate
        self.window_W = W
        # One-hot placement/extraction einsum precision. One operand of
        # every product is an exact 0.0/1.0, so 3-pass bf16 (HIGH) is
        # f32-faithful: the one-hot splits as (b,0,0) and all dropped
        # cross terms are exactly zero; only the value operand's third
        # split piece can be dropped, a <= 2^-24 relative perturbation.
        # Measured vs HIGHEST on v5e: same checksums. Kept as an
        # attribute so experiments can flip it.
        self._oh_precision = lax.Precision.HIGH
        # Rates subbox: every rated cell (Euclidean dist <= R) lies in
        # the central (2 ceil(R)+1)^3 cube, which is strictly smaller
        # than the sublane-aligned sweep box Dc (17^3 of 24^3 at R=8 —
        # 2.8x fewer exp evaluations in the compute-bound rate pass).
        # Only worth it when the saving is real: marginal shrinks (e.g.
        # 61^3 of 64^3 at R=30) trade ~no exp work for odd-sized
        # slices/updates, measured CATASTROPHIC at the bench config
        # (1.8 -> 45 ns/cell).
        rs = int(np.ceil(min(float(R_max_LLS), float(N))))
        b0 = max(0, g.c - rs)
        b1 = min(g.Dc, g.c + rs + 1)
        if (b1 - b0) ** 3 > 0.7 * g.Dc ** 3:
            b0, b1 = 0, g.Dc
        self._rb0 = b0
        self._rb1 = b1
        self.Ds = b1 - b0
        # Multi-source lane packing: at small radii the kernel's
        # (Dc, 2*Dc) face-pair planes fill only 2*Dc/128 of each (8, 128)
        # f32 vreg (37% at Dc=24), so G = 64//Dc sources share one plane
        # (lane = sign*G*Dc + g*Dc + b) and the kernel batch dim shrinks
        # to B/G — same FLOPs in ~1/G the vector registers. Needs G | B;
        # the fused-fold kernel keeps the G=1 geometry layout.
        gp = max(1, 64 // g.Dc)
        while gp > 1 and (self.batch_size % gp or self.fuse_fold
                          or not self.use_pallas):
            gp //= 2
        self.lane_pack = gp
        # Shell segmentation bounds the face-stack memory in R (the
        # reference's device memory model is R-independent,
        # src/asora/memory.cu:58-78, while the stacks here grow as
        # O(B R^3)): large-R sweeps run as K segments of S shells
        # through ONE compiled kernel (the segment offset is a
        # scalar-prefetch operand — K segments change data, not code,
        # which matters on this stack's remote Mosaic compile service).
        # "auto" segments when the full stacks would exceed ~768 MB:
        # R=100/B=4 (419 MB) measured FASTER monolithic (1.02 vs the
        # segmented 1.67 ns/cell — 3 launches + carry + per-segment box
        # assembly cost ~0.65 ns), while the r04 OOM class (B=16 at
        # R=100: 1.7 GB) segments. Each segment's stacks are bounded at
        # ~192 MB. An int forces S; 0 disables.
        stack_bytes = (3 * self.batch_size * (g.r_max + 1) * g.Dc
                       * 2 * g.Dc * np.dtype(
                           np.float32 if dt == jnp.float32
                           else np.float64).itemsize)
        if shell_segment == "auto":
            seg_S = 0
            if self.use_pallas and stack_bytes > 768 * 1024 * 1024:
                per_shell = stack_bytes // (g.r_max + 1)
                seg_S = max(8, int((192 * 1024 * 1024) // per_shell))
        else:
            seg_S = int(shell_segment or 0)
        if seg_S >= g.r_max + 1:
            seg_S = 0
        self.seg_S = seg_S
        self.seg_K = -(-g.r_max // seg_S) if seg_S else 0
        if self.seg_S and (self.fuse_rates or self.fuse_fold):
            raise ValueError("shell segmentation does not compose with "
                             "fuse_rates/fuse_fold")
        from .pallas_sweep import pack_geometry, pack_rates_tables
        np_dt = np.float32 if dt == jnp.float32 else np.float64
        geom_np = pack_geometry(g, np_dt, G=self.lane_pack)
        if self.seg_S:
            # zero-pad the shell axis so every segment's geometry block
            # exists (rows past r_max have all-false masks -> overrun
            # shells write zeros)
            rp = self.seg_K * self.seg_S + 1
            pad = rp - geom_np.shape[1]
            if pad > 0:
                geom_np = np.pad(geom_np,
                                 ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        rt_np = pack_rates_tables(g, float(R_max_LLS) ** 2, np_dt)
        sub3 = (slice(self._rb0, self._rb1),) * 3
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
            rt_sub=jnp.asarray(self._build_rt_sub(np_dt), dt),
            rt_tab=jnp.asarray(rt_np),
            bins_s=jnp.asarray(bins.s, dt),
            bins_w=jnp.asarray(bins.w_photo, dt),
            bins_wh=jnp.asarray(bins.w_heat, dt))
        self._trace_jit = jax.jit(self._trace_impl)

    # ------------------------------------------------------------------
    def prepare_sources(self, src_pos, src_flux):
        B = self.batch_size
        if self.accumulate == "window":
            presorted = None
            if self._auto_window:
                presorted = self._adapt_window(src_pos)
            return self._prepare_sources_packed(src_pos, src_flux,
                                                presorted=presorted)
        ns = src_flux.shape[0]
        nb = -(-ns // B)
        pos = np.zeros((nb * B, 3), dtype=np.int32)
        flx = np.zeros((nb * B,), dtype=np.float64)
        pos[:ns] = np.asarray(src_pos, dtype=np.int32)
        flx[:ns] = np.asarray(src_flux, dtype=np.float64)
        return (jnp.asarray(pos.reshape(nb, B, 3)),
                jnp.asarray(flx.reshape(nb, B), dtype=self.dtype))

    def window_for_ext(self, dims):
        """Effective accumulation-window side for an extended frame of
        the given dims (None = the window path does not pay there).
        Both the packing and the trace derive W from the same static
        shapes, so they always agree."""
        if self.accumulate != "window":
            return None
        W = min(self.window_W, min(int(d) for d in dims))
        # span < 16 is pathological on v5e (see _adapt_window) — scan
        # beats a too-tight window there
        return W if W - self.geom.Dc >= 16 else None

    @staticmethod
    def _allowed_runs(p, B):
        """Rolling bbox spans over the next <= B Morton-ordered sources.

        Returns spans (ns, B) where spans[i, k] is the largest per-axis
        extent of positions i..i+k (positions past the end repeat the
        last row, which never grows the span incorrectly because counts
        are clipped to the remainder by the greedy walk)."""
        ns = len(p)
        p32 = np.ascontiguousarray(p, dtype=np.int32)
        pad = np.concatenate([p32, np.repeat(p32[-1:], B - 1, axis=0)], 0)
        out = np.empty((ns, B), dtype=np.int32)
        # chunked: the window view's running extrema are (rows, 3, B)
        # temps; bound them ~12 MB at any B
        step = max(1 << 12, min(1 << 17, (1 << 20) // max(B, 1) * 8))
        for i0 in range(0, ns, step):
            i1 = min(ns, i0 + step)
            win = np.lib.stride_tricks.sliding_window_view(
                pad[i0:i1 + B - 1], B, axis=0)
            hi = np.maximum.accumulate(win, axis=2)
            lo = np.minimum.accumulate(win, axis=2)
            out[i0:i1] = (hi - lo).max(axis=1)
        return out                                        # (ns, B)

    @staticmethod
    def _greedy_walk(spans, limit, B, ns):
        """Batch lengths of the greedy span-bounded packing: from i,
        take min(B, longest prefix with span <= limit, remainder)."""
        ok = spans <= limit                               # (ns, B)
        # spans[i, k] covers sources i..i+k; max length = first k with
        # span over limit. ok[:, 0] is always True (span of one source
        # is 0), so argmin == 0 means the whole row fits.
        first_bad = ok.argmin(axis=1)
        allowed = np.where(ok.all(axis=1), B, first_bad)
        sizes = []
        i = 0
        while i < ns:
            k = min(int(allowed[i]), ns - i)
            sizes.append(k)
            i += k
        return sizes

    # window-regime cost model (v5e-measured, r05 lane-packed kernel):
    # per batch, a fixed part (dispatch, window RMW pair, staging
    # ~ 41 us), a per-source part (sweep kernel + rates + fold
    # ~ 9.8 us/src at Dc=24) and a window part (placement/extraction
    # einsums scaling ~ (W/56)^3 ~ 150 us at W=56). Calibrated against
    # the R=10/Ns=1e6 B x W grid (scratch/r10_bw_sweep_r05.py: B=24/32/
    # 48/64 at W=40 -> 0.33/0.43/0.57/0.72 ms/batch). Used only to RANK
    # candidate (B, W) pairs.
    _WCOST_FIXED = 41.0
    _WCOST_SRC = 9.8
    _WCOST_W56 = 150.0

    def _adapt_window(self, src_pos):
        """Pick the (batch, window) pair that keeps the packing dense.

        The auto defaults are tuned for ~1e5-source catalogs; a denser
        catalog packs full batches into a much smaller span (every cell
        of W costs W^3-scaling einsum + RMW volume) and amortizes the
        per-batch fixed cost over a LARGER batch (B=64 measured 2.68 vs
        B=32's 3.22 ns/cell at the R=10/Ns=1e6 row — the lane-packed
        kernel moved the optimum up). Evaluates the real packing
        (cheap, host-side: one rolling-span pass at the largest
        candidate B, sliced per candidate) and keeps the cost-model
        argmin over B in {1,2,3,4} x B0 (capped at 96) and the three
        window spans {16, 24, 32} past the box. Changing (B, W) changes
        traced shapes, so at most one extra compile per catalog-density
        regime — cached thereafter."""
        pos = np.asarray(src_pos, dtype=np.int64).reshape(-1, 3)
        B0 = self._batch_size0
        ns = len(pos)
        if ns < 4 * B0:
            return None
        g = self.geom
        pad_full = self.N + g.Dc - 1
        order = np.argsort(_morton_code(pos), kind="stable")
        # cap 96: B=128 measured worse than 96 in every probe (2.77 vs
        # 2.48 fixed-config, 2.66 via the tuner at the 1e6 row) — fill
        # decay plus VMEM pressure outpace the fixed-cost amortization.
        # A configured B0 already past the cap keeps itself as the only
        # candidate (W-only tuning) rather than emptying the set.
        cand_B = [m * B0 for m in (1, 2, 3, 4)
                  if m * B0 <= 96 and m * B0 <= ns] or [B0]
        spans_max = self._allowed_runs(pos[order], max(cand_B))
        best = (np.inf, self.window_W, self.batch_size)
        for B in cand_B:
            spans = spans_max[:, :B]
            # dW = 8 (span 8) is EXCLUDED: measured pathological on v5e
            # even at perfect fill (B=64/W=32: 6.13 vs W=40's 2.68
            # ns/cell at the R=10/Ns=1e6 row; r04 saw the same cliff at
            # B=32) — the cost model must never be allowed to pick it.
            for dW in (16, 24, 32):
                Wc = min(-(-(g.Dc + dW) // 8) * 8, pad_full)
                if Wc - g.Dc < 16:
                    continue
                nb = len(self._greedy_walk(spans, Wc - g.Dc, B, ns))
                cost = nb * (self._WCOST_FIXED + self._WCOST_SRC * B
                             + self._WCOST_W56 * (Wc / 56.0) ** 3)
                if cost < best[0]:
                    best = (cost, Wc, B)
        self.window_W = best[1]
        self.batch_size = best[2]
        return order, spans_max[:, :best[2]]

    def _prepare_sources_packed(self, src_pos, src_flux, W=None,
                                allow_fallback=True, presorted=None):
        """Morton-sorted greedy packing into span-bounded batches.

        Every batch's box-start bounding box spans at most W - Dc cells
        per axis, so all of its (Dc,Dc,Dc) boxes fit in one (W,W,W)
        accumulation window. Padding sources get zero flux and sit at
        the batch's bbox minimum (inside the window by construction).
        ``W`` defaults to the engine's single-device window; callers
        staging for a smaller extended frame (domain decomposition) pass
        their window_for_ext."""
        pos = np.asarray(src_pos, dtype=np.int64).reshape(-1, 3)
        flx = np.asarray(src_flux, dtype=np.float64).reshape(-1)
        B = self.batch_size
        span = (self.window_W if W is None else int(W)) - self.geom.Dc
        if len(pos) == 0:
            return (PackedPositions(jnp.zeros((1, B, 3), jnp.int32),
                                    span=0),
                    jnp.zeros((1, B), dtype=self.dtype))
        ns = len(pos)
        if presorted is not None:
            order, spans = presorted
            ps = pos[order]
        else:
            order = np.argsort(_morton_code(pos), kind="stable")
            ps = pos[order]
            spans = self._allowed_runs(ps, B)
        fs = flx[order]
        sizes = np.asarray(self._greedy_walk(spans, span, B, ns))
        nb = len(sizes)
        # Fill guard: padded slots cost a full sweep each, so a sparse
        # catalog (windows holding only a couple of sources) loses more
        # to padding than the one-RMW-per-batch accumulate saves
        # (measured: R=10, 256^3, Ns=1e3 -> fill 0.24, 36 vs 17
        # ns/cell). Fall back to plain scan-path batches there.
        if allow_fallback and len(pos) < 0.5 * nb * B:
            nb_plain = -(-ns // B)
            pos_out = np.zeros((nb_plain * B, 3), dtype=np.int32)
            flx_out = np.zeros((nb_plain * B,), dtype=np.float64)
            pos_out[:ns] = pos
            flx_out[:ns] = flx
            return (jnp.asarray(pos_out.reshape(nb_plain, B, 3)),
                    jnp.asarray(flx_out.reshape(nb_plain, B),
                                dtype=self.dtype))
        # vectorized batch materialization: sorted sources are already
        # consecutive per batch, so gather rows by start + offset and
        # mask padding slots (position = batch bbox minimum, flux = 0)
        starts = np.concatenate([[0], np.cumsum(sizes[:-1])])
        ar = np.arange(B)[None, :]
        valid = ar < sizes[:, None]
        idx = np.minimum(starts[:, None] + ar, ns - 1)
        bmin = np.minimum.reduceat(ps, starts, axis=0)    # (nb, 3)
        pos_out = np.where(valid[..., None], ps[idx],
                           bmin[:, None, :]).astype(np.int32)
        flx_out = np.where(valid, fs[idx], 0.0)
        got_span = pos_out.max(axis=1) - pos_out.min(axis=1)
        assert got_span.max() <= span, \
            "internal: packed batch exceeds the window span"
        return (PackedPositions(jnp.asarray(pos_out), span=span),
                jnp.asarray(flx_out, dtype=self.dtype))


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
        """Fold the lane-packed (Bg, R1, Dc, 2*G*Dc) BATCH-LEADING face
        stacks from the Pallas kernel into the cartesian box
        (B, Dc, Dc, Dc). With multi-source lane packing (G > 1) the g
        segments of each sign half are first unpacked back into the
        batch dim (b = bg*G + g, matching the nhi packing).

        Pure static assembly (no per-shell loop): shell r's minus face is
        box plane c-r and its plus face c+r, so the whole stack maps to a
        contiguous plane range via one flip per sign — the kernel
        already emits the stacks batch-leading, so no (R1,B) transpose
        copies materialize here.

        (Negative result, kept for the record: expressing the fold as
        one-hot MATMULS over the shell axis — "rbjk,ri->bijk" per sign
        per face, flips absorbed into the one-hot — is exact but SLOWER
        on v5e: 4.10 vs 3.90 ns/cell at the R=10/1e5-source probe. The
        ~76 us/batch of layout copies around this assembly are cheaper
        than the 6 tiny-contraction einsums that replace them.)"""
        g = self.geom
        dt = self.dtype
        B = src_cd.shape[0]
        c, Dc, R1 = g.c, g.Dc, g.r_max + 1
        G = B // X.shape[0]
        GD = G * Dc

        def fold(S):
            Sm = _unseg_stacks(S[:, :, :, :GD], Dc, G)   # minus faces
            Sp = _unseg_stacks(S[:, :, :, GD:], Dc, G)
            n_dn = min(c, R1 - 1)
            n_up = min(Dc - 1 - c, R1 - 1)
            dn = jnp.flip(Sm[:, 1:n_dn + 1], 1)
            up = Sp[:, 1:n_up + 1]
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
        if self.seg_S and not fuse_rates:
            return self._sweep_pallas_segmented(tb, nhi_box, dr, sig=sig)
        g = self.geom
        B = nhi_box.shape[0]
        Dc, c = g.Dc, g.c
        G = self.lane_pack if B % self.lane_pack == 0 else 1
        Bg = B // G
        nx = _pack_lane_groups(jnp.transpose(nhi_box, (1, 0, 2, 3)),
                               Dc, Bg, G)
        ny = _pack_lane_groups(jnp.transpose(nhi_box, (2, 0, 1, 3)),
                               Dc, Bg, G)
        nz = _pack_lane_groups(jnp.transpose(nhi_box, (3, 0, 1, 2)),
                               Dc, Bg, G)
        src_cd = nhi_box[:, c, c, c] * (0.5 * dr)
        init_plane = _lane_init_plane(src_cd, Dc, c, Bg, G, self.dtype)
        X, Y, Z = cheb_sweep_pallas(
            (tb.geom_x, tb.geom_y, tb.geom_z), nx, ny, nz, dr, init_plane,
            B=B, Dc=Dc, R1=g.r_max + 1, c=c,
            sig=(self.sig if sig is None else float(sig)),
            bins=self._bins_static if fuse_rates else None,
            R2=self.R_max_LLS ** 2, G=G,
            interpret=self._pallas_interpret)
        center_val = jnp.zeros_like(src_cd) if fuse_rates else src_cd
        return self._fold_stacks_packed(X, Y, Z, center_val)

    def _sweep_pallas_segmented(self, tb, nhi_box, dr, sig=None):
        """Radius-segmented Pallas sweep for large R: the shell grid is
        cut into K segments of S shells (seg_S/seg_K, set in __init__),
        each run through the ONE compiled segment kernel with the
        previous segment's final planes as carry, and each segment's
        stacks folded into the cartesian box immediately — peak HBM is
        the box plus ONE segment's stacks, O(B Dc^3 + B S Dc^2), versus
        O(B R1 Dc^2) for the monolithic stacks (~1.4 GB at R=100 on
        250^3, which OOMed the r04 attempts; BENCH_SWEEP_r04
        "missing")."""
        from .pallas_sweep import cheb_sweep_seg_pallas
        g = self.geom
        B = nhi_box.shape[0]
        Dc, c = g.Dc, g.c
        G = self.lane_pack if B % self.lane_pack == 0 else 1
        Bg = B // G
        GD = G * Dc
        S, K = self.seg_S, self.seg_K
        dt = self.dtype
        nx = _pack_lane_groups(jnp.transpose(nhi_box, (1, 0, 2, 3)),
                               Dc, Bg, G)
        ny = _pack_lane_groups(jnp.transpose(nhi_box, (2, 0, 1, 3)),
                               Dc, Bg, G)
        nz = _pack_lane_groups(jnp.transpose(nhi_box, (3, 0, 1, 2)),
                               Dc, Bg, G)
        src_cd = nhi_box[:, c, c, c] * (0.5 * dr)
        init = _lane_init_plane(src_cd, Dc, c, Bg, G, dt)
        planes = (init, init, init)

        def add_planes(box, piece, lo, orient):
            n = piece.shape[1]
            if orient == 0:                       # x: planes along i
                return box.at[:, lo:lo + n, :, :].add(piece)
            if orient == 1:                       # y: (B, j, i, k)
                return box.at[:, :, lo:lo + n, :].add(
                    jnp.transpose(piece, (0, 2, 1, 3)))
            return box.at[:, :, :, lo:lo + n].add(  # z: (B, k, i, j)
                jnp.transpose(piece, (0, 2, 3, 1)))

        box = jnp.zeros((B, Dc, Dc, Dc), dt)
        for k in range(K):
            r0 = 1 + k * S
            out = cheb_sweep_seg_pallas(
                (tb.geom_x, tb.geom_y, tb.geom_z), nx, ny, nz, dr,
                planes, r0, B=B, Dc=Dc, S=S, c=c,
                sig=(self.sig if sig is None else float(sig)), G=G,
                interpret=self._pallas_interpret)
            planes = out[3:]
            for orient, St in enumerate(out[:3]):
                Sm = _unseg_stacks(St[..., :GD], Dc, G)
                Sp = _unseg_stacks(St[..., GD:], Dc, G)
                n_dn = int(np.clip(c - r0 + 1, 0, S))
                if n_dn > 0:
                    box = add_planes(box, jnp.flip(Sm[:, :n_dn], 1),
                                     c - r0 - n_dn + 1, orient)
                n_up = int(np.clip(Dc - c - r0, 0, S))
                if n_up > 0:
                    box = add_planes(box, Sp[:, :n_up], c + r0, orient)
        return box.at[:, c, c, c].set(src_cd)

    def _source_cell_rate(self, nhi_box, flux, dr, bins_static=None):
        """Gamma of the source cell itself (tau_in = 0, vol = dr^3;
        raytracing.cu:285-294). bins_static defaults to the photo
        weights; pass _bins_heat_static for the heating channel."""
        g = self.geom
        dt = self.dtype
        if bins_static is None:
            bins_static = self._bins_static
        nhi_src = nhi_box[:, g.c, g.c, g.c]
        dtau = nhi_src * (0.5 * dr) * jnp.asarray(self.sig, dt)
        acc = jnp.zeros_like(dtau)
        for s_e, w_e in bins_static:
            acc = acc + w_e * -jnp.expm1(-dtau * s_e)
        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        tiny = jnp.asarray(np.finfo(np.float32 if dt == jnp.float32
                                    else np.float64).tiny, dt)
        return flux * s_over_dr3 * acc / jnp.maximum(nhi_src, tiny)

    def _sweep_fold_rates(self, tb, nhi_box, flux, dr):
        """Fused sweep + in-VMEM fold + rates (pallas_sweep.
        cheb_sweep_rates_pallas): returns (phi_box, heat_box) full-box
        with the source cell filled by its closed form."""
        from .pallas_sweep import cheb_sweep_rates_pallas
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
        out = cheb_sweep_rates_pallas(
            (tb.geom_x, tb.geom_y, tb.geom_z), tb.rt_tab,
            nx, ny, nz, dr, init_plane, flux.astype(self.dtype),
            B=B, Dc=g.Dc, R1=g.r_max + 1, c=g.c, sig=self.sig,
            bins=self._bins_static,
            heat_bins=(self._bins_heat_static if self.do_heating
                       else None),
            interpret=self._pallas_interpret)
        phi_box = out[0]
        src_phi = self._source_cell_rate(nhi_box, flux, dr)
        phi_box = phi_box.at[:, g.c, g.c, g.c].set(src_phi)
        if self.do_heating:
            heat_box = out[1]
            src_heat = self._source_cell_rate(nhi_box, flux, dr,
                                              self._bins_heat_static)
            heat_box = heat_box.at[:, g.c, g.c, g.c].set(src_heat)
            return phi_box, heat_box
        return phi_box, None

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

    def _build_rt_sub(self, np_dt):
        """Host-side build of the stacked rates-subbox tables (see
        ChebTables.rt_sub): everything static in the rate pass —
        geometry factors and the full validity mask — is folded here so
        the per-batch fusion touches ONE constant array."""
        g = self.geom
        sub3 = (slice(self._rb0, self._rb1),) * 3
        path3 = np.asarray(g.path3[sub3], np.float64)
        dist2 = np.asarray(g.dist2[sub3], np.float64)
        valid = (np.asarray(g.rate_valid[sub3])
                 & (dist2 <= float(self.R_max_LLS) ** 2))
        cs = g.c - self._rb0
        with np.errstate(divide="ignore"):
            geominv = 1.0 / (dist2 * path3 * FOURPI)
        geominv[cs, cs, cs] = 1.0     # source cell: vol = dr^3, tau_in=0
        return np.stack([path3, geominv, valid]).astype(np_dt)

    # ------------------------------------------------------------------
    def _rates(self, tb, cd, nhi_box, flux, dr):
        """Dense spectral-bin rate pass over the central rates SUBBOX.

        Inputs are full (B, Dc, Dc, Dc) sweep boxes; rates are evaluated
        only on the (Ds, Ds, Ds) cube [rb0, rb1) per axis that contains
        every cell with dist <= R (the pass is exp-compute-bound, so
        shrinking the domain is a direct win over masking). Returns
        (phi, heat) of shape (B, Ds, Ds, Ds); callers accumulate them at
        box position + rb0."""
        dt = self.dtype
        sig = jnp.asarray(self.sig, dt)
        b0, b1 = self._rb0, self._rb1
        sub = (slice(None), slice(b0, b1), slice(b0, b1), slice(b0, b1))
        cd = cd[sub]
        nhi_box = nhi_box[sub]
        path3 = tb.rt_sub[0]
        geominv = tb.rt_sub[1]
        dcol = nhi_box * (path3[None] * dr)
        cdin = cd - dcol
        tau_in = cdin * sig
        dtau = dcol * sig

        s_over_dr3 = jnp.exp(jnp.asarray(np.log(S_STAR_REF), dt)
                             - 3.0 * jnp.log(dr))
        prefact = flux[:, None, None, None] * s_over_dr3 * geominv[None]

        acc = jnp.zeros_like(cd)
        acc_h = jnp.zeros_like(cd) if self.do_heating else None
        for e in range(self.num_bins):
            se = tb.bins_s[e]
            core = jnp.exp(-tau_in * se) * (-jnp.expm1(-dtau * se))
            acc = acc + tb.bins_w[e] * core
            if self.do_heating:
                acc_h = acc_h + tb.bins_wh[e] * core

        mask = ((tb.rt_sub[2] > 0.5)[None]
                & (cdin <= jnp.asarray(MAX_COLDENSH, dt)))
        # Guard the photon-conserving division: a zero-density cell
        # absorbs nothing (acc = 0), so Gamma-per-atom is 0, not 0/0.
        # The floor is the smallest normal float — a no-op for any
        # physical density — and matters because a NaN box cell would
        # contaminate the whole window in the matmul accumulate
        # (NaN * one-hot 0 = NaN). Zero-density cells DO occur: the
        # zero-padded interior halos under domain decomposition, swept
        # by zero-flux padding sources.
        tiny = jnp.asarray(np.finfo(np.float32 if dt == jnp.float32
                                    else np.float64).tiny, dt)
        nhi_safe = jnp.maximum(nhi_box, tiny)
        phi = jnp.where(mask, prefact * acc / nhi_safe, 0.0)
        heat = (jnp.where(mask, prefact * acc_h / nhi_safe, 0.0)
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

    def _axis_onehots(self, off, W, D=None):
        """Per-axis one-hot placement matrices (B, D, W):
        M[s, a, w] = 1 iff w == off[s, ax] + a. D defaults to the full
        sweep-box side Dc (pass Ds for the rates subbox)."""
        D = self.geom.Dc if D is None else D
        a2 = lax.broadcasted_iota(jnp.int32, (D, W), 0)
        w2 = lax.broadcasted_iota(jnp.int32, (D, W), 1)
        return tuple(
            ((off[:, ax, None, None] + a2[None]) == w2[None])
            .astype(self.dtype) for ax in range(3))

    def _place_boxes(self, boxes, oh):
        """Place B (Dc,Dc,Dc) boxes at integer offsets into one (W,W,W)
        window — scatter expressed as three one-hot batched matmuls so
        it runs on the MXU instead of the ~20 us/op sequential
        dynamic-update path. Each intermediate element has exactly one
        nonzero contribution (placement is injective per source), and
        Precision.HIGHEST keeps the one-hot products exact, so the
        result matches the scan path up to f32 summation order across
        sources and f32 denormal flushing in the matmul path (absolute
        error <= ~1.2e-38 per cell — only deep-attenuation cells with
        physically negligible rates are affected; TPU hardware flushes
        denormals everywhere anyway)."""
        hp = self._oh_precision
        t = jnp.einsum("sabc,scw->sabw", boxes, oh[2], precision=hp)
        t = jnp.einsum("sabw,sbv->savw", t, oh[1], precision=hp)
        return jnp.einsum("savw,sau->uvw", t, oh[0], precision=hp)

    def _extract_from_window(self, win, oh):
        """Gather B (Dc,Dc,Dc) boxes out of one (W,W,W) window — the
        transpose of _place_boxes, on the MXU. Each output element is
        exactly one window value times 1.0, so the extraction is exact
        (modulo f32 denormal flushing)."""
        hp = self._oh_precision
        t = jnp.einsum("sau,uvw->savw", oh[0], win, precision=hp)
        t = jnp.einsum("sbv,savw->sabw", oh[1], t, precision=hp)
        return jnp.einsum("scw,sabw->sabc", oh[2], t, precision=hp)

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
        packed = isinstance(pos_b, PackedPositions)
        span = None
        if packed:
            span = pos_b.span
            pos_b = pos_b.pos
        W = self.window_for_ext(nhi_pad.shape) if packed else None
        # batches packed under an earlier tuner state may exceed the
        # window the CURRENT state derives — the recorded (static)
        # span gates the window path; scan is always correct
        use_window = W is not None and (span is None
                                        or span <= W - self.geom.Dc)

        def batch_step(carry, xs):
            # lax.scan over batches: the per-batch (pos, flux) arrive as
            # scan xs (double-buffered by XLA) instead of per-iteration
            # dynamic_slice of the full batch arrays, which showed up in
            # profiles as ~58 us/batch of s32 index-staging copies.
            phi_pad, heat_pad = carry
            pos, flux = xs
            if use_window:
                hi = jnp.asarray([s - W for s in nhi_pad.shape], jnp.int32)
                origin = jnp.clip(jnp.min(pos, axis=0), 0, hi)
                off = pos - origin[None]
                oh = self._axis_onehots(off, W)
                o3 = (origin[0], origin[1], origin[2])
                boxes = self._extract_from_window(
                    lax.dynamic_slice(nhi_pad, o3, (W,) * 3), oh)
            else:
                boxes = self._extract_boxes(nhi_pad, pos)
            if self.use_pallas and self.fuse_fold:
                phi_box, heat_box = self._sweep_fold_rates(
                    tb, boxes, flux, dr)
            elif self.use_pallas and self.fuse_rates and not self.do_heating:
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

            # the rate pass returns the (Ds)^3 subbox; the fused-kernel
            # path returns the full (Dc)^3 box. Accumulate whichever at
            # box position + shift.
            D = phi_box.shape[-1]
            shift = self._rb0 if D == self.Ds else 0

            def accum(pad, boxes_v):
                def one(p_acc, xs2):
                    pv, box = xs2
                    p0 = (pv[0] + shift, pv[1] + shift, pv[2] + shift)
                    cur = lax.dynamic_slice(p_acc, p0, (D,) * 3)
                    return lax.dynamic_update_slice(
                        p_acc, cur + box, p0), None
                pad, _ = lax.scan(one, pad, (pos, boxes_v))
                return pad

            def scan_accum(phi_pad, heat_pad):
                phi_pad = accum(phi_pad, phi_box)
                if self.do_heating:
                    heat_pad = accum(heat_pad, heat_box)
                return phi_pad, heat_pad

            if not use_window:
                return scan_accum(phi_pad, heat_pad), None

            # window accumulate: one (W,W,W) RMW pair per BATCH instead
            # of per source, with the in-window placement on the MXU.
            # The span guarantee (every box fits the window) holds by
            # construction of the PackedPositions batches.
            oh_p = oh if (D == g.Dc and shift == 0) else \
                self._axis_onehots(off + shift, W, D)
            win = self._place_boxes(phi_box, oh_p)
            cur = lax.dynamic_slice(phi_pad, o3, (W,) * 3)
            phi_pad = lax.dynamic_update_slice(phi_pad, cur + win, o3)
            if self.do_heating:
                winh = self._place_boxes(heat_box, oh_p)
                curh = lax.dynamic_slice(heat_pad, o3, (W,) * 3)
                heat_pad = lax.dynamic_update_slice(
                    heat_pad, curh + winh, o3)
            return (phi_pad, heat_pad), None

        (phi_pad, heat_pad), _ = lax.scan(
            batch_step, (phi_pad0, heat_pad0), (pos_b, flux_b))
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
