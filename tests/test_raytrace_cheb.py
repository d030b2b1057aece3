"""Chebyshev-face engine tests: must reproduce the oracle exactly (grey)
and the tables to bin-quadrature accuracy — same battery as the box
engine."""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.ops.raytrace_box import grey_bins
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.oracle import oracle_raytrace
from pyc2ray_tpu.constants import ev2fr

from test_raytrace import SIG, DR


def _mk(N, R, bins=None, batch=2, dtype=jnp.float64, heating=False):
    if bins is None:
        bins = grey_bins()
    return ChebRaytracer(N, R, SIG, bins, batch_size=batch, dtype=dtype,
                         do_heating=heating)


def test_cheb_grey_single_source_full_box():
    N = 8
    ndens = 1.5e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk(N, R=1e9)
    src = np.array([[3, 4, 2]])
    flux = np.array([7.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, 1e9,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=2e-7)


def test_cheb_grey_random_density_multi_source():
    N = 10
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    rt = _mk(N, R=1e9, batch=2)
    src = np.array([[0, 9, 5], [4, 4, 4], [9, 0, 0]])
    flux = np.array([1.0, 2.0, 0.5])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, 1e9,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=2e-7)


def test_cheb_small_radius_lls():
    N = 16
    R = 3.0
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    rt = _mk(N, R=R)
    src = np.array([[8, 8, 8], [1, 14, 3]])
    flux = np.array([1.0, 2.0])
    phi = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    phi_o, _, _ = oracle_raytrace(ndens, xh, src, flux, DR, SIG, R,
                                  grey=True)
    np.testing.assert_allclose(phi, phi_o, rtol=2e-7)


def test_cheb_blackbody_bins():
    from pyc2ray_tpu.radiation import make_tau_table
    N = 8
    ndens = 2e-3 * np.ones((N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))
    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    tau, dlogtau = make_tau_table(-20.0, 4.0, 2000)
    bb = BlackBodySource(5e4, False, fmin, 2.8)
    thin, thick = bb.make_photo_table(tau, fmin, fmax, 1e48)
    h_thin, h_thick = bb.make_heat_table(tau, fmin, fmax, 1e48)
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, fmax, panels=8, nodes=8)
    rt = _mk(N, R=1e9, bins=bins, heating=True)
    src = np.array([[4, 4, 4]])
    flux = np.array([10.0])
    phi, heat = rt.trace(ndens, xh, src, flux, DR)
    phi_o, heat_o, _ = oracle_raytrace(
        ndens, xh, src, flux, DR, SIG, 1e9,
        tables=(thin, thick, h_thin, h_thick, -20.0, dlogtau))
    np.testing.assert_allclose(np.asarray(phi), phi_o, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(heat), heat_o, rtol=1e-3)


def test_cheb_f32():
    N = 12
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    src = np.array([[6, 6, 6]])
    flux = np.array([5.0])
    phi64 = np.asarray(_mk(N, 1e9).trace(ndens, xh, src, flux, DR))
    phi32 = np.asarray(_mk(N, 1e9, dtype=jnp.float32).trace(
        ndens, xh, src, flux, DR))
    assert np.all(np.isfinite(phi32))
    rel = np.abs(phi32 - phi64) / np.maximum(np.abs(phi64), 1e-30)
    assert np.median(rel) < 1e-4
    assert np.percentile(rel, 99) < 1e-2


def test_cheb_pallas_sweep_matches():
    """The Pallas kernel (interpret mode on CPU) must reproduce the XLA
    engine through the full trace. The kernel fuses the rate pass, which
    reorders float ops vs the separate XLA rates, so agreement is to f32
    rounding (the un-fused kernel matched bitwise)."""
    N = 10
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = np.array([[0, 9, 5], [4, 4, 4]])
    flux = np.array([1.0, 2.0])
    rt_x = _mk(N, R=1e9, batch=2, dtype=jnp.float32)
    rt_p = ChebRaytracer(N, 1e9, SIG, grey_bins(), batch_size=2,
                         dtype=jnp.float32, use_pallas=True)
    phi_x = np.asarray(rt_x.trace(ndens, xh, src, flux, DR))
    phi_p = np.asarray(rt_p.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_p, phi_x, rtol=2e-5, atol=0)


# ---------------------------------------------------------------------
# window (packed one-hot-matmul) accumulate vs the per-source scan
# ---------------------------------------------------------------------

def test_window_accumulate_matches_scan():
    """The MXU window accumulate must reproduce the scan path. Diffs are
    bounded by f32 summation order across sources plus denormal flushing
    in the matmul path (absolute <= ~1.2e-38)."""
    rng = np.random.default_rng(0)
    N, R = 48, 9.0
    nd = 1e-3 * (1 + 0.5 * rng.random((N, N, N)))
    xh = 1e-4 * rng.random((N, N, N))
    pos = rng.integers(0, N, (60, 3))
    flux = 10 ** rng.uniform(-1, 2, 60)
    common = dict(batch_size=16, dtype=jnp.float32)
    e_scan = ChebRaytracer(N, R, SIG, grey_bins(), accumulate="scan",
                           **common)
    e_win = ChebRaytracer(N, R, SIG, grey_bins(), accumulate="window",
                          **common)
    assert e_win.accumulate == "window"
    p1 = np.asarray(e_scan.trace(nd, xh, pos, flux, DR))
    p2 = np.asarray(e_win.trace(nd, xh, pos, flux, DR))
    assert ((p1 != 0) == (p2 != 0)).all()
    big = np.abs(p1) > 1e-30
    rel = np.abs(p1 - p2)[big] / np.abs(p1)[big]
    assert rel.max() < 1e-5
    # denormal-flush bound everywhere else (up to ~#overlapping-sources
    # flushed contributions per cell)
    assert np.abs(p1 - p2)[~big].max() < 60 * 1.2e-38


def test_window_heating_channel():
    """Window placement of the heating boxes must match the scan path."""
    from pyc2ray_tpu.radiation import make_tau_table
    rng = np.random.default_rng(1)
    N, R = 32, 7.0
    fmin = ev2fr * 13.598
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, 10 * fmin * 4, panels=2, nodes=4)
    nd = 1e-3 * (1 + 0.5 * rng.random((N, N, N)))
    xh = 1e-4 * rng.random((N, N, N))
    pos = rng.integers(0, N, (30, 3))
    flux = 10 ** rng.uniform(-1, 1, 30)
    common = dict(batch_size=8, dtype=jnp.float32, do_heating=True)
    e_scan = ChebRaytracer(N, R, SIG, bins, accumulate="scan", **common)
    e_win = ChebRaytracer(N, R, SIG, bins, accumulate="window", **common)
    p1, h1 = e_scan.trace(nd, xh, pos, flux, DR)
    p2, h2 = e_win.trace(nd, xh, pos, flux, DR)
    for a, b in ((p1, p2), (h1, h2)):
        a, b = np.asarray(a), np.asarray(b)
        big = np.abs(a) > 1e-30
        assert (np.abs(a - b)[big] / np.abs(a)[big]).max() < 1e-5


def test_packed_batches_span_invariant():
    """Every packed batch must fit one accumulation window, cover all
    sources exactly once, and preserve fluxes."""
    rng = np.random.default_rng(2)
    N, R = 64, 6.0
    eng = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=8,
                        dtype=jnp.float32, accumulate="window")
    pos = rng.integers(0, N, (100, 3))
    flux = 10 ** rng.uniform(-1, 2, 100)
    pb, fb = eng.prepare_sources(pos, flux)
    pb, fb = np.asarray(pb.pos), np.asarray(fb)
    span = eng.window_W - eng.geom.Dc
    assert (pb.max(axis=1) - pb.min(axis=1)).max() <= span
    # all (pos, flux) pairs present exactly once among nonzero-flux slots
    got = sorted((tuple(int(x) for x in p), float(f))
                 for p, f in zip(pb.reshape(-1, 3), fb.reshape(-1))
                 if f > 0)
    want = sorted((tuple(int(x) for x in p), float(np.float32(f)))
                  for p, f in zip(pos, flux))
    assert got == want


def test_window_engine_bare_batches_take_scan_path():
    """Arbitrary (unpacked) batches through a window engine must be
    bit-identical to the scan engine — the dispatch is on the
    PackedPositions pytree structure, so bare arrays are always safe."""
    rng = np.random.default_rng(3)
    N, R = 48, 9.0
    nd = 1e-3 * (1 + 0.5 * rng.random((N, N, N)))
    xh = 1e-4 * rng.random((N, N, N))
    pos = rng.integers(0, N, (20, 3))
    flux = 10 ** rng.uniform(-1, 2, 20)
    common = dict(batch_size=4, dtype=jnp.float32)
    e_scan = ChebRaytracer(N, R, SIG, grey_bins(), accumulate="scan",
                           **common)
    e_win = ChebRaytracer(N, R, SIG, grey_bins(), accumulate="window",
                          **common)
    pb, fb = e_scan.prepare_sources(pos, flux)   # bare arrays
    p1, _ = e_scan.trace_batches(jnp.asarray(nd.ravel(), jnp.float32),
                                 jnp.asarray(xh.ravel(), jnp.float32),
                                 pb, fb, jnp.asarray(DR, jnp.float32))
    p2, _ = e_win.trace_batches(jnp.asarray(nd.ravel(), jnp.float32),
                                jnp.asarray(xh.ravel(), jnp.float32),
                                pb, fb, jnp.asarray(DR, jnp.float32))
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_rates_subbox_covers_sphere():
    """The rates subbox [rb0, rb1) must contain every cell within
    R_max_LLS of the source."""
    for N, R in ((48, 9.0), (32, 3.5), (64, 16.0)):
        eng = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=2,
                            dtype=jnp.float32)
        g = eng.geom
        rv = np.asarray(g.rate_valid & (g.dist2 <= R * R))
        idx = np.argwhere(rv)
        assert idx.min() >= eng._rb0
        assert idx.max() < eng._rb1


def test_fuse_fold_kernel_matches():
    """The fused sweep+fold+rates kernel (in-VMEM box assembly) must
    reproduce the XLA engine. The kernel carries cdin exactly while the
    XLA path reconstructs cdin = cd_folded - dcol, which loses f32 bits
    when dcol >> cdin; at cells with huge dtau that turns into
    exp(+-eps*dtau*s) — so agreement is tight only above a rate floor
    (the divergent cells hold physically negligible rates ~1e-20 of the
    peak)."""
    N = 10
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = np.array([[0, 9, 5], [4, 4, 4]])
    flux = np.array([1.0, 2.0])
    rt_x = _mk(N, R=1e9, batch=2, dtype=jnp.float32)
    rt_f = ChebRaytracer(N, 1e9, SIG, grey_bins(), batch_size=2,
                         dtype=jnp.float32, use_pallas=True,
                         fuse_fold=True)
    phi_x = np.asarray(rt_x.trace(ndens, xh, src, flux, DR))
    phi_f = np.asarray(rt_f.trace(ndens, xh, src, flux, DR))
    assert ((phi_x != 0) == (phi_f != 0)).all()
    big = np.abs(phi_x) > 1e-8 * np.abs(phi_x).max()
    rel = np.abs(phi_f - phi_x)[big] / np.abs(phi_x)[big]
    assert rel.max() < 2e-4


def test_adaptive_window_shrinks_for_dense_catalogs():
    """prepare_sources re-tunes the accumulation window per catalog:
    a dense catalog packs full batches into a small span, so auto-W
    must come DOWN from the static Dc+32 default, the packing must
    honor the chosen span exactly, and the greedy walk must cover
    every source exactly once."""
    fmin = 3.288e15
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, 40 * fmin, panels=2, nodes=4)
    rng = np.random.default_rng(7)
    N = 100
    eng = ChebRaytracer(N, 8.0, SIG, bins, batch_size=32,
                        accumulate="window")
    W0 = eng.window_W
    # dense: ~1 source per 2.7 cells^3
    pos = rng.integers(0, N, (300000, 3))
    flux = np.ones(len(pos))
    pb, fb = eng.prepare_sources(pos, flux)
    assert eng.window_W < W0, (eng.window_W, W0)
    # span guarantee at the ADAPTED window
    p = np.asarray(pb.pos)
    span = p.max(axis=1) - p.min(axis=1)
    assert span.max() <= eng.window_W - eng.geom.Dc
    # every source represented exactly once (padding has zero flux)
    f = np.asarray(fb)
    assert (f > 0).sum() == len(pos)
    # sparse catalog: W stays at the default
    eng2 = ChebRaytracer(N, 8.0, SIG, bins, batch_size=32,
                         accumulate="window")
    eng2.prepare_sources(rng.integers(0, N, (200, 3)), np.ones(200))
    assert eng2.window_W == W0


def test_vectorized_packing_edge_cases():
    """The vectorized greedy packing (rolling-window extrema + batch
    walk) must handle: ns not divisible by B, ns < B, duplicate
    positions, and a catalog lying on one line (degenerate bbox)."""
    fmin = 3.288e15
    bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                              fmin, 40 * fmin, panels=2, nodes=4)
    eng = ChebRaytracer(40, 5.0, SIG, bins, batch_size=8,
                        accumulate="window")
    span_max = eng.window_W - eng.geom.Dc
    rng = np.random.default_rng(1)
    cases = [
        rng.integers(0, 40, (13, 3)),            # ns % B != 0
        rng.integers(0, 40, (3, 3)),             # ns < B
        np.tile([[7, 7, 7]], (20, 1)),           # duplicates
        np.stack([np.arange(30) % 40,
                  np.zeros(30, int),
                  np.zeros(30, int)], 1),        # collinear
    ]
    for pos in cases:
        flux = np.arange(1.0, len(pos) + 1.0)
        pb, fb = eng.prepare_sources(pos, flux)
        f = np.asarray(fb).ravel()
        # all real sources present with their fluxes, padding zero
        assert sorted(f[f > 0]) == sorted(flux)
        if hasattr(pb, "pos"):
            p = np.asarray(pb.pos)
            span = p.max(axis=1) - p.min(axis=1)
            assert span.max() <= span_max


def test_lane_packed_kernel_matches_xla():
    """Multi-source lane packing (G sources per kernel plane,
    lane = sign*G*Dc + g*Dc + b) must be BIT-identical to the XLA
    sweep for G in {2, 4} across scan and window accumulates."""
    N = 40
    rng = np.random.RandomState(31)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    src = rng.randint(0, N, size=(20, 3))
    flux = rng.uniform(0.5, 3.0, 20)
    for R, B, acc, G_want in ((4.0, 8, "scan", 4), (8.0, 8, "scan", 2),
                              (10.0, 16, "window", 2)):
        rx = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=B,
                           dtype=jnp.float64, accumulate=acc)
        rp = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=B,
                           dtype=jnp.float64, accumulate=acc,
                           use_pallas=True)
        assert rp.lane_pack == G_want, (R, rp.geom.Dc, rp.lane_pack)
        phi_x = np.asarray(rx.trace(ndens, xh, src, flux, DR))
        phi_p = np.asarray(rp.trace(ndens, xh, src, flux, DR))
        np.testing.assert_array_equal(phi_p, phi_x)


def test_segmented_sweep_matches_xla():
    """Shell-segmented sweep (memory-bounded large-R path): K segments
    through one kernel with carried shell planes must be BIT-identical
    to the monolithic XLA sweep — including a ragged last segment and
    combined with lane packing."""
    N = 40
    rng = np.random.RandomState(32)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    src = rng.randint(0, N, size=(6, 3))
    flux = rng.uniform(0.5, 3.0, 6)
    for R, S in ((14.0, 5), (14.0, 4), (18.0, 18)):
        rx = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=2,
                           dtype=jnp.float64)
        rs = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=2,
                           dtype=jnp.float64, use_pallas=True,
                           shell_segment=S)
        if S <= rs.geom.r_max:
            assert rs.seg_S == S and rs.seg_K == -(-rs.geom.r_max // S)
        phi_x = np.asarray(rx.trace(ndens, xh, src, flux, DR))
        phi_s = np.asarray(rs.trace(ndens, xh, src, flux, DR))
        np.testing.assert_array_equal(phi_s, phi_x)


def test_segmentation_auto_thresholds():
    """auto mode: off at production radii AND at the R=100/B=4 class
    (monolithic measured faster, 419 MB stacks fit); on when the
    monolithic stacks would exceed ~768 MB (the r04 OOM class);
    S*K covers r_max and each segment's stacks stay under 192 MB."""
    rt = ChebRaytracer(64, 30.0, SIG, grey_bins(), batch_size=8,
                       dtype=jnp.float32, use_pallas=True)
    assert rt.seg_S == 0
    mono = ChebRaytracer(250, 100.0, SIG, grey_bins(), batch_size=4,
                         dtype=jnp.float32, use_pallas=True)
    assert mono.seg_S == 0
    big = ChebRaytracer(250, 100.0, SIG, grey_bins(), batch_size=16,
                        dtype=jnp.float32, use_pallas=True)
    assert big.seg_S > 0 and big.seg_S * big.seg_K >= big.geom.r_max
    # stacks per segment bounded by the 192 MB budget
    per_shell = 3 * 16 * big.geom.Dc * 2 * big.geom.Dc * 4
    assert big.seg_S * per_shell <= 192 * 1024 * 1024


def test_stale_packed_batches_after_retune_stay_correct():
    """Batches packed under an earlier tuner state must stay CORRECT
    when a later prepare_sources retunes the window smaller: the
    recorded static span gates the window path (falls back to scan)
    instead of silently dropping sources through all-zero one-hot
    placement rows."""
    from pyc2ray_tpu.ops.raytrace_cheb import PackedPositions

    N = 64
    rng = np.random.RandomState(41)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    rt = ChebRaytracer(N, 8.0, SIG, grey_bins(), batch_size=8,
                       dtype=jnp.float64, accumulate="window",
                       use_pallas=False)
    # catalog A: spread out -> larger window
    srcA = rng.randint(0, N, size=(80, 3))
    fluxA = rng.uniform(0.5, 2.0, 80)
    posA, flxA = rt.prepare_sources(srcA, fluxA)
    assert isinstance(posA, PackedPositions) and posA.span is not None
    phiA_fresh = np.asarray(rt.trace_batches(
        jnp.asarray(ndens.reshape(-1)), jnp.asarray(xh.reshape(-1)),
        posA, flxA, jnp.asarray(DR))[0])
    # catalog B: dense cluster -> the tuner shrinks W (and may raise B)
    srcB = rng.randint(20, 36, size=(600, 3))
    rt.prepare_sources(srcB, np.ones(600))
    # force a smaller window than catalog A's packing span needs
    rt.window_W = min(rt.window_W, rt.geom.Dc + 16)
    if posA.span > rt.window_W - rt.geom.Dc:
        pass  # the interesting configuration: stale batches don't fit
    phiA_stale = np.asarray(rt.trace_batches(
        jnp.asarray(ndens.reshape(-1)), jnp.asarray(xh.reshape(-1)),
        posA, flxA, jnp.asarray(DR))[0])
    np.testing.assert_allclose(phiA_stale, phiA_fresh, rtol=1e-12)
