"""Domain-decomposition tests on the virtual 8-CPU mesh.

The halo-exchanged, grid-sharded trace must reproduce the single-device
engine exactly (same f64 ops in a different execution order only at the
accumulation seams, which is addition — associativity holds per cell
since every cell's Gamma is accumulated in the same source order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.ops.raytrace_box import grey_bins
from pyc2ray_tpu.ops.chemistry import ChemistryParams
from pyc2ray_tpu.parallel import (make_domain_mesh, DomainDecomposition,
                                  evolve3D_domain)
from pyc2ray_tpu.evolve import evolve3D

from test_raytrace import SIG, DR
from test_evolve import CHEM

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _engine(N, R, batch=2, heating=False):
    return ChebRaytracer(N, R, SIG, grey_bins(), batch_size=batch,
                         dtype=jnp.float64, do_heating=heating)


def _halo_roundtrip(N, pi, pj, R):
    """(a) each device's halo_gather frame must equal the corresponding
    window of the globally wrap-padded field; (b) halo_reduce must be the
    exact adjoint: reduce(gather(f)) = f * coverage_count per cell."""
    eng = _engine(N, R)
    mesh = make_domain_mesh(pi, pj)
    dd = DomainDecomposition(eng, mesh)
    rng = np.random.RandomState(0)
    f = rng.rand(N, N, N)
    hlo, hhi = dd.hlo, dd.hhi
    Li, Lj = dd.Li, dd.Lj
    Ei, Ej, Ek = Li + hlo + hhi, Lj + hlo + hhi, N + hlo + hhi

    @partial(shard_map, mesh=mesh, in_specs=P("di", "dj", None),
             out_specs=P("di", "dj", None), check_vma=False)
    def gather(fl):
        return dd.halo_gather(fl)

    ext = np.asarray(gather(jnp.asarray(f)))     # (pi*Ei, pj*Ej, Ek)
    padg = np.pad(f, ((N, N),) * 3, mode="wrap")  # generous global pad
    for oi in range(pi):
        for oj in range(pj):
            frame = ext[oi * Ei:(oi + 1) * Ei, oj * Ej:(oj + 1) * Ej]
            want = padg[N + oi * Li - hlo:N + oi * Li + Li + hhi,
                        N + oj * Lj - hlo:N + oj * Lj + Lj + hhi,
                        N - hlo:2 * N + hhi]
            np.testing.assert_array_equal(frame, want)

    @partial(shard_map, mesh=mesh, in_specs=P("di", "dj", None),
             out_specs=P("di", "dj", None), check_vma=False)
    def gather_then_reduce(fl):
        return dd.halo_reduce(dd.halo_gather(fl))

    out = np.asarray(gather_then_reduce(jnp.asarray(f)))

    from pyc2ray_tpu.parallel.domain import _halo_pieces
    def cov(L):
        c = np.ones(L)
        for s, w in _halo_pieces(hlo, L):
            c[L - w:] += 1
        for s, w in _halo_pieces(hhi, L):
            c[:w] += 1
        return c
    ci = np.tile(cov(Li), pi)
    cj = np.tile(cov(Lj), pj)
    ck = np.ones(N)
    ck[N - hlo:] += 1
    ck[:hhi] += 1
    exp = f * ci[:, None, None] * cj[None, :, None] * ck[None, None, :]
    np.testing.assert_allclose(out, exp, rtol=1e-14)


def test_halo_roundtrip_2x2():
    _halo_roundtrip(16, 2, 2, R=3.0)


def test_halo_roundtrip_4x2_multihop():
    # N=16 on 4x2: Li=4 < halo width -> exercises multi-hop exchange
    _halo_roundtrip(16, 4, 2, R=6.0)


def test_domain_trace_matches_single_2x4():
    N = 16
    R = 3.0
    rng = np.random.RandomState(3)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = rng.randint(0, N, size=(9, 3))
    flux = rng.uniform(0.5, 3.0, 9)
    eng = _engine(N, R)
    phi_single = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    dd = DomainDecomposition(eng, make_domain_mesh(2, 4))
    phi_dom = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_dom, phi_single, rtol=1e-13)


def test_domain_trace_multihop_halo():
    """Halo wider than the local extent (Li=2 < halo) must still match."""
    N = 16
    R = 5.0
    rng = np.random.RandomState(4)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    src = rng.randint(0, N, size=(5, 3))
    flux = rng.uniform(0.5, 3.0, 5)
    eng = _engine(N, R)
    phi_single = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    dd = DomainDecomposition(eng, make_domain_mesh(8, 1))
    phi_dom = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_dom, phi_single, rtol=1e-13)


def test_domain_full_box_radius():
    """R covering the whole box (halo = N/2 scale) on a 2x2 submesh."""
    N = 8
    rng = np.random.RandomState(5)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    src = np.array([[0, 7, 3], [4, 4, 4]])
    flux = np.array([1.0, 2.0])
    eng = _engine(N, R=1e9)
    phi_single = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    dd = DomainDecomposition(eng, make_domain_mesh(4, 2))
    phi_dom = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_dom, phi_single, rtol=1e-13)


def test_evolve3D_domain_matches_single():
    N = 8
    rng = np.random.RandomState(6)
    ndens = 1e-3 * np.ones((N, N, N))
    temp = 1e4 * np.ones(N ** 3)
    xh = 1.2e-3 * np.ones(N ** 3)
    src = np.array([[4, 4, 4], [1, 6, 2], [7, 0, 5]])
    flux = np.array([1.0, 0.5, 2.0])
    dt = 3.0e13

    eng = _engine(N, R=1e9, batch=2)
    xh_s, phi_s = evolve3D(dt, DR, flux, src, eng, CHEM,
                           temp, ndens.reshape(-1), xh, quiet=True)
    dd = DomainDecomposition(eng, make_domain_mesh(2, 4))
    xh_d, phi_d = evolve3D_domain(dt, DR, flux, src, dd, CHEM,
                                  temp, ndens, xh, quiet=True)
    np.testing.assert_allclose(phi_d, np.asarray(phi_s).reshape(N, N, N),
                               rtol=1e-12)
    np.testing.assert_allclose(xh_d, np.asarray(xh_s).reshape(N, N, N),
                               rtol=1e-12)


def test_multihost_helpers_single_process():
    """multihost entry points degrade gracefully in a single process:
    initialize() is a no-op, meshes span all (virtual) devices."""
    from pyc2ray_tpu.parallel import multihost
    assert multihost.initialize() is False
    assert multihost.is_primary()
    mesh = multihost.global_domain_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("di", "dj", "dk")
    pi, pj, pk = mesh.devices.shape
    assert pi * pj * pk == 8 and {pi, pj, pk} <= {1, 2, 4, 8}
    smesh = multihost.global_source_mesh()
    assert smesh.axis_names == ("src", "space")


# ---------------------------------------------------------------------------
# 3D decomposition (dk axis), non-divisible meshes, interior overlap
# ---------------------------------------------------------------------------

def test_domain_trace_3d_mesh_2x2x2():
    """Full 3D (2,2,2) mesh with a mix of interior sources (swept from
    local data, overlapping the exchange) and boundary sources."""
    N = 32
    R = 3.0
    rng = np.random.RandomState(7)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = rng.randint(0, N, size=(20, 3))
    flux = rng.uniform(0.5, 3.0, 20)
    eng = _engine(N, R)
    dd = DomainDecomposition(eng, make_domain_mesh(2, 2, 2))
    # the split must actually produce both classes for this config
    pos_i, flux_i, pos_b, flux_b = dd.prepare_sources(src, flux)
    assert pos_i is not None and pos_b is not None
    n_assigned = int((np.asarray(flux_i) > 0).sum()
                     + (np.asarray(flux_b) > 0).sum())
    assert n_assigned == 20
    phi_single = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    phi_dom = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_dom, phi_single, rtol=1e-13)


def test_domain_trace_nondivisible_i_axis():
    """N=20 on a (3,2,1) mesh: 20 % 3 != 0 -> the i axis takes the
    padded all_gather compat path; j stays on the ppermute path."""
    N = 20
    R = 3.0
    rng = np.random.RandomState(8)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = rng.randint(0, N, size=(11, 3))
    flux = rng.uniform(0.5, 3.0, 11)
    eng = _engine(N, R)
    dd = DomainDecomposition(eng, make_domain_mesh(3, 2, 1))
    assert dd.padded
    phi_single = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    phi_dom = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_dom, phi_single, rtol=1e-12)


def test_domain_trace_nondivisible_k_axis():
    """Non-divisible decomposition of the minor (k) axis."""
    N = 20
    R = 4.0
    rng = np.random.RandomState(9)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.9, (N, N, N))
    src = rng.randint(0, N, size=(7, 3))
    flux = rng.uniform(0.5, 3.0, 7)
    eng = _engine(N, R)
    dd = DomainDecomposition(eng, make_domain_mesh(2, 1, 3))
    assert dd.padded
    phi_single = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    phi_dom = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_dom, phi_single, rtol=1e-12)


def test_evolve3D_domain_3d_nondivisible():
    """Full convergence loop on a non-divisible 3D mesh: dead padding
    rows must not corrupt the convergence sums (mask path)."""
    N = 10
    rng = np.random.RandomState(10)
    ndens = 1e-3 * np.ones((N, N, N))
    temp = 1e4 * np.ones(N ** 3)
    xh = 1.2e-3 * np.ones(N ** 3)
    src = np.array([[4, 4, 4], [1, 6, 2], [9, 0, 5]])
    flux = np.array([1.0, 0.5, 2.0])
    dt = 3.0e13

    eng = _engine(N, R=1e9, batch=2)
    xh_s, phi_s = evolve3D(dt, DR, flux, src, eng, CHEM,
                           temp, ndens.reshape(-1), xh, quiet=True)
    dd = DomainDecomposition(eng, make_domain_mesh(3, 1, 2))
    assert dd.padded
    xh_d, phi_d = evolve3D_domain(dt, DR, flux, src, dd, CHEM,
                                  temp, ndens, xh, quiet=True)
    np.testing.assert_allclose(phi_d, np.asarray(phi_s).reshape(N, N, N),
                               rtol=1e-11)
    np.testing.assert_allclose(xh_d, np.asarray(xh_s).reshape(N, N, N),
                               rtol=1e-11)


def test_domain_step_collective_traffic_matches_model():
    """Hard guarantee for the O(surface x halo) traffic claim: the
    compiled HLO of the domain step must move EXACTLY the halo volume
    through collective-permutes (gather + adjoint reduce per axis) and
    contain no grid-sized all-gathers/all-reduces — the reference's MPI
    path moves 2*N^3 words per rank per iteration instead
    (reference evolve.py:433-437)."""
    import re
    from pyc2ray_tpu.ops.chemistry import ChemistryParams

    N = 16
    eng = _engine(N, R=3.0)
    dd = DomainDecomposition(eng, make_domain_mesh(2, 2, 2))
    rng = np.random.RandomState(11)
    srcs = dd.prepare_sources(rng.randint(0, N, (6, 3)), np.ones(6))
    assert srcs[2] is not None   # boundary sources present -> exchange
    step = dd.make_step(CHEM, srcs)
    f = jnp.ones((N, N, N), jnp.float64)
    args = (step._tables, f, f * 1e4, f * 1e-3, f * 1e-3, *step._srcs,
            jnp.float64(1e13), jnp.float64(2e21))
    txt = step._jitted.lower(*args).compile().as_text()

    tot = 0
    for m in re.finditer(r"collective-permute(?:-start)?\(", txt):
        line = txt[txt.rfind("\n", 0, m.start()) + 1:txt.find("\n", m.end())]
        shp = re.search(r"f(32|64)\[([0-9,]*)\]", line)
        if shp:
            n = 1
            dims = shp.group(2)
            for d in (dims.split(",") if dims else []):
                n *= int(d)
            tot += n * (4 if shp.group(1) == "32" else 8)

    # analytic halo model: gather (hlo+hhi) * cross-section per axis on
    # the progressively extended block, and the adjoint reduce moves the
    # same volume back
    h = dd.hlo + dd.hhi
    Li, Lj, Lk = dd.Li, dd.Lj, dd.Lk
    expect_elems = 2 * h * (Lj * Lk + (Li + h) * Lk + (Li + h) * (Lj + h))
    assert tot == expect_elems * 8, (tot, expect_elems * 8)

    # far below the reference's replicated Reduce+Bcast...
    assert tot < 2 * N ** 3 * 8
    # ...and no hidden grid-sized collectives
    assert not re.search(r"all-gather[^\n]*\[16,16,16\]", txt)
    assert not re.search(r"all-reduce[^\n]*f64\[16,16,16\]", txt)


def test_domain_trace_window_engine_matches_single():
    """Window-accumulate staging under the 3D domain mesh: per-owner
    Morton-packed batches sized for the extended LOCAL frame
    (window_for_ext) must reproduce the single-device trace."""
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins

    from pyc2ray_tpu.ops.raytrace_cheb import PackedPositions

    N, R = 48, 3.0    # Lp=24: the extended frame leaves span >= 16
    rng = np.random.RandomState(11)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0, 0.5, (N, N, N))
    ns = 600   # dense enough that the packing fill guard keeps windows
    src = rng.randint(0, N, size=(ns, 3))
    flux = rng.uniform(0.5, 5.0, ns)
    eng = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=4,
                        dtype=jnp.float64, accumulate="window")
    assert eng.accumulate == "window"
    dd = DomainDecomposition(eng, make_domain_mesh(2, 2, 2))
    ext = tuple(dd.hlo + ax.Lp + dd.hhi for ax in dd.axes)
    assert eng.window_for_ext(ext) is not None  # window path engaged
    srcs = dd.prepare_sources(src, flux)
    assert any(isinstance(s, PackedPositions) for s in srcs)
    phi_s = np.asarray(eng.trace(ndens, xh, src, flux, DR))
    phi_d = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_d, phi_s, rtol=1e-12)


def test_domain_traffic_512_class_production_scale():
    """Weak-scaling paper trail at production scale (VERDICT r3 item 9):
    the LOWERED 512^3 domain step on a (2,2,2) mesh moves EXACTLY the
    analytic halo volume through collective-permutes — 125.5 MB/chip
    per iteration (f32, h = Dc-1 = 63, L = 256) vs the reference MPI
    path's replicated 2 N^3 f64 Reduce+Bcast = 2147 MB per rank
    (reference evolve.py:433-437) — and contains no grid-sized
    collectives. Args are abstract (ShapeDtypeStruct), so the check
    runs at full production shapes without allocating 512^3 fields."""
    import re

    N, R = 512, 31.0
    eng = ChebRaytracer(N, R, SIG, grey_bins(), batch_size=8,
                        dtype=jnp.float32)
    dd = DomainDecomposition(eng, make_domain_mesh(2, 2, 2))
    rng = np.random.RandomState(11)
    srcs = dd.prepare_sources(rng.randint(0, N, (64, 3)), np.ones(64))
    step = dd.make_step(CHEM, srcs)

    f = jax.ShapeDtypeStruct((N, N, N), jnp.float32)
    sds = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                       jnp.asarray(x).dtype), t)
    s0 = jax.ShapeDtypeStruct((), jnp.float32)
    txt = step._jitted.lower(sds(step._tables), f, f, f, f,
                             *sds(step._srcs), s0, s0).as_text()

    tot = 0
    for m in re.finditer(
            r"stablehlo\.collective_permute.*?tensor<([0-9x]+)xf(32|64)>",
            txt):
        n = 1
        for d in m.group(1).split("x"):
            n *= int(d)
        tot += n * (4 if m.group(2) == "32" else 8)

    h = dd.hlo + dd.hhi
    Li, Lj, Lk = dd.Li, dd.Lj, dd.Lk
    expect = 2 * h * (Lj * Lk + (Li + h) * Lk
                      + (Li + h) * (Lj + h)) * 4
    assert tot == expect, (tot, expect)
    assert tot < 0.06 * 2 * N ** 3 * 8          # >16x below the reference
    assert not re.search(r"all_gather.*tensor<512x512x512", txt)
    assert not re.search(r"all_reduce.*tensor<512x512x512", txt)


def _adaptive_engine(N, radii, batch=4, accumulate="auto"):
    from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer
    return AdaptiveRaytracer(N, max(radii), SIG, grey_bins(),
                             radii=list(radii), batch_size=batch,
                             dtype=jnp.float64, accumulate=accumulate,
                             R_min=1.0)


def test_domain_adaptive_trace_matches_single():
    """Owner-local bucketing (VERDICT r4 item 3): the adaptive engine
    under the 3D domain mesh — per-owner Stromgren buckets swept
    bucket-major on ONE max-halo exchange — must reproduce the
    single-device adaptive trace exactly."""
    N = 24
    rng = np.random.RandomState(21)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    ns = 40
    src = rng.randint(0, N, size=(ns, 3))
    flux = 10 ** rng.uniform(-3, 1, ns)       # 4 decades: spreads buckets
    art = _adaptive_engine(N, (3.0, 6.0))
    avg = float(np.mean(ndens))
    batches, _ = art.prepare_sources(src, flux, dr=float(DR), avg_dens=avg)
    assert all(c > 0 for c in batches.counts), "want every bucket hit"
    phi_s = np.asarray(art.trace(ndens, xh, src, flux, DR, avg_dens=avg))
    dd = DomainDecomposition(art, make_domain_mesh(2, 2, 2))
    assert dd._adaptive and dd.hlo == art.engines[-1].geom.c
    phi_d = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    # per-bucket halo pieces sum in a different order than the
    # single-device bucket totals: f64 non-associativity only
    np.testing.assert_allclose(phi_d, phi_s, rtol=1e-10)


def test_domain_adaptive_trace_window_engine():
    """Adaptive x domain with window-accumulate buckets (the production
    configuration): per-bucket per-owner Morton packing against the
    max-halo extended frame, smaller buckets shifted by hlo - c_k."""
    N = 32
    rng = np.random.RandomState(22)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0.0, 0.5, (N, N, N))
    ns = 400
    src = rng.randint(0, N, size=(ns, 3))
    flux = 10 ** rng.uniform(-2, 1, ns)
    art = _adaptive_engine(N, (3.0, 6.0), batch=4, accumulate="window")
    assert all(e.accumulate == "window" for e in art.engines)
    avg = float(np.mean(ndens))
    phi_s = np.asarray(art.trace(ndens, xh, src, flux, DR, avg_dens=avg))
    dd = DomainDecomposition(art, make_domain_mesh(2, 2, 2))
    phi_d = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_d, phi_s, rtol=1e-12)


def test_evolve3D_domain_adaptive_matches_single():
    """Full evolve loop: adaptive engine under the domain mesh equals
    the single-device adaptive evolve (chemistry shard-local)."""
    N = 16
    rng = np.random.RandomState(23)
    ndens = 1e-3 * (1.0 + rng.rand(N, N, N))
    temp = 1e4 * np.ones(N ** 3)
    xh = 1.2e-3 * np.ones(N ** 3)
    ns = 12
    src = rng.randint(0, N, size=(ns, 3))
    flux = 10 ** rng.uniform(-1, 1, ns)
    dt = 3.0e13
    art = _adaptive_engine(N, (3.0, 5.0), batch=2)
    xh_s, phi_s = evolve3D(dt, DR, flux, src, art, CHEM,
                           temp, ndens.reshape(-1), xh, quiet=True)
    dd = DomainDecomposition(art, make_domain_mesh(2, 2, 1))
    xh_d, phi_d = evolve3D_domain(dt, DR, flux, src, dd, CHEM,
                                  temp, ndens, xh, quiet=True)
    np.testing.assert_allclose(phi_d, np.asarray(phi_s).reshape(N, N, N),
                               rtol=1e-10)
    np.testing.assert_allclose(xh_d, np.asarray(xh_s).reshape(N, N, N),
                               rtol=1e-10)


def test_domain_adaptive_empty_bucket_static_structure():
    """A bucket with no sources stages one zero-flux batch per device
    (structure stays static across timesteps) and contributes nothing."""
    N = 16
    rng = np.random.RandomState(24)
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))
    src = rng.randint(4, 12, size=(6, 3))
    flux = np.full(6, 1e-3)                 # all faint -> smallest bucket
    art = _adaptive_engine(N, (3.0, 6.0))
    avg = float(np.mean(ndens))
    batches, _ = art.prepare_sources(src, flux, dr=float(DR), avg_dens=avg)
    assert batches.counts[-1] == 0          # largest bucket empty
    dd = DomainDecomposition(art, make_domain_mesh(2, 2, 1))
    srcs = dd.prepare_sources(src, flux, dr=float(DR), avg_dens=avg)
    # empty bucket present in the interior slot as a zero-flux batch
    assert srcs[0] is not None and srcs[0][-1] is not None
    assert float(np.max(np.asarray(
        srcs[1][-1].pos if hasattr(srcs[1][-1], "pos")
        else srcs[1][-1]))) == 0.0
    phi_s = np.asarray(art.trace(ndens, xh, src, flux, DR, avg_dens=avg))
    phi_d = np.asarray(dd.trace(ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_d, phi_s, rtol=1e-13)


def test_domain_traffic_512_class_64_chips():
    """64-chip row of the 512^3 weak-scaling table, HLO-verified
    (VERDICT r4 item 6): lower the full domain step on a virtual
    (4,4,4) mesh in a subprocess (needs 64 host devices) and check the
    collective-permute bytes equal the analytic halo model
    (39.0 MB/chip/iter vs the reference's constant 2147 MB/rank)."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scratch",
                          "domain_traffic.py")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=64",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    out = subprocess.run(
        [sys.executable, script, "512", "31", "4", "4", "4"],
        env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["chips"] == 64
    assert res["measured_bytes_per_chip_iter"] == \
        res["model_bytes_per_chip_iter"]
    assert res["measured_MB"] == 39.0


def test_domain_traffic_512_class_512_chips():
    """512-chip row of the 512^3 weak-scaling table, HLO-verified on a
    virtual (8,8,8) mesh: 14.3 MB/chip/iter == the analytic halo model
    (the reference's replicated path stays at 2147 MB/rank). With this
    row every entry of the weak-scaling table is measured, not
    analytic."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scratch",
                          "domain_traffic.py")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=512",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    out = subprocess.run(
        [sys.executable, script, "512", "31", "8", "8", "8"],
        env=env, capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["chips"] == 512
    assert res["measured_bytes_per_chip_iter"] == \
        res["model_bytes_per_chip_iter"]
    assert res["measured_MB"] == 14.3
