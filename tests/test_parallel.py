"""Multi-device tests on the virtual 8-CPU mesh: sharded raytrace and
chemistry must reproduce the single-device results exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyc2ray_tpu.ops.chemistry import ChemistryParams, global_pass
from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
from pyc2ray_tpu.parallel import (make_mesh, trace_sharded,
                                  global_pass_sharded, evolve3D_sharded)
from pyc2ray_tpu.evolve import evolve3D

from test_raytrace import TABLES, SIG, DR
from test_evolve import CHEM

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multiple devices")


def _mk(N, batch=2):
    cfg = RaytraceConfig(N=N, R_max_LLS=1e9, sig=SIG, batch_size=batch,
                         dtype=jnp.float64)
    return Raytracer(cfg, TABLES[0], TABLES[1], TABLES[4], TABLES[5])


def test_trace_sharded_matches_single():
    N = 8
    rng = np.random.RandomState(5)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0, 0.5, (N, N, N))
    ns = 13  # awkward count: exercises padding over devices
    src = rng.randint(0, N, size=(ns, 3))
    flux = rng.uniform(0.5, 5.0, ns)

    rt = _mk(N)
    phi_single = np.asarray(rt.trace(ndens, xh, src, flux, DR))

    mesh = make_mesh()  # all devices on the src axis
    phi_shard = np.asarray(trace_sharded(rt, mesh, ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_shard, phi_single, rtol=1e-13)


def test_trace_sharded_2d_mesh():
    N = 8
    rng = np.random.RandomState(6)
    ndens = 1e-3 * np.ones((N, N, N))
    xh = 1e-3 * np.ones((N, N, N))
    src = rng.randint(0, N, size=(5, 3))
    flux = np.ones(5)
    rt = _mk(N)
    phi_single = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    mesh = make_mesh(n_src=4, n_space=2)
    phi_shard = np.asarray(trace_sharded(rt, mesh, ndens, xh, src, flux, DR))
    np.testing.assert_allclose(phi_shard, phi_single, rtol=1e-13)


def test_global_pass_sharded_matches_single():
    rng = np.random.RandomState(7)
    n = 8 ** 3
    ndens = 10 ** rng.uniform(-4, -2, n)
    temp = 1e4 * np.ones(n)
    xh = 1.2e-3 * np.ones(n)
    phi = 10 ** rng.uniform(-16, -8, n)
    dt = 3.15e13

    xi_s, xav_s, cf_s = global_pass(
        dt, jnp.asarray(ndens), jnp.asarray(temp), jnp.asarray(xh),
        jnp.asarray(xh), jnp.asarray(phi), CHEM)

    mesh = make_mesh()
    xi_p, xav_p, cf_p = global_pass_sharded(
        mesh, dt, jnp.asarray(ndens), jnp.asarray(temp), jnp.asarray(xh),
        jnp.asarray(xh), jnp.asarray(phi), CHEM)
    np.testing.assert_allclose(np.asarray(xi_p), np.asarray(xi_s),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(xav_p), np.asarray(xav_s),
                               rtol=1e-13)
    assert int(cf_p) == int(cf_s)


def test_evolve_sharded_matches_single(tmp_path):
    N = 8
    ndens = 2e-3 * np.ones((N, N, N))
    temp = 1e4 * np.ones((N, N, N))
    xh0 = 1.2e-3 * np.ones((N, N, N))
    src = np.array([[4, 4, 4], [1, 2, 3], [6, 1, 7]])
    flux = np.array([5.0, 2.0, 1.0])
    dt = 1e13

    rt = _mk(N, batch=1)
    log1 = str(tmp_path / "single.log")
    xh_s, phi_s = evolve3D(dt, DR, flux, src, rt, CHEM, temp, ndens, xh0,
                           logfile=log1, quiet=True)

    mesh = make_mesh(n_src=4, n_space=2)
    log2 = str(tmp_path / "sharded.log")
    xh_p, phi_p = evolve3D_sharded(dt, DR, flux, src, rt, mesh, CHEM,
                                   temp, ndens, xh0, logfile=log2,
                                   quiet=True)
    np.testing.assert_allclose(xh_p, xh_s, rtol=1e-11)
    np.testing.assert_allclose(phi_p, phi_s, rtol=1e-11)


def test_trace_sharded_window_engine_matches_single():
    """Window-accumulate (PackedPositions) staging under the source
    mesh: every shard runs the one-RMW-per-batch path on its batch
    slice; the psum-reduced Gamma must match the single-device trace."""
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer, PackedPositions
    from pyc2ray_tpu.ops.raytrace_box import grey_bins
    from pyc2ray_tpu.parallel.source_parallel import prepare_sources_sharded

    N = 16
    rng = np.random.RandomState(9)
    ndens = 10 ** rng.uniform(-4, -2, (N, N, N))
    xh = rng.uniform(0, 0.5, (N, N, N))
    ns = 21
    src = rng.randint(0, N, size=(ns, 3))
    flux = rng.uniform(0.5, 5.0, ns)
    rt = ChebRaytracer(N, 4.0, SIG, grey_bins(), batch_size=4,
                       dtype=jnp.float64, accumulate="window")
    assert rt.accumulate == "window"
    phi_single = np.asarray(rt.trace(ndens, xh, src, flux, DR))
    mesh = make_mesh()
    pb, _ = prepare_sources_sharded(rt, mesh, src, flux)
    assert isinstance(pb, PackedPositions)
    assert pb.pos.shape[0] % mesh.devices.size == 0
    phi_shard = np.asarray(trace_sharded(rt, mesh, ndens, xh, src,
                                         flux, DR))
    np.testing.assert_allclose(phi_shard, phi_single, rtol=1e-12)


def test_adaptive_sharded_matches_single():
    """Bucket-major adaptive sharding: the psum-reduced Gamma over the
    per-bucket sharded batches must equal the single-device adaptive
    trace. The catalog spans both buckets; one bucket may be sparse
    enough that its per-device padding dominates — correctness must be
    unaffected."""
    from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins
    from pyc2ray_tpu.parallel.source_parallel import prepare_sources_sharded

    N = 16
    rng = np.random.RandomState(11)
    ndens = 1e-3 * np.ones((N, N, N))
    xh = rng.uniform(0, 0.3, (N, N, N))
    src = rng.randint(0, N, size=(9, 3))
    flux = np.array([1e3, 1e3, 1e-4, 1e-4, 1e-4, 1e3, 1e-4, 1e3, 1e-4])
    rt = AdaptiveRaytracer(N, 6.0, SIG, grey_bins(), radii=[3.0, 6.0],
                           batch_size=2, dtype=jnp.float64, R_min=3.0)
    phi_single, st = rt.trace(ndens, xh, src, flux, DR, stats=True)
    assert min(st["bucket_counts"]) > 0      # both buckets exercised
    mesh = make_mesh(n_src=4, n_space=2)
    pos_t, flux_t = prepare_sources_sharded(
        rt, mesh, src, flux, dr=DR, avg_dens=1e-3)
    assert len(pos_t) == len(rt.engines)
    for pk in pos_t:
        leaf = pk.pos if hasattr(pk, "pos") else pk
        assert leaf.shape[0] % mesh.devices.size == 0
    phi_shard = np.asarray(trace_sharded(rt, mesh, ndens, xh, src,
                                         flux, DR))
    np.testing.assert_allclose(phi_shard, np.asarray(phi_single),
                               rtol=1e-12)


def test_adaptive_sharded_empty_bucket():
    """All sources in one bucket: the other bucket stages zero-flux
    padding batches on every device and contributes exactly nothing."""
    from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins

    N = 12
    ndens = 1e-3 * np.ones((N, N, N))
    xh = np.zeros((N, N, N))
    src = np.array([[6, 6, 6], [2, 9, 4]])
    flux = 1e4 * np.ones(2)                  # both in the top bucket
    rt = AdaptiveRaytracer(N, 5.0, SIG, grey_bins(), radii=[3.0, 5.0],
                           batch_size=2, dtype=jnp.float64)
    phi_single, st = rt.trace(ndens, xh, src, flux, DR, stats=True)
    assert st["bucket_counts"][0] == 0
    mesh = make_mesh()
    phi_shard = np.asarray(trace_sharded(rt, mesh, ndens, xh, src,
                                         flux, DR))
    np.testing.assert_allclose(phi_shard, np.asarray(phi_single),
                               rtol=1e-12)


def test_adaptive_evolve_sharded_matches_single(tmp_path):
    """Full convergence loop with the adaptive engine under the source
    mesh: xh and Gamma must match the single-device adaptive evolve."""
    from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins

    N = 8
    ndens = 2e-3 * np.ones((N, N, N))
    temp = 1e4 * np.ones((N, N, N))
    xh0 = 1.2e-3 * np.ones((N, N, N))
    src = np.array([[4, 4, 4], [1, 2, 3], [6, 1, 7]])
    flux = np.array([5.0, 2.0, 1.0])
    dt = 1e13
    rt = AdaptiveRaytracer(N, 4.0, SIG, grey_bins(), radii=[2.0, 4.0],
                           batch_size=1, dtype=jnp.float64, R_min=2.0)
    xh_s, phi_s = evolve3D(dt, DR, flux, src, rt, CHEM, temp, ndens, xh0,
                           logfile=str(tmp_path / "s.log"), quiet=True)
    mesh = make_mesh(n_src=4, n_space=2)
    xh_p, phi_p = evolve3D_sharded(dt, DR, flux, src, rt, mesh, CHEM,
                                   temp, ndens, xh0,
                                   logfile=str(tmp_path / "p.log"),
                                   quiet=True)
    np.testing.assert_allclose(xh_p, xh_s, rtol=1e-11)
    np.testing.assert_allclose(phi_p, phi_s, rtol=1e-11)


def test_sharded_loss_fraction_warning_fires(tmp_path):
    """The truncation-budget warning must fire on a SHARDED run: an
    adaptive engine with a deliberately tiny loss budget logs the
    WARNING line through the shared convergence loop (round-3 gap: the
    parallel call sites dropped the loss_fraction kwarg)."""
    from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins

    N = 12
    ndens = 2e-3 * np.ones((N, N, N))
    temp = 1e4 * np.ones((N, N, N))
    xh0 = 1.2e-3 * np.ones((N, N, N))
    src = np.array([[6, 6, 6]])
    flux = np.array([1e-4])                  # faint: truncated radius
    dt = 1e13
    rt = AdaptiveRaytracer(N, 5.0, SIG, grey_bins(), radii=[2.0, 5.0],
                           batch_size=1, dtype=jnp.float64, R_min=2.0)
    mesh = make_mesh()
    log = str(tmp_path / "warn.log")
    evolve3D_sharded(dt, DR, flux, src, rt, mesh, CHEM, temp, ndens,
                     xh0, logfile=log, quiet=True,
                     loss_fraction=1e-30)
    text = open(log).read()
    assert "exceeds" in text and "loss_fraction" in text
