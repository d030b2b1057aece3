"""float32-mode accuracy: the TPU-native dtype must stay within physically
meaningful tolerances of the float64 reference path.

float32 is the performance dtype on TPU (f64 is software-emulated); the
rate computation was specifically restructured to fit f32 range (tables
normalized by S_star, volume prefactor in log space — see raytrace.py).
"""

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
from pyc2ray_tpu.ops.chemistry import ChemistryParams, global_pass

from test_raytrace import TABLES, SIG, DR
from test_evolve import CHEM


def _mk(N, dtype, grey=False):
    cfg = RaytraceConfig(N=N, R_max_LLS=1e9, sig=SIG, batch_size=2,
                         dtype=dtype, grey_analytic=grey)
    if grey:
        return Raytracer(cfg)
    return Raytracer(cfg, TABLES[0], TABLES[1], TABLES[4], TABLES[5])


def test_f32_phi_close_to_f64():
    N = 12
    rng = np.random.RandomState(5)
    ndens = 10 ** rng.uniform(-3.5, -2.5, (N, N, N))
    xh = 1.2e-3 * np.ones((N, N, N))
    src = np.array([[6, 6, 6], [1, 10, 3]])
    flux = np.array([10.0, 3.0])

    phi64 = np.asarray(_mk(N, jnp.float64).trace(ndens, xh, src, flux, DR))
    phi32 = np.asarray(_mk(N, jnp.float32).trace(ndens, xh, src, flux, DR))
    assert np.all(np.isfinite(phi32))
    # thick cells suffer cancellation in f32; bound the typical error
    rel = np.abs(phi32 - phi64) / np.maximum(np.abs(phi64), 1e-30)
    assert np.median(rel) < 1e-3
    assert np.percentile(rel, 95) < 3e-2


def test_f32_chemistry_close_to_f64():
    rng = np.random.RandomState(6)
    n = 512
    ndens = 10 ** rng.uniform(-4, -2, n)
    temp = 1e4 * np.ones(n)
    xh = 1.2e-3 * np.ones(n)
    phi = 10 ** rng.uniform(-16, -8, n)
    dt = 3.15e13

    xi64, _, _ = global_pass(
        dt, jnp.asarray(ndens), jnp.asarray(temp), jnp.asarray(xh),
        jnp.asarray(xh), jnp.asarray(phi), CHEM)
    f32 = jnp.float32
    xi32, _, _ = global_pass(
        jnp.asarray(dt, f32), jnp.asarray(ndens, f32),
        jnp.asarray(temp, f32), jnp.asarray(xh, f32), jnp.asarray(xh, f32),
        jnp.asarray(phi, f32), CHEM)
    rel = np.abs(np.asarray(xi32, np.float64) - np.asarray(xi64)) \
        / np.maximum(np.asarray(xi64), 1e-10)
    assert np.median(rel) < 1e-4
    assert rel.max() < 2e-2
