"""Pre-seed the persistent JAX compilation cache for production configs.

Compiles (without timing) the programs of the main production surfaces:
the bench config (256^3 / R=30 / B=8 pallas), the production EoR
adaptive probe (250^3 / R<=15 buckets), and the golden 128^3 configs
(h and he engines at R=8/B=16). After one run, any cold start of
bench.py / the sweep / the examples on the same machine is a cache hit
(seconds instead of the remote Mosaic service's 200-1000 s bill —
docs/TPU_PERFORMANCE_NOTES.md "compile regression was environmental").

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scratch/warm_cache.py
(or `make warm`).
"""
import time

import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.constants import ev2fr


def sync(x):
    return float(jnp.ravel(x)[0])


def bb_bins():
    fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
    dense = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                               fmin, fmax, panels=48, nodes=16)
    return compress_bins(dense, target_rel=1e-3)


def warm(name, fn):
    t0 = time.time()
    fn()
    print(f"{name}: first call {time.time() - t0:.1f} s", flush=True)


def trace_config(N, R, B, engine_kw=None, ns=256):
    bins = bb_bins()
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B,
                       dtype=jnp.float32, use_pallas=True,
                       **(engine_kw or {}))
    rng = np.random.RandomState(0)
    pos_b, flux_b = rt.prepare_sources(
        rng.randint(0, N, size=(ns, 3)), np.ones(ns))
    nd = jnp.asarray(1e-3 * np.ones(N ** 3), jnp.float32)
    xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), jnp.float32)
    sync(rt.trace_batches(nd, xh, pos_b, flux_b,
                          jnp.asarray(6.7e20, jnp.float32))[0])


def he_config(N=128, R=8.0, B=16, ns=2048):
    from pyc2ray_tpu.ops.raytrace_he import HeRaytracer
    from pyc2ray_tpu.radiation.helium import make_spectral_bins_he
    bins = make_spectral_bins_he(
        BlackBodySource(5e4, False, ev2fr * 13.598, 2.8))
    rt = HeRaytracer(N, R, bins, 0.074, batch_size=B, dtype=jnp.float32,
                     use_pallas=True)
    rng = np.random.RandomState(0)
    pos_b, flux_b = rt.prepare_sources(
        rng.randint(0, N, size=(ns, 3)), np.ones(ns))
    sh3 = (N,) * 3
    nd = jnp.full(sh3, 1e-3, jnp.float32)
    xh = jnp.full(sh3, 1.2e-3, jnp.float32)
    y1 = jnp.full(sh3, 1e-3, jnp.float32)
    y2 = jnp.zeros(sh3, jnp.float32)
    sync(rt.trace_batches(nd, xh, y1, y2, pos_b, flux_b,
                          jnp.asarray(6.7e20, jnp.float32))[0])


if __name__ == "__main__":
    warm("bench 256^3 R=30 B=8", lambda: trace_config(256, 30.0, 8))
    warm("h golden 128^3 R=8 B=16 (window)",
         lambda: trace_config(128, 8.0, 16, ns=2048))
    warm("eor probe 250^3 R=8 B=16 (window)",
         lambda: trace_config(250, 7.7, 16, ns=4096))
    warm("eor probe 250^3 R=15.4 B=16",
         lambda: trace_config(250, 15.4, 16, ns=2048))
    warm("he golden 128^3 R=8 B=16", he_config)
    print("persistent compile cache seeded")
