"""Re-measure fuse_rates at the new 32-bin default (round-1 measured it
slower at 64 bins; halving the in-kernel exp chains may flip it).

Run ALONE on the TPU: /opt/venv/bin/python scratch/fuse32.py [B]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.constants import ev2fr

N, R, NS = 256, 30.0, 2048
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                          fmin, fmax, panels=4, nodes=8)
rng = np.random.RandomState(100)
ndens = jnp.asarray(1e-3 * np.ones(N ** 3), jnp.float32)
xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), jnp.float32)
dr = jnp.asarray(6.7e20, jnp.float32)
pos = rng.randint(0, N, size=(NS, 3))
flux = np.ones(NS)

def sync(x):
    return float(jnp.ravel(x)[0])

for fuse in (False, True):
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B,
                       dtype=jnp.float32, use_pallas=True, fuse_rates=fuse)
    pos_b, flux_b = rt.prepare_sources(pos, flux)
    t0 = time.time()
    phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
    sync(phi)
    comp = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
        sync(phi)
        ts.append(time.time() - t0)
    t = min(ts)
    nspc = 1e9 * t / (NS * 4 / 3 * np.pi * R ** 3)
    print(f"fuse_rates={fuse} B={B}: {t:.3f} s  {nspc:.3f} ns/cell "
          f"(compile {comp:.0f} s)  sum={float(jnp.sum(phi)):.6e}",
          flush=True)
