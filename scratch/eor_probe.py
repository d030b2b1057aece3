"""Production EoR probe: 250^3, 20k synthetic sources (2-decade flux
spread), adaptive engine, one v5e chip. Measures the per-convergence-
iteration raytrace cost on the production path (prepare_sources once,
time trace_batches), the quantity BENCH_SWEEP r03/r04 track
(r02: 0.95 s -> r03: 0.518 -> r04: 0.390).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scratch/eor_probe.py [batch]
"""
import sys, time
import numpy as np
import jax.numpy as jnp

from pyc2ray_tpu.ops.adaptive import AdaptiveRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.constants import ev2fr

N, NS = 250, 20000
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
dense = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                           fmin, fmax, panels=48, nodes=16)
bins = compress_bins(dense, target_rel=1e-3)
rt = AdaptiveRaytracer(N, 15.4, 6.30e-18, bins, batch_size=B,
                       dtype=jnp.float32, use_pallas=True)
# win_bench-style production fields (dense medium -> small Stromgren
# radii; the r02-r04 probes' operating point)
rng = np.random.default_rng(42)
pos = rng.integers(0, N, (NS, 3))
flux = 10 ** rng.uniform(0, 2, NS)
nd = jnp.asarray(1e-4 * (1 + 0.2 * rng.random(N ** 3)), jnp.float32)
xh = jnp.asarray(1e-4 * rng.random(N ** 3), jnp.float32)
dr = 6.7e22
batches, _ = rt.prepare_sources(pos, flux, dr=dr, avg_dens=1.1e-4)
print(rt.describe_buckets(batches))
print("bucket (B, W):", [(e.batch_size, e.window_W, e.accumulate)
                         for e in rt.engines])
drj = jnp.asarray(dr, jnp.float32)

def sync(x):
    return float(jnp.ravel(x)[0])

t0 = time.time()
sync(rt.trace_batches(nd, xh, batches, None, drj)[0])
print(f"compile+first: {time.time()-t0:.1f} s", flush=True)
ts = []
for _ in range(3):
    t0 = time.time()
    sync(rt.trace_batches(nd, xh, batches, None, drj)[0])
    ts.append(time.time() - t0)
print(f"per-iteration raytrace: {min(ts):.3f} s (reps {['%.3f'%t for t in ts]})")
