"""R=10 / Ns=1e6 B/W micro-sweep after multi-source lane packing (r05).

The r04 local optimum was B=32/W=40 (3.48 ns). The lane-packed kernel
halves the sweep's vector work, so the fixed-vs-window cost balance
shifts; re-probe B and W around the optimum. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scratch/r10_bw_sweep_r05.py
"""
import sys, time
import numpy as np

import jax.numpy as jnp
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.constants import ev2fr

N, R, NS = 250, 10.0, 1_000_000
fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
dense = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                           fmin, fmax, panels=48, nodes=16)
bins = compress_bins(dense, target_rel=1e-3)
rng = np.random.RandomState(100)
ndens = jnp.asarray(1e-3 * np.ones(N ** 3), jnp.float32)
xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), jnp.float32)
dr = jnp.asarray(6.7e20, jnp.float32)
src = rng.randint(0, N, size=(NS, 3))
flux = np.ones(NS)

def sync(x):
    return float(jnp.ravel(x)[0])

import ast, os
cfgs = ast.literal_eval(os.environ.get(
    "BW_CONFIGS",
    "[(32, None), (32, 48), (48, None), (48, 48), (64, None),"
    " (64, 48), (64, 56), (24, None)]"))
for B, W in cfgs:
    rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B,
                       dtype=jnp.float32, use_pallas=True, window_size=W)
    pos_b, flux_b = rt.prepare_sources(src, flux)
    nbat = (pos_b.pos if hasattr(pos_b, "pos") else pos_b).shape[0]
    fill = NS / (nbat * B)
    t0 = time.time()
    sync(rt.trace_batches(ndens, xh, pos_b, flux_b, dr)[0])
    tc = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        sync(rt.trace_batches(ndens, xh, pos_b, flux_b, dr)[0])
        ts.append(time.time() - t0)
    t = min(ts)
    nspc = 1e9 * t / (NS * 4 / 3 * np.pi * R ** 3)
    print(f"B={B:3d} W={rt.window_W:3d} G={rt.lane_pack} fill={fill:.2f}"
          f" : {t:7.3f} s  {nspc:6.3f} ns/cell (compile {tc:.0f}s)",
          flush=True)
