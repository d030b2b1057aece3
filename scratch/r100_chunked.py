"""R=100/Ns=1e4 measured in chunks (the single 70 s trace call crashes
the relay worker; chunking bounds per-call device time)."""
import sys, time
import numpy as np, jax.numpy as jnp
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.constants import ev2fr

N, R, NS, B = 250, 100.0, 10000, 4
CH = 1000
SEG = sys.argv[1] if len(sys.argv) > 1 else "auto"
SEG = SEG if SEG == "auto" else int(SEG)
fmin, fmax = ev2fr*13.598, 10*ev2fr*54.416
dense = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                           fmin, fmax, panels=48, nodes=16)
bins = compress_bins(dense, target_rel=1e-3)
rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B,
                   dtype=jnp.float32, use_pallas=True, shell_segment=SEG)
print(f"Dc={rt.geom.Dc} seg S={rt.seg_S} K={rt.seg_K}", flush=True)
rng = np.random.RandomState(100)
nd = jnp.asarray(1e-3*np.ones(N**3), jnp.float32)
xh = jnp.asarray(1.2e-3*np.ones(N**3), jnp.float32)
drj = jnp.asarray(6.7e20, jnp.float32)
src = rng.randint(0, N, size=(NS, 3))

def sync(x):
    return float(jnp.ravel(x)[0])

chunks = [rt.prepare_sources(src[i:i+CH], np.ones(CH))
          for i in range(0, NS, CH)]
t0 = time.time()
sync(rt.trace_batches(nd, xh, chunks[0][0], chunks[0][1], drj)[0])
print(f"compile+first chunk: {time.time()-t0:.1f} s", flush=True)
ts = []
for rep in range(2):
    t0 = time.time()
    for pb, fb in chunks:
        sync(rt.trace_batches(nd, xh, pb, fb, drj)[0])
    ts.append(time.time() - t0)
    print(f"rep {rep}: {ts[-1]:.2f} s", flush=True)
t = min(ts)
print(f"ns/cell: {1e9*t/(NS*4/3*np.pi*R**3):.3f} "
      f"(10 chunks of {CH}; ~27 ms sync/chunk included)")
