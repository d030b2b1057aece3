"""Bisect the Dc size at which the segmented sweep faults on hardware."""
import sys, time
import numpy as np, jax.numpy as jnp
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.constants import ev2fr

R = float(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 250
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SEG = sys.argv[4] if len(sys.argv) > 4 else "auto"
SEG = SEG if SEG == "auto" else int(SEG)
fmin, fmax = ev2fr*13.598, 10*ev2fr*54.416
bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                          fmin, fmax, panels=2, nodes=4)
rng = np.random.RandomState(1)
nd = (1e-3*np.ones((N,N,N))).astype(np.float32)
xh = (1e-3*np.ones((N,N,N))).astype(np.float32)
pos = rng.randint(0, N, size=(B,3))
flux = np.ones(B)
rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B,
                   dtype=jnp.float32, use_pallas=True, shell_segment=SEG)
print(f"R={R} Dc={rt.geom.Dc} r_max={rt.geom.r_max} seg S={rt.seg_S} K={rt.seg_K}", flush=True)
t0 = time.time()
phi = np.asarray(rt.trace(nd, xh, pos, flux, 6.7e20))
print(f"OK in {time.time()-t0:.1f} s; phi sum {phi.sum():.3e}", flush=True)
