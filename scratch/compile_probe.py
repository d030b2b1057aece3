"""Where does the 1093s bench compile go? Time each piece separately."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

t00 = time.time()
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.constants import ev2fr

N, R, NS, BATCH = 256, 30.0, 2048, 8
fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                          fmin, fmax, panels=4, nodes=8)
rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=BATCH,
                   dtype=jnp.float32, use_pallas=True)
g = rt.geom
print(f"setup {time.time()-t00:.1f}s  Dc={g.Dc} c={g.c} R1={g.r_max+1} "
      f"accumulate={rt.accumulate} W={rt.window_W} Ds={rt.Ds}", flush=True)

# 1. pallas sweep kernel alone
from pyc2ray_tpu.ops.pallas_sweep import cheb_sweep_pallas
B, Dc, R1, c = BATCH, g.Dc, g.r_max + 1, g.c
tb = rt.tables
nx = jnp.zeros((Dc, B, Dc, Dc), jnp.float32)
init = jnp.zeros((B, Dc, 2 * Dc), jnp.float32)
t0 = time.time()
lowered = cheb_sweep_pallas.lower(
    (tb.geom_x, tb.geom_y, tb.geom_z), nx, nx, nx, jnp.float32(1.0), init,
    B=B, Dc=Dc, R1=R1, c=c, sig=6.30e-18, bins=None, R2=R*R,
    interpret=False)
t1 = time.time()
compiled = lowered.compile()
t2 = time.time()
print(f"pallas sweep kernel: lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)

# 2. full _trace_impl
rng = np.random.RandomState(100)
pos_b, flux_b = rt.prepare_sources(rng.randint(0, N, size=(NS, 3)), np.ones(NS))
nd = jnp.ones((N,)*3, jnp.float32)
xh = jnp.full((N,)*3, 1.2e-3, jnp.float32)
t0 = time.time()
low2 = rt._trace_jit.lower(rt.tables, nd, xh, pos_b, flux_b, jnp.float32(6.7e20))
t1 = time.time()
comp2 = low2.compile()
t2 = time.time()
print(f"full _trace_impl: lower {t1-t0:.1f}s compile {t2-t1:.1f}s", flush=True)
