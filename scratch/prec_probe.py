"""HIGH vs HIGHEST one-hot einsum precision + W tuning on TPU."""
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from pyc2ray_tpu.radiation.blackbody import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer

N, R, ns = 250, 10.0, 100000
rng = np.random.default_rng(42)
nd = (1.0e-4*(1+0.2*rng.random((N,)*3))).astype(np.float32)
xh = (1e-4*rng.random((N,)*3)).astype(np.float32)
pos = rng.integers(0, N, (ns,3)); flux = 10**rng.uniform(0,2,ns)
dr = 6.7e22
fmin=3.288e15; src=BlackBodySource(5e4, False, fmin, 2.8)
bins = compress_bins(make_spectral_bins(src, fmin, 10*fmin*4, panels=48, nodes=16), 1e-3)
print("K =", bins.num_bins, flush=True)
nd_d, xh_d = jnp.asarray(nd.ravel()), jnp.asarray(xh.ravel())
for prec, W in (("highest",64), ("high",64), ("high",48), ("high",56)):
    eng = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=32, use_pallas=True,
                        accumulate="window", window_size=W)
    eng._oh_precision = {"high": lax.Precision.HIGH,
                         "highest": lax.Precision.HIGHEST}[prec]
    eng._trace_jit = jax.jit(eng._trace_impl)
    pb, fb = eng.prepare_sources(pos, flux)
    fill = float((np.asarray(fb) > 0).mean())
    phi,_ = eng.trace_batches(nd_d, xh_d, pb, fb, jnp.asarray(dr, jnp.float32))
    s = float(jnp.sum(phi))
    ts=[]
    for _ in range(3):
        t0=time.time(); phi,_ = eng.trace_batches(nd_d, xh_d, pb, fb, jnp.asarray(dr, jnp.float32))
        s2=float(jnp.sum(phi)); ts.append(time.time()-t0)
    t=min(ts); npc = t/(ns*4/3*np.pi*R**3)*1e9
    print(f"{prec:>8} W={W}: {t*1e3:7.1f} ms {npc:6.2f} ns/cell fill={fill:.2f} checksum={s:.8e}", flush=True)
