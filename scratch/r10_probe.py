"""R=10 convergence + production probe with compressed bins, HIGH, auto-W."""
import argparse, time, numpy as np, jax, jax.numpy as jnp
from pyc2ray_tpu.radiation.blackbody import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer

ap = argparse.ArgumentParser()
ap.add_argument("--N", type=int, default=250)
ap.add_argument("--R", type=float, default=10.0)
ap.add_argument("--ns", type=int, default=100000)
ap.add_argument("--configs", default="16:0,32:0,48:0")   # B:W (0=auto)
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--target", type=float, default=1e-3)
args = ap.parse_args()
N, R, ns = args.N, args.R, args.ns
rng = np.random.default_rng(42)
nd = (1.0e-4*(1+0.2*rng.random((N,)*3))).astype(np.float32)
xh = (1e-4*rng.random((N,)*3)).astype(np.float32)
pos = rng.integers(0, N, (ns,3)); flux = 10**rng.uniform(0,2,ns)
fmin=3.288e15; src=BlackBodySource(5e4, False, fmin, 2.8)
bins = compress_bins(make_spectral_bins(src, fmin, 40*fmin, panels=48, nodes=16), args.target)
print("K =", bins.num_bins, flush=True)
nd_d, xh_d = jnp.asarray(nd.ravel()), jnp.asarray(xh.ravel())
dr = jnp.asarray(6.7e22, jnp.float32)
for cfg in args.configs.split(","):
    B, W = (int(x) for x in cfg.split(":"))
    eng = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B, use_pallas=True,
                        accumulate="window", window_size=W or None)
    pb, fb = eng.prepare_sources(pos, flux)
    fill = float((np.asarray(fb) > 0).mean())
    t0=time.time()
    phi,_ = eng.trace_batches(nd_d, xh_d, pb, fb, dr); s=float(jnp.sum(phi))
    tc=time.time()-t0
    ts=[]
    for _ in range(args.reps):
        t0=time.time(); phi,_ = eng.trace_batches(nd_d, xh_d, pb, fb, dr)
        s=float(jnp.sum(phi)); ts.append(time.time()-t0)
    t=min(ts); npc=t/(ns*4/3*np.pi*R**3)*1e9
    print(f"B{B} W{eng.window_W}: {t*1e3:8.1f} ms {npc:6.2f} ns/cell fill={fill:.2f} compile={tc:.0f}s checksum={s:.8e}", flush=True)
