"""Window vs scan accumulate on real TPU hardware.

Production small-box probe (R=8, N=250, 20k sources — the EoR operating
point from TPU_PERFORMANCE_NOTES 'small-box cost floor') plus the bench
config (R=30, N=256, 2048 sources).
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from pyc2ray_tpu.ops.raytrace_box import grey_bins
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.blackbody import BlackBodySource
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer

ap = argparse.ArgumentParser()
ap.add_argument("--N", type=int, default=250)
ap.add_argument("--R", type=float, default=8.0)
ap.add_argument("--ns", type=int, default=20000)
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--bins", type=int, default=4, help="panels (x8 nodes)")
ap.add_argument("--modes", default="scan:8,window:32,window:64,window:128")
ap.add_argument("--W", type=int, default=None)
ap.add_argument("--compress", type=float, default=0.0,
                help="compress dense bins to this rel target (0 = off)")
args = ap.parse_args()

SIG = 6.30e-18
N, R, ns = args.N, args.R, args.ns
rng = np.random.default_rng(42)
nd = (1.0e-4 * (1 + 0.2 * rng.random((N, N, N)))).astype(np.float32)
xh = (1e-4 * rng.random((N, N, N))).astype(np.float32)
pos = rng.integers(0, N, (ns, 3))
flux = 10 ** rng.uniform(0, 2, ns)
dr = 6.7e22

fmin = 3.288e15
src = BlackBodySource(5e4, False, fmin, 2.8)
if args.compress > 0:
    from pyc2ray_tpu.radiation.bins_compress import compress_bins
    dense = make_spectral_bins(src, fmin, 10 * fmin * 4, panels=48, nodes=16)
    t0 = time.time()
    bins = compress_bins(dense, target_rel=args.compress)
    print(f"compressed bins: K={bins.num_bins} (fit {time.time()-t0:.0f}s)")
else:
    bins = make_spectral_bins(src, fmin, 10 * fmin * 4,
                              panels=args.bins, nodes=8)

nd_d = jnp.asarray(nd.ravel())
xh_d = jnp.asarray(xh.ravel())
dr_d = jnp.asarray(dr, jnp.float32)

results = {}
for spec in args.modes.split(","):
    mode, B = spec.split(":")
    B = int(B)
    t0 = time.time()
    fuse_fold = mode.startswith("fold")
    acc = {"fold": "scan", "foldwin": "window"}.get(mode, mode)
    eng = ChebRaytracer(N, R, SIG, bins, batch_size=B, use_pallas=True,
                        accumulate=acc, window_size=args.W,
                        fuse_fold=fuse_fold)
    pb, fb = eng.prepare_sources(pos, flux)
    fill = float((np.asarray(fb) > 0).mean())
    # warmup/compile
    phi, _ = eng.trace_batches(nd_d, xh_d, pb, fb, dr_d)
    s = float(jnp.sum(phi))  # force
    t_compile = time.time() - t0
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        phi, _ = eng.trace_batches(nd_d, xh_d, pb, fb, dr_d)
        s = float(jnp.sum(phi))
        ts.append(time.time() - t0)
    t = min(ts)
    ns_per_cell = t / (ns * 4 / 3 * np.pi * R ** 3) * 1e9
    key = f"{mode}:B{B}" + (f":W{eng.window_W}" if mode == "window" else "")
    results[key] = (t, ns_per_cell, s)
    nb = getattr(pb, "pos", pb).shape[0]
    print(f"{key:>22}: {t*1e3:8.1f} ms  {ns_per_cell:7.2f} ns/cell  "
          f"nb={nb} fill={fill:.2f}  compile={t_compile:.0f}s  "
          f"checksum={s:.6e}", flush=True)

ks = list(results)
if len(ks) > 1:
    ref = results[ks[0]][2]
    for k in ks[1:]:
        rd = abs(results[k][2] - ref) / abs(ref)
        print(f"checksum rel dev {ks[0]} vs {k}: {rd:.2e}")
