"""Per-op device profile of the R=10 window path (current pipeline)."""
import numpy as np, jax, jax.numpy as jnp
from pyc2ray_tpu.radiation.blackbody import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.radiation.bins_compress import compress_bins
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.diagnostics import profile_trace, device_op_times

N, R, ns = 250, 10.0, 100000
rng = np.random.default_rng(42)
nd = (1.0e-4*(1+0.2*rng.random((N,)*3))).astype(np.float32)
xh = (1e-4*rng.random((N,)*3)).astype(np.float32)
pos = rng.integers(0, N, (ns,3)); flux = 10**rng.uniform(0,2,ns)
fmin=3.288e15; src=BlackBodySource(5e4, False, fmin, 2.8)
bins = compress_bins(make_spectral_bins(src, fmin, 40*fmin, panels=48, nodes=16), 1e-3)
nd_d, xh_d = jnp.asarray(nd.ravel()), jnp.asarray(xh.ravel())
dr = jnp.asarray(6.7e22, jnp.float32)
eng = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=32, use_pallas=True,
                    accumulate="window")
pb, fb = eng.prepare_sources(pos, flux)
nb = pb.pos.shape[0]
phi,_ = eng.trace_batches(nd_d, xh_d, pb, fb, dr)
s = float(jnp.sum(phi))  # warm
import shutil; shutil.rmtree("/tmp/prof_r10", ignore_errors=True)
with profile_trace("/tmp/prof_r10") as p:
    phi,_ = eng.trace_batches(nd_d, xh_d, pb, fb, dr)
    p["sync"] = phi
times = device_op_times("/tmp/prof_r10", top=25)
tot = sum(device_op_times("/tmp/prof_r10").values())
print(f"nb={nb} total_device_ms={tot*1e3:.1f} per_batch_us={tot/nb*1e6:.1f}")
for k, v in times.items():
    print(f"{v*1e3:9.2f} ms  {v/nb*1e6:7.1f} us/b  {k[:90]}")
