"""Profile trace_batches at bench config via diagnostics helpers."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.spectral_bins import make_spectral_bins
from pyc2ray_tpu.constants import ev2fr
from pyc2ray_tpu.diagnostics import profile_trace, device_op_times

N, R, NS, B = 250, 8.0, 512, 8
fmin, fmax = ev2fr * 13.598, 10 * ev2fr * 54.416
bins = make_spectral_bins(BlackBodySource(5e4, False, fmin, 2.8),
                          fmin, fmax, panels=4, nodes=8)
rt = ChebRaytracer(N, R, 6.30e-18, bins, batch_size=B,
                   dtype=jnp.float32, use_pallas=True)
rng = np.random.RandomState(100)
pos_b, flux_b = rt.prepare_sources(rng.randint(0, N, size=(NS, 3)),
                                   np.ones(NS))
ndens = jnp.asarray(1e-3 * np.ones(N ** 3), jnp.float32)
xh = jnp.asarray(1.2e-3 * np.ones(N ** 3), jnp.float32)
dr = jnp.asarray(6.7e20, jnp.float32)

phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
float(jnp.ravel(phi)[0])
with profile_trace("/tmp/prof3") as p:
    phi, _ = rt.trace_batches(ndens, xh, pos_b, flux_b, dr)
    p["sync"] = phi
nb = NS // B
for name, ms in list(device_op_times("/tmp/prof3").items())[:25]:
    print(f"{ms:9.3f} ms total  {ms/nb*1000:8.1f} us/batch  {name[:90]}")
