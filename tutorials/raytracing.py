"""Tutorial: standalone raytracing.

Analog of the reference's raytracing tutorials: compute the
photoionization-rate field of a few sources in a clumpy medium and show
the expected 1/r^2 x attenuation behavior along a ray.

Run: python tutorials/raytracing.py [--engine cheb|flat]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

parser = argparse.ArgumentParser()
parser.add_argument("--engine", default="cheb", choices=["cheb", "flat"])
args = parser.parse_args()

N = 64
dr = 2.0e21
sig = 6.30e-18
rng = np.random.RandomState(1)
ndens = 10 ** rng.uniform(-3.5, -2.5, (N, N, N))
xh = 1.2e-3 * np.ones((N, N, N))
src_pos = np.array([[32, 32, 32], [10, 50, 20]])
src_flux = np.array([10.0, 3.0])   # units of S_star = 1e48 photons/s

if args.engine == "cheb":
    from pyc2ray_tpu.ops.raytrace_cheb import ChebRaytracer
    from pyc2ray_tpu.ops.raytrace_box import grey_bins
    rt = ChebRaytracer(N, 1e9, sig, grey_bins(), batch_size=2,
                       dtype=jnp.float64)
else:
    from pyc2ray_tpu.ops.raytrace import RaytraceConfig, Raytracer
    cfg = RaytraceConfig(N=N, R_max_LLS=1e9, sig=sig, batch_size=2,
                         dtype=jnp.float64, grey_analytic=True)
    rt = Raytracer(cfg)

phi = np.asarray(rt.trace(ndens, xh, src_pos, src_flux, dr))
print(f"Gamma field: min {phi.min():.3e}  mean {phi.mean():.3e}  "
      f"max {phi.max():.3e}  [1/s]")

# profile along +x from the first source
print("\n r [cells]   Gamma [1/s]   Gamma * 4 pi r^2 dr^2 (attenuated flux)")
for r in range(1, 20):
    g = phi[32 + r, 32, 32]
    print(f"{r:10d}   {g:10.3e}   {g * 4 * np.pi * (r * dr) ** 2:10.3e}")

from pyc2ray_tpu.diagnostics import photon_budget
budget = photon_budget(phi, ndens, xh, src_flux, dr)
print(f"\nphoton budget: emitted {budget['emitted_per_s']:.3e}/s, "
      f"absorbed {budget['absorbed_per_s']:.3e}/s, "
      f"loss fraction {budget['loss_fraction']:.2e}")
