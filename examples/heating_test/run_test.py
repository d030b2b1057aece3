"""Photoheating test (beyond the reference test suite).

A single black-body source ionizes AND heats an initially cold uniform
medium (Material.isothermal: false — the capability the reference
declares TODO, README.md:81-87). Checks:

* the temperature profile T(r) declines monotonically (binned) away
  from the source,
* the ionized core is photoheated to ~1e4 K scale while distant gas
  stays near the initial temperature,
* temperature and ionization fronts track each other.

Usage: python run_test.py [-N 48] [--steps 6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("-N", type=int, default=48)
parser.add_argument("--steps", type=int, default=6)
args = parser.parse_args()

import pyc2ray_tpu as pc2r

N = args.N
base = open(os.path.join(os.path.dirname(__file__), "..",
                         "single_source_test", "parameters.yml")).read()
base = base.replace("NumTau: 2000", "NumTau: 500")
base = base.replace("compute_heating_rates: 0", "compute_heating_rates: 1")
base = base.replace("temp0: 1e4", "temp0: 1e2")
base = base.replace("Material:", "Material:\n  isothermal: false")
base = base.replace("results_basename: ./results/", "results_basename: "
                    + os.path.join(os.getcwd(), "results") + "/")
base = base.replace("dtype: float64", "dtype: float64\n  engine: cheb")
os.makedirs("results", exist_ok=True)
pfile = os.path.join("results", "parameters_heating.yml")
open(pfile, "w").write(base)

sim = pc2r.C2Ray_Test(pfile, N, use_gpu=True)
sim.ndens = 1e-3 * np.ones((N, N, N))
srcpos = np.array([[N // 2 + 1], [N // 2 + 1], [N // 2 + 1]], dtype=float)
srcflux = np.array([50.0])

zreds = sim.generate_redshift_array(2, 2e6)
dt = sim.set_timestep(zreds[0], zreds[1], args.steps)
for step in range(args.steps):
    sim.evolve3D(dt, srcflux, srcpos)

temp = np.asarray(sim.temp).reshape(N, N, N)
xh = np.asarray(sim.xh).reshape(N, N, N)
c = N // 2
i, j, k = np.indices((N, N, N))
r = np.sqrt((i - c) ** 2 + (j - c) ** 2 + (k - c) ** 2)

# radially binned profiles
rb = np.arange(0, N // 2)
t_prof = np.array([temp[(r >= a) & (r < a + 1)].mean() for a in rb])
x_prof = np.array([xh[(r >= a) & (r < a + 1)].mean() for a in rb])

print("\n r [cells]   <T> [K]      <x>")
for a in range(0, N // 2, 3):
    print(f"  {a:3d}      {t_prof[a]:10.1f}  {x_prof[a]:.3e}")

ok = True


def check(name, cond):
    global ok
    print(f"{name:55s} {'PASSED' if cond else 'FAILED'}")
    ok = ok and cond


core = t_prof[1]
edge = t_prof[-1]
check("core photoheated above 5e3 K", core > 5e3)
check("distant gas within 3x of initial 100 K", edge < 300.0)
# T peaks near the I-front (spectral hardening deposits more energy per
# ionization deeper in), then falls steeply: monotone beyond the front.
r_front = int(np.argmin(np.abs(x_prof - 0.5)))
post = t_prof[r_front:]
check("T profile monotone non-increasing beyond the I-front (tol 1%)",
      bool(np.all(np.diff(post) <= 0.01 * post[:-1] + 1e-9)))
check("T peak sits at/inside the I-front",
      int(np.argmax(t_prof)) <= r_front + 1)
# ionized gas is hot; a preheated partially-ionized shell beyond the
# front (hard photons) is expected and physical
check("ionized gas (x>0.9) is photoheated (median T > 5e3 K)",
      float(np.median(temp[xh > 0.9])) > 5e3)
print("\nALL TESTS PASSED" if ok else "\nSOME TESTS FAILED")
sys.exit(0 if ok else 1)
