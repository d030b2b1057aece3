"""Tutorial: helium (H+He) radiative transfer with photoheating.

The reference declares helium, multi-frequency and heating-coupled
chemistry as TODO (reference README.md:81-87); here they are one
parameter file away. This walks the low-level API — the model layer
does the same from YAML with::

    Raytracing:
      engine: he
    Material:
      isothermal: 0
    Photo:
      compute_heating_rates: 1

Run: python tutorials/helium_thermal.py   (CPU-safe, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from pyc2ray_tpu.radiation import BlackBodySource
from pyc2ray_tpu.radiation.helium import make_spectral_bins_he, HE_EDGES_EV
from pyc2ray_tpu.ops.raytrace_he import HeRaytracer
from pyc2ray_tpu.ops.chemistry import ChemistryParams
from pyc2ray_tpu.ops.chemistry_he import HeChemistryParams
from pyc2ray_tpu.ops.thermal import ThermalParams
from pyc2ray_tpu.evolve import evolve3D_he
from pyc2ray_tpu.constants import ev2fr

N = 24
ABU_HE = 0.074                       # He/H by number

# --- three-band spectral bins over the HI / HeI / HeII edges ----------
bb = BlackBodySource(1e5, False, ev2fr * HE_EDGES_EV[0], 2.8)
bins = make_spectral_bins_he(bb, panels_per_band=3, nodes=4)

# --- engine + chemistry + thermal parameters --------------------------
chem = ChemistryParams(bh00=2.59e-13, albpow=-0.7,
                       colh0=1.3e-8 * 0.83 / (13.598 ** 2),
                       temph0=13.598 / 8.617e-05, abu_c=7.1e-7)
phe = HeChemistryParams(chem=chem, abu_he=ABU_HE)
thermal = ThermalParams(bh00=chem.bh00, albpow=chem.albpow,
                        colh0=chem.colh0, temph0=chem.temph0,
                        abu_c=chem.abu_c)
rt = HeRaytracer(N, 1e9, bins, abu_he=ABU_HE, batch_size=1,
                 dtype=jnp.float64, do_heating=True)

# --- fields + one hard source -----------------------------------------
nd = 1e-3 * np.ones((N, N, N))
temp = 1e2 * np.ones((N, N, N))
xh = 1e-3 * np.ones((N, N, N))
y1 = 1e-3 * np.ones((N, N, N))       # xHeII
y2 = np.zeros((N, N, N))             # xHeIII
src = np.array([[N // 2] * 3])
flux = np.array([30.0])              # units of S_star = 1e48 photons/s

out = evolve3D_he(1e13, 2.0e21, flux, src, rt, phe, temp, nd,
                  xh, y1, y2, quiet=True, thermal=thermal, zred=9.0)
xh_n, gH, y1_n, y2_n, gHe1, gHe2, temp_n = out

c = N // 2
line = lambda f: np.asarray(f)[c, c, c:]
print("radial profiles from the source (cell index along +z):")
print("  xHII   :", np.array2string(line(xh_n)[:8], precision=3))
print("  xHeII  :", np.array2string(line(y1_n)[:8], precision=3))
print("  xHeIII :", np.array2string(line(y2_n)[:8], precision=3))
print("  T [K]  :", np.array2string(line(temp_n)[:8], precision=0))
r_h = int(np.sum(line(xh_n) > 0.5))
r_he3 = int(np.sum(line(y2_n) > 0.5))
print(f"HII front at ~{r_h} cells; HeIII front at ~{r_he3} cells "
      f"(HeIII ionized only near the hard source)")
print(f"temperature raised from 100 K to {float(line(temp_n)[0]):.0f} K "
      f"at the source by photoheating")
assert r_h > 0 and np.asarray(temp_n).max() > 1e3
print("OK")
