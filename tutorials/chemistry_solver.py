"""Tutorial: the standalone chemistry solver.

Analog of the reference's tutorials/chemistry_solver.ipynb: evolve the
ionized fraction of a uniform medium under a fixed photoionization rate
and compare against the analytic photoionization-equilibrium limit.

Run: python tutorials/chemistry_solver.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from pyc2ray_tpu import hydrogenODE

# A uniform box: hydrogen density, temperature, initial neutral state
N = 32
ndens = 1e-3 * np.ones((N, N, N))      # cm^-3
temp = 1e4 * np.ones((N, N, N))        # K
xh = 1.2e-3 * np.ones((N, N, N))       # initial ionized fraction

# A photoionization rate typical of the ionized EoR IGM
gamma = 3e-13 * np.ones((N, N, N))     # 1/s

# Evolve in ten steps of 1 Myr
dt = 3.156e13
for step in range(10):
    # the pass-level convergence flag counts cells whose x_av moved
    # by >1e-3 (always true on the first steps of a big transition),
    # so lift the assert threshold for this demonstration
    xh = hydrogenODE(dt, ndens, temp, xh, gamma,
                     max_nonconverged_fraction=1.01)
    print(f"t = {(step + 1) * dt / 3.156e13:5.1f} Myr   "
          f"<x_HII> = {xh.mean():.6f}")

# Analytic equilibrium: Gamma (1 - x) = alpha_B n_e x  (collisions tiny)
alpha_B = 2.59e-13
g, nH = 3e-13, 1e-3
# solve g(1-x) = a nH x^2  ->  quadratic in x
a = alpha_B * nH
x_eq = (-g + np.sqrt(g * g + 4 * a * g)) / (2 * a)
print(f"\nanalytic photoionization equilibrium: x_eq = {x_eq:.6f}")
print(f"solver equilibrium:                   <x>  = {xh.mean():.6f}")
