"""Single black-body source regression test.

Analog of the reference's golden test
(test/unit_tests_hackathon/1_single_black_body/run_test.py): a uniform
grid ionized by one 1e49 photons/s black-body source for 2 redshift slices
x 10 timesteps. The reference compares against a stored original-C2Ray
binary (not shipped in the repo); here the reference solution is produced
by the sequential C2Ray-faithful native oracle running the identical
evolve loop, and the same per-cell error statistics and tolerances are
applied (run_test.py:89-118).

Usage: python run_test.py [-N 32] [--full]   (--full uses N=128)

NOTE: this is a like-for-like TABLE comparison, so parameters.yml keeps
``engine: flat`` (table-exact; passes at ~1e-9). The production cheb /
pallas engines evaluate the exact band integral via spectral bins and
differ from the table oracle by the TABLE's own interpolation error
(up to ~2e-4 end-to-end at these tolerances) — see README "Accuracy
hierarchy".
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

# x64 is required by the table-exact flat engine (f64 tables); the
# production cheb/pallas variants run float32 and global x64 would
# promote Mosaic index/shift scalars to i64, which the TPU kernel
# compiler rejects
_eng = None
for _i, _a in enumerate(sys.argv):
    if _a == "--engine" and _i + 1 < len(sys.argv):
        _eng = sys.argv[_i + 1]
    elif _a.startswith("--engine="):
        _eng = _a.split("=", 1)[1]
if _eng in (None, "flat"):
    jax.config.update("jax_enable_x64", True)

import pyc2ray_tpu as pc2r
from pyc2ray_tpu.oracle import oracle_chemistry_global
from pyc2ray_tpu.native_ext import (native_available, oracle_sweep_native,
                                    chemistry_global_native)
from pyc2ray_tpu.utils.sourceutils import format_sources

parser = argparse.ArgumentParser()
parser.add_argument("-N", type=int, default=32)
parser.add_argument("--full", action="store_true",
                    help="run the full 128^3 configuration")
parser.add_argument("--numreds", type=int, default=2)
parser.add_argument("--steps", type=int, default=10)
parser.add_argument("--engine", default=None,
                    choices=["flat", "cheb", "pallas"],
                    help="override Raytracing.engine. flat (default) is "
                    "the table-exact f64 path judged against the golden "
                    "2e-5 tolerances; cheb/pallas are the production "
                    "f32 spectral-bin path judged against the documented "
                    "bins-vs-table budget (README accuracy hierarchy)")
args = parser.parse_args()

N = 128 if args.full else args.N
num_steps_between_slices = args.steps
numzred = args.numreds
paramfile = os.path.join(os.path.dirname(__file__), "parameters.yml")
if args.engine:
    import re
    import tempfile
    txt = open(paramfile).read()
    if re.search(r"^\s*engine:", txt, re.M):
        txt = re.sub(r"^(\s*)engine:.*$", rf"\1engine: {args.engine}",
                     txt, flags=re.M)
    else:
        txt = txt.replace("Raytracing:",
                          f"Raytracing:\n  engine: {args.engine}", 1)
    if args.engine != "flat":
        # production engines run float32 (the Mosaic kernel path); the
        # comparison budget below accounts for it
        txt = re.sub(r"^(\s*)dtype:.*$", r"\1dtype: float32",
                     txt, flags=re.M)
    tmp = tempfile.NamedTemporaryFile("w", suffix=".yml", delete=False)
    tmp.write(txt)
    tmp.close()
    paramfile = tmp.name

os.makedirs("./results", exist_ok=True)
sim = pc2r.C2Ray_Test(paramfile, N, use_gpu=True)

zred_array = sim.generate_redshift_array(numzred, 1e7)

# single source at the grid center region (1-indexed convention)
srcpos = np.array([[3 * N // 4], [3 * N // 4], [N // 2]], dtype=float)
srcflux = np.array([1e49 / 1e48])

avgdens = 1e-3
ndens = avgdens * np.ones((N, N, N))
sim.ndens = ndens.copy()

# ---------------- oracle evolve loop (sequential reference) -------------
def oracle_evolve_loop(dt, dr, xh, ndens, temp):
    pos0, flux = format_sources(srcpos, srcflux)
    tables = (sim.photo_thin_table, sim.photo_thick_table,
              sim.heat_thin_table, sim.heat_thick_table,
              sim.minlogtau, sim.dlogtau)
    num_cells = N ** 3
    conv_criterion = min(int(1e-4 * num_cells), 0)
    prev1 = prev0 = 2.0 * num_cells
    xh_av = xh.copy()
    xh_int = xh.copy()
    converged = False
    while not converged:
        phi, _, _ = oracle_sweep_native(ndens, xh_av, pos0, flux, dr,
                                        sim.sig, sim.R_max_LLS,
                                        tables=tables)
        xh_int, xh_av, conv_flag = chemistry_global_native(
            dt, ndens, temp, xh, xh_av, phi, sim.bh00, sim.albpow,
            sim.colh0, sim.temph0, sim.abu_c)
        s1, s0 = xh_int.sum(), (1 - xh_int).sum()
        rel1 = abs((s1 - prev1) / s1) if s1 > 0 else 1.0
        rel0 = abs((s0 - prev0) / s0) if s0 > 0 else 1.0
        converged = (conv_flag < conv_criterion) or (rel1 < 1e-4 and
                                                     rel0 < 1e-4)
        prev1, prev0 = s1, s0
    return xh_int


if not native_available():
    print("native oracle unavailable; cannot produce the reference "
          "solution — aborting")
    sys.exit(1)

xh_oracle = sim.xh.copy()
xh_initial = sim.xh.copy()
temp = sim.temp.copy()
tinit = time.time()

steps_executed = 0
for k in range(len(zred_array) - 1):
    zi, zf = zred_array[k], zred_array[k + 1]
    dt = sim.set_timestep(zi, zf, num_steps_between_slices)
    pc2r.printlog(f"Doing redshift {zi:.3f} to {zf:.3f}", sim.logfile)
    for t in range(num_steps_between_slices):
        sim.cosmo_evolve(dt)
        sim.evolve3D(dt, srcflux, srcpos)
        xh_oracle = oracle_evolve_loop(dt, sim.dr, xh_oracle, sim.ndens,
                                       temp)
        steps_executed += 1

pc2r.printlog(f"Done. Final time: {time.time()-tinit:.3f} s", sim.logfile)

# Guard against vacuous passes: the error statistics below are only
# meaningful if the run actually evolved the field (e.g. --numreds 1
# yields len(zred_array)-1 == 0 slices and would trivially "pass").
if steps_executed == 0:
    print("ERROR: zero timesteps executed (need --numreds >= 2); "
          "no comparison was performed")
    sys.exit(2)
if np.array_equal(np.asarray(sim.xh), xh_initial):
    print("ERROR: ionized fraction did not change over "
          f"{steps_executed} steps; the run did not evolve")
    sys.exit(2)

# ---------------- error statistics (run_test.py:70-118) -----------------
xfrac_tpu = sim.xh
abserr = xfrac_tpu - xh_oracle
relerr = abserr / xh_oracle
print("\n \n TEST RESULTS \n")
print(f"Mean ionized fraction (oracle): {xh_oracle.mean():.12e}")
print(f"Mean ionized fraction (TPU):    {xfrac_tpu.mean():.12e}")

nfail = 0
if args.engine in ("cheb", "pallas"):
    # The production engines evaluate the exact band integral via
    # spectral bins (f32); the oracle interpolates the NumTau=2000
    # log-linear TABLE (f64). Their difference is dominated by the
    # ORACLE TABLE's own interpolation error (the bins are measured
    # ~5x closer to the dense band integral than the table —
    # docs/TPU_PERFORMANCE_NOTES), concentrated in the most neutral
    # cells where relative errors are largest. This variant therefore
    # certifies the production engine against an explicit
    # BINS-VS-TABLE budget (measured r04 hardware values ~x3 headroom:
    # docs/GOLDEN_TPU_128_PALLAS_r05.log), not the golden 2e-5 table
    # tolerances, which only a table-exact engine can meaningfully
    # meet. Its role is production-engine regression detection.
    print(f"(engine {args.engine}: bins-vs-table budget tolerances)")
    checks = [
        ("Absolute mean", abserr.mean(), 5e-5),
        ("Absolute std", abserr.std(), 3e-5),
        ("Absolute max", abserr.max(), 4e-4),
        ("Absolute min", abserr.min(), 3e-5),
        ("Relative mean", relerr.mean(), 3e-2),
        ("Relative std", relerr.std(), 1.5e-2),
        ("Relative max", relerr.max(), 5e-2),
        ("Relative min", relerr.min(), 1e-3),
    ]
else:
    checks = [
        ("Absolute mean", abserr.mean(), 1e-8),
        ("Absolute std", abserr.std(), 3e-7),
        ("Absolute max", abserr.max(), 5e-6),
        ("Absolute min", abserr.min(), 5e-6),
        ("Relative mean", relerr.mean(), 1e-7),
        ("Relative std", relerr.std(), 3e-6),
        ("Relative max", relerr.max(), 2e-5),
        ("Relative min", relerr.min(), 2e-5),
    ]
for name, val, tol in checks:
    ok = abs(val) <= tol
    print(f"{name:16s}: {val: .7e}   {'PASSED' if ok else 'FAILED'}")
    nfail += 0 if ok else 1

print("\nALL TESTS PASSED" if nfail == 0 else f"\n{nfail} TEST(S) FAILED")
sys.exit(0 if nfail == 0 else 1)
