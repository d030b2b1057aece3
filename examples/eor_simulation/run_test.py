"""Production EoR run driver (analog of test/paper_eor_simulation/run_test.py).

Loops over redshift slices from CubeP3M catalogs, doing ``num_steps``
timesteps per slice. Requires ./inputs/ populated with
coarser_densities/<z>n_all.dat files and sources/*.hdf5 catalogs; use
--synthetic to generate a random self-contained input set instead.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def make_synthetic_inputs(N, basedir, zlist, ns=200):
    """Generate a synthetic density + source input set (the role of
    archive/fake_cosmo_for_report in the reference)."""
    import h5py
    os.makedirs(os.path.join(basedir, "coarser_densities"), exist_ok=True)
    os.makedirs(os.path.join(basedir, "sources"), exist_ok=True)
    rng = np.random.RandomState(1)
    for z in zlist:
        rho = (1.0 + 0.3 * rng.standard_normal((N, N, N))).clip(0.1)
        rho = (rho * 1.0e-28).astype(np.float32)  # g/cm^3 comoving-ish
        fn = os.path.join(basedir, "coarser_densities", f"{z:.3f}n_all.dat")
        with open(fn, "wb") as f:
            np.asarray([N, N, N], dtype=np.int32).tofile(f)
            rho.flatten(order="F").tofile(f)
        with h5py.File(os.path.join(basedir, "sources",
                                    f"{z:.3f}-sources.hdf5"), "w") as f:
            f["sources_positions"] = rng.randint(1, N + 1, size=(ns, 3))
            f["sources_mass"] = 10 ** rng.uniform(9, 11, ns)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-N", type=int, default=250)
    parser.add_argument("--num_steps", type=int, default=2)
    parser.add_argument("--num_slices", type=int, default=3)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--numsrc", type=int, default=200,
                        help="sources per slice for --synthetic")
    args = parser.parse_args()

    import pyc2ray_tpu as pc2r

    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(here)
    os.makedirs("results", exist_ok=True)
    paramfile = os.path.join(here, "parameters.yml")

    zlist = np.array([21.062, 20.134, 19.284, 18.501, 17.778, 17.108])
    zlist = zlist[: args.num_slices + 1]
    inputs = "./inputs"
    if args.synthetic:
        # NEVER write into ./inputs — it holds the committed CubeP3M
        # example data (a synthetic run once clobbered it)
        inputs = "./inputs_synthetic"
        make_synthetic_inputs(args.N, inputs, zlist, ns=args.numsrc)

    sim = pc2r.C2Ray_CubeP3M(paramfile, args.N, use_gpu=True)
    if args.synthetic:
        sim.inputs_basename = inputs + "/"

    xh_initial = np.asarray(sim.xh).copy()
    steps_executed = 0
    for k in range(len(zlist) - 1):
        zi, zf = zlist[k], zlist[k + 1]
        pc2r.printlog(f"=== slice z = {zi:.3f} -> {zf:.3f} ===", sim.logfile)
        sim.read_density(zi)
        srcfile = f"{inputs}/sources/{zi:.3f}-sources.hdf5"
        srcpos, normflux = sim.read_sources(srcfile)
        dt = sim.set_timestep(zi, zf, args.num_steps)
        for t in range(args.num_steps):
            sim.cosmo_evolve(dt)
            sim.evolve3D(dt, normflux, srcpos)
            steps_executed += 1
        sim.write_output(zf)

    if steps_executed == 0:
        raise SystemExit("ERROR: zero timesteps executed "
                         "(num_slices/num_steps too small)")
    if np.array_equal(np.asarray(sim.xh), xh_initial):
        raise SystemExit(f"ERROR: ionized fraction unchanged after "
                         f"{steps_executed} steps; the run did not evolve")
    pc2r.printlog(f"EoR run complete ({steps_executed} steps).", sim.logfile)


if __name__ == "__main__":
    main()
