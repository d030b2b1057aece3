"""Multi-host pod driver: the distributed deployment pattern.

Every host of a TPU pod runs this same script (standard SPMD). On a
single process it degrades gracefully: ``multihost.initialize()`` is a
no-op and the mesh spans the local devices, so the script doubles as
the single-host multi-chip driver. Outputs are written by process 0
only (``is_primary`` gate).

The analog of the reference's MPI test
(test/unit_tests_hackathon/4_multiple_sources_mpi/run_test.py), with
jax.distributed + a domain mesh instead of mpi4py + replicated grids.

Usage (each host):  python run_test.py [-N 64] [--steps 2]
                    [--mode domain|source]
On a CPU dev box:   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                    JAX_PLATFORMS=cpu python run_test.py -N 32
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import pyc2ray_tpu as pc2r
from pyc2ray_tpu.parallel import multihost


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-N", type=int, default=64)
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument("--numsrc", type=int, default=20)
    parser.add_argument("--mode", default="domain",
                        choices=["domain", "source"])
    args = parser.parse_args()

    # no-op off-pod; on a pod this wires jax.distributed from the env
    multihost.initialize()

    import jax
    mesh = (multihost.global_domain_mesh() if args.mode == "domain"
            else multihost.global_source_mesh())
    if multihost.is_primary():
        print(f"{jax.process_count()} process(es), "
              f"{len(jax.devices())} device(s), mesh = "
              f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")

    N = args.N
    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(here)
    os.makedirs("results", exist_ok=True)
    sim = pc2r.C2Ray_Test(os.path.join(here, "parameters.yml"), N,
                          mesh=mesh)
    sim.ndens = 1e-3 * np.ones((N, N, N))

    rng = np.random.RandomState(7)
    srcpos = rng.randint(1, N + 1, size=(3, args.numsrc)).astype(float)
    srcflux = rng.uniform(1.0, 10.0, args.numsrc)

    zreds = sim.generate_redshift_array(2, 1e6)
    dt = sim.set_timestep(zreds[0], zreds[1], args.steps)
    xh0 = sim.xh.mean()
    for _ in range(args.steps):
        sim.cosmo_evolve(dt)
        sim.evolve3D(dt, srcflux, srcpos)

    if sim.xh.mean() <= xh0:
        raise SystemExit("ERROR: field did not evolve")
    if multihost.is_primary():
        sim.write_output(sim.zred)
        print(f"OK: mean xHII {xh0:.3e} -> {sim.xh.mean():.3e} over "
              f"{args.steps} steps on the {args.mode} mesh")


if __name__ == "__main__":
    main()
