"""Multi-host (pod-scale) entry points.

The reference's multi-node story is user-supplied mpi4py (the test
script passes MPI.COMM_WORLD into the sim,
test/unit_tests_hackathon/4_multiple_sources_mpi/run_test.py:29-34).
The TPU-native equivalent is ``jax.distributed``: every host runs the
same program, JAX wires the pod's ICI/DCN fabric, and the SAME
shard_map code from source_parallel.py / domain.py runs unchanged —
``jax.devices()`` simply returns the global device list, so a mesh
built from it spans hosts and the psum / ppermute collectives ride the
inter-chip interconnect.

Typical pod run:

    import pyc2ray_tpu as pc2r
    from pyc2ray_tpu.parallel import multihost
    multihost.initialize()                  # no-op on a single process
    mesh = multihost.global_domain_mesh()   # all chips on the pod
    sim = pc2r.C2Ray_Test("parameters.yml", N, mesh=mesh)

Every host must execute the identical script (standard SPMD); outputs
should be written by process 0 only — gate on ``is_primary()``.
"""

import os

import jax

from .mesh import make_mesh
from .domain import make_domain_mesh

__all__ = ["initialize", "is_primary", "global_domain_mesh",
           "global_source_mesh"]


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Initialize jax.distributed when running as one process of a
    multi-host job; a harmless no-op for single-process runs.

    On Cloud TPU pods all three arguments are auto-detected from the
    environment; on other clusters pass them explicitly (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    # auto-detect only unambiguous multi-host environments: a TPU pod
    # worker list with >1 host, or an explicit process count > 1
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    multi = ("," in hosts) or (nproc and nproc > 1)
    if not explicit and not multi:
        return False  # single-process run
    # forward the env-configured topology explicitly: jax.distributed
    # only auto-reads the coordinator address, not the process count/id
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address or explicit,
        num_processes=num_processes or (nproc if nproc > 0 else None),
        process_id=process_id)
    return True


def is_primary():
    """True on the process that should write outputs/logs (rank-0
    analog of the reference's `if rank == 0` gating)."""
    return jax.process_index() == 0


def global_domain_mesh(pi=None, pj=None, pk=None):
    """("di","dj","dk") domain mesh over ALL chips of the job (all
    hosts).

    Defaults to the most-cubic factorization of the global device count
    so halo surfaces are minimized."""
    n = len(jax.devices())
    if pi is None and pj is None and pk is None:
        pk = 1
        for f in range(int(round(n ** (1.0 / 3.0))), 0, -1):
            if n % f == 0:
                pk = f
                break
        m = n // pk
        pj = 1
        for f in range(int(m ** 0.5), 0, -1):
            if m % f == 0:
                pj = f
                break
        pi = m // pj
    else:
        # partially specified: missing minor axes default to 1, a
        # missing pi absorbs the remaining devices
        pj = 1 if pj is None else pj
        pk = 1 if pk is None else pk
        pi = n // (pj * pk) if pi is None else pi
    return make_domain_mesh(pi, pj, pk)


def global_source_mesh():
    """("src","space") source-parallel mesh over all chips (reference
    MPI-mode parity)."""
    return make_mesh()
