"""Device-mesh helpers for multi-chip execution.

The reference's distributed backend is mpi4py with contiguous source-range
splitting, a Gamma Reduce+Bcast per convergence iteration, and chemistry
serialized on rank 0 (reference: pyc2ray/evolve.py:361-371,433-437,439-448).

The TPU-native equivalent is a ``jax.sharding.Mesh``:

* axis ``"src"``: source-parallel raytracing — each device sweeps its shard
  of the source catalog; a single ``psum`` over ICI replaces Reduce+Bcast.
* axis ``"space"``: grid-cell parallelism — the chemistry pass runs
  shard-local over cells on *all* devices (no rank-0 bottleneck); in the
  raytrace step this axis currently co-shards sources (full-grid sweeps),
  and is reserved for 3D domain decomposition with halo exchange.
"""

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "device_count"]


def device_count():
    return len(jax.devices())


def make_mesh(n_src=None, n_space=1, devices=None):
    """Create a 2D ("src", "space") device mesh.

    By default all devices go on the source axis (the reference's
    source-decomposition parallelism)."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_src is None:
        n_src = n_dev // n_space
    assert n_src * n_space == n_dev, \
        f"mesh {n_src}x{n_space} != {n_dev} devices"
    dev_array = np.array(devices).reshape(n_src, n_space)
    return Mesh(dev_array, ("src", "space"))
