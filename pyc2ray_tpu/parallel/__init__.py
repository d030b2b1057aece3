from .mesh import make_mesh, device_count
from .source_parallel import (trace_sharded, global_pass_sharded,
                              evolve3D_sharded, evolve3D_he_sharded)
from .domain import (make_domain_mesh, DomainDecomposition,
                     evolve3D_domain, evolve3D_he_domain)
from . import multihost

__all__ = ["make_mesh", "device_count", "trace_sharded",
           "global_pass_sharded", "evolve3D_sharded",
           "make_domain_mesh", "DomainDecomposition", "evolve3D_domain",
           "evolve3D_he_domain", "evolve3D_he_sharded",
           "multihost"]
