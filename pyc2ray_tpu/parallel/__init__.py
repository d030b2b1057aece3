from .mesh import make_mesh, device_count
from .source_parallel import trace_sharded, global_pass_sharded, evolve3D_sharded

__all__ = ["make_mesh", "device_count", "trace_sharded",
           "global_pass_sharded", "evolve3D_sharded"]
