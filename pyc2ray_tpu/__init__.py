"""pyc2ray-tpu: a TPU-native radiative-transfer + ionization-chemistry
framework for Epoch-of-Reionization simulations.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
pyc2ray (C2Ray + ASORA): octahedral short-characteristics raytracing,
photon-conserving photoionization rates, analytic hydrogen ionization
chemistry, black-body radiation tables, cosmological evolution, N-body
coupling, and multi-chip source-parallel execution over a device mesh.
"""

def _enable_compilation_cache():
    """Persistent XLA compilation cache (the CUDA reference gets kernel
    caching from the driver for free; on TPU the engines compile for
    20-350 s per configuration, and the JAX persistent cache — keyed by
    HLO hash + compiler version, so always safe — turns every repeat
    run into a ~ms cache hit). Opt out with PYC2RAY_TPU_NO_COMPILE_CACHE;
    override the location with PYC2RAY_TPU_COMPILE_CACHE. A cache dir
    already configured by the embedding application is honored."""
    import os
    if os.environ.get("PYC2RAY_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is not None:
            return
        d = os.environ.get(
            "PYC2RAY_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "pyc2ray_tpu", "jax_cache"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass          # cache is an optimization, never a requirement


_enable_compilation_cache()

from . import constants
from .chemistry_api import hydrogenODE
from .cosmology import FlatLambdaCDM
from .evolve import evolve3D
from .models import C2RaySimulation, C2Ray_Test, C2Ray_CubeP3M, C2Ray_244Test
from .ops import (ChemistryParams, global_pass, doric,
                  OctaGeometry, build_geometry, RaytraceConfig, Raytracer)
from .radiation import BlackBodySource, make_tau_table
from .utils import (printlog, format_sources, read_test_sources,
                    generate_test_sourcefile)

__version__ = "0.1.0"

__all__ = [
    "constants", "hydrogenODE", "FlatLambdaCDM", "evolve3D",
    "C2RaySimulation", "C2Ray_Test", "C2Ray_CubeP3M", "C2Ray_244Test",
    "ChemistryParams", "global_pass", "doric",
    "OctaGeometry", "build_geometry", "RaytraceConfig", "Raytracer",
    "BlackBodySource", "make_tau_table",
    "printlog", "format_sources", "read_test_sources",
    "generate_test_sourcefile",
]
