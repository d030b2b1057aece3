"""pyc2ray-tpu: a TPU-native radiative-transfer + ionization-chemistry
framework for Epoch-of-Reionization simulations.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
pyc2ray (C2Ray + ASORA): octahedral short-characteristics raytracing,
photon-conserving photoionization rates, analytic hydrogen ionization
chemistry, black-body radiation tables, cosmological evolution, N-body
coupling, and multi-chip source-parallel execution over a device mesh.
"""

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
