from .chemistry import global_pass, doric, ChemistryParams
from .geometry import OctaGeometry, build_geometry
from .raytrace import RaytraceConfig, Raytracer

__all__ = [
    "global_pass", "doric", "ChemistryParams",
    "OctaGeometry", "build_geometry",
    "RaytraceConfig", "Raytracer",
]
