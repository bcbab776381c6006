from mamri_tpu.utils.stl import load_stl, sample_surface_points
from mamri_tpu.utils.trace import Tracer, span

__all__ = ["load_stl", "sample_surface_points", "Tracer", "span"]
