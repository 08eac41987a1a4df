from raytracer_tpu.accel.grid import GridData, GridTracer, build_grid

__all__ = ["GridData", "GridTracer", "build_grid"]
