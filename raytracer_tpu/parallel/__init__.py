from raytracer_tpu.parallel.mesh import make_rt_mesh
from raytracer_tpu.parallel.shard import render_sharded

__all__ = ["make_rt_mesh", "render_sharded"]
