"""Multi-device rendering: pixel-tile DP × primitive sharding (SURVEY.md §3.2).

`render_sharded` runs the wavefront renderer under `jax.shard_map` on a
Mesh('tiles','prims'):

- image rays block-shard over 'tiles' (DP — no cross-chip comm in forward
  except the output gather, which XLA inserts from the out_specs);
- the winner search shards primitives over 'prims' via ShardTracer
  (all_gather + min-combine) or streams them around the ring via RingTracer
  (`ppermute`, rays resident — the ring-attention analog for scenes > HBM);
- the differentiable surface/shade stages use the replicated scene, so
  `jax.grad` through this function equals the single-device gradient, with
  scene-parameter grads psum'd automatically by the shard_map transpose
  (SURVEY §2.3 "Gradient DP").
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raytracer_tpu.core.types import Camera, RenderOptions, Scene
from raytracer_tpu.ops import geometry as geom
from raytracer_tpu.ops.safemath import clamp01
from raytracer_tpu.parallel import tracer as tr
from raytracer_tpu.renderer import render_rays


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def render_sharded(scene: Scene, camera: Camera, opts: RenderOptions, mesh,
                   ring: bool = False, count_rays: bool = False):
    """Full-image render on a Mesh('tiles','prims') → (image, rays_traced)."""
    from raytracer_tpu.core.types import as_jax

    scene = as_jax(scene)
    camera = as_jax(camera)
    n_tiles = mesh.shape["tiles"]
    n_prims = mesh.shape["prims"]
    h, w = opts.height, opts.width
    n_pix = h * w

    per_dev = _ceil_to(-(-n_pix // n_tiles), 8)
    inner = min(opts.tile_rays, per_dev)
    per_dev = _ceil_to(per_dev, inner)
    n_pad = per_dev * n_tiles

    dirs = geom.raygen(camera.pos, camera.c2w, camera.fov_deg, w, h)
    if n_pad != n_pix:
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                                    (n_pad - n_pix, 3))])

    g_full = tr.pad_trace_geom(tr.build_trace_geom(scene), n_prims)
    sizes = (g_full.sph_c.shape[0] // n_prims,
             g_full.pl_p.shape[0] // n_prims,
             g_full.tri_v0.shape[0] // n_prims)

    # check_vma=False: the min-combine (all_gather/psum/ring fold) makes the
    # radiance provably equal across 'prims', but the static varying-axes
    # checker cannot infer that.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P("tiles", None), tr.geom_pspec("prims"), P(), P()),
             out_specs=(P("tiles", None), P()), check_vma=False)
    def body(dirs_shard, g_shard, scene_rep, cam_pos):
        if ring:
            tracer = tr.RingTracer(g_shard, "prims", sizes, n_prims)
        else:
            tracer = tr.ShardTracer(g_shard, "prims", sizes)
        orig = jnp.broadcast_to(cam_pos, (inner, 3))
        tiles = dirs_shard.reshape(-1, inner, 3)

        def tile_fn(carry, td):
            rad, n = render_rays(scene_rep, orig, td, opts,
                                 count_rays=count_rays, tracer=tracer)
            return carry + n, rad

        traced, rad = jax.lax.scan(tile_fn, jnp.zeros((), jnp.float32), tiles)
        # every prim-shard traces the same ray lanes → sum tiles only
        traced = jax.lax.psum(traced, "tiles")
        return rad.reshape(-1, 3), traced

    rad, traced = body(dirs, g_full, scene, camera.pos)
    img = clamp01(rad[:n_pix]).reshape(h, w, 3)
    return img, traced
