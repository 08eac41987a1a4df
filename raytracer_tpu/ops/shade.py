"""Local Phong shading with shadow rays (docs/SPEC.md DIFFUSE_AND_GLOSSY branch).

Reference analog: the `castRay` diffuse/glossy switch arm — per-light shadow trace,
Lambert accumulation, Phong specular (SURVEY.md §3.1 L3). Genre-exact quirks kept:
specular is not shadow-masked and not multiplied by albedo; shadow rays test all
objects including transparent ones.
"""

import jax.numpy as jnp

from raytracer_tpu.core.types import Scene
from raytracer_tpu.ops import trace as trace_ops
from raytracer_tpu.ops.geometry import reflect, spawn_origin
from raytracer_tpu.ops.safemath import dot, safe_pow, safe_sqrt


def shade_diffuse(scene: Scene, surf, in_dir, bias: float, t_min: float,
                  tri_chunk: int, count_rays: bool = False, tracer=None,
                  active=None):
    """Phong local radiance [N,3] for rays hitting diffuse/glossy surfaces.

    Computed for *all* rays (branchless); the caller masks by material type.
    `tracer` overrides the occlusion backend (sharded/ring paths in parallel/).
    `active` [N] bool marks the lanes whose result the caller will keep — the
    walk-based occlusion backends park the other lanes instead of DDA-walking
    shadow rays whose contribution is masked out anyway (active lanes'
    results are bitwise-unchanged).
    Returns (rgb, shadow_ray_count) — the count is for rays/s accounting only.
    """
    p, n = surf.p, surf.n
    # Shadow origin: + bias·N when the viewing ray hits the front face (SPEC).
    sorig = p + jnp.where(dot(in_dir, n) < 0, 1.0, -1.0)[:, None] * bias * n

    nl = scene.lights.count
    n_shadow = jnp.zeros((), jnp.int32)
    if nl == 0:
        return jnp.zeros_like(p), n_shadow
    # Per-light shadow geometry, stacked [L, N, ...]. The L occlusion walks
    # batch into ONE [L·N]-lane tracer call: per-lane math is independent,
    # so results are bitwise-identical to L separate walks, and one wider
    # walk amortizes the per-walk fixed costs (scan-step state staging —
    # the top profile item at VMEM-resident tile sizes, BENCH_LOG r3-h).
    # At the shipping tile 4096 × 2 lights the 8192-lane walk still sits
    # under the VMEM cliff.
    lpos = scene.lights.pos                       # [L, 3]
    lvec = lpos[:, None, :] - p[None, :, :]       # [L, N, 3]
    d2 = jnp.sum(lvec * lvec, axis=-1)            # [L, N]
    dist = safe_sqrt(d2, valid=d2 > 0)
    ldir = lvec / jnp.maximum(dist, 1e-12)[:, :, None]
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    sorig_b = jnp.broadcast_to(sorig[None], (nl,) + sorig.shape)
    act_b = None if active is None else \
        flat(jnp.broadcast_to(active[None], (nl,) + active.shape))
    if tracer is None:
        shadowed = trace_ops.occluded(scene, flat(sorig_b), flat(ldir),
                                      flat(dist), t_min, tri_chunk,
                                      active=act_b)
    else:
        shadowed = tracer.occluded(flat(sorig_b), flat(ldir), flat(dist),
                                   t_min, tri_chunk, active=act_b)
    # part of the render "plan" (renderer._name_plan): saved as a remat
    # residual so the backward never re-walks shadow rays
    from jax.ad_checkpoint import checkpoint_name
    shadowed = checkpoint_name(shadowed, "trace_plan").reshape(nl, -1)

    light_amt = jnp.zeros_like(p)
    spec = jnp.zeros_like(p)
    for li in range(nl):  # L is tiny and static — shading stays unrolled
        lint = scene.lights.intensity[li]
        ldn = jnp.maximum(0.0, dot(ldir[li], n))
        vis = jnp.where(shadowed[li], 0.0, 1.0)
        light_amt = light_amt + (vis * ldn)[:, None] * lint[None, :]
        r = reflect(-ldir[li], n)
        spec = spec + safe_pow(-dot(r, in_dir), surf.spec_n)[:, None] \
            * lint[None, :]
        if count_rays:
            n_shadow = n_shadow + p.shape[0]
    rgb = light_amt * surf.albedo * surf.kd[:, None] + spec * surf.ks[:, None]
    return rgb, n_shadow
