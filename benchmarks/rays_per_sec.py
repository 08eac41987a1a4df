"""rays/s benchmark harness (SURVEY.md §6): fwd and fwd+bwd per chip.

Primary metric (BASELINE.json:2): rays/sec/chip, fwd+bwd, 1080p, 4-bounce.
"vs_baseline" normalization: the driver-set north star is >1e9 rays/s fwd+bwd
on a v5p-16 slice (8 chips) ⇒ per-chip fair share 1.25e8 rays/s. The reference
itself publishes no numbers (BASELINE.json:13 "published": {}).
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from raytracer_tpu.models import presets
from raytracer_tpu.renderer import render
from raytracer_tpu.utils.profiling import timed

NORTH_STAR_PER_CHIP = 1e9 / 8.0  # v5p-16 = 8 chips


def _grad_params(scene):
    return {
        "center": scene.spheres.center,
        "radius": scene.spheres.radius,
        "albedo": scene.materials.albedo,
        "light_pos": scene.lights.pos,
        "light_int": scene.lights.intensity,
    }


def _with_params(scene, p):
    return scene.replace(
        spheres=dataclasses.replace(scene.spheres, center=p["center"],
                                    radius=p["radius"]),
        materials=dataclasses.replace(scene.materials, albedo=p["albedo"]),
        lights=dataclasses.replace(scene.lights, pos=p["light_pos"],
                                   intensity=p["light_int"]),
    )


def run_bench(config: str = "config4", repeats: int = 3, fwd_bwd: bool = True,
              width: int | None = None, height: int | None = None,
              max_depth: int | None = None, emit_json: bool = True,
              use_grid: bool | None = None, tile_rays: int | None = None):
    scene, cam, opts = presets.PRESETS[config]()
    if width:
        opts = dataclasses.replace(opts, width=width, height=height or width)
    if max_depth is not None:
        opts = dataclasses.replace(opts, max_depth=max_depth)
    if tile_rays is not None:
        opts = dataclasses.replace(opts, tile_rays=tile_rays)

    tracer = None
    if use_grid or (use_grid is None and scene.meshes.count):
        from raytracer_tpu.accel.grid import GridTracer

        tracer = GridTracer.build(scene)

    # IMPORTANT ordering: on this TPU stack the first device→host readback
    # permanently degrades per-dispatch latency (~25 ms) for the rest of the
    # process. All timing runs first (block_until_ready only, no readbacks);
    # the data-dependent ray count is read back at the very end.
    scene, cam, tracer = jax.device_put((scene, cam, tracer))

    fwd = jax.jit(lambda s, c, tr: render(s, c, opts, tracer=tr)[0])
    img, t_fwd = timed(fwd, scene, cam, tracer, repeats=repeats)

    t_bwd = None
    if fwd_bwd:
        target = img * 0.9  # any fixed target; forces full backward

        def loss(p, s, c, timg, tr):
            out = render(_with_params(s, p), c, opts, tracer=tr)[0]
            return jnp.mean((out - timg) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        p0 = _grad_params(scene)
        (_, g), t_bwd = timed(lambda: vg(p0, scene, cam, target, tracer),
                              repeats=repeats)

    # ---- readbacks only below this line ----
    n_rays = float(jax.jit(
        lambda s, c, tr: render(s, c, opts, count_rays=True, tracer=tr)[1])(
            scene, cam, tracer))
    fwd_rate = n_rays / t_fwd
    results = {
        "config": config, "width": opts.width, "height": opts.height,
        "max_depth": opts.max_depth, "rays_per_frame": n_rays,
        "fwd_s": t_fwd, "fwd_rays_per_sec": fwd_rate,
        "device": str(jax.devices()[0]),
    }
    if t_bwd is not None:
        results["fwd_bwd_s"] = t_bwd
        results["fwd_bwd_rays_per_sec"] = n_rays / t_bwd

    rate = results.get("fwd_bwd_rays_per_sec", fwd_rate)
    if emit_json:
        print(json.dumps({
            "metric": f"rays_per_sec_per_chip_fwd{'_bwd' if fwd_bwd else ''}"
                      f"_{opts.width}x{opts.height}_d{opts.max_depth}_{config}",
            "value": rate,
            "unit": "rays/s",
            "vs_baseline": rate / NORTH_STAR_PER_CHIP,
        }))
    return results
