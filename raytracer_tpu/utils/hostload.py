"""Host-side scene/tracer loading shared by the CLI and the elastic workers.

One copy of: preset-vs-scenefile loading with width/height/depth overrides
(reference analog: `main()`'s Options + scene setup, SURVEY §1 L5), the
meshes-gated winner-search backend selection, and the device recovery wait.
Everything here is cold-path host code — scenes build as numpy pytrees
(core/types.py) and no function below touches a device.
"""

import dataclasses
import os


def load_scene_cli(config: str = "", scene_path: str = "", width: int = 0,
                   height: int = 0, max_depth: int | None = None):
    """(scene, camera, opts) from a preset name or a scene text file."""
    if scene_path:
        from raytracer_tpu.io.scenefile import load_scene

        scene, cam, opts = load_scene(scene_path)
    else:
        from raytracer_tpu.models import presets

        scene, cam, opts = presets.PRESETS[config]()
    if width:
        opts = dataclasses.replace(opts, width=width, height=height or width)
    if max_depth is not None:
        opts = dataclasses.replace(opts, max_depth=max_depth)
    return scene, cam, opts


def build_tracer(scene, kind: str):
    """Winner-search backend for `kind` in {auto, none, grid, bvh, pallas};
    None when the scene has no mesh (dense scan covers analytic prims). The
    `fused` backend is NOT built here — it replaces the whole renderer, not
    the tracer (cli.cmd_render handles it explicitly)."""
    if not scene.meshes.count or kind == "none":
        return None
    if kind in ("grid", "auto"):
        from raytracer_tpu.accel.grid import GridTracer

        return GridTracer.build(scene)
    if kind == "bvh":
        from raytracer_tpu.accel.bvh import BVHTracer

        return BVHTracer.build(scene)
    if kind == "pallas":
        from raytracer_tpu.ops.pallas_trace import PallasTracer

        return PallasTracer(scene)
    if kind == "grid-pallas":
        from raytracer_tpu.accel.grid import GridTracer

        return GridTracer.build(scene, walk="pallas")
    if kind == "mat":
        from raytracer_tpu.ops.mat_trace import MatTracer

        return MatTracer.build(scene)
    raise ValueError(f"unknown tracer kind: {kind!r}")


def recovery_wait_s() -> float:
    """Post-crash backoff before re-dispatching device work: the shared TPU
    worker needs ~2 min to recover from a kernel fault (CLAUDE.md rules 1/5);
    the CPU sim recovers instantly."""
    return 0.0 if os.environ.get("JAX_PLATFORMS") == "cpu" else 120.0
