"""Multi-device scaling benchmark (SURVEY.md §6: rays/s at 1/N devices,
scaling efficiency vs the ≥85% target).

On this box the mesh is the 8-device CPU simulator (functional check of the
harness); on a real pod slice the same code measures ICI scaling. Usage:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m benchmarks.scaling
"""

import dataclasses
import json
import sys
import time

import jax


def run_scaling(config: str = "config2", width: int = 256, height: int = 256,
                max_depth: int = 2, device_counts=None, prims: int = 1,
                ring: bool = False, repeats: int = 3):
    from raytracer_tpu.models import presets
    from raytracer_tpu.parallel.mesh import make_rt_mesh
    from raytracer_tpu.parallel.shard import render_sharded

    scene, cam, opts = presets.PRESETS[config]()
    opts = dataclasses.replace(opts, width=width, height=height,
                               max_depth=max_depth,
                               tile_rays=max(1024, width * height // 8))
    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]

    results = []
    for nd in device_counts:
        p = prims if nd % max(prims, 1) == 0 and nd >= prims else 1
        mesh = make_rt_mesh(tiles=nd // p, prims=p,
                            devices=jax.devices()[:nd])
        f = jax.jit(lambda s, c: render_sharded(s, c, opts, mesh, ring=ring)[0])
        jax.block_until_ready(f(scene, cam))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(f(scene, cam))
            best = min(best, time.perf_counter() - t0)
        results.append({"devices": nd, "seconds": best,
                        "pixrays_per_sec": width * height / best})

    base = results[0]
    sim = jax.devices()[0].platform == "cpu"
    for r in results:
        ideal = base["pixrays_per_sec"] * r["devices"]
        r["efficiency"] = r["pixrays_per_sec"] / ideal
        r["speedup"] = r["pixrays_per_sec"] / base["pixrays_per_sec"]
        if sim:
            # On the CPU simulator all N virtual devices share the host's
            # cores AND the 1-device baseline already multi-threads across
            # them, so ideal-N "efficiency" is unreachable by construction.
            # Speedup > 1 is the meaningful signal here (the sharded program
            # is not slower than the fused single-device one); ICI
            # efficiency vs the ≥85% target needs a real pod slice.
            r["sim_shared_cores"] = True
    return results


def run_grad_overlap(config: str = "config2", width: int = 128,
                     height: int = 128, max_depth: int = 2, tiles: int = 4,
                     prims: int = 2, repeats: int = 3):
    """A/B the bounce-pipelined backward (per-bounce psum) vs the fused-psum
    twin on the full device mesh (parallel/overlap.py). On the CPU sim this
    is a functional timing smoke; on a pod slice it measures whether the
    per-bounce allreduces actually overlap the backward compute.

    Measurement discipline (CLAUDE.md): no device→host readback before
    timing (the target stays a device array) and per-step time comes from
    the dependency-chain slope, not a single block_until_ready round-trip.
    """
    import jax.numpy as jnp

    from benchmarks.rays_per_sec import _chained_time
    from raytracer_tpu.models import presets
    from raytracer_tpu.parallel.mesh import make_rt_mesh
    from raytracer_tpu.parallel.overlap import make_loss_and_grad
    from raytracer_tpu.parallel.shard import render_sharded

    scene, cam, opts = presets.PRESETS[config]()
    opts = dataclasses.replace(opts, width=width, height=height,
                               max_depth=max_depth)
    mesh = make_rt_mesh(tiles=tiles, prims=prims,
                        devices=jax.devices()[:tiles * prims])
    target = jax.jit(
        lambda s, c: render_sharded(s, c, opts, mesh)[0])(scene, cam) * 0.9

    out = {}
    for name, overlap in (("overlapped", True), ("fused", False)):
        step = make_loss_and_grad(scene, cam, opts, mesh, overlap=overlap)
        _, per = _chained_time(
            lambda eps: step(scene, jnp.asarray(target) + eps),
            repeats=repeats)
        out[name] = per
    out["speedup"] = out["fused"] / out["overlapped"]
    return out


def main():
    import argparse
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU-sim: expose 8 virtual devices (must precede backend init)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad-overlap", action="store_true",
                    help="A/B per-bounce-psum backward vs fused backward")
    args = ap.parse_args()
    if args.grad_overlap:
        print(json.dumps(run_grad_overlap()))
        return
    res = run_scaling()
    for r in res:
        print(json.dumps(r))
    if len(res) > 1:
        last = res[-1]
        if last.get("sim_shared_cores"):
            print(f"# {last['devices']}-device CPU-sim speedup: "
                  f"{last['speedup']:.2f}x (shared host cores — ideal-N "
                  "efficiency not measurable off-pod; see run_scaling)",
                  file=sys.stderr)
        else:
            print(f"# {last['devices']}-device efficiency: "
                  f"{last['efficiency']:.1%}", file=sys.stderr)


if __name__ == "__main__":
    main()
