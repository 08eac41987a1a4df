"""rays/s benchmark harness (SURVEY.md §6): fwd and fwd+bwd per chip.

Primary metric (BASELINE.json:2): rays/sec/chip, fwd+bwd, 1080p, 4-bounce.
"vs_baseline" normalization: the driver-set north star is >1e9 rays/s fwd+bwd
on a v5p-16 slice (8 chips) ⇒ per-chip fair share 1.25e8 rays/s. The reference
itself publishes no numbers (BASELINE.json:13 "published": {}).

Measurement discipline for this TPU stack (see memory/bench ordering notes):
- the first device→host readback permanently degrades dispatch latency, so all
  timing happens before any readback;
- a mesh (grid/BVH) program over the ~3M pixel×bounce-unit budget triggers a
  libtpu kernel fault, so mesh-scene phases run as per-band microbatches, each
  its own jit program (identical gradient: per-band squared-error sums divided
  by the global pixel count); mesh-free scenes run full-frame in one program
  (readback-verified safe at 1080p both directions);
- phases run in separate subprocesses (bench.py) so a device fault in one
  phase cannot take down the others.

CLI (used by bench.py): python -m benchmarks.rays_per_sec --phase time|count
"""

import dataclasses
import json
import os
import sys
import time

import jax

# persistent compile cache: remote TPU compiles of the big backward graphs
# take minutes; cache them across processes/rounds
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

from raytracer_tpu.models import presets
from raytracer_tpu.renderer import render

NORTH_STAR_PER_CHIP = 1e9 / 8.0  # v5p-16 = 8 chips
# Backward-program size budget in pixel×bounce-round units: measured fault
# boundary on this stack is between 3.5M (ok) and 3.9M (kernel fault);
# forward has no such limit. Bands are sized to depth-scaled fractions of it.
BWD_UNIT_BUDGET = int(os.environ.get("RT_BWD_UNIT_BUDGET", 3_200_000))


def _grad_params(scene):
    # config-5 parameter classes (BASELINE: "sphere positions + albedos")
    return {
        "center": jnp.asarray(scene.spheres.center),
        "albedo": jnp.asarray(scene.materials.albedo),
    }


def _with_params(scene, p):
    return scene.replace(
        spheres=dataclasses.replace(scene.spheres, center=p["center"]),
        materials=dataclasses.replace(scene.materials, albedo=p["albedo"]),
    )


def _setup(config, width=None, height=None, max_depth=None, tile_rays=None,
           tracer_kind=None):
    scene, cam, opts = presets.PRESETS[config]()
    if width:
        opts = dataclasses.replace(opts, width=width, height=height or width)
    if max_depth is not None:
        opts = dataclasses.replace(opts, max_depth=max_depth)
    if tile_rays is None and os.environ.get("RT_BENCH_TILE"):
        tile_rays = int(os.environ["RT_BENCH_TILE"])  # sweep hook
    if tile_rays is not None:
        opts = dataclasses.replace(opts, tile_rays=tile_rays)
    if os.environ.get("RT_BENCH_TILE_BLOCK"):  # screen-block tile order
        bh, bw = (int(x) for x in
                  os.environ["RT_BENCH_TILE_BLOCK"].split("x"))
        opts = dataclasses.replace(opts, tile_block=(bh, bw))
    if os.environ.get("RT_BENCH_REMAT"):  # sweep hook: remat off/on + policy
        rv = os.environ["RT_BENCH_REMAT"]  # 0=off, 1=on, plan/full=policy
        if rv in ("plan", "full"):
            opts = dataclasses.replace(opts, remat_tiles=True,
                                       remat_policy=rv)
        else:
            opts = dataclasses.replace(opts, remat_tiles=rv == "1")
    if os.environ.get("RT_BENCH_LIGHTS"):  # sweep hook: truncate light count
        # (cost ATTRIBUTION only — image changes; never set for record runs)
        nl = int(os.environ["RT_BENCH_LIGHTS"])
        scene = scene.replace(lights=dataclasses.replace(
            scene.lights, pos=scene.lights.pos[:nl],
            intensity=scene.lights.intensity[:nl]))
    # compacted wavefronts (default on for glass; RT_BENCH_COMPACT=0 off,
    # =N caps at N·n0, fractional N<1 shrinks single-child wavefronts too):
    # config3 d4 otherwise runs 31× n0 buffer lanes at 5.5% occupancy
    # (benchmarks/occupancy.py; ~6× fwd on the wavefront path); mesh scenes'
    # bounce≥1 walks pay ~10 ns/gather-row for parked lanes (BENCH_LOG r2-d).
    # Exactness asserted post-timing via the dropped-lane counter.
    comp = os.environ.get("RT_BENCH_COMPACT", "")
    if comp == "":
        # per-scene default cap: config3's floor was swept on TPU (BENCH_LOG
        # r4-h): 0.5 is the LOWEST EXACT cap at the 1024² bench size
        # (dropped==0 gated post-timing; 0.375 drops 30k alive lanes) and is
        # 1.56× the cap-1 training step. Other/unknown glass scenes keep the
        # safe cap 1 — the gate still protects them.
        cap = (0.5 if config == "config3" else 1) \
            if scene.has_glass else None
    else:
        cap = float(comp)
        if cap <= 0:  # any non-positive value disables compaction
            cap = None
    if cap is not None and (scene.has_glass or cap < 1):
        opts = dataclasses.replace(opts, compact_cap=cap)
    tracer = None
    if tracer_kind is None:
        tracer_kind = os.environ.get("RT_BENCH_TRACER", "grid")
    if scene.meshes.count and tracer_kind != "none":
        if tracer_kind == "bvh":
            from raytracer_tpu.accel.bvh import BVHTracer

            tracer = BVHTracer.build(scene)
        elif tracer_kind == "pallas":
            from raytracer_tpu.ops.pallas_trace import PallasTracer

            tracer = PallasTracer(scene)
        elif tracer_kind == "grid-pallas":
            from raytracer_tpu.accel.grid import GridTracer

            tracer = GridTracer.build(scene, walk="pallas")
        elif tracer_kind == "mat":
            from raytracer_tpu.ops.mat_trace import MatTracer

            tracer = MatTracer.build(scene)
        elif tracer_kind == "cull":
            # tile-culled dense sweep at d0 (RT_CULL_CAP/_CHUNK/_DEPTHS/
            # _OCCL), grid walk inner. EXACT only when no tile's culled
            # list overflows the cap — check with accel.cull.cull_audit;
            # overflowing probe runs measure machinery cost, not product.
            from raytracer_tpu.accel.cull import CullTracer

            tracer = CullTracer.build(scene)
        else:
            from raytracer_tpu.accel.grid import GridTracer

            tracer = GridTracer.build(scene)
    scene, cam, tracer = jax.device_put((scene, cam, tracer))
    return scene, cam, opts, tracer


def _bands(opts):
    n_pix = opts.width * opts.height
    max_pix = max(1, BWD_UNIT_BUDGET // (opts.max_depth + 1))
    n_bands = max(1, -(-n_pix // max_pix))
    rows = opts.height // n_bands
    out = []
    r0 = 0
    for b in range(n_bands):
        rr = rows if b < n_bands - 1 else opts.height - r0
        out.append((r0, rr))
        r0 += rr
    return out


def _chained_time(call, repeats=2, k=6):
    """Per-iteration seconds via the async dependency-chain slope.

    `call(eps)` must thread eps (a scalar device array, always 0) into its
    inputs so iteration i+1 data-depends on iteration i.

    WARNING (measured 2026-08-19, BENCH_LOG r2-c): through the axon relay,
    `block_until_ready` acks before real completion EVEN at the end of a
    dependency chain, so this slope saturates at the ~0.2-0.5 ms enqueue
    floor and under-reports real frame times by up to ~6x at 1080p+ (a 4K
    frame "measured" faster than 540p). Kept for CPU/pod use and as a
    diagnostic; the official TPU numbers come from _synced_time below.
    """
    zero = jnp.zeros(())
    out = call(zero)
    jax.block_until_ready(out)

    def chain(n):
        eps = zero
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = call(eps)
            eps = jax.tree.leaves(o)[0].ravel()[0] * 0.0
        jax.block_until_ready(o)
        return time.perf_counter() - t0, o

    chain(1)  # warm dispatch path
    t1 = min(chain(1)[0] for _ in range(repeats))
    tk, o = chain(k)
    for _ in range(repeats - 1):
        tk = min(tk, chain(k)[0])
    per = max((tk - t1) / (k - 1), 1e-9)
    return o, per


def _leaf0(o):
    return jax.tree.leaves(o)[0].ravel()[0]


def _synced_time(call, repeats=2, n1=None, n2=None):
    """Per-iteration seconds via readback-synced two-length chains.

    The ONLY trustworthy sync through the axon relay is a real D2H readback
    (CLAUDE.md rule 3; async acks lie — see _chained_time warning). Method:
    pay the one-time readback transition, then time dependency chains of n1
    and n2 frames EACH ENDING IN A SCALAR READBACK; the readback + constant
    overheads cancel in the difference:  per = (T(n2) - T(n1)) / (n2 - n1).
    Validated by pixel-count scaling (540p 0.87 ms vs 4K 6.29 ms per frame,
    config2 fused d2 — proportional, as real compute must be). The result
    INCLUDES the per-dispatch relay overhead (~0.5-1 ms day-dependent) —
    i.e. it is the deployable per-frame latency, slightly pessimistic on
    pure device compute.

    Chain lengths auto-scale to the warm-probe frame time so slow frames
    (honest backward steps run seconds each) don't burn a 92-frame schedule
    against the driver's phase timeout.
    """
    zero = jnp.zeros(())
    out = call(zero)
    jax.block_until_ready(out)
    float(_leaf0(out))  # one-time readback-transition (can take ~a minute)

    def chain(n):
        eps = zero
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = call(eps)
            eps = _leaf0(o) * 0.0
        float(_leaf0(o))  # real sync
        return time.perf_counter() - t0, o

    t_probe, _ = chain(2)  # warm the sync dispatch path (+ frame estimate)
    if n1 is None or n2 is None:
        per_est = t_probe / 2
        if per_est > 1.0:
            n1, n2, repeats = 1, 3, 1
        elif per_est > 0.15:
            n1, n2, repeats = 2, 8, min(repeats, 2)
        else:
            n1, n2 = 6, 24
    t1 = min(chain(n1)[0] for _ in range(repeats))
    t2, o = chain(n2)
    for _ in range(repeats - 1):
        t2 = min(t2, chain(n2)[0])
    per = max((t2 - t1) / (n2 - n1), 1e-9)
    return o, per


def _timer():
    """Official timing method: sync on TPU-through-axon, async elsewhere
    (CPU block_until_ready is honest and the sync readbacks cost nothing).
    RT_BENCH_TIMING=async|sync overrides."""
    mode = os.environ.get("RT_BENCH_TIMING")
    if mode is None:
        mode = "sync" if jax.default_backend() not in ("cpu",) else "async"
    return _synced_time if mode == "sync" else _chained_time


def phase_fwd(config, repeats=2, with_count=False, **kw):
    """Forward timing; with_count=True folds the ray count in post-timing
    (the D2H readbacks happen after all timing, and the subprocess exits
    right after, so the permanent dispatch degradation is irrelevant)."""
    res = _phase_fwd_timed(config, repeats=repeats, **kw)
    if with_count:
        try:
            res.update(phase_count(config, **kw))
        except Exception as e:  # count is a bonus — never lose the timing
            print(f"# count failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    return res


def _phase_fwd_timed(config, repeats=2, **kw):
    use_fused = os.environ.get("RT_BENCH_FUSED") == "1"
    # fused path sweeps baked triangles itself — skip the grid/BVH build
    scene, cam, opts, tracer = _setup(
        config, tracer_kind="none" if use_fused else None, **kw)

    if use_fused:
        from raytracer_tpu.ops import fused as fused_mod

        # Build from the HOST preset scene, not the device_put one: the
        # builder's np.asarray over device arrays would be a D2H readback
        # before timing — the permanent ~25 ms sync-dispatch poisoning
        # (CLAUDE.md rule 3) that invalidates the measurement.
        scene_h, cam_h, _ = presets.PRESETS[config]()
        if os.environ.get("RT_BENCH_LIGHTS"):  # attribution sweeps only
            nl = int(os.environ["RT_BENCH_LIGHTS"])
            scene_h = scene_h.replace(lights=dataclasses.replace(
                scene_h.lights, pos=scene_h.lights.pos[:nl],
                intensity=scene_h.lights.intensity[:nl]))
        assert fused_mod.supported(scene_h), \
            "RT_BENCH_FUSED needs a scene without big meshes"
        tile_env = os.environ.get("RT_FUSED_TILE")
        tile = (tuple(int(x) for x in tile_env.split(","))
                if tile_env else None)
        fw = fused_mod.FusedWhitted(scene_h, cam_h, opts, tile=tile)
        if os.environ.get("RT_FUSED_EMIT_PLAN") == "1":
            # time the PLAN-emitting forward (the replay planner's cost —
            # attribution for the fused-plan training path)
            out, t_fwd = _timer()(lambda eps: fw.render_plan(eps=eps)[0],
                                  repeats=repeats)
            img = out
        else:
            img, t_fwd = _timer()(lambda eps: fw.render(eps=eps),
                                  repeats=repeats)
        float(img[0, 0, 0])  # validation readback
        return {"config": config, "width": opts.width, "height": opts.height,
                "max_depth": opts.max_depth, "fwd_s": t_fwd, "fwd_bands": 1,
                "fused": True, "device": str(jax.devices()[0])}

    if os.environ.get("RT_BENCH_HYBRID") == "1" and scene.meshes.count:
        # partitioned hybrid (accel/cull.py): per-band partition built
        # BEFORE timing (its np readbacks flip the process to sync dispatch
        # — harmless under the official _synced_time, which differences
        # readback-terminated chains). The timed frame is the steady-state
        # fixed-partition program, amortizing the audit like the grid
        # build; exactness of thin tiles is audit-gated inside HybridBand.
        from raytracer_tpu.accel.cull import HybridBand

        bands = _bands(opts)
        hbs = []
        for i, (r0, rr) in enumerate(bands):
            print(f"# hybrid band {i + 1}/{len(bands)} partition…",
                  file=sys.stderr, flush=True)
            hb = HybridBand(scene, cam, opts, row0=r0, rows=rr)
            print(f"#   thin {hb.n_thin}/{hb.n_tiles} tiles",
                  file=sys.stderr, flush=True)
            hbs.append(hb)

        def fwd_h(eps):
            outs = [hb(eps) for hb in hbs]
            return outs[-1]

        z = jnp.zeros(())
        for i, hb in enumerate(hbs):
            print(f"# hybrid band {i + 1}/{len(hbs)} compile+warm…",
                  file=sys.stderr, flush=True)
            jax.block_until_ready(hb(z))
        print("# hybrid bands warm; timing…", file=sys.stderr, flush=True)
        img, t_fwd = _timer()(fwd_h, repeats=repeats)
        float(img[0, 0, 0])  # validation readback
        return {"config": config, "width": opts.width,
                "height": opts.height, "max_depth": opts.max_depth,
                "fwd_s": t_fwd, "fwd_bands": len(bands), "hybrid": True,
                "thin_tiles": [hb.n_thin for hb in hbs],
                "n_tiles": [hb.n_tiles for hb in hbs],
                "device": str(jax.devices()[0])}

    # The program-size budget applies to FORWARD grid programs too (verified:
    # 960x540xd4 ok, 1440x810xd4 kernel-faults) — band-split the frame into
    # one jit program per band; mesh-free scenes get a single band.
    bands = _bands(opts) if scene.meshes.count else [(0, opts.height)]
    # one program per band HEIGHT (row0 is a traced scalar — raygen supports
    # it), so n bands cost ≤2 compiles: the body height + a short last band
    fns = {}
    compact = opts.compact_cap is not None
    for _, rows in bands:
        if rows not in fns:
            @jax.jit
            def band_fwd(eps, s, c, tr, r0, rows=rows):
                c2 = dataclasses.replace(c, pos=c.pos + eps)
                out = render(s, c2, opts, tracer=tr, row0=r0, rows=rows)
                # compact mode: carry the dropped-lane counter out of the
                # same program (a scalar — free) for the post-timing gate
                return (out[0], out[2]) if compact else out[0]

            fns[rows] = band_fwd
    calls = [(fns[rows], r0) for r0, rows in bands]

    def fwd(eps):
        outs = [f(eps, scene, cam, tracer, r0) for f, r0 in calls]
        return outs[-1]  # chaining on the last band serializes the frame tail

    # warm band-by-band with progress lines: if the phase times out, the
    # partial stderr (surfaced by bench.py) says whether it died compiling
    # band k or dispatching — compile-grind and tunnel-poison look identical
    # from outside otherwise
    z = jnp.zeros(())
    for i, (f, r0) in enumerate(calls):
        print(f"# fwd band {i + 1}/{len(calls)} compile+warm…",
              file=sys.stderr, flush=True)
        jax.block_until_ready(f(z, scene, cam, tracer, r0))
    print("# fwd bands warm; timing…", file=sys.stderr, flush=True)
    out, t_fwd = _timer()(fwd, repeats=repeats)
    img = out[0] if compact else out
    float(img[0, 0, 0])  # validation readback — async faults surface here
    if compact:
        # exactness gate (post-timing readbacks, programs already warm): no
        # alive lane may have been dropped by the compaction cap in ANY band
        dropped = sum(float(f(z, scene, cam, tracer, r0)[1])
                      for f, r0 in calls)
        assert dropped == 0, (
            f"compact_cap={opts.compact_cap} dropped {dropped} alive lanes — "
            f"raise RT_BENCH_COMPACT or set 0")
    return {"config": config, "width": opts.width, "height": opts.height,
            "max_depth": opts.max_depth, "fwd_s": t_fwd,
            "fwd_bands": len(bands), "device": str(jax.devices()[0])}


def _phase_bwd_replay(config, repeats=2, **kw):
    """fwd+bwd step via fused-plan replay (RT_BENCH_PLAN=1, non-glass
    fused-supported scenes): the param-input fused kernel emits the plan
    each step (no recompile), and value_and_grad differentiates only the
    shading replay (ops/replay.py)."""
    from raytracer_tpu.ops.fused import FusedWhitted, supported
    from raytracer_tpu.ops.replay import value_and_grad_replay

    scene, cam, opts, _ = _setup(config, **kw)
    assert supported(scene), "plan replay needs a fused-supported scene"
    n_pix = opts.width * opts.height
    print("# bwd-replay target render…", file=sys.stderr, flush=True)
    target = jax.jit(lambda s, c: render(s, c, opts)[0])(scene, cam)
    jax.block_until_ready(target)
    target = target * 0.9
    p0 = _grad_params(scene)
    fused = FusedWhitted(scene, cam, opts, param_inputs=True)
    # glass replays per band to bound residual memory (plan-compacted when
    # opts.compact_cap is set — ops/replay._replay_render_compact; set
    # RT_REPLAY_COMPACT=0 for the uncompacted r3-l variant)
    # 4 gradient microbatches: the replay vg's residual set shrinks with the
    # band, and 4 bands beat the single-band step 1.2× at 1080p (BENCH_LOG
    # r4-i sweep: 1→0.0293, 2→0.0261, 4→0.0240, 8 noisy 0.022–0.030,
    # 16→0.057 — per-band fixed costs take over). Same banding glass always
    # used; RT_BENCH_REPLAY_BANDS sweeps it.
    band_rows = max(64, opts.height // 4)
    if int(os.environ.get("RT_BENCH_REPLAY_BANDS") or 0) >= 1:  # sweep hook
        band_rows = max(64, opts.height
                        // int(os.environ["RT_BENCH_REPLAY_BANDS"]))
    # RT_REPLAY_TILE: tile the non-glass band replay (ops/replay tiled scan;
    # None/unset = single-tile, the r3-j operating point)
    tile_rays = None
    if int(os.environ.get("RT_REPLAY_TILE") or 0) > 0:
        tile_rays = int(os.environ["RT_REPLAY_TILE"])

    def builder(q):
        return fused.bind(center=q["center"], albedo=q["albedo"])

    def step(eps):
        p = jax.tree.map(lambda x: x + eps, p0)
        return value_and_grad_replay(_with_params, p, scene, cam, opts,
                                     target, builder, band_rows=band_rows,
                                     tile_rays=tile_rays)

    print("# bwd-replay compile+warm…", file=sys.stderr, flush=True)
    jax.block_until_ready(step(jnp.zeros(())))
    print("# bwd-replay warm; timing…", file=sys.stderr, flush=True)
    (val, g), t_bwd = _timer()(step, repeats=repeats)
    float(val)  # validation readback
    del n_pix
    return {"fwd_bwd_s": t_bwd, "bwd_bands": 1, "mode": "plan-replay"}


def _phase_bwd_kernel(config, repeats=2, **kw):
    """fwd+bwd step via the in-kernel fused VJP (RT_BENCH_PLAN=kernel):
    render_plan emits the plan at serving speed, then ONE Pallas kernel
    computes the band's L2 loss and analytic param gradients
    (ops/fused.plan_value_and_grad) — no XLA autodiff graph at all."""
    from raytracer_tpu.ops.fused import FusedWhitted, supported

    scene, cam, opts, _ = _setup(config, tracer_kind="none", **kw)
    scene_h = presets.PRESETS[config]()[0]
    assert supported(scene_h), "fused-vjp needs a fused-supported scene"
    n_pix = opts.width * opts.height
    print("# bwd-kernel target render…", file=sys.stderr, flush=True)
    target = jax.jit(lambda s, c: render(s, c, opts)[0])(scene, cam)
    jax.block_until_ready(target)
    target = target * 0.9
    p0 = _grad_params(scene)
    fused = FusedWhitted(scene_h, cam, opts, param_inputs=True)
    base_sph, base_pln = fused._psph, fused._ppln
    base_mat, base_lgt = fused._pmat, fused._plgt
    ns, nm = base_sph.shape[0], base_mat.shape[0]
    # the kernel backward holds no residuals, so single-band is the natural
    # default; RT_BENCH_REPLAY_BANDS sweeps microbatching anyway
    nb = int(os.environ.get("RT_BENCH_REPLAY_BANDS") or 1)
    band_rows = max(fused._tile[0], opts.height // nb)
    bands = [(r0, min(band_rows, opts.height - r0))
             for r0 in range(0, opts.height, band_rows)]
    scale = 1.0 / (n_pix * 3)

    def step(eps):
        p = jax.tree.map(lambda x: x + eps, p0)
        sph = jnp.asarray(base_sph).at[:p["center"].shape[0], 0:3].set(
            p["center"])
        mat = jnp.asarray(base_mat).at[:p["albedo"].shape[0], 0:3].set(
            p["albedo"])
        val = jnp.zeros(())
        gc = jnp.zeros_like(p0["center"])
        ga = jnp.zeros_like(p0["albedo"])
        for r0, rb in bands:
            _, wins, occs = fused._render(r0, rb, True, eps, sph, base_pln,
                                          mat, base_lgt)
            l, g = fused._train_vg(r0, rb, eps, sph, base_pln, mat,
                                   base_lgt, wins, occs,
                                   target[r0:r0 + rb])
            val = val + l
            gc = gc + g["sph"][:gc.shape[0], 0:3]
            ga = ga + g["mat"][:ga.shape[0], 0:3]
        return val * scale, {"center": gc * scale, "albedo": ga * scale}

    print("# bwd-kernel compile+warm…", file=sys.stderr, flush=True)
    jax.block_until_ready(step(jnp.zeros(())))
    print("# bwd-kernel warm; timing…", file=sys.stderr, flush=True)
    (val, g), t_bwd = _timer()(step, repeats=repeats)
    float(val)  # validation readback
    return {"fwd_bwd_s": t_bwd, "bwd_bands": len(bands),
            "mode": "fused-vjp"}


def _phase_bwd_waveplan(config, repeats=2, **kw):
    """fwd+bwd step via WAVEFRONT-planner replay (RT_BENCH_PLAN=wave, mesh
    scenes): each band's wavefront render runs its walks ONCE and emits the
    plan (renderer.render record_plan=True — the mesh-scene analog of the
    fused planner), then value_and_grad differentiates only the walk-free
    shading replay (ops/replay.PlanTracer). Grads match the standard
    plan-remat vg up to association (the same integer residuals drive both
    backwards)."""
    from raytracer_tpu.ops.replay import _replay_band_vg

    scene, cam, opts, tracer = _setup(config, **kw)
    assert scene.meshes.count, "wave-planner replay targets mesh scenes"
    n_pix = opts.width * opts.height
    bands = _bands(opts)
    print(f"# bwd-waveplan target render ({len(bands)} bands)…",
          file=sys.stderr, flush=True)
    tgt_fn = jax.jit(lambda s, c, tr, r0, rows: render(
        s, c, opts, tracer=tr, row0=r0, rows=rows)[0],
        static_argnames=("rows",))
    target = jnp.concatenate(
        [tgt_fn(scene, cam, tracer, r0=r0, rows=rows) for r0, rows in bands],
        axis=0) * 0.9
    p0 = _grad_params(scene)

    plan_fns = {}
    for _, rows in bands:
        if rows not in plan_fns:
            @jax.jit
            def plan_fn(eps, s, c, tr, r0, rows=rows):
                c2 = dataclasses.replace(c, pos=c.pos + eps)
                out = render(s, c2, opts, tracer=tr, row0=r0, rows=rows,
                             record_plan=True)
                return out[2], out[3]

            plan_fns[rows] = plan_fn

    def step(eps):
        p = jax.tree.map(lambda x: x + eps, p0)
        val = jnp.zeros(())
        g = None
        for r0, rows in bands:
            wins, occs = plan_fns[rows](eps, scene, cam, tracer, r0)
            plan = jax.lax.stop_gradient((list(wins), list(occs)))
            v, gb = _replay_band_vg(p, scene, cam, target, plan, r0,
                                    apply_params=_with_params, opts=opts,
                                    rb=rows)
            val = val + v
            g = gb if g is None else jax.tree.map(jnp.add, g, gb)
        return val, g

    print("# bwd-waveplan compile+warm…", file=sys.stderr, flush=True)
    jax.block_until_ready(step(jnp.zeros(())))
    print("# bwd-waveplan warm; timing…", file=sys.stderr, flush=True)
    (val, g), t_bwd = _timer()(step, repeats=repeats)
    float(val)  # validation readback
    del n_pix
    return {"fwd_bwd_s": t_bwd, "bwd_bands": len(bands),
            "mode": "wave-planner-replay"}


def phase_bwd(config, repeats=2, **kw):
    # training-step backend ladder for fused-supported scenes:
    #   kernel (r5 DEFAULT for ALL fused-supported scenes, glass included)
    #     — in-kernel fused VJP (_phase_bwd_kernel): config2 1080p 0.01674
    #     vs replay 0.02458 (1.47×); config3 glass d4 0.0396 vs wavefront
    #     0.325 (8.2× — the r5 glass breakthrough; BENCH_LOG r5-c/r5-d);
    #   replay — XLA shading-replay vg (the r3/r4 default; RT_BENCH_PLAN=1);
    #   standard wavefront vg — non-fused scenes; RT_BENCH_PLAN=0 forces it.
    plan = os.environ.get("RT_BENCH_PLAN", "auto")
    if plan != "0":
        from raytracer_tpu.ops.fused import supported

        scene0 = presets.PRESETS[config]()[0]
        if plan == "wave" or (plan == "auto" and scene0.meshes.count
                              and not supported(scene0)):
            # mesh scenes: wavefront-planner replay — walks run once,
            # undifferentiated; vg sees only the walk-free shading replay.
            # Beat the plan-remat vg in both interleaved brackets (r5q15:
            # 1.1775/1.1779 vs 1.1946/1.1954 — +1.5%, 0.07% spread).
            return _phase_bwd_waveplan(config, repeats=repeats, **kw)
        if plan == "kernel" or (plan == "auto" and supported(scene0)):
            return _phase_bwd_kernel(config, repeats=repeats, **kw)
        if plan == "1" or (not scene0.has_glass and supported(scene0)):
            return _phase_bwd_replay(config, repeats=repeats, **kw)
    scene, cam, opts, tracer = _setup(config, **kw)
    n_pix = opts.width * opts.height
    # the program-size fault is specific to grid/BVH mesh programs; mesh-free
    # scenes run full-frame 1080p backward fine (readback-verified) — one
    # program saves the per-band dispatch on the headline fwd+bwd number
    bands = _bands(opts) if scene.meshes.count else [(0, opts.height)]

    # target rendered band-wise (full-frame grid programs exceed the budget)
    print(f"# bwd target render ({len(bands)} bands)…",
          file=sys.stderr, flush=True)
    tgt_fn = jax.jit(lambda s, c, tr, r0, rows: render(
        s, c, opts, tracer=tr, row0=r0, rows=rows)[0],
        static_argnames=("rows",))
    target = jnp.concatenate(
        [tgt_fn(scene, cam, tracer, r0=r0, rows=rows) for r0, rows in bands],
        axis=0) * 0.9
    p0 = _grad_params(scene)
    # The per-scene remat winner is encoded in each PRESET now (BENCH_LOG
    # r3-f: config2 plan-remat 0.0915 s vs 0.134 remat-off; config3 the
    # reverse) — the old "remat off unless glass" override here silently
    # cost config2 1.46x. RT_BENCH_REMAT (applied in _setup) stays the
    # explicit sweep hook.
    opts_b = opts
    if os.environ.get("RT_BENCH_HYBRID") == "1" and scene.meshes.count:
        # hybrid training step: fixed-partition hybrid forward inside the
        # vg (thin tiles culled-dense, fat tiles walk; same remat policy).
        # The tracers keep p0's stop-grad scene copy exactly like the
        # standard path (winner ids are residuals; eps is always 0).
        from raytracer_tpu.accel.cull import HybridBand, hybrid_image

        vgs_h = []
        for i, (r0, rr) in enumerate(bands):
            print(f"# hybrid bwd band {i + 1}/{len(bands)} partition…",
                  file=sys.stderr, flush=True)
            hb = HybridBand(scene, cam, opts, row0=r0, rows=rr)
            print(f"#   thin {hb.n_thin}/{hb.n_tiles} tiles",
                  file=sys.stderr, flush=True)

            def band_loss(p, hb=hb, r0=r0, rr=rr):
                s = _with_params(scene, p)
                img = hybrid_image(s, hb._orig, hb._thin_dirs,
                                   hb._fat_dirs, hb._cull, hb._inner,
                                   hb._order, hb._inv, opts_b, rr,
                                   hb._n_pix)[0]
                return jnp.sum((img - jax.lax.dynamic_slice_in_dim(
                    target, r0, rr, 0)) ** 2) / (n_pix * 3)

            vgs_h.append(jax.jit(jax.value_and_grad(band_loss)))

        def step_h(eps):
            p = jax.tree.map(lambda x: x + eps, p0)
            val = jnp.zeros(())
            g = None
            for vg in vgs_h:
                v, gb = vg(p)
                val = val + v
                g = gb if g is None else jax.tree.map(jnp.add, g, gb)
            return val, g

        for i, vg in enumerate(vgs_h):
            print(f"# hybrid bwd band {i + 1}/{len(vgs_h)} compile+warm…",
                  file=sys.stderr, flush=True)
            jax.block_until_ready(vg(p0))
        print("# hybrid bwd bands warm; timing…", file=sys.stderr,
              flush=True)
        (val, g), t_bwd = _timer()(step_h, repeats=repeats)
        float(val)  # validation readback
        return {"fwd_bwd_s": t_bwd, "bwd_bands": len(vgs_h),
                "mode": "hybrid"}
    # one value_and_grad program per band height (traced row0), as in fwd
    vg_by_rows = {}
    for _, rows in bands:
        if rows not in vg_by_rows:
            def band_loss(p, s, c, timg, tr, r0, rows=rows):
                o = render(_with_params(s, p), c, opts_b, tracer=tr,
                           row0=r0, rows=rows)[0]
                return jnp.sum((o - jax.lax.dynamic_slice_in_dim(
                    timg, r0, rows, 0)) ** 2) / (n_pix * 3)

            vg_by_rows[rows] = jax.jit(jax.value_and_grad(band_loss))
    vgs = [(vg_by_rows[rows], r0) for r0, rows in bands]

    def step(eps):
        p = jax.tree.map(lambda x: x + eps, p0)
        val = jnp.zeros(())
        g = None
        for vg, r0 in vgs:
            v, gb = vg(p, scene, cam, target, tracer, r0)
            val = val + v
            g = gb if g is None else jax.tree.map(jnp.add, g, gb)
        return val, g

    for i, (vg, r0) in enumerate(vgs):
        print(f"# bwd band {i + 1}/{len(vgs)} compile+warm…",
              file=sys.stderr, flush=True)
        jax.block_until_ready(vg(p0, scene, cam, target, tracer, r0))
    print("# bwd bands warm; timing…", file=sys.stderr, flush=True)
    (val, g), t_bwd = _timer()(step, repeats=repeats)
    float(val)  # validation readback — async faults surface here
    return {"fwd_bwd_s": t_bwd, "bwd_bands": len(vgs)}


def phase_time(config, repeats=2, fwd_bwd=True, **kw):
    """Single-process fwd(+bwd) timing (CPU/convenience path)."""
    out = phase_fwd(config, repeats=repeats, **kw)
    if fwd_bwd:
        try:
            out.update(phase_bwd(config, repeats=repeats, **kw))
        except Exception as e:
            print(f"# fwd+bwd failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out["fwd_bwd_error"] = type(e).__name__
    return out


def phase_count(config, **kw):
    scene, cam, opts, tracer = _setup(config, **kw)
    bands = _bands(opts) if scene.meshes.count else [(0, opts.height)]
    f = jax.jit(lambda s, c, tr, r0, rows: render(
        s, c, opts, count_rays=True, tracer=tr, row0=r0, rows=rows)[1],
        static_argnames=("rows",))
    n = sum(float(f(scene, cam, tracer, r0=r0, rows=rows))
            for r0, rows in bands)
    return {"rays_per_frame": n}


def run_bench(config="config4", repeats=3, fwd_bwd=True, emit_json=True, **kw):
    """Single-process convenience path (CPU tests); bench.py uses subprocesses."""
    res = phase_time(config, repeats=repeats, fwd_bwd=fwd_bwd, **kw)
    res.update(phase_count(config, **kw))
    _finish(res, emit_json)
    return res


def _finish(res, emit_json):
    n_rays = res["rays_per_frame"]
    res["fwd_rays_per_sec"] = n_rays / res["fwd_s"]
    if "fwd_bwd_s" in res:
        res["fwd_bwd_rays_per_sec"] = n_rays / res["fwd_bwd_s"]
    rate = res.get("fwd_bwd_rays_per_sec", res["fwd_rays_per_sec"])
    if emit_json:
        kind = "fwd_bwd" if "fwd_bwd_s" in res else "fwd"
        print(json.dumps({
            "metric": f"rays_per_sec_per_chip_{kind}_"
                      f"{res['width']}x{res['height']}_d{res['max_depth']}_"
                      f"{res['config']}",
            "value": rate,
            "unit": "rays/s",
            "vs_baseline": rate / NORTH_STAR_PER_CHIP,
        }))
    return res


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["fwd", "bwd", "count", "probe", "time", "all"])
    ap.add_argument("--config", default=os.environ.get("RT_BENCH_CONFIG",
                                                       "config4"))
    ap.add_argument("--repeats", type=int,
                    default=int(os.environ.get("RT_BENCH_REPEATS", "3")))
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--depth", type=int, default=-1)
    ap.add_argument("--with-count", action="store_true",
                    help="fold the ray count into the fwd phase result")
    args = ap.parse_args(argv)
    kw = {}
    if args.width:
        kw["width"] = args.width
        kw["height"] = args.height or args.width
    if args.depth >= 0:
        kw["max_depth"] = args.depth
    if args.phase == "probe":
        x = jax.jit(lambda a: (a * 2).sum())(jnp.ones(8192))
        assert float(x) == 16384.0
        print("PHASE_RESULT " + json.dumps({"ok": True}))
    elif args.phase == "fwd":
        print("PHASE_RESULT " + json.dumps(
            phase_fwd(args.config, repeats=args.repeats,
                      with_count=args.with_count, **kw)))
    elif args.phase == "bwd":
        print("PHASE_RESULT " + json.dumps(
            phase_bwd(args.config, repeats=args.repeats, **kw)))
    elif args.phase == "time":
        print("PHASE_RESULT " + json.dumps(
            phase_time(args.config, repeats=args.repeats,
                       fwd_bwd=not args.fwd_only, **kw)))
    elif args.phase == "count":
        print("PHASE_RESULT " + json.dumps(phase_count(args.config, **kw)))
    else:
        run_bench(args.config, repeats=args.repeats,
                  fwd_bwd=not args.fwd_only, **kw)


if __name__ == "__main__":
    main()
