"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Primary metric (BASELINE.json:2): rays/sec/chip fwd+bwd at 1080p 4-bounce on
the local TPU chip (config4: ~20k-tri mesh + mirror sphere + checker plane,
grid-accelerated). vs_baseline = rate / 1.25e8 (per-chip share of the >1e9
rays/s north star on a v5p-16 = 8-chip slice; the reference publishes no
numbers — BASELINE.json:13).

Fault-tolerant sequencing for this TPU stack (a kernel fault crashes the
shared TPU worker and poisons the tunnel for minutes — see CLAUDE.md):
each phase (fwd timing, bwd timing, ray count) runs in its own subprocess,
preceded by a health probe that waits for worker recovery.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

NORTH_STAR_PER_CHIP = 1e9 / 8.0


def _phase(phase: str, config: str | None = None, extra=(),
           timeout: int = 3000, env: dict | None = None) -> dict | None:
    cmd = [sys.executable, "-m", "benchmarks.rays_per_sec", "--phase", phase]
    if config:
        cmd += ["--config", config]
    cmd += list(extra)
    run_env = dict(os.environ, **env) if env else None
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=timeout, env=run_env)
    except subprocess.TimeoutExpired as e:
        tail = (e.stderr or b"")[-600:]
        sys.stderr.write(f"# phase {phase}: timeout; partial stderr:\n"
                         + tail.decode("utf-8", "replace") + "\n")
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            return json.loads(line[len("PHASE_RESULT "):])
    sys.stderr.write(f"# phase {phase} failed:\n")
    sys.stderr.write(proc.stderr[-1200:] + "\n")
    return None


def _wait_healthy(max_wait: int = 2000) -> bool:
    # PATIENT probing: a poisoned tunnel blocks in tcp_recvmsg for minutes,
    # and killing a blocked probe re-poisons it — the kill-retry loop never
    # converges (observed 25+ min). One 900 s probe (the measured patient
    # window, CLAUDE.md rule 1) rides it out; retry (after a rest) only when
    # the probe exits on its own. max_wait allows two full probe cycles.
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if _phase("probe", timeout=900) is not None:
            return True
        sys.stderr.write("# TPU unhealthy; resting 150s…\n")
        time.sleep(150)
    return False


def _guarded(phase: str, config: str | None = None, extra=(),
             attempts: int = 2, env: dict | None = None) -> dict | None:
    for _ in range(attempts):
        if not _wait_healthy():
            return None
        res = _phase(phase, config, extra, env=env)
        if res is not None:
            return res
    return None


def main():
    # Fallback chain: the grid-accelerated config4 is the headline workload,
    # but this TPU stack's worker can enter a degraded state where complex
    # kernels fault (CLAUDE.md). Rungs: config4 grid at shrinking band
    # budgets (smaller per-program work), config4 with the BVH tracer, then
    # config2 driven at 1080p so the metric stays meaningful if the whole
    # mesh path faults.
    primary = os.environ.get("RT_BENCH_CONFIG", "config4")
    chain = [(primary, (), {})]
    if primary != "config2":
        # Preflight ladder: on degraded-worker days grid/BVH programs fault —
        # sometimes at ANY size, sometimes only above a (day-dependent)
        # band-size boundary. A full rung that faults mid-timing hangs until
        # its 50-min phase timeout, so probe the boundary with single
        # band-sized renders (short timeouts) and keep only rungs whose
        # per-program bands the device tolerates TODAY. Only a render that
        # FAILED on a healthy device indicts the mesh path; if the probe
        # never came up (transient tunnel poisoning) keep the rungs — the
        # device may well recover before they run.
        if _wait_healthy():
            if _phase("fwd", primary,
                      ("--width", "480", "--height", "270", "--depth", "2"),
                      timeout=900) is None:
                sys.stderr.write("# mesh-path preflight failed; "
                                 "skipping mesh rungs\n")
                chain = []
            elif _wait_healthy() and _phase(
                    "fwd", primary,
                    ("--width", "1920", "--height", "270", "--depth", "4"),
                    timeout=900) is None:
                # plain-rung band scale (~2.6M units) faults today; probe the
                # smallest rung's band (~0.8M units)
                sys.stderr.write("# band-scale preflight (2.6M units) "
                                 "failed\n")
                if _wait_healthy() and _phase(
                        "fwd", primary,
                        ("--width", "1920", "--height", "83", "--depth", "4"),
                        timeout=900) is not None:
                    chain = [(primary, (), {"RT_BWD_UNIT_BUDGET": "800000"})]
                else:
                    sys.stderr.write("# small-band preflight failed too; "
                                     "skipping mesh rungs\n")
                    chain = []
        if chain and chain[0][2] == {}:
            for budget in ("1600000", "800000"):
                chain.append((primary, (), {"RT_BWD_UNIT_BUDGET": budget}))
            chain.append((primary, (), {"RT_BENCH_TRACER": "bvh",
                                        "RT_BWD_UNIT_BUDGET": "1600000"}))
        # config3 (glass Cornell, 1024² d4): fwd = fused megakernel (no
        # grid program at all — its 10 triangles are baked), bwd = wavefront
        # with the scan tracer, so this rung dodges the grid-path fault
        # entirely while still measuring a 4-bounce refractive workload.
        chain.append(("config3", (),
                      {"RT_BENCH_FUSED": "1", "RT_BENCH_TRACER": "none"}))
        c2 = ("--width", "1920", "--height", "1080", "--depth", "2")
        chain.append(("config2", c2, {"RT_BENCH_FUSED": "1"}))
        chain.append(("config2", c2, {}))
    # Overall wall-clock budget: a blocked phase costs its full timeout
    # (~50 min) before failing, so a bad day could burn hours on dead mesh
    # rungs. Past the deadline, skip ahead to the reliable mesh-free rungs
    # so the driver always gets a metric.
    deadline = time.time() + float(os.environ.get("RT_BENCH_DEADLINE_S",
                                                  "5400"))
    t = used = extra = env = None
    for cfg, ex, ev in chain:
        if time.time() > deadline and cfg != "config2":
            sys.stderr.write(f"# deadline passed; skipping {cfg} {ev}\n")
            continue
        t = _guarded("fwd", cfg, ex, env=ev, attempts=1)
        if t is not None:
            used, extra, env = cfg, ex, ev
            break
        sys.stderr.write(f"# fwd on {cfg} {ev} failed; trying fallback\n")
    if t is None:
        print(json.dumps({"metric": "rays_per_sec_per_chip", "value": 0,
                          "unit": "rays/s", "vs_baseline": 0,
                          "error": "fwd phase failed"}))
        return
    late = 2 if time.time() < deadline else 1
    b = _guarded("bwd", used, extra, env=env, attempts=late)
    if not b:
        # Degraded-day bwd ladder: on bad days the program-size fault
        # boundary collapses (observed: config3 1024² d4 bwd ≈1.3M units
        # faults mid-timing while config1-size bwd passes) — smaller band
        # budgets mean smaller per-program work, which often survives.
        cur = int((env or {}).get("RT_BWD_UNIT_BUDGET", 3_200_000))
        for budget in (1_600_000, 800_000, 400_000):
            if budget >= cur or time.time() > deadline:
                continue
            sys.stderr.write(f"# bwd failed; retrying with band budget "
                             f"{budget}\n")
            b = _guarded("bwd", used, extra,
                         env={**(env or {}),
                              "RT_BWD_UNIT_BUDGET": str(budget)}, attempts=1)
            if b:
                break
    if b:
        t.update(b)
    c = _guarded("count", used, extra, env=env, attempts=late)
    n_rays = c["rays_per_frame"] if c else float(t["width"] * t["height"])

    kind = "fwd_bwd" if "fwd_bwd_s" in t else "fwd"
    rate = n_rays / t.get("fwd_bwd_s", t["fwd_s"])
    print(json.dumps({
        "metric": f"rays_per_sec_per_chip_{kind}_"
                  f"{t['width']}x{t['height']}_d{t['max_depth']}_{t['config']}",
        "value": rate,
        "unit": "rays/s",
        "vs_baseline": rate / NORTH_STAR_PER_CHIP,
    }))
    print(f"# fwd: {n_rays / t['fwd_s']:.4g} rays/s "
          f"({t['fwd_s']*1e3:.2f} ms/frame); rays/frame {n_rays:.4g}"
          + ("" if c else " (primary-ray fallback count)"), file=sys.stderr)
    if "fwd_bwd_s" in t:
        print(f"# fwd+bwd: {rate:.4g} rays/s ({t['fwd_bwd_s']*1e3:.2f} "
              f"ms/step, {t.get('bwd_bands', 1)} grad bands)",
              file=sys.stderr)
    else:
        print("# fwd+bwd unavailable (device fault); value above is fwd",
              file=sys.stderr)
    print(f"# device: {t['device']}", file=sys.stderr)


if __name__ == "__main__":
    main()
