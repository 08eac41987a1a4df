"""Unit tests for benchmark helpers (no device timing)."""

import json

from benchmarks.rays_per_sec import BWD_UNIT_BUDGET, _bands
from raytracer_tpu.core.types import RenderOptions


def test_bands_cover_image_exactly():
    for (w, h, d) in [(1920, 1080, 4), (1920, 1080, 2), (256, 256, 0),
                      (1024, 1024, 4), (640, 481, 3)]:
        opts = RenderOptions(width=w, height=h, max_depth=d)
        bands = _bands(opts)
        assert bands[0][0] == 0
        # contiguous, covering, positive
        r = 0
        for r0, rows in bands:
            assert r0 == r and rows > 0
            r += rows
        assert r == h
        # each band under the depth-scaled budget
        for _, rows in bands[:-1]:
            assert rows * w * (d + 1) <= BWD_UNIT_BUDGET


def test_single_band_when_small():
    opts = RenderOptions(width=128, height=128, max_depth=4)
    assert _bands(opts) == [(0, 128)]


# ---- bench.py ladder logic (incremental-emission rung machine) ----

def _fake_phase(calls, mesh_ok):
    """Build a _phase stand-in: config4 phases succeed iff mesh_ok."""
    def fake(phase, config=None, extra=(), timeout=3000, env=None):
        calls.append((phase, config, tuple(extra), dict(env or {})))
        if phase == "probe":
            return {"ok": True}
        if config == "config4" and not mesh_ok:
            return None
        if phase == "fwd":
            res = {"fwd_s": 1e-3, "width": 1920, "height": 1080,
                   "max_depth": 2 if config == "config2" else 4,
                   "config": config, "device": "fake"}
            if "--with-count" in extra:
                res["rays_per_frame"] = 4.0e6
            return res
        if phase == "bwd":
            return {"fwd_bwd_s": 2e-3, "bwd_bands": 1}
        raise AssertionError(phase)
    return fake


def _run_bench_main(monkeypatch, capsys, mesh_ok):
    import bench
    calls = []
    monkeypatch.delenv("RT_BENCH_CONFIG", raising=False)
    monkeypatch.delenv("RT_BENCH_SMOKE", raising=False)
    monkeypatch.setattr(bench, "_phase", _fake_phase(calls, mesh_ok))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    return calls, [json.loads(line) for line in out]


def test_ladder_emits_incrementally_and_last_line_is_best(monkeypatch,
                                                          capsys):
    calls, lines = _run_bench_main(monkeypatch, capsys, mesh_ok=True)
    # multiple lines emitted (driver tail-parse gets a number even on kill)
    assert len(lines) >= 4
    # first line lands after ONE fwd phase: the reliable config2 rung
    assert lines[0]["metric"].endswith("config2")
    assert "fwd" in lines[0]["metric"]
    # last line = the headline rung (config4 fwd+bwd)
    assert lines[-1]["metric"].endswith("config4")
    assert "fwd_bwd" in lines[-1]["metric"]
    assert lines[-1]["value"] > 0
    # rung ladder ran cheap→headline: config2 fwd before any config4 phase
    kinds = [(c[1], c[0]) for c in calls if c[0] in ("fwd", "bwd")]
    assert kinds.index(("config2", "fwd")) < kinds.index(("config4", "fwd"))


def test_mesh_preflight_failure_skips_mesh_rungs(monkeypatch, capsys):
    calls, lines = _run_bench_main(monkeypatch, capsys, mesh_ok=False)
    # Exactly one config4 fwd attempt: the small preflight render (the
    # band-scale preflights never run once it fails).
    c4_fwd = [c for c in calls if c[0] == "fwd" and c[1] == "config4"]
    assert len(c4_fwd) == 1
    assert "480" in c4_fwd[0][2]
    # Fallback lands on the fused config3 rung (no grid programs) and still
    # reports a fwd+bwd metric as the LAST emitted line.
    result = lines[-1]
    assert result["metric"].endswith("config3")
    c3 = [c for c in calls if c[0] == "fwd" and c[1] == "config3"]
    assert c3 and c3[0][3].get("RT_BENCH_FUSED") == "1"
    assert "fwd_bwd" in result["metric"]
    assert result["value"] > 0


def test_transient_unhealthy_preflight_keeps_mesh_rungs(monkeypatch, capsys):
    # If the probe never comes up at preflight time (transient tunnel
    # poisoning), the mesh path is NOT indicted: the config4 rung still runs.
    import bench
    calls = []
    monkeypatch.delenv("RT_BENCH_CONFIG", raising=False)
    monkeypatch.delenv("RT_BENCH_SMOKE", raising=False)
    monkeypatch.setattr(bench, "_phase", _fake_phase(calls, mesh_ok=True))
    # health-check order: config2 fwd, config2 bwd, config3 fwd, config3 bwd,
    # then the PREFLIGHT check (False), then the config4 rung phases (True)
    health = iter([True, True, True, True, False])
    monkeypatch.setattr(bench, "_wait_healthy",
                        lambda max_wait=2000: next(health, True))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    c4_fwd = [c for c in calls if c[0] == "fwd" and c[1] == "config4"]
    # no preflight render ran, but the full primary rung did
    assert len(c4_fwd) == 1 and c4_fwd[0][2] == ("--with-count",)
    assert lines[-1]["metric"].endswith("config4")


def test_mesh_preflight_success_runs_primary(monkeypatch, capsys):
    calls, lines = _run_bench_main(monkeypatch, capsys, mesh_ok=True)
    # Preflight ladder (small + band-scale), then the full-size primary rung.
    c4_fwd = [c for c in calls if c[0] == "fwd" and c[1] == "config4"]
    assert len(c4_fwd) == 3
    assert "480" in c4_fwd[0][2]      # small preflight
    assert "270" in c4_fwd[1][2]      # band-scale preflight (1920x270 d4)
    assert c4_fwd[2][2] == ("--with-count",)   # the real rung
    assert lines[-1]["metric"].endswith("config4")
    assert lines[-1]["value"] > 0


def test_band_preflight_failure_keeps_only_small_rung(monkeypatch, capsys):
    """Band-scale preflight fails, small-band preflight passes → the rung
    runs at the 800k budget (today's boundary is between them)."""
    import bench
    calls = []

    def fake(phase, config=None, extra=(), timeout=3000, env=None):
        calls.append((phase, config, tuple(extra), dict(env or {})))
        if phase == "probe":
            return {"ok": True}
        if config == "config4" and "270" in extra and "1920" in extra:
            return None  # the 2.6M-unit band faults
        if phase == "fwd":
            res = {"fwd_s": 1e-3, "width": 1920, "height": 1080,
                   "max_depth": 2 if config == "config2" else 4,
                   "config": config, "device": "fake"}
            if "--with-count" in extra:
                res["rays_per_frame"] = 4.0e6
            return res
        if phase == "bwd":
            return {"fwd_bwd_s": 2e-3, "bwd_bands": 1}
        raise AssertionError(phase)

    monkeypatch.delenv("RT_BENCH_CONFIG", raising=False)
    monkeypatch.delenv("RT_BENCH_SMOKE", raising=False)
    monkeypatch.setattr(bench, "_phase", fake)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    full_rungs = [c for c in calls
                  if c[0] == "fwd" and c[1] == "config4"
                  and c[2] == ("--with-count",)]
    assert len(full_rungs) == 1
    assert full_rungs[0][3].get("RT_BWD_UNIT_BUDGET") == "800000"
    assert lines[-1]["metric"].endswith("config4")


def test_remat_env_hook_maps_policies(monkeypatch):
    """RT_BENCH_REMAT: 0=off, 1=on, plan/full=on with that policy."""
    from benchmarks.rays_per_sec import _setup

    for val, tiles, policy in [("0", False, None), ("1", True, None),
                               ("plan", True, "plan"),
                               ("full", True, "full")]:
        monkeypatch.setenv("RT_BENCH_REMAT", val)
        _, _, opts, _ = _setup("config1")
        assert opts.remat_tiles is tiles
        if policy is not None:
            assert opts.remat_policy == policy


def test_lights_env_hook_truncates(monkeypatch):
    from benchmarks.rays_per_sec import _setup

    monkeypatch.setenv("RT_BENCH_LIGHTS", "1")
    scene, _, _, _ = _setup("config2")
    assert scene.lights.count == 1
