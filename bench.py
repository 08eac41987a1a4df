"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Primary metric (BASELINE.json:2): rays/sec/chip fwd+bwd at 1080p 4-bounce on
the local TPU chip (config4: ~20k-tri mesh + mirror sphere + checker plane,
grid-accelerated). vs_baseline = rate / 1.25e8 (per-chip share of the >1e9
rays/s north star on a v5p-16 = 8-chip slice; the reference publishes no
numbers — BASELINE.json:13).

Phases run in separate subprocesses: (1) timing (no device→host readbacks —
the first readback permanently degrades dispatch latency on this stack),
(2) exact ray count (readback allowed). A device fault in one phase cannot
poison the other.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _run_phase(phase: str) -> dict | None:
    cmd = [sys.executable, "-m", "benchmarks.rays_per_sec", "--phase", phase]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=3000)
    for line in proc.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            return json.loads(line[len("PHASE_RESULT "):])
    sys.stderr.write(proc.stderr[-2000:] + "\n")
    return None


def main():
    from benchmarks.rays_per_sec import NORTH_STAR_PER_CHIP

    t = _run_phase("time")
    if t is None:
        print(json.dumps({"metric": "rays_per_sec_per_chip", "value": 0,
                          "unit": "rays/s", "vs_baseline": 0,
                          "error": "time phase failed"}))
        return
    c = _run_phase("count")
    n_rays = c["rays_per_frame"] if c else float(
        t["width"] * t["height"])  # fall back: primary rays only

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
          f"({t['fwd_s']*1e3:.2f} ms/frame); rays/frame {n_rays:.4g}",
          file=sys.stderr)
    if "fwd_bwd_s" in t:
        print(f"# fwd+bwd: {rate:.4g} rays/s ({t['fwd_bwd_s']*1e3:.2f} "
              f"ms/step, {t.get('bwd_bands', 1)} grad bands)",
              file=sys.stderr)
    if "fwd_bwd_error" in t:
        print(f"# fwd+bwd failed in time phase: {t['fwd_bwd_error']}",
              file=sys.stderr)
    print(f"# device: {t['device']}", file=sys.stderr)


if __name__ == "__main__":
    main()
