"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Primary metric (BASELINE.json:2): rays/sec/chip fwd+bwd at 1080p 4-bounce on
the local TPU chip. vs_baseline = rate / 1.25e8 (the per-chip share of the
>1e9 rays/s north star on a v5p-16 = 8-chip slice; the reference publishes no
numbers of its own — BASELINE.json:13).

Scene: config4 (~20k-tri mesh + mirror sphere + checker plane, 1920×1080,
4 bounces) — the BASELINE config-4 workload.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    config = os.environ.get("RT_BENCH_CONFIG", "config4")
    repeats = int(os.environ.get("RT_BENCH_REPEATS", "3"))
    from benchmarks.rays_per_sec import run_bench

    res = run_bench(config=config, repeats=repeats, fwd_bwd=True)
    print(f"# fwd:     {res['fwd_rays_per_sec']:.4g} rays/s "
          f"({res['fwd_s']*1e3:.1f} ms/frame)", file=sys.stderr)
    if "fwd_bwd_rays_per_sec" in res:
        print(f"# fwd+bwd: {res['fwd_bwd_rays_per_sec']:.4g} rays/s "
              f"({res['fwd_bwd_s']*1e3:.1f} ms/step)", file=sys.stderr)
    print(f"# device:  {res['device']}; {res['rays_per_frame']:.4g} rays/frame",
          file=sys.stderr)


if __name__ == "__main__":
    main()
