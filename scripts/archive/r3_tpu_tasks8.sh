#!/bin/bash
# Round-3 TPU queue #8: decompositions for the r4 roadmap + last config3
# lever.
#   - config2 WAVEFRONT fwd at 1080p (the primal the training step pays;
#     bounds what a fused-plan forward could save)
#   - config3 bwd tile ladder under remat-off (its winner was only swept
#     under full remat)
#   - per-stage profile of config4 at the final operating point
# bash scripts/r3_tpu_tasks8.sh > /tmp/r3_tasks8.log 2>&1
set -u
cd "$(dirname "$0")/.."

probe() {
  for i in 1 2 3; do
    if timeout 900 python -m benchmarks.rays_per_sec --phase probe \
        >/dev/null 2>&1; then return 0; fi
    echo "# probe $i failed; resting 150s" >&2; sleep 150
  done
  return 1
}

run() {
  local name="$1" to="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  probe || { echo "# $name: TPU unhealthy, skipped" >&2; return 1; }
  timeout "$to" "$@" > "/tmp/r8_${name}.out" 2> "/tmp/r8_${name}.err"
  echo "# $name rc=$?" >&2
}

# 1. config2 wavefront (non-fused) fwd, 1080p d2 — twice.
for pass in a b; do
  run "c2_wave_fwd_$pass" 1500 \
      python -m benchmarks.rays_per_sec --phase fwd --config config2 \
      --width 1920 --height 1080 --depth 2
done

# 2. config3 bwd tile ladder at the remat-off winner.
for pass in a b; do
  for t in 8192 16384 32768; do
    run "c3_bwd_off_tile${t}_$pass" 1800 env RT_BENCH_TILE=$t \
        python -m benchmarks.rays_per_sec --phase bwd --config config3
  done
done

# 3. Per-stage profile of config4 fwd at the final defaults.
run prof_c4_final 1800 python tools/profile_step.py --config config4 \
    --phase fwd --width 1920 --height 216 --depth 4 --k 30

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
