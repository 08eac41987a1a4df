#!/bin/bash
# Round-3 TPU queue #7 (final): joint skip0 x tile matrix (the two knobs
# interact — skip's win was a spilled-width artifact), config4 bwd remat
# A/B (phase_bwd now respects preset remat), and the official final bench.
# bash scripts/r3_tpu_tasks7.sh > /tmp/r3_tasks7.log 2>&1
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
  timeout "$to" "$@" > "/tmp/r7_${name}.out" 2> "/tmp/r7_${name}.err"
  echo "# $name rc=$?" >&2
}

# 1. skip0 (new default) x tile, interleaved twice.
for pass in a b; do
  for t in 2048 4096 8192; do
    run "tile${t}_$pass" 1500 env RT_BENCH_TILE=$t \
        python -m benchmarks.rays_per_sec --phase fwd --config config4 \
        --width 1920 --height 216
  done
done

# 2. config4 training step: preset plan-remat vs remat off (the old
#    phase_bwd override always measured off).
run c4_bwd_plan 2400 python -m benchmarks.rays_per_sec --phase bwd \
    --config config4
run c4_bwd_off 2400 env RT_BENCH_REMAT=0 \
    python -m benchmarks.rays_per_sec --phase bwd --config config4

# 3. The official final bench (skip0, tile4096, per-preset remat respected).
run bench_final2 4800 python bench.py

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
