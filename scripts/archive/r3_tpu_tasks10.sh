#!/bin/bash
# Round-3 TPU queue #10: fused-plan replay A/B on the config2 training step.
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
  timeout "$to" "$@" > "/tmp/r10_${name}.out" 2> "/tmp/r10_${name}.err"
  echo "# $name rc=$?" >&2
}
for pass in a b; do
  run "c2_replay_$pass" 1800 env RT_BENCH_PLAN=1 \
      python -m benchmarks.rays_per_sec --phase bwd --config config2 \
      --width 1920 --height 1080 --depth 2
  run "c2_std_$pass" 1800 \
      python -m benchmarks.rays_per_sec --phase bwd --config config2 \
      --width 1920 --height 1080 --depth 2
done
echo "=== all done ($(date +%H:%M:%S)) ===" >&2
