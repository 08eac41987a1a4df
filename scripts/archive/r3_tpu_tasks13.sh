#!/bin/bash
# Round-3 TPU queue #13: glass fused-plan replay A/B on the config3 step.
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
  timeout "$to" "$@" > "/tmp/r13_${name}.out" 2> "/tmp/r13_${name}.err"
  echo "# $name rc=$?" >&2
}
for pass in a b; do
  run "c3_replay_$pass" 2400 env RT_BENCH_PLAN=1 \
      python -m benchmarks.rays_per_sec --phase bwd --config config3
  run "c3_std_$pass" 1800 \
      python -m benchmarks.rays_per_sec --phase bwd --config config3
done
echo "=== all done ($(date +%H:%M:%S)) ===" >&2
