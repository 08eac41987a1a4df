#!/bin/bash
# Round-3 TPU queue #11: the official final bench with fused-plan replay
# as the default config2 training step.
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
  timeout "$to" "$@" > "/tmp/r11_${name}.out" 2> "/tmp/r11_${name}.err"
  echo "# $name rc=$?" >&2
}
run bench_final4 4800 python bench.py
echo "=== all done ($(date +%H:%M:%S)) ===" >&2
