#!/bin/bash
# Round-3 TPU queue #9: batched shadow-walk A/B (one [L*N]-lane occlusion
# walk instead of L sequential walks) + headline re-measure if it wins.
# bash scripts/r3_tpu_tasks9.sh > /tmp/r3_tasks9.log 2>&1
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
  timeout "$to" "$@" > "/tmp/r9_${name}.out" 2> "/tmp/r9_${name}.err"
  echo "# $name rc=$?" >&2
}
for pass in a b; do
  run "c4_fwd_$pass" 1500 python -m benchmarks.rays_per_sec --phase fwd \
      --config config4 --width 1920 --height 216
  run "c2_bwd_$pass" 1500 python -m benchmarks.rays_per_sec --phase bwd \
      --config config2 --width 1920 --height 1080 --depth 2
done
run c4_bwd 2400 python -m benchmarks.rays_per_sec --phase bwd --config config4
run bench_final3 4800 python bench.py
echo "=== all done ($(date +%H:%M:%S)) ===" >&2
