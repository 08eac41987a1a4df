#!/bin/bash
# Round-3 TPU queue #5: bottom of the tile curve (queue #4 found monotone
# improvement down to 8192: 0.458 s vs 0.739 s @16384 on the 1920x216 d4
# band). Probe 2048/4096 with an 8192 anchor, interleaved twice.
# bash scripts/r3_tpu_tasks5.sh > /tmp/r3_tasks5.log 2>&1
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
  timeout "$to" "$@" > "/tmp/r5_${name}.out" 2> "/tmp/r5_${name}.err"
  echo "# $name rc=$?" >&2
}

for pass in a b; do
  for t in 2048 4096 8192; do
    run "c4_tile${t}_$pass" 1500 env RT_BENCH_TILE=$t \
        python -m benchmarks.rays_per_sec --phase fwd --config config4 \
        --width 1920 --height 216
  done
done

# config4 fwd+bwd at tile 8192 (does the bwd step follow the fwd cliff?)
run c4_bwd_tile8192 2400 env RT_BENCH_TILE=8192 \
    python -m benchmarks.rays_per_sec --phase bwd --config config4

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
