#!/bin/bash
# Round-3 TPU queue #2: walk cost model + config2/3 bwd levers.
# bash scripts/r3_tpu_tasks2.sh > /tmp/r3_tasks2.log 2>&1
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
  timeout "$to" "$@" > "/tmp/r3_${name}.out" 2> "/tmp/r3_${name}.err"
  echo "# $name rc=$?" >&2
}

# 1. The walk cost model: width x iters x capacity x coherence.
run walk_cost 2400 python -m benchmarks.walk_cost

# 2. config2 bwd tile-size sweep (the backward runs a 127-step scan of
#    16384-ray tiles; per-tile staging showed up all over the profile).
for tile in 16384 65536 262144; do
  RT_BENCH_TILE=$tile run "c2_bwd_tile_$tile" 1800 \
      python -m benchmarks.rays_per_sec --phase bwd --config config2 \
      --width 1920 --height 1080 --depth 2
done

# 3. config3 bwd: remat on/off A/B + tile sweep (the 150x-of-fwd config).
RT_BENCH_REMAT=0 run c3_bwd_noremat 1800 \
    python -m benchmarks.rays_per_sec --phase bwd --config config3
run c3_bwd_base 1800 \
    python -m benchmarks.rays_per_sec --phase bwd --config config3
RT_BENCH_TILE=65536 run c3_bwd_tile_65536 1800 \
    python -m benchmarks.rays_per_sec --phase bwd --config config3

# 4. config2 fwd+bwd with the best tile re-interleaved (variance anchor).
for tile in 16384 262144; do
  RT_BENCH_TILE=$tile run "c2_bwd_tile_${tile}_b" 1800 \
      python -m benchmarks.rays_per_sec --phase bwd --config config2 \
      --width 1920 --height 1080 --depth 2
done

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
