#!/bin/bash
# Round-3 TPU queue #3: config4 frame-cost ATTRIBUTION.
# The profile says all six in-frame walks cost ~equal (~165 ms/tile) while a
# standalone coherent walk is 0.5 ms/131k — this queue decides between the
# candidate explanations with direct A/Bs on ONE band shape (1920x216 d4,
# the profiled shape; px*(d+1) = 2.07M units, under the fault budget):
#   depth ladder  -> marginal cost of each bounce round
#   lights 1 vs 2 -> shadow-walk share
#   tile sweep    -> lax.scan staging share (414720 = single-tile path)
# bash scripts/r3_tpu_tasks3.sh > /tmp/r3_tasks3.log 2>&1
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

band() { # band NAME [ENV=VAL ...] -- extra args
  local name="$1"; shift
  local envs=()
  while [[ $# -gt 0 && "$1" == *=* ]]; do envs+=("$1"); shift; done
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  probe || { echo "# $name: TPU unhealthy, skipped" >&2; return 1; }
  env "${envs[@]}" timeout 1500 python -m benchmarks.rays_per_sec \
      --phase fwd --config config4 --width 1920 --height 216 "$@" \
      > "/tmp/r3_${name}.out" 2> "/tmp/r3_${name}.err"
  echo "# $name rc=$?" >&2
}

# 1. Depth ladder (marginal bounce cost), interleaved twice.
for pass in a b; do
  for d in 0 1 2 4; do
    band "c4_depth${d}_$pass" --depth "$d"
  done
done

# 2. Shadow share: 1 light vs 2, at d0 and d4.
for pass in a b; do
  band "c4_l1_d0_$pass" RT_BENCH_LIGHTS=1 --depth 0
  band "c4_l1_d4_$pass" RT_BENCH_LIGHTS=1 --depth 4
done

# 3. Tile sweep at d4: scan staging share (414720 = single tile, no scan).
for pass in a b; do
  for t in 16384 131072 414720; do
    band "c4_tile${t}_$pass" RT_BENCH_TILE=$t --depth 4
  done
done

# 4. config2 bwd remat A/B (c3 noremat won 1.25x in queue #2).
run c2_bwd_noremat 1800 env RT_BENCH_REMAT=0 \
    python -m benchmarks.rays_per_sec --phase bwd --config config2 \
    --width 1920 --height 1080 --depth 2

# 4b. config3 bwd with the permute_take compaction VJP (scatter-free
#     backward through _compact), alone and with remat off.
run c3_bwd_permvjp 1800 \
    python -m benchmarks.rays_per_sec --phase bwd --config config3
run c3_bwd_permvjp_noremat 1800 env RT_BENCH_REMAT=0 \
    python -m benchmarks.rays_per_sec --phase bwd --config config3

# 5. walk_cost re-run with the fixed auto-scaling sync timer (first run's
#    1-vs-4 chains were noise: most rows 0.0 ms).
run walk_cost2 3600 python -m benchmarks.walk_cost

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
