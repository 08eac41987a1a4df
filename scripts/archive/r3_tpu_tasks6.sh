#!/bin/bash
# Round-3 TPU queue #6: re-tune the grid AT the VMEM-resident operating
# point (tile 4096 — queue #5's bottom). The cap-128/dens-0.125 winner was
# tuned at spilled 131072-lane tiles where iterations were everything; at
# VMEM-resident widths the [tile, cap] candidate traffic itself is live, so
# smaller capacities / finer grids may rebalance. Plus a skip ladder, the
# bwd step at 4096, and the official bench at the final defaults.
# bash scripts/r3_tpu_tasks6.sh > /tmp/r3_tasks6.log 2>&1
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
  timeout "$to" "$@" > "/tmp/r6_${name}.out" 2> "/tmp/r6_${name}.err"
  echo "# $name rc=$?" >&2
}

band() { # band NAME ENV=VAL...
  local name="$1"; shift
  run "$name" 1500 env "$@" python -m benchmarks.rays_per_sec \
      --phase fwd --config config4 --width 1920 --height 216
}

# 1. capacity x density at tile 4096, interleaved twice (anchor = shipping
#    128/0.125). Overflow grows as capacity shrinks; rays_per_sec asserts
#    exactness post-timing, and heavy-overflow combos just measure slow.
for pass in a b; do
  band "g128_d0125_$pass"                    # anchor (= shipping defaults)
  band "g64_d0125_$pass"  RT_GRID_CAPACITY=64
  band "g64_d025_$pass"   RT_GRID_CAPACITY=64 RT_GRID_DENSITY=0.25
  band "g32_d05_$pass"    RT_GRID_CAPACITY=32 RT_GRID_DENSITY=0.5
  band "g128_d00625_$pass" RT_GRID_DENSITY=0.0625
  band "g192_d0125_$pass" RT_GRID_CAPACITY=192
done

# 2. skip ladder at tile 4096 (default 2).
for pass in a b; do
  for s in 0 1 2 4; do
    band "skip${s}_$pass" RT_GRID_SKIP=$s
  done
done

# 3. config4 full training step at tile 4096 (the headline direction).
run c4_bwd_4096 2400 python -m benchmarks.rays_per_sec --phase bwd \
    --config config4

# 4. Official bench at the final defaults (all presets tuned).
run bench_final 4800 python bench.py

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
