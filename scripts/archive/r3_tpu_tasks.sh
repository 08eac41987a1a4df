#!/bin/bash
# Round-3 serial TPU task queue (ONE process at a time — CLAUDE.md rule 1).
# Run in background:  bash scripts/r3_tpu_tasks.sh > /tmp/r3_tasks.log 2>&1
# Each step is guarded by a patient probe; outputs land in /tmp/r3_*.
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

run() { # run NAME TIMEOUT CMD...
  local name="$1" to="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  probe || { echo "# $name: TPU unhealthy, skipped" >&2; return 1; }
  timeout "$to" "$@" > "/tmp/r3_${name}.out" 2> "/tmp/r3_${name}.err"
  echo "# $name rc=$?" >&2
}

# 1. Name where the config4 band forward goes (one band, grid tracer).
run prof_c4_fwd 1800 python tools/profile_step.py --config config4 \
    --phase fwd --width 1920 --height 216 --depth 4 --k 30

# 2. Fractional-compaction sweep on config4 fwd (the width lever).
for cap in 0.5 0.25 0.125; do
  RT_BENCH_COMPACT=$cap run "c4_compact_$cap" 1800 \
      python -m benchmarks.rays_per_sec --phase fwd --config config4 \
      --with-count
done
# baseline re-run interleaved (day-variance control)
run c4_compact_off 1800 python -m benchmarks.rays_per_sec --phase fwd \
    --config config4 --with-count

# 3. Fill the r2-d promise: scatter-probe microbenchmark.
run scatter_probe 1200 python -m benchmarks.scatter_probe

# 4. Name the config2 backward ops (VERDICT ask #5).
run prof_c2_bwd 1800 python tools/profile_step.py --config config2 \
    --phase bwd --depth 2 --k 30

# 5. Knob re-verdicts at the new coarse defaults (VERDICT ask #6):
#    skip / exact / fanout / active-mask, interleaved twice.
for pass in a b; do
  for env in "RT_GRID_SKIP=0" "RT_GRID_SKIP=2" "RT_GRID_EXACT=1" \
             "RT_GRID_FANOUT=2" "RT_NO_ACTIVE_MASK=1"; do
    name="knob_${env//=/_}_$pass"
    eval "export $env"
    run "$name" 1200 python -m benchmarks.rays_per_sec --phase fwd \
        --config config4 --width 1920 --height 432
    eval "unset ${env%%=*}"
  done
done

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
