#!/bin/bash
# Round-3 TPU queue #4: exploit the r3-e findings.
#   tile 16384 beat 131072 by 2.7x on the config4 band (VMEM-resident walk
#   buffers) -> fine tile sweep, compact re-sweep at the new tile (with the
#   bounce-0 reshape-fold fix), backward remat-policy A/Bs, then the full
#   official bench at the new defaults.
# bash scripts/r3_tpu_tasks4.sh > /tmp/r3_tasks4.log 2>&1
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
  timeout "$to" "$@" > "/tmp/r4_${name}.out" 2> "/tmp/r4_${name}.err"
  echo "# $name rc=$?" >&2
}

# 1. Fine tile sweep on the config4 band (d4), interleaved twice.
for pass in a b; do
  for t in 8192 16384 24576 32768 65536; do
    run "c4_tile${t}_$pass" 1500 env RT_BENCH_TILE=$t \
        python -m benchmarks.rays_per_sec --phase fwd --config config4 \
        --width 1920 --height 216
  done
done

# 2. Fractional-compaction re-sweep at the new tile (bounce-0 folds are now
#    reshape; scatter folds only at compacted width).
for pass in a b; do
  for cap in 0.25 0.125 0.0625; do
    run "c4_compact${cap}_$pass" 1500 env RT_BENCH_COMPACT=$cap \
        python -m benchmarks.rays_per_sec --phase fwd --config config4 \
        --width 1920 --height 216
  done
  run "c4_compact_off_$pass" 1500 \
      python -m benchmarks.rays_per_sec --phase fwd --config config4 \
      --width 1920 --height 216
done

# 3. config3 bwd: remat policy A/B (plan is the new default) + permute_take
#    compaction VJP (in since 2c42f72).
for pass in a b; do
  run "c3_bwd_plan_$pass" 1800 \
      python -m benchmarks.rays_per_sec --phase bwd --config config3
  run "c3_bwd_full_$pass" 1800 env RT_BENCH_REMAT=full \
      python -m benchmarks.rays_per_sec --phase bwd --config config3
  run "c3_bwd_off_$pass" 1800 env RT_BENCH_REMAT=0 \
      python -m benchmarks.rays_per_sec --phase bwd --config config3
done

# 4. config2 bwd: remat policy A/B at the winning 65536 tile.
for pass in a b; do
  for pol in plan full 0; do
    run "c2_bwd_${pol}_$pass" 1800 env RT_BENCH_REMAT=$pol RT_BENCH_TILE=65536 \
        python -m benchmarks.rays_per_sec --phase bwd --config config2 \
        --width 1920 --height 1080 --depth 2
  done
done

# 5. config4 bwd step at the new defaults (the headline direction).
run c4_bwd_new 2400 python -m benchmarks.rays_per_sec --phase bwd \
    --config config4

# 6. The official full bench at the new defaults.
run bench_full 4800 python bench.py

echo "=== all done ($(date +%H:%M:%S)) ===" >&2
