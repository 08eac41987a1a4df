#!/bin/bash
# Round-3 TPU queue #12: fanout re-verdict at the loop-overhead-bound
# operating point (walks now cost ~13.6us/iter = the while_loop fixed
# overhead; K cells/iter halves iterations) + product-surface validation.
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
  timeout "$to" "$@" > "/tmp/r12_${name}.out" 2> "/tmp/r12_${name}.err"
  echo "# $name rc=$?" >&2
}
for pass in a b; do
  for f in 1 2 4; do
    run "fanout${f}_$pass" 1500 env RT_GRID_FANOUT=$f \
        python -m benchmarks.rays_per_sec --phase fwd --config config4 \
        --width 1920 --height 216
  done
done
# product surfaces on TPU at final defaults
run resilient_render 2400 python -m raytracer_tpu.cli render \
    --config config4 --resilient --out /tmp/c4_resilient.png
run optimize_plan 2400 python -m raytracer_tpu.cli optimize --plan \
    --steps 5 --out /tmp/opt_plan_tpu.png
echo "=== all done ($(date +%H:%M:%S)) ===" >&2
