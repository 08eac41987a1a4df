#!/bin/bash
# Reusable serial TPU queue runner (replaces the r3 one-off task scripts).
#
#   bash scripts/runq.sh QUEUE_NAME TASKFILE [> /tmp/QUEUE.log 2>&1]
#
# TASKFILE: one task per line,  name|timeout_seconds|command …
#   - '#' lines and blanks are skipped
#   - env assignments go through `env` in the command field
#   - tasks run strictly serially (one TPU process at a time — CLAUDE.md
#     rule 1), each preceded by a probe that waits out worker recovery
# Outputs land in /tmp/<QUEUE_NAME>_<name>.{out,err}; a PASS/FAIL summary
# line per task goes to stderr.
set -u
cd "$(dirname "$0")/.."
Q="$1"
TASKS="$2"

probe() {
  for i in 1 2 3; do
    if timeout 900 python -m benchmarks.rays_per_sec --phase probe \
        >/dev/null 2>&1; then return 0; fi
    echo "# probe $i failed; resting 150s" >&2; sleep 150
  done
  return 1
}

while IFS='|' read -r name to cmd; do
  case "$name" in ''|'#'*) continue;; esac
  echo "=== $Q/$name ($(date +%H:%M:%S)) ===" >&2
  probe || { echo "# $Q/$name: TPU unhealthy, skipped" >&2; continue; }
  eval "timeout $to $cmd" > "/tmp/${Q}_${name}.out" 2> "/tmp/${Q}_${name}.err"
  rc=$?
  echo "# $Q/$name rc=$rc $(grep -o 'PHASE_RESULT.*' "/tmp/${Q}_${name}.out" \
    | tail -1 | cut -c1-200)" >&2
done < "$TASKS"
echo "=== $Q all done ($(date +%H:%M:%S)) ===" >&2
