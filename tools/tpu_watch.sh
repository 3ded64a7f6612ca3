#!/usr/bin/env bash
# Poll chip health every ~10 min; on the first healthy report, run the
# round-3 idle-backlog sweep (tools/tpu_r3_sweep.sh) once and exit.
# Designed to sit in a tmux pane across a multi-hour tunnel outage.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r3}
mkdir -p "$OUT"
i=0
while true; do
  i=$((i + 1))
  ts=$(date +%H:%M:%S)
  timeout 400 python tools/chip_health.py 2>/dev/null > "$OUT/health_poll.json"
  if grep -q '"healthy": true' "$OUT/health_poll.json"; then
    echo "[$ts] poll $i: HEALTHY — starting sweep" | tee -a "$OUT/watch.log"
    bash tools/tpu_r3_sweep.sh "$OUT" 2>&1 | tee -a "$OUT/watch.log"
    rc=${PIPESTATUS[0]}  # the sweep's status, not tee's
    echo "WATCH_DONE rc=$rc" | tee -a "$OUT/watch.log"
    exit "$rc"
  fi
  echo "[$ts] poll $i: unhealthy ($(cat "$OUT/health_poll.json" 2>/dev/null | tr -d '\n'))" >> "$OUT/watch.log"
  sleep 600
done
