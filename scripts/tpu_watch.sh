#!/usr/bin/env bash
# Loop the TPU probe every ~4 min; record status transitions to
# results/tpu_watch.log and maintain results/tpu_status ("up"/"down").
# Does NOT launch any workload — the builder decides what to run when
# the tunnel recovers (the round-3 lesson: auto-launching the envelope
# regen before the algorithm fix just burns chip time on a bad run).
set -u
cd "$(dirname "$0")/.."
LOG=results/tpu_watch.log
STATUS=results/tpu_status
prev=""
while true; do
  if python scripts/tpu_probe.py --timeout 90 > /dev/null 2>&1; then
    cur=up
  else
    cur=down
  fi
  echo "$cur" > "$STATUS"
  if [ "$cur" != "$prev" ]; then
    echo "$(date +%F-%H:%M:%S) tpu $cur" >> "$LOG"
    prev=$cur
  fi
  sleep 240
done
