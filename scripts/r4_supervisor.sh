#!/usr/bin/env bash
# Round-4 chip-time supervisor: let the ENVELOPE seed hunts run until
# DEADLINE_EPOCH (or natural exit), then stop them cleanly by PID and
# run queue2_r4.sh (bench + profile + per_bench + OUNoise regen) with
# the chip exclusive. PIDs of the hunt scripts passed as $2 $3...
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_supervisor.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
DEADLINE=${1:?deadline epoch}

shift
PIDS=("$@")
say "supervising pids: ${PIDS[*]} until $(date -d @"$DEADLINE" +%H:%M)"

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  ALIVE=0
  for p in "${PIDS[@]}"; do
    kill -0 "$p" 2>/dev/null && ALIVE=1
  done
  [ "$ALIVE" = 0 ] && { say "hunts finished early"; break; }
  sleep 60
done

for p in "${PIDS[@]}"; do
  if kill -0 "$p" 2>/dev/null; then
    say "deadline: stopping hunt pid $p (and its children)"
    CHILD=$(pgrep -P "$p" | tr '\n' ' ')
    kill "$p" 2>/dev/null
    for c in $CHILD; do kill "$c" 2>/dev/null; done
  fi
done
sleep 10

say "launching queue2_r4"
bash scripts/queue2_r4.sh "" results/queue2_r4.log
say "supervisor done"
