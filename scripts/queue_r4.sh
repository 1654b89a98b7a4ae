#!/usr/bin/env bash
# Round-4 TPU-first queue. Run AFTER `python scripts/tpu_probe.py` passes —
# the axon tunnel was down for ~3h of round 3 and everything here needs
# the chip (the ENVELOPE update is ~20 GFLOP x ~100k updates: minutes on
# v5e, days on this 2-core CPU).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/queue_r4.log}

step() { echo "=== $(date +%H:%M:%S) $1 ===" | tee -a "$LOG"; }

step "tpu probe"
if ! python scripts/tpu_probe.py --timeout 90 >> "$LOG" 2>&1; then
  echo "TPU down — aborting queue" | tee -a "$LOG"; exit 1
fi

step "envelope train + Pareto sweep (clears the two pending golden specs)"
timeout 10800 python -u scripts/envelope_e2e.py --train >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "bench suite"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "profile refresh (contiguous ring write landed after the last trace)"
timeout 3600 python scripts/profile_bench.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "golden table"
FREERL_PLATFORM=cpu timeout 600 python -u -m freerl_tpu.train.golden >> "$LOG" 2>&1
echo "queue_r4 done" | tee -a "$LOG"
