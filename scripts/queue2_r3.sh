#!/usr/bin/env bash
# Round-3 TPU queue #2: MARL curve evidence + ENVELOPE end-to-end.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/queue2_r3.log}

echo "=== $(date +%H:%M:%S) marl_curves ===" | tee -a "$LOG"
timeout 14400 python scripts/marl_curves.py >> "$LOG" 2>&1
echo "=== rc=$? $(date +%H:%M:%S) envelope_e2e ===" | tee -a "$LOG"
timeout 14400 python scripts/envelope_e2e.py --train >> "$LOG" 2>&1
echo "=== rc=$? $(date +%H:%M:%S) queue2 done ===" | tee -a "$LOG"
