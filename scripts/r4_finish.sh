#!/usr/bin/env bash
# Round-4 wrap-up (CPU): refresh the best-run ENVELOPE artifacts from
# every completed run, re-run the golden table, the full test suite, and
# the multi-chip dryrun. Waits for $1 (the supervisor/queue PID) first.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_finish.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -n "${1:-}" ]; then
  say "waiting for pid $1 (queue) to finish"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

say "envelope finalize"
FREERL_PLATFORM=cpu timeout 600 python scripts/envelope_finalize.py >> "$LOG" 2>&1
say "golden table"
FREERL_PLATFORM=cpu timeout 900 python -m freerl_tpu.train.golden >> "$LOG" 2>&1
say "golden rc=$?"
say "full test suite"
FREERL_PLATFORM=cpu timeout 3000 python -m pytest tests/ -q >> "$LOG" 2>&1
say "suite rc=$?"
say "dryrun_multichip(8)"
FREERL_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" >> "$LOG" 2>&1
say "dryrun rc=$?"
say "r4_finish done"
