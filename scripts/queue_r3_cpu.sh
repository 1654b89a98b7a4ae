#!/usr/bin/env bash
# Round-3 CPU queue: everything that doesn't need the TPU chip.
# Usage: bash scripts/queue_r3_cpu.sh [wait_pid] [logfile]
# If wait_pid is given, blocks until that process exits first (used to
# chain behind the golden regen batch without contending for the 2 cores).
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
LOG=${2:-results/queue_r3_cpu.log}

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID ..." | tee -a "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

step() { echo "=== $(date +%H:%M:%S) $1 ===" | tee -a "$LOG"; }

step "marl_curves"
FREERL_PLATFORM=cpu timeout 10800 python -u scripts/marl_curves.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "envelope_e2e"
FREERL_PLATFORM=cpu timeout 7200 python -u scripts/envelope_e2e.py --train >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "gail_e2e"
timeout 7200 python -u scripts/gail_e2e.py --cpu >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "dp_scaling"
timeout 7200 python -u scripts/dp_scaling.py --cpu >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "compare chart"
FREERL_PLATFORM=cpu timeout 600 python - >> "$LOG" 2>&1 <<'EOF'
import glob, os
import numpy as np
from freerl_tpu.train.plotting import plot_compare
d = "results/learning_curves/MountainCar-v0"
sets = {}
for f in sorted(glob.glob(os.path.join(d, "*_3_seed.npy"))):
    name = os.path.basename(f).replace("_3_seed.npy", "")
    if name.endswith("_dp8"):
        continue
    arr = np.load(f)
    sets[name] = [arr[i] for i in range(arr.shape[0])]
print("variants:", sorted(sets))
print("saved", plot_compare(sets, out_dir=d, env_name="MountainCar-v0"))
EOF
echo "rc=$?" | tee -a "$LOG"

step "golden table"
FREERL_PLATFORM=cpu timeout 600 python -u -m freerl_tpu.train.golden >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"
echo "queue_r3_cpu done" | tee -a "$LOG"
