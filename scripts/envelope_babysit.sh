#!/usr/bin/env bash
# Babysit the ENVELOPE DST reference-protocol run against a flapping TPU
# tunnel: wait for two clean probes, launch the CLI run with periodic
# checkpoints, restart if checkpoint mtime stalls, and on completion copy
# the curve + run the Pareto sweep (clears both pending golden specs).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/envelope_babysit.log}
ROOT=results/golden_runs
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

while true; do
  if ! python scripts/tpu_probe.py --timeout 60 >> "$LOG" 2>&1; then
    say "tunnel down; waiting"; sleep 120; continue
  fi
  sleep 20
  if ! python scripts/tpu_probe.py --timeout 60 >> "$LOG" 2>&1; then
    say "tunnel flapping; waiting"; sleep 120; continue
  fi
  say "tunnel stable; launching envelope"
  python -u -m freerl_tpu.cli \
    --algo ENVELOPE --env_name deep-sea-treasure-v0 \
    --max_episodes 5000 --num_envs 8 --updates_per_burst 8 \
    --batch_size 256 --buffer_size 1000000 --start_steps 500 \
    --save_freq 125 --seed 0 \
    --results_root "$ROOT" --no_tensorboard >> "$LOG" 2>&1 &
  PID=$!
  RUNDIR=""
  while kill -0 "$PID" 2>/dev/null; do
    sleep 300
    RUNDIR=$(ls -td "$ROOT"/deep-sea-treasure-v0/ENVELOPE_* 2>/dev/null | head -1)
    if [ -z "$RUNDIR" ]; then
      # run died before creating its dir: treat as stalled immediately
      say "no run dir after 300s; treating as stalled"
      AGE=100000
    elif [ -d "$RUNDIR/checkpoint" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$RUNDIR/checkpoint") ))
    else
      AGE=$(( $(date +%s) - $(stat -c %Y "$RUNDIR/config.json") ))
    fi
    if [ "$AGE" -gt 900 ]; then
      say "stalled (no checkpoint for ${AGE}s); killing $PID"
      kill "$PID" 2>/dev/null; sleep 3; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null; RC=$?
  RUNDIR=$(ls -td "$ROOT"/deep-sea-treasure-v0/ENVELOPE_* 2>/dev/null | head -1)
  if [ -f "$RUNDIR/ENVELOPE_seed_0.npy" ]; then
    say "run complete (rc=$RC) at $RUNDIR; copying curve + sweep"
    python - "$RUNDIR" >> "$LOG" 2>&1 <<'EOF'
import sys, os
import numpy as np
run = sys.argv[1]
curve = np.load(os.path.join(run, "ENVELOPE_seed_0.npy"))
out = "results/learning_curves/deep-sea-treasure-v0"
os.makedirs(out, exist_ok=True)
np.save(os.path.join(out, "ENVELOPE_1_seed.npy"), curve[None])
print("curve saved; final-50:", curve[-50:].mean())
EOF
    timeout 1800 python -u scripts/envelope_e2e.py --model_dir "$RUNDIR" >> "$LOG" 2>&1
    say "sweep rc=$?"
    break
  fi
  say "run died without artifact (rc=$RC); retrying"
done
say "babysitter done"
