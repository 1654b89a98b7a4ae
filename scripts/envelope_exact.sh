#!/usr/bin/env bash
# Protocol-EXACT ENVELOPE DST run: num_envs=1, 1 update per env step —
# the reference's literal single-env loop shape (ENVELOPE_DQN.py:472-544),
# removing the 8-env vectorization as a variable. Diagnostic for the
# residual high-w1 Q inflation: the reference's shipped ENVELOPE_DQN.pt
# is bounded (|Q| <= 24 everywhere probed) while our 8-env runs inflate
# to ~150 at w1 -> 1.
# Waits for any existing TPU user (PID in $1) to exit first.
set -u
cd "$(dirname "$0")/.."
LOG=${2:-results/envelope_exact.log}
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -n "${1:-}" ]; then
  say "waiting for pid $1 to release the chip"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

for i in 1 2 3; do
  if python scripts/tpu_probe.py --timeout 90 >> "$LOG" 2>&1; then break; fi
  say "tunnel down (try $i); waiting 300s"; sleep 300
done

say "launching protocol-exact single-env run"
timeout 7200 python -u -m freerl_tpu.cli \
  --algo ENVELOPE --env_name deep-sea-treasure-v0 \
  --max_episodes 5000 --num_envs 1 --updates_per_burst 1 \
  --batch_size 256 --buffer_size 1000000 --start_steps 500 \
  --save_freq 125 --seed 0 \
  --results_root results/golden_runs --no_tensorboard >> "$LOG" 2>&1
say "train rc=$?"
RUNDIR=$(ls -td results/golden_runs/deep-sea-treasure-v0/ENVELOPE_* 2>/dev/null | head -1)
say "sweep on $RUNDIR"
timeout 1800 python -u -c "
import sys; sys.argv=['x']
sys.path.insert(0, '.')
from scripts.envelope_e2e import sweep
sweep('$RUNDIR', None)" >> "$LOG" 2>&1
say "sweep rc=$?"
say "envelope_exact done"
