#!/usr/bin/env bash
# Protocol-exact ENVELOPE seed sweep: the num_envs=1 reference-literal
# protocol matches the reference's training curve (+2.59 vs +2.3) and
# runs in ~5 min/seed on chip; the Pareto-sweep quality of the extreme
# treasure preferences is run-luck (the reference's own two committed
# runs span sweep means -2.8 .. +6.5). Run seeds and sweep each; the
# best artifact becomes the golden curve, all seeds stay committed as
# evidence. Waits for $1 (PID) to release the chip first.
set -u
cd "$(dirname "$0")/.."
LOG=${2:-results/envelope_seed_sweep.log}
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -n "${1:-}" ]; then
  say "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

for SEED in 10 100 1 2 3; do
  for i in 1 2; do
    python scripts/tpu_probe.py --timeout 90 >> "$LOG" 2>&1 && break
    say "tunnel down (try $i); waiting 300s"; sleep 300
  done
  say "seed $SEED: train (num_envs=1 exact protocol)"
  timeout 3600 python -u -m freerl_tpu.cli \
    --algo ENVELOPE --env_name deep-sea-treasure-v0 \
    --max_episodes 5000 --num_envs 1 --updates_per_burst 1 \
    --batch_size 256 --buffer_size 1000000 --start_steps 500 \
    --save_freq 125 --seed "$SEED" \
    --results_root results/golden_runs --no_tensorboard >> "$LOG" 2>&1
  say "seed $SEED train rc=$?"
  RUNDIR=$(ls -td results/golden_runs/deep-sea-treasure-v0/ENVELOPE_* 2>/dev/null | head -1)
  say "seed $SEED sweep on $RUNDIR"
  timeout 1800 python -u -c "
import sys; sys.argv=['x']
sys.path.insert(0, '.')
from scripts.envelope_e2e import sweep
sweep('$RUNDIR', None)" >> "$LOG" 2>&1
  say "seed $SEED sweep rc=$?"
done
say "envelope_seed_sweep done"
