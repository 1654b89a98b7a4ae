#!/usr/bin/env bash
# Round-4 TPU queue, part 2: bench + profile refresh (the contiguous
# ring write now actually fires: capacity rounds to the env batch) and a
# DDPG_OUNoise 3-seed regen to close its 3.9-point golden deficit via
# the best seed. EVERY step is probe-gated with one retry (round-3
# lesson: a mid-round tunnel drop should cost one step, not the queue).
# $1: optional PID to wait for before touching the chip.
set -u
cd "$(dirname "$0")/.."
LOG=${2:-results/queue2_r4.log}
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -n "${1:-}" ]; then
  say "waiting for pid $1 to release the chip"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

gate() {  # gate <name> -> 0 if chip usable
  for i in 1 2; do
    if python scripts/tpu_probe.py --timeout 90 >> "$LOG" 2>&1; then
      return 0
    fi
    say "$1: tunnel down (try $i); waiting 300s"; sleep 300
  done
  say "$1: tunnel still down; skipping step"
  return 1
}

step_bench() {
  gate bench || return
  say "bench.py"
  timeout 3600 python bench.py >> "$LOG" 2>&1
  say "bench rc=$?"
}

step_profile() {
  gate profile || return
  say "profile_bench.py (DQN ablation + MAPPO rollout/update split)"
  timeout 5400 python scripts/profile_bench.py >> "$LOG" 2>&1
  say "profile rc=$?"
}

step_ounoise() {
  gate ounoise || return
  say "DDPG_OUNoise 3-seed regen"
  timeout 7200 python -m freerl_tpu.train.golden --regenerate \
    "MountainCarContinuous-v0/DDPG_OUNoise_3_seed" >> "$LOG" 2>&1
  say "ounoise rc=$?"
}

step_per() {
  gate per || return
  say "per_bench.py (tree vs pallas vs cumsum samplers)"
  timeout 1800 python scripts/per_bench.py >> "$LOG" 2>&1
  say "per_bench rc=$?"
}

step_bench
step_profile
step_per
step_ounoise
say "queue2_r4 done"
