#!/usr/bin/env bash
# Round-3 golden regeneration queue (runs sequentially on the one TPU).
# Usage: bash scripts/regen_r3.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/regen_r3.log}
mkdir -p results

run() {
  echo "=== $(date +%H:%M:%S) regen $* ===" | tee -a "$LOG"
  timeout 7200 python -m freerl_tpu.train.golden --regenerate "$@" \
    >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S) ===" | tee -a "$LOG"
}

run "CartPole-v1/REINFORCE_3_seed"
run "MountainCar-v0/DQN_3_seed"
run "MountainCar-v0/DQN_Double_3_seed"
run "MountainCar-v0/DQN_Dueling_3_seed"
run "MountainCar-v0/DQN_PER_3_seed"
run "MountainCar-v0/DQN_Noisy_3_seed"
run "MountainCar-v0/DQN_N_Step_3_seed"
run "MountainCar-v0/DQN_Categorical_3_seed"
run "MountainCar-v0/DQN_Rainbow_3_seed"
python -m freerl_tpu.train.golden >> "$LOG" 2>&1
echo "queue done" | tee -a "$LOG"
