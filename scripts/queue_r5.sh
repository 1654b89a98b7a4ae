#!/usr/bin/env bash
# Round-5 regeneration pipeline (documentation of the order that
# produced the committed artifacts; each step is idempotent — artifacts
# that exist are skipped unless --force).
#
# PROTOCOL NOTES (the round's two recoveries):
#  * every reference family trains with env.reset(seed=args.seed) each
#    episode -> protocol-exact runs use --fixed_reset;
#  * the reference clips per-net grad norms (0.5/10/none by family) —
#    restored in the algos, so regens after this round pick it up
#    automatically.
# NEVER run two chip jobs concurrently over the remote TPU tunnel: the
# serialized dispatch queue multiplies every readback (measured 14-70x
# slowdowns); chain jobs on PIDs instead.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/queue_r5.log}
step() { echo "=== $(date +%H:%M:%S) $1 ===" | tee -a "$LOG"; }

step "tpu probe"
python scripts/tpu_probe.py --timeout 90 >> "$LOG" 2>&1 || exit 1

step "protocol-exact N=5 MARL matrix (11 tags, 3 seeds; ~40 min)"
python -u scripts/r5_marl_n5.py --seeds 0,10,100 >> "$LOG" 2>&1
python -u scripts/r5_marl_n5.py --only MAPPO_attention_N30 --seeds 0 >> "$LOG" 2>&1

step "single-agent golden matrix (PPO x4, Pendulum trio, discrete, tabular)"
python -u scripts/r5_singles.py >> "$LOG" 2>&1

step "north-star conjunction sweep (parity at >=1M env-steps/s)"
python -u scripts/r5_northstar.py >> "$LOG" 2>&1

step "CEM-GD3PG BipedalWalker (2 draws, ~45 min each)"
python -u scripts/r5_cem_bipedal.py --runs 2 >> "$LOG" 2>&1

step "DP compute/comm decomposition (CPU virtual mesh)"
python -u scripts/dp_comm_model.py >> "$LOG" 2>&1

step "bench suite"
timeout 3600 python bench.py >> "$LOG" 2>&1

step "golden table"
FREERL_PLATFORM=cpu timeout 600 python -u -m freerl_tpu.train.golden >> "$LOG" 2>&1
echo "queue_r5 done" | tee -a "$LOG"
