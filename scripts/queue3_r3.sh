#!/usr/bin/env bash
# Round-3 TPU queue #3: post-artifact chores — trick-matrix compare
# chart, bench suite, profile breakdown, DP scaling sweep, graft check.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/queue3_r3.log}

step() { echo "=== $(date +%H:%M:%S) $1 ===" | tee -a "$LOG"; }

step "compare chart"
timeout 600 python - >> "$LOG" 2>&1 <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
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

step "dp_scaling (cpu virtual mesh)"
timeout 3600 python scripts/dp_scaling.py --cpu >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "profile_bench (tpu)"
timeout 3600 python scripts/profile_bench.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "bench suite (tpu)"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "pixel cartpole DQN curve (tpu)"
timeout 7200 python scripts/pixel_curve.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "graft entry + dryrun"
timeout 1200 python __graft_entry__.py >> "$LOG" 2>&1
echo "rc=$?" | tee -a "$LOG"

step "golden final table"
timeout 600 python - >> "$LOG" 2>&1 <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from freerl_tpu.train.golden import check_all
for r in check_all():
    print(r["status"], r["env"], r["algo"], r["ours"], r["ref"],
          r["seed_overlap"])
EOF
echo "queue3 done" | tee -a "$LOG"
