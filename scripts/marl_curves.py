"""Learning-curve runs for the MARL algorithms the reference ships
without committed curves (MATD3, HAPPO, IPPO, MAT, MAAC).

The reference publishes only converged learning rates for these
(README.md:149-158: MADDPG/MATD3 5e-4, HAPPO 1e-4, MAAC_discrete 5e-4,
MAT 1e-4/5e-4) — our config defaults already carry them. This script
runs each through the public CLI on its reference env/protocol (the
600-episode simple_spread protocol the committed MADDPG/MAPPO/MASAC
curves use; simple_adversary for IPPO's heterogeneous-dims case) and
drops the curves into the golden learning-curves tree, where
train/golden.py gates them against the nearest family reference curve.

Usage: python scripts/marl_curves.py [--only MATD3,HAPPO,...]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = {
    # algo: (env, episodes, extra argv)
    "MATD3": ("simple_spread_v3", 600, []),
    "HAPPO": ("simple_spread_v3", 600, []),
    "MAT": ("simple_spread_v3", 1500, []),
    "IPPO": ("simple_adversary_v3", 600, []),
    "MAAC": ("simple_spread_v3", 2000, []),
    # recurrent MAPPO (beyond-reference capability; the reference lists
    # rmappo as unimplemented) — curve demonstrates GRU+BPTT training
    # end-to-end on the same spread protocol, family-gated vs MAPPO
    "RMAPPO": ("simple_spread_v3", 600, []),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated algo subset")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--results_root", default="results/golden_runs")
    args = ap.parse_args()

    from freerl_tpu.cli import run as cli_run

    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = set(args.only.split(",")) if args.only else set(RUNS)
    for algo, (env_name, episodes, extra) in RUNS.items():
        if algo not in only:
            continue
        print(f"=== {algo} on {env_name} ({episodes} eps) ===", flush=True)
        model_dir = cli_run([
            "--algo", algo, "--env_name", env_name,
            "--max_episodes", str(episodes), "--num_envs", "8",
            "--seed", str(args.seed),
            "--results_root", args.results_root, "--no_tensorboard",
        ] + extra)
        src = os.path.join(model_dir, f"{algo}_seed_{args.seed}.npy")
        out_dir = os.path.join(root, "results", "learning_curves", env_name)
        os.makedirs(out_dir, exist_ok=True)
        dst = os.path.join(out_dir, f"{algo}_1_seed.npy")
        shutil.copyfile(src, dst)
        curve = np.load(dst)
        final = curve[-50:].mean()
        print(f"{algo}: saved {dst} final-50 per-agent mean {final:.2f}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
