"""Round-5 single-agent golden runs: the reference-committed configs
that had no freerl_tpu curve yet (VERDICT r4 Missing #3/#5/#6/#7).

All runs use --fixed_reset: every reference family resets with the SAME
seed each episode during training (DQN.py:334, PPO.py:454, SAC.py:565,
TD3.py:441, DDPG_simple.py:348 — SURVEY §4.1's determinism fixture), so
the committed curves are fixed-start runs; on BipedalWalker that pins
the terrain itself. Off-policy runs use num_envs=8 x updates_per_burst=8
(the reference's 1 update per env step).

Reference targets (final-50, from the committed artifacts):
  PPO CartPole 500/500/500; PPO Pendulum -126.1/-317.8/-228.6;
  PPO LunarLander +220.2 (1 run, seed 100);
  PPO BipedalWalker +260.7/+201.3/+169.8;
  SAC Pendulum -125.2; TD3 Pendulum -127.3;
  DDPG_simple Pendulum -127.9/-249.4/-130.2;
  SAC discrete CartPole 500.0; DDPG discrete CartPole 462.2 (best of 3
  same-seed runs: 82.4/462.2/457.4);
  DQN FrozenLake 0.22/0.16/0.12; DQN Taxi -266.6 (seed 100).

Usage: python scripts/r5_singles.py [--only PPO_BipedalWalker,...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_UPB = ["--updates_per_burst", "8"]
_DQN = ["--batch_size", "256", "--buffer_size", "1000000",
        "--start_steps", "500"] + _UPB
# tag: (algo, env, artifact stem, seeds, extra argv)
RUNS = {
    "PPO_CartPole": ("PPO", "CartPole-v1", "PPO", (0, 10, 100),
                     ["--horizon", "2048"]),
    "PPO_Pendulum": ("PPO", "Pendulum-v1", "PPO", (0, 10, 100),
                     ["--horizon", "2048"]),
    "PPO_LunarLander": ("PPO", "LunarLander-v2", "PPO", (0, 10, 100),
                        ["--horizon", "2048"]),
    "PPO_BipedalWalker": ("PPO", "BipedalWalker-v3", "PPO", (0, 10, 100),
                          ["--horizon", "2048"]),
    "SAC_Pendulum": ("SAC", "Pendulum-v1", "SAC", (0,),
                     ["--batch_size", "256", "--random_steps", "500"]
                     + _UPB),
    "TD3_Pendulum": ("TD3", "Pendulum-v1", "TD3", (0,),
                     ["--batch_size", "256"] + _UPB),
    "DDPG_Pendulum": ("DDPG", "Pendulum-v1", "DDPG_simple", (0, 10, 100),
                      ["--batch_size", "256"] + _UPB),
    "DDPG_discrete_CartPole": ("DDPG", "CartPole-v1", "DDPG_discrete",
                               (0,), ["--batch_size", "256"] + _UPB),
    "SAC_discrete_CartPole": ("SAC", "CartPole-v1", "SAC_discrete", (0,),
                              ["--batch_size", "256",
                               "--random_steps", "500"] + _UPB),
    "DQN_FrozenLake": ("DQN", "FrozenLake-v1", "DQN", (0, 10, 100), _DQN),
    "DQN_Taxi": ("DQN", "Taxi-v3", "DQN", (100,), _DQN),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated tags")
    ap.add_argument("--num_envs", type=int, default=8)
    ap.add_argument("--results_root", default="results/golden_runs")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from freerl_tpu.cli import run as cli_run

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = set(args.only.split(",")) if args.only else set(RUNS)
    failures = []
    for tag, (algo, env_name, stem, seeds, extra) in RUNS.items():
        if tag not in only:
            continue
        out_dir = os.path.join(root, "results", "learning_curves", env_name)
        os.makedirs(out_dir, exist_ok=True)
        dst = os.path.join(out_dir, f"{stem}_{len(seeds)}_seed.npy")
        if os.path.exists(dst) and not args.force:
            print(f"=== {tag}: exists, skipping ===", flush=True)
            continue
        curves = []
        for seed in seeds:
            print(f"=== {tag} seed {seed}: {algo} on {env_name} "
                  f"{' '.join(extra)} ===", flush=True)
            t0 = time.time()
            try:
                model_dir = cli_run([
                    "--algo", algo, "--env_name", env_name,
                    "--max_episodes", "500",
                    "--num_envs", str(args.num_envs),
                    "--seed", str(seed), "--fixed_reset",
                    "--results_root", args.results_root,
                    "--no_tensorboard",
                ] + extra)
            except Exception as e:  # noqa: BLE001 — keep the queue going
                print(f"{tag} seed {seed} FAILED: {e!r}", flush=True)
                failures.append(f"{tag}:{seed}")
                continue
            src = os.path.join(model_dir, f"{algo}_seed_{seed}.npy")
            curve = np.load(src)
            curves.append(curve)
            print(f"{tag} seed {seed}: final-50 {curve[-50:].mean():.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if curves:
            T = min(len(c) for c in curves)
            np.save(dst, np.stack([c[:T] for c in curves]))
            arr = np.load(dst)
            print(f"{tag}: saved {dst} shape {arr.shape} per-seed final-50 "
                  f"{[round(float(c[-50:].mean()), 2) for c in arr]}",
                  flush=True)
    if failures:
        print("FAILURES:", failures, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
