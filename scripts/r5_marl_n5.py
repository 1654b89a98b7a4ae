"""Round-5 MARL matrix at the reference's REAL N=5 protocol.

Every committed reference simple_spread artifact is a 5-agent run (the
``_N_5`` filename suffix written at MADDPG_simple.py:395; env built with
``env_agent_n`` at :214-226).  Round 4's curves all used the easier
3-agent default, so this script re-runs the full matrix at N=5 through
the public CLI and drops ``<TAG>_<k>_seed.npy`` artifacts into the
golden learning-curves tree, where train/golden.py gates them against
the real committed ``*_N_5.npy`` reference runs.

Two protocol facts recovered from the reference code (both load-bearing;
the first r5 sweep missed them and landed at random-policy level):

1. FIXED RESET.  Every MARL family resets with the SAME seed every
   episode at the time these artifacts were produced
   (``env.reset(seed=args.seed)`` — MADDPG_simple.py:375,
   MAPPO.py:714, MAT.py:701, MATD3_simple.py:462, MAAC_discrete.py:460,
   IPPO.py:551; the MADDPG README's 2025.3.10 note admits all prior
   convergence depended on it).  The committed curves are therefore
   single-layout runs; ``--fixed_reset`` reproduces that protocol.
   Random-reset twins are kept as ``<TAG>_rand`` artifacts.
2. UPDATE RATIO.  learn_steps_interval=1 -> 1 update per env step;
   num_envs=8 x updates_per_burst=8 matches it.

Protocols (from the reference artifacts themselves):
  off-policy (MADDPG/MATD3/MASAC/MAAC/ATT) — 600 ep, shape (5, 600);
  MAPPO/HAPPO/MAPPO_attention — 5000 ep; MAT — 7000 ep;
  IPPO simple_adversary — 5000 ep (default agent count);
  MAPPO_attention N=30 — 5000 ep (the one large-agent-count artifact).
MASAC/MAAC lr=1e-3: the N=5 artifacts are dated Nov 2024 (tfevents),
before the 2025.3.22 README note changed the defaults to 1e-4/5e-4 for
the 40k protocol; the then-default was 1e-3.

Usage: python scripts/r5_marl_n5.py [--only MADDPG_N5,...]
       [--seeds 0,10,100] [--random_reset]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# off-policy runs match the reference's learn_steps_interval=1 cadence
_UPB = ["--updates_per_burst", "8"]
# tag: (algo, env, episodes, extra argv)
RUNS = {
    "MADDPG_N5": ("MADDPG", "simple_spread_v3", 600, ["--N", "5"] + _UPB),
    "MATD3_N5": ("MATD3", "simple_spread_v3", 600, ["--N", "5"] + _UPB),
    "MASAC_N5": ("MASAC", "simple_spread_v3", 600,
                 ["--N", "5", "--actor_lr", "1e-3", "--critic_lr", "1e-3"]
                 + _UPB),
    "MAAC_N5": ("MAAC", "simple_spread_v3", 600,
                ["--N", "5", "--actor_lr", "1e-3", "--critic_lr", "1e-3"]
                + _UPB),
    "MADDPG_ATT_N5": ("MADDPG", "simple_spread_v3", 600,
                      ["--N", "5", "--trick", "ATT"] + _UPB),
    "MAPPO_N5": ("MAPPO", "simple_spread_v3", 5000, ["--N", "5"]),
    "MAPPO_attention_N5": ("MAPPO", "simple_spread_v3", 5000,
                           ["--N", "5", "--trick", "attention"]),
    "HAPPO_N5": ("HAPPO", "simple_spread_v3", 5000, ["--N", "5"]),
    # MAT protocol (MAT.py argparse): DISCRETE actions, horizon 256
    # (= one 256-row batch, K_epochs 15, clip 0.05)
    "MAT_N5": ("MAT", "simple_spread_v3", 7000,
               ["--N", "5", "--discrete_actions", "--horizon", "256"]),
    "IPPO_5000": ("IPPO", "simple_adversary_v3", 5000, []),
    # the reference's two committed IPPO adversary runs are BOTH layout
    # seed 100 (IPPO_1/IPPO_2: IPPO_seed_100.npy) — two independent
    # draws on one layout; reproduce that shape via --reset_seed
    "IPPO_L100": ("IPPO", "simple_adversary_v3", 5000,
                  ["--reset_seed", "100"]),
    "MAPPO_attention_N30": ("MAPPO", "simple_spread_v3", 5000,
                            ["--N", "30", "--trick", "attention"]),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated tags")
    ap.add_argument("--seeds", default="0,10,100",
                    help="comma-separated seeds (reference protocol "
                         "0/10/100; under fixed reset the seed IS the "
                         "layout, so cross-seed spread = layout spread)")
    ap.add_argument("--num_envs", type=int, default=8)
    ap.add_argument("--results_root", default="results/golden_runs")
    ap.add_argument("--random_reset", action="store_true",
                    help="drop --fixed_reset (robust protocol; artifacts "
                         "get a _rand suffix)")
    ap.add_argument("--force", action="store_true",
                    help="re-run even when the artifact already exists")
    args = ap.parse_args()

    import numpy as np

    from freerl_tpu.cli import run as cli_run

    seeds = [int(s) for s in args.seeds.split(",")]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = set(args.only.split(",")) if args.only else set(RUNS)
    failures = []
    for tag, (algo, env_name, episodes, extra) in RUNS.items():
        if tag not in only:
            continue
        out_tag = tag + ("_rand" if args.random_reset else "")
        out_dir = os.path.join(root, "results", "learning_curves", env_name)
        os.makedirs(out_dir, exist_ok=True)
        dst = os.path.join(out_dir, f"{out_tag}_{len(seeds)}_seed.npy")
        if os.path.exists(dst) and not args.force:
            print(f"=== {out_tag}: exists, skipping ===", flush=True)
            continue
        curves = []
        for seed in seeds:
            print(f"=== {out_tag} seed {seed}: {algo} on {env_name} "
                  f"({episodes} eps) {' '.join(extra)} ===", flush=True)
            t0 = time.time()
            argv = [
                "--algo", algo, "--env_name", env_name,
                "--max_episodes", str(episodes),
                "--num_envs", str(args.num_envs),
                "--seed", str(seed),
                "--results_root", args.results_root, "--no_tensorboard",
            ] + extra
            if not args.random_reset:
                argv.append("--fixed_reset")
            try:
                model_dir = cli_run(argv)
            except Exception as e:  # noqa: BLE001 — keep the queue going
                print(f"{out_tag} seed {seed} FAILED: {e!r}", flush=True)
                failures.append(f"{out_tag}:{seed}")
                continue
            src = os.path.join(model_dir, f"{algo}_seed_{seed}.npy")
            curve = np.load(src)              # (episodes, n_agents)
            curves.append(curve.mean(axis=1))
            print(f"{out_tag} seed {seed}: final-50 "
                  f"{curve[-50:].mean():.2f} ({time.time() - t0:.0f}s)",
                  flush=True)
        if curves:
            T = min(len(c) for c in curves)
            # golden artifacts are (seeds, episodes) per-agent-mean returns
            np.save(dst, np.stack([c[:T] for c in curves]))
            arr = np.load(dst)
            print(f"{out_tag}: saved {dst} shape {arr.shape} per-seed "
                  f"final-50 {[round(float(c[-50:].mean()), 2) for c in arr]}",
                  flush=True)
    if failures:
        print("FAILURES:", failures, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
