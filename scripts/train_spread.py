"""Long-protocol MARL learning-curve runs on MPE simple_spread_v3.

Reproduces the reference's committed curve protocols
(MADDPG_file/MADDPG_simple.py:340-375 train loop; MAAC_file/README.md
"2025.3.22": the MASAC curve is a 40000-episode lr=1e-4 run) on the
vectorized TPU driver, and saves the same artifacts: per-episode
per-agent return `.npy` + smoothed `.png`.

Usage:
    python scripts/train_spread.py --algo MASAC --episodes 40000 \
        --seed 0 --num_envs 16 --out results/learning_curves/simple_spread_v3
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="MASAC",
                   choices=["MASAC", "MADDPG", "MATD3"])
    p.add_argument("--env", default="simple_spread_v3")
    p.add_argument("--episodes", type=int, default=40_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--chunk_size", type=int, default=128)
    p.add_argument("--updates_per_burst", type=int, default=1)
    p.add_argument("--out", default="results/learning_curves")
    p.add_argument("--tag", default=None,
                   help="artifact name prefix; defaults to --algo")
    args = p.parse_args()

    import jax
    import numpy as np

    from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig, MATD3
    from freerl_tpu.algos.masac import MASAC, MASACConfig
    from freerl_tpu.envs import make
    from freerl_tpu.train.marl import MARLConfig, train_marl

    print(f"backend={jax.default_backend()} devices={jax.device_count()}",
          flush=True)

    env = make(args.env)
    if args.algo == "MASAC":
        algo = MASAC(env, MASACConfig(num_envs=args.num_envs))
    elif args.algo == "MADDPG":
        algo = MADDPG(env, MADDPGConfig(num_envs=args.num_envs))
    else:
        algo = MATD3(env, MADDPGConfig(num_envs=args.num_envs))

    cfg = MARLConfig(
        seed=args.seed,
        num_envs=args.num_envs,
        max_episodes=args.episodes,
        chunk_size=args.chunk_size,
        updates_per_burst=args.updates_per_burst,
        log_every_chunks=8,
    )

    t0 = time.time()

    def on_chunk(chunk_i, n_eps, n_steps, carry):
        rets = np.asarray(carry.episode_returns)[:n_eps]
        last = rets[-200:].mean(axis=0) if len(rets) else np.zeros(1)
        print(f"chunk {chunk_i} eps={n_eps} steps={n_steps} "
              f"last200={last.mean():.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    _, returns, info = train_marl(env, algo, cfg, on_chunk=on_chunk)
    print("info:", info, flush=True)

    out_dir = os.path.join(args.out, args.env)
    os.makedirs(out_dir, exist_ok=True)
    tag = args.tag or args.algo
    npy = os.path.join(out_dir, f"{tag}_seed_{args.seed}.npy")
    np.save(npy, returns)
    print("saved", npy, "shape", returns.shape, flush=True)
    print(f"final-50 per-agent mean: {returns[-50:].mean():.2f}", flush=True)

    from freerl_tpu.train.plotting import plot_learning_curve
    # per-agent mean return, one curve
    plot_learning_curve([returns.mean(axis=1)], label=tag,
                        out_dir=out_dir, env_name=args.env)


if __name__ == "__main__":
    main()
