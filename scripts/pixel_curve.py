"""Pixel-CartPole DQN learning-curve artifact (ROADMAP r3 candidate).

The reference's Atari path is stubbed buffers only
(PPO_advance/Buffer.py:374-433 — never trained); this runs the full
pixel pipeline for real: procedural 48x48 2-frame-stack renderer inside
the jitted env, ConvTrunk DQN, episode accounting, and commits the curve
(results/learning_curves/PixelCartPole-v1/DQN_1_seed.npy).

Usage: python scripts/pixel_curve.py [--episodes 400] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from freerl_tpu.algos import DQN, DQNConfig
    from freerl_tpu.envs import make
    from freerl_tpu.train import OffPolicyConfig, train_offpolicy

    env = make("PixelCartPole-v1")
    algo = DQN(env.dim_info, DQNConfig(
        buffer_size=100_000, batch_size=64,
        obs_shape=env.obs_shape, conv_arch="small", cnn_features=128,
    ))
    cfg = OffPolicyConfig(
        seed=args.seed, num_envs=8, max_episodes=args.episodes,
        start_steps=1000, updates_per_burst=4, chunk_size=128,
    )
    _, returns, info = train_offpolicy(env, algo, cfg)
    out = os.path.join("results", "learning_curves", "PixelCartPole-v1")
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, f"DQN_seed_{args.seed}.npy"), returns)
    print("pixel DQN final-30:", float(returns[-30:].mean()),
          "start-10:", float(returns[:10].mean()), "info:", info,
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
