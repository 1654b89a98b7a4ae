"""Sharded-driver scaling sweep + a learning curve THROUGH the DP path.

Runs DQN/CartPole through ``train_offpolicy(..., mesh=)`` at
n_devices in {1, 2, 4, 8} and records aggregate env-steps/s, then trains
one full curve on the 8-device mesh and saves it as a committed artifact
(results/learning_curves/CartPole-v1/DQN_dp8_1_seed.npy).

NOTE on honesty: under `--cpu` the mesh is XLA's host-platform device
emulation (8 virtual devices on this box's 2 physical cores), so the
sweep validates that the sharded program runs and stays correct at every
mesh size — it is NOT an ICI-scaling perf claim. On a real multi-chip
slice the same code path is the one that scales (per-device envs/replay,
gradient-only collectives).

Usage: python scripts/dp_scaling.py --cpu --out results/dp_scaling.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--envs_per_device", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8192,
                    help="per-device vector steps for the throughput sweep")
    ap.add_argument("--out", default="results/dp_scaling.json")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from freerl_tpu.algos.dqn import DQN, DQNConfig
    from freerl_tpu.distributed.dp import make_mesh
    from freerl_tpu.envs import make
    from freerl_tpu.train.loop import OffPolicyConfig, train_offpolicy

    env = make("CartPole-v1")
    rows = []
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        algo = DQN(env.dim_info, DQNConfig(
            buffer_size=20_000, batch_size=64, axis_name="dp"))
        cfg = OffPolicyConfig(
            num_envs=args.envs_per_device * n_dev,
            max_episodes=10**9,
            max_env_steps=args.envs_per_device * n_dev * args.steps,
            start_steps=500, chunk_size=256,
        )
        _, _, info = train_offpolicy(env, algo, cfg,
                                     mesh=make_mesh(n_dev))
        rows.append(dict(
            n_devices=n_dev, num_envs=cfg.num_envs,
            env_steps=info["env_steps"],
            env_steps_per_s=round(info["env_steps_per_s"], 1),
            updates=info["updates"],
        ))
        print(rows[-1], flush=True)

    # on-policy twin: PPO through train_onpolicy(mesh=) at every size
    from freerl_tpu.algos.ppo import PPO, PPOConfig
    from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy

    on_rows = []
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        nenv = args.envs_per_device * n_dev
        ppo = PPO(env.dim_info, PPOConfig(
            horizon=128 * nenv, minibatch_size=64, num_envs=nenv,
            adv_norm=True, axis_name="dp"))
        ocfg = OnPolicyConfig(
            num_envs=nenv, max_episodes=10**9,
            max_env_steps=nenv * args.steps // 2, horizon=128 * nenv,
        )
        _, _, info = train_onpolicy(env, ppo, ocfg, mesh=make_mesh(n_dev))
        on_rows.append(dict(
            n_devices=n_dev, num_envs=nenv,
            env_steps=info["env_steps"],
            env_steps_per_s=round(info["env_steps_per_s"], 1),
            iterations=info["iterations"],
        ))
        print(on_rows[-1], flush=True)

    # MARL twin: MADDPG through train_marl(mesh=) at every size
    from freerl_tpu.algos.maddpg import MADDPG, MADDPGConfig
    from freerl_tpu.train.marl import MARLConfig, train_marl

    menv = make("simple_spread_v3")
    marl_rows = []
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        nenv = max(args.envs_per_device // 4, 2) * n_dev
        maddpg = MADDPG(menv, MADDPGConfig(
            buffer_size=20_000, batch_size=64, axis_name="dp"))
        mcfg = MARLConfig(
            num_envs=nenv, max_episodes=10**9,
            max_env_steps=nenv * args.steps // 8,
            start_steps=500, chunk_size=64,
        )
        _, _, info = train_marl(menv, maddpg, mcfg, mesh=make_mesh(n_dev))
        marl_rows.append(dict(
            n_devices=n_dev, num_envs=nenv,
            env_steps=info["env_steps"],
            env_steps_per_s=round(info["env_steps_per_s"], 1),
            updates=info["updates"],
        ))
        print(marl_rows[-1], flush=True)

    # one full learning curve through the 8-device sharded path
    algo = DQN(env.dim_info, DQNConfig(
        buffer_size=20_000, batch_size=64, axis_name="dp"))
    cfg = OffPolicyConfig(num_envs=16, max_episodes=250, start_steps=500,
                          updates_per_burst=8, chunk_size=128)
    _, curve, info = train_offpolicy(env, algo, cfg, mesh=make_mesh(
        min(8, jax.device_count())))
    out_dir = os.path.join("results", "learning_curves", "CartPole-v1")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "DQN_dp8_1_seed.npy"), curve)
    print("dp8 curve final-30:", float(curve[-30:].mean()), flush=True)

    # and a sharded MADDPG spread curve on the 8-device mesh
    maddpg = MADDPG(menv, MADDPGConfig(
        buffer_size=20_000, batch_size=64, axis_name="dp"))
    mcfg = MARLConfig(num_envs=16, max_episodes=600, start_steps=500,
                      updates_per_burst=2, chunk_size=64)
    _, mcurve, minfo = train_marl(menv, maddpg, mcfg, mesh=make_mesh(
        min(8, jax.device_count())))
    out_dir = os.path.join("results", "learning_curves", "simple_spread_v3")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "MADDPG_dp8_1_seed.npy"),
            mcurve.mean(axis=-1)[None])
    print("maddpg dp8 curve final-50:",
          float(mcurve.mean(axis=-1)[-50:].mean()), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "backend": jax.default_backend(),
            "virtual_devices": bool(args.cpu),
            "sweep": rows,
            "onpolicy_sweep": on_rows,
            "marl_sweep": marl_rows,
            "dp8_curve_final30": float(curve[-30:].mean()),
            "maddpg_dp8_curve_final50": float(
                mcurve.mean(axis=-1)[-50:].mean()
            ),
        }, f, indent=2)
    print("wrote", args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
