"""GAIL end-to-end imitation artifact (reference GAIL_file/GAIL.py:122-187).

Pipeline, matching the reference's protocol and artifact set:
  1. train a PPO expert on Pendulum-v1 (the reference's GAIL env; its
     committed expert eval averages -166..-183 over 10 episodes —
     GAIL_file/logs/Pendulum-v1/PPO/*/eval_rewards.npz);
  2. roll the deterministic expert into an (s, a) .npz expert set
     (eval_data.npz analogue);
  3. train GAIL from scratch on discriminator rewards only;
  4. evaluate both on 10 held-out seeds and write the GAIL-family
     artifact set: timestamped run dir + config.json (PPO2.py:310-343),
     eval_rewards.npz, and the true-reward learning curve.

Reference imitation bar: its best committed GAIL Pendulum run averages
-184.1 (GAIL/20260328-223446), its other run -642.8 — high variance; we
gate on matching the BEST one within slack in test/PARITY terms.

Usage: python scripts/gail_e2e.py [--cpu] [--expert_episodes N]
       [--gail_iters N] [--out results/gail]
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
    ap.add_argument("--expert_episodes", type=int, default=3000)
    ap.add_argument("--gail_iters", type=int, default=800)
    ap.add_argument("--n_expert_transitions", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="results/gail")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from freerl_tpu.algos.gail import (
        GAIL,
        GAILConfig,
        collect_expert_data,
        init_logging,
        train_gail,
    )
    from freerl_tpu.algos.ppo import PPO, PPOConfig
    from freerl_tpu.envs import make
    from freerl_tpu.train.evaluate import evaluate
    from freerl_tpu.train.onpolicy import OnPolicyConfig, train_onpolicy

    env = make("Pendulum-v1")
    run_dir = init_logging(
        os.path.join(args.out, "Pendulum-v1", "GAIL"), vars(args)
    )
    print("run_dir:", run_dir, flush=True)

    # ---- 1. expert ----------------------------------------------------
    # horizon 400 (2 Pendulum episodes per env per iteration): at the
    # old 2048x8 a 2000-episode run got only ~24 PPO iterations and the
    # expert plateaued at -251. This cadence + lr 3e-4 measures 10-seed
    # eval -156 at 3000 episodes (-146 at 5000), beating the reference
    # expert's -166..-183 band (GAIL_file logs eval_rewards.npz).
    expert_cfg = PPOConfig(
        horizon=400, minibatch_size=64, num_envs=8, adv_norm=True,
        actor_lr=3e-4, critic_lr=3e-4,
        obs_norm=True, reward_scaling=True, orthogonal_init=True,
        tanh=False, lr_decay=True,
        lr_decay_episodes=args.expert_episodes,
    )
    expert = PPO(env.dim_info, expert_cfg)
    ocfg = OnPolicyConfig(seed=args.seed, num_envs=8,
                          max_episodes=args.expert_episodes, horizon=400)
    expert_state, expert_curve, _ = train_onpolicy(env, expert, ocfg)
    np.save(os.path.join(run_dir, "expert_curve.npy"), expert_curve)
    print("expert final-50:", expert_curve[-50:].mean(), flush=True)

    expert_act = lambda obs: expert.evaluate_action(expert_state, obs)
    expert_eval = evaluate(env, expert_act, n_episodes=10, seed0=1000)
    print("expert 10-seed eval:", expert_eval.mean(), flush=True)

    # ---- 2. expert data -----------------------------------------------
    data = collect_expert_data(
        env, expert_act, args.n_expert_transitions, seed=args.seed,
        out_path=os.path.join(run_dir, "expert_data.npz"),
    )

    # ---- 3. GAIL from scratch -----------------------------------------
    # learner hyperparams from the reference's GOOD run config
    # (logs/Pendulum-v1/GAIL/20260328-223446/config.json): p_lr 1e-4,
    # d_lr 4e-4 BCE, one D step per iteration — the slow policy keeps
    # the discriminator reward signal stable. (Our PPO mirrors the
    # reference PPO_file's MERGED actor+critic optimizer, so the single
    # lr follows p_lr.)
    # d_lr 1e-4 (not the reference's 4e-4): our vectorized collection
    # feeds the discriminator ~8x more on-policy data per iteration, so
    # the reference lr overpowers the policy and imitation collapses
    # late (measured: 4e-4 -> eval -324; longer runs -1587). At 1e-4 the
    # 10-seed eval lands at -185.1 vs the reference's best committed run
    # -184.1 (its other run: -642.8).
    gail = GAIL(env.dim_info,
                PPOConfig(horizon=2048, minibatch_size=64, num_envs=8,
                          actor_lr=1e-4,
                          adv_norm=True, orthogonal_init=True, tanh=False),
                GAILConfig(d_steps_per_iter=1, d_lr=1e-4))
    state, curve, history = train_gail(
        env, gail, data, num_iterations=args.gail_iters, num_envs=8,
        seed=args.seed + 1,
    )
    np.save(os.path.join(run_dir, "gail_true_reward_curve.npy"), curve)

    # ---- 4. held-out eval ----------------------------------------------
    gail_act = lambda obs: gail.ppo.evaluate_action(state.ppo_state, obs)
    gail_eval = evaluate(env, gail_act, n_episodes=10, seed0=1000)
    np.savez(
        os.path.join(run_dir, "eval_rewards.npz"),
        episode_rewards=gail_eval,
        episode_avg_rewards=np.float32(gail_eval.mean()),
        expert_rewards=expert_eval,
        expert_avg_rewards=np.float32(expert_eval.mean()),
    )
    summary = {
        "expert_eval_avg": float(expert_eval.mean()),
        "gail_eval_avg": float(gail_eval.mean()),
        "reference_best_gail_avg": -184.1,
        "reference_other_gail_avg": -642.8,
    }
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
