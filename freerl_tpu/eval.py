"""Offline evaluation CLI — the reference's evaluate.py / MA_evaluate.py.

Loads a run directory produced by ``python -m freerl_tpu.cli`` (full-state
checkpoint), replays ``--n_episodes`` held-out seeds through the
deterministic policy, and writes the reference's artifact set
(DQN_file/evaluate.py:66-133, MADDPG_file/MA_evaluate.py):

  - ``evaluate.png``  — exp-smoothed returns vs the env reward_threshold
  - ``evaluate.gif``  — one replayed episode, drawn from the state trace
  - console mean/std over the held-out seeds (per-agent for MARL)

Training runs dump ``config.json`` (freerl_tpu/cli.py), so the only
required flag is the run directory — env, algorithm and every
construction-affecting trick are reconstructed from it (the reference
re-types them; its GAIL family pioneered the config dump,
GAIL_file/PPO2.py:338). Explicit flags still override.

Example:
  python -m freerl_tpu.cli  --algo DQN --env_name CartPole-v1 --seed 0
  python -m freerl_tpu.eval --model_dir results/CartPole-v1/DQN_1
"""
from __future__ import annotations

import argparse
import json
import os
from types import SimpleNamespace

import numpy as np

# fallbacks for pre-config.json run dirs (mirrors the training CLI)
_BUILD_DEFAULTS = dict(
    algo="DQN", env_name="CartPole-v1", trick=[], dis_to_con=False,
    discrete_actions=False, num_envs=8, horizon=2048,
    buffer_size=200_000, batch_size=64, max_episodes=500,
    lr=1e-3, gauss_sigma=0.1, noise_init_scale=None,
)


def _build_args(args) -> SimpleNamespace:
    """config.json < explicit CLI flags, over the CLI defaults."""
    merged = dict(_BUILD_DEFAULTS)
    cfg_path = os.path.join(args.model_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved = json.load(f)
        merged.update({k: v for k, v in saved.items() if k in merged})
    for k in _BUILD_DEFAULTS:
        v = getattr(args, k, None)
        if v is not None:
            merged[k] = v
    return SimpleNamespace(**merged)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True,
                   help="run dir containing 'checkpoint' (+ config.json)")
    p.add_argument("--n_episodes", type=int, default=100)
    p.add_argument("--seed0", type=int, default=0,
                   help="first held-out seed (training used --seed)")
    p.add_argument("--gif", action="store_true", default=True)
    p.add_argument("--no_gif", dest="gif", action="store_false")
    p.add_argument("--gif_seed", type=int, default=None,
                   help="episode seed for the gif (default: random)")
    # construction flags: normally read from the run's config.json;
    # passing any of them explicitly overrides the saved value
    p.add_argument("--algo", default=None)
    p.add_argument("--env_name", default=None)
    p.add_argument("--trick", nargs="*", default=None)
    p.add_argument("--dis_to_con", action="store_true", default=None)
    p.add_argument("--discrete_actions", action="store_true", default=None)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--buffer_size", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_episodes", type=int, default=None,
                   help="must match training (ENVELOPE schedules on it)")
    p.add_argument("--preference", type=float, nargs="*", default=None,
                   help="ENVELOPE only: evaluation preference weights "
                        "(default: uniform over reward_dim)")
    cli = p.parse_args(argv)

    import jax

    from freerl_tpu.cli import MARL_OFF, MARL_ON, build
    from freerl_tpu.train.evaluate import evaluate, plot_evaluate
    from freerl_tpu.train.runio import load_checkpoint

    args = _build_args(cli)
    args.model_dir = cli.model_dir
    args.n_episodes = cli.n_episodes
    args.seed0 = cli.seed0
    args.gif, args.gif_seed = cli.gif, cli.gif_seed
    args.preference = cli.preference
    env, algo = build(args)
    example = algo.init(jax.random.PRNGKey(0))
    state = load_checkpoint(os.path.join(args.model_dir, "checkpoint"),
                            example)

    recurrent = hasattr(algo, "init_policy_carry")
    carry_init = gif_carry = None
    if recurrent:
        # GRU policies thread the hidden carry through the scan
        import jax.numpy as jnp

        carry_init = algo.init_policy_carry(args.n_episodes)
        gif_carry = algo.init_policy_carry(1)
        dp = jnp.zeros((args.n_episodes,), jnp.bool_)
        act_fn = lambda obs, pc: algo.evaluate_action(state, obs, pc, dp)

        def gif_act(obs, pc):
            a, pc = algo.evaluate_action(
                state, obs[None], pc, jnp.zeros((1,), jnp.bool_)
            )
            return a[0], pc
    elif args.algo == "ENVELOPE":
        # ENVELOPE policies are preference-conditioned
        # (ENVELOPE_MORL_file/ENVELOPE_DQN.py eval_model:367): score at a
        # fixed preference, scalarizing vector rewards by w·r.
        import jax.numpy as jnp

        rdim = getattr(env, "reward_dim", 2)
        w = (np.asarray(args.preference, dtype=np.float32)
             if args.preference else np.full((rdim,), 1.0 / rdim, np.float32))
        w = w / w.sum()
        act_fn = lambda obs: algo.evaluate_action(state, obs, jnp.asarray(w))
    else:
        act_fn = lambda obs: algo.evaluate_action(state, obs)

    multi_agent = args.algo in MARL_OFF | MARL_ON or args.algo == "MAT"
    returns = evaluate(
        env, act_fn,
        n_episodes=args.n_episodes, seed0=args.seed0,
        multi_agent=multi_agent, carry_init=carry_init,
    )
    if multi_agent:
        mean, std = returns.mean(axis=0), returns.std(axis=0)
        print(f"eval over {args.n_episodes} held-out seeds, per-agent:")
        for i, (m, s) in enumerate(zip(mean, std)):
            print(f"  agent_{i}: {m:.2f} +- {s:.2f}")
        curve = returns.mean(axis=-1)
    else:
        print(f"eval over {args.n_episodes} held-out seeds: "
              f"{returns.mean():.2f} +- {returns.std():.2f} "
              f"(threshold: {env.reward_threshold})")
        curve = returns

    png = plot_evaluate(
        curve, goal=env.reward_threshold,
        out_path=os.path.join(args.model_dir, "evaluate.png"),
    )
    print(f"plot: {png}")

    if args.gif:
        from freerl_tpu.train.render import render_episode_gif

        gif_seed = (
            args.gif_seed if args.gif_seed is not None
            else int(np.random.default_rng().integers(0, 10_000))
        )
        gif = render_episode_gif(
            env, gif_act if recurrent else act_fn,
            out_path=os.path.join(args.model_dir, "evaluate.gif"),
            seed=gif_seed, carry_init=gif_carry,
        )
        print(f"gif: {gif} (episode seed {gif_seed})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
