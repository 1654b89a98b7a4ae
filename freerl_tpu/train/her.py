"""Hindsight Experience Replay driver.

Parity surface: DDPG_file/DDPG_simple_try_HER.py:380-442 — the reference
caches the current episode's transitions, and at episode end relabels each
transition with 4 goals sampled from its future window ("future" strategy,
generate_goals :267-279, window = [i, i+200)), recomputing the sparse
reward and storing the relabeled copies with done=False (:421-427).

TPU-native redesign: Pendulum episodes are fixed-horizon (200 steps), so
one episode is one ``lax.scan`` over the vectorized env batch producing
stacked trajectories (T, N, ...). The relabel pass is then pure array
ops — sample k future indices per (t, env) with one ``jax.random.randint``
-style draw, gather achieved goals, recompute rewards with the env's
``goal_reward`` hook, and scatter real + relabeled transitions into the
HBM replay ring in two batched adds. The per-transition python loops of
the reference (:421-427) disappear entirely; everything from rollout to
the gradient updates is one jitted program per episode.

Deviations (documented):
  - future goals are sampled with replacement (the reference uses
    random.sample without replacement over <=200 candidates; statistically
    negligible);
  - the recorded learning curve is the sparse HER return (success-shaped),
    not Pendulum's dense cost the reference logs alongside — the reference
    kept this file as a non-converged experiment with no committed curve.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.algos.base import ExploreCtx
from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import vec_reset


@dataclasses.dataclass(frozen=True)
class HERConfig:
    seed: int = 0
    num_envs: int = 16
    max_episodes: int = 500
    start_steps: int = 500           # total env steps before learning
    random_steps: int = 0
    k_future: int = 4                # relabeled goals per transition
    sample_range: int = 200          # future window length
    updates_per_episode: Optional[int] = None   # default: episode length


def relabel_future(env, obs, action, next_obs, key, k_future: int,
                   sample_range: int) -> Transition:
    """Vectorized 'future' relabeling of one trajectory.

    obs/next_obs: (T, obs_dim); action: (T, act_dim).
    Returns a Transition batch of T*k_future relabeled copies.
    """
    T = obs.shape[0]
    t_idx = jnp.arange(T)
    # window size per t: min(sample_range, T - t), inclusive of t itself
    win = jnp.minimum(sample_range, T - t_idx)              # (T,)
    u = jax.random.uniform(key, (T, k_future))
    j = t_idx[:, None] + jnp.floor(u * win[:, None]).astype(jnp.int32)
    new_goal = env.achieved(next_obs[j])                    # (T, k, gdim)
    obs_k = jnp.broadcast_to(
        obs[:, None, :], (T, k_future, obs.shape[-1])
    )
    next_k = jnp.broadcast_to(
        next_obs[:, None, :], (T, k_future, obs.shape[-1])
    )
    reward = env.goal_reward(new_goal, obs_k)               # (T, k)
    flat = lambda x: x.reshape((T * k_future,) + x.shape[2:])
    act_k = jnp.broadcast_to(
        action[:, None], (T, k_future) + action.shape[1:]
    )
    return Transition(
        obs=flat(env.with_goal(obs_k, new_goal)),
        action=flat(act_k),
        reward=flat(reward),
        next_obs=flat(env.with_goal(next_k, new_goal)),
        done=jnp.zeros((T * k_future,), jnp.bool_),
        episode_done=jnp.zeros((T * k_future,), jnp.bool_),
    )


def train_her(env, algo, cfg: HERConfig):
    """HER training: off-policy algo + goal env + future relabeling.

    Works with any env exposing ``achieved``/``with_goal``/``goal_reward``
    and a fixed truncation horizon (envs/goal.py GoalPendulum).
    """
    num_envs = cfg.num_envs
    T = env.max_steps
    updates = cfg.updates_per_episode or T

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_loop = jax.random.split(key)
    algo_state = algo.init(k_algo)
    di = env.dim_info
    example = Transition(
        obs=jnp.zeros((di.obs_dim,), jnp.float32),
        action=jnp.zeros((di.action_dim,), jnp.float32),
        reward=jnp.zeros((), jnp.float32),
        next_obs=jnp.zeros((di.obs_dim,), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        episode_done=jnp.zeros((), jnp.bool_),
    )
    buffer = algo.make_buffer(example)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=())
    def run_episode(algo_state, buffer, key, ep_counter):
        k_reset, k_roll, k_rel, k_learn = jax.random.split(key, 4)
        env_state, obs0 = vec_reset(env, k_reset, num_envs)

        def roll(carry, t):
            algo_state, env_state, obs, k = carry
            k, k_act, k_step = jax.random.split(k, 3)
            total_env_steps = (ep_counter * T + t) * num_envs
            ctx = ExploreCtx(
                total_env_steps=total_env_steps,
                episodes=ep_counter,
                done_prev=jnp.zeros((num_envs,), jnp.bool_),
                random_steps=cfg.random_steps,
            )
            algo_state, action = algo.explore(algo_state, obs, k_act, ctx)
            keys = jax.random.split(k_step, num_envs)
            new_state, next_obs, reward, term, trunc = jax.vmap(
                lambda s, a, kk: env.step(s, a, kk)
            )(env_state, action, keys)
            out = (obs, action, reward, next_obs, term)
            return (algo_state, new_state, next_obs, k), out

        (algo_state, _, _, _), (obs, action, reward, next_obs, term) = (
            jax.lax.scan(
                roll, (algo_state, env_state, obs0, k_roll), jnp.arange(T)
            )
        )
        # real transitions, HER reward, done=terminated (done_bool conv.)
        ep_done = jnp.zeros((T, num_envs), jnp.bool_).at[-1].set(True)
        to_flat = lambda x: x.reshape((T * num_envs,) + x.shape[2:])
        real = Transition(
            obs=to_flat(obs), action=to_flat(action), reward=to_flat(reward),
            next_obs=to_flat(next_obs), done=to_flat(term),
            episode_done=to_flat(ep_done),
        )
        buffer = buffer.add(real)
        # relabeled copies, one vectorized pass over the env batch
        rel_keys = jax.random.split(k_rel, num_envs)
        relab = jax.vmap(
            lambda o, a, n, k: relabel_future(
                env, o, a, n, k, cfg.k_future, cfg.sample_range
            ),
            in_axes=(1, 1, 1, 0),
        )(obs, action, next_obs, rel_keys)
        buffer = buffer.add(
            jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), relab)
        )

        # learner burst (1 update per single-env step, reference cadence)
        env_steps_now = (ep_counter + 1) * T * num_envs

        def burst(args):
            algo_state, buf = args

            def one(i, acc):
                s, b = acc
                s, b, _ = algo.learn_step(
                    s, b, jax.random.fold_in(k_learn, i), num_envs
                )
                return (s, b)

            return jax.lax.fori_loop(0, updates, one, (algo_state, buf))

        algo_state, buffer = jax.lax.cond(
            env_steps_now > cfg.start_steps, burst,
            lambda a: a, (algo_state, buffer),
        )
        ep_returns = reward.sum(axis=0)     # (num_envs,) sparse returns
        return algo_state, buffer, ep_returns

    # donation needs unique buffers (fresh state aliases target params)
    algo_state, buffer = jax.tree.map(jnp.copy, (algo_state, buffer))

    t0 = time.time()
    all_returns = []
    ep = 0
    while ep * num_envs < cfg.max_episodes:
        k_loop, k_ep = jax.random.split(k_loop)
        algo_state, buffer, rets = run_episode(
            algo_state, buffer, k_ep, jnp.int32(ep)
        )
        all_returns.append(np.asarray(rets))
        ep += 1

    returns = np.concatenate(all_returns)[: cfg.max_episodes]
    info = {
        "elapsed_s": time.time() - t0,
        "env_steps": ep * T * num_envs,
        "episodes": int(len(returns)),
    }
    return algo_state, returns, info
