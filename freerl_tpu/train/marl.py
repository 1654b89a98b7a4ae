"""Multi-agent off-policy training driver (MADDPG/MATD3/MASAC family).

Mirrors the single-agent loop but carries the agent axis: observations are
(num_envs, n_agents, obs_pad), rewards (num_envs, n_agents); MPE episodes
end for all agents at once (25-step truncation). Stored actions live in
[-1, 1] (the reference's tanh-actor convention) and are remapped to the MPE
action box [0, 1] at the env boundary (MADDPG_simple.py:349-352).
"""
from __future__ import annotations

import dataclasses
from functools import partial
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from freerl_tpu.algos.base import ExploreCtx
from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import Env, vec_reset, vec_step_auto_reset


@dataclasses.dataclass(frozen=True)
class MARLConfig:
    seed: int = 0
    num_envs: int = 16
    max_episodes: int = 600
    max_env_steps: int = 10_000_000
    start_steps: int = 500
    random_steps: int = 0
    updates_per_burst: int = 1
    chunk_size: int = 128
    log_every_chunks: int = 8
    # periodic full-state checkpointing (reference save_freq cadence in
    # dispatch units; 0 = off)
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    # lazy device->host episode-count sync cadence (see
    # OffPolicyConfig.host_sync_every — a tunnel readback is ~60 ms)
    host_sync_every: int = 4


@struct.dataclass
class MARLCarry:
    algo_state: object
    buffer: object
    env_state: object
    obs: jnp.ndarray             # (N, A, O)
    key: jax.Array
    ep_return: jnp.ndarray       # (N, A)
    done_prev: jnp.ndarray       # (N,)
    ep_counter: jnp.ndarray
    episode_returns: jnp.ndarray  # (cap, A)
    total_steps: jnp.ndarray
    update_count: jnp.ndarray


def _example_transition(env: Env) -> Transition:
    A = env.n_agents
    action = (
        jnp.zeros((A, env.dim_info.action_dim), jnp.float32)
        if env.dim_info.is_continue
        else jnp.zeros((A,), jnp.int32)
    )
    return Transition(
        obs=jnp.zeros((A, env.dim_info.obs_dim), jnp.float32),
        action=action,
        reward=jnp.zeros((A,), jnp.float32),
        next_obs=jnp.zeros((A, env.dim_info.obs_dim), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        episode_done=jnp.zeros((), jnp.bool_),
    )


def train_marl(env: Env, algo, cfg: MARLConfig,
               on_chunk: Optional[Callable] = None, mesh=None):
    """Returns (algo_state, episode_returns (E, n_agents), info).

    With ``mesh`` (a jax.sharding.Mesh), the loop runs data-parallel via
    distributed/dp.py's :func:`train_marl_sharded`: per-device env
    slices + replay shards, per-agent learners pmean-synced (the algo's
    config must carry ``axis_name`` matching the mesh axis).
    """
    if mesh is not None:
        from freerl_tpu.distributed.dp import train_marl_sharded

        return train_marl_sharded(env, algo, cfg, mesh,
                                  axis=mesh.axis_names[0],
                                  on_chunk=on_chunk)
    num_envs = cfg.num_envs
    A = env.n_agents
    # an episode costs >=1 env step, so the record never needs more
    # slots than the step budget (guards huge max_episodes sentinels)
    # include the final chunk's overshoot past max_env_steps so episodes
    # finishing inside it are not dropped from the record
    record_cap = min(
        cfg.max_episodes,
        cfg.max_env_steps + cfg.chunk_size * num_envs,
    ) + num_envs + 1

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_env, k_loop = jax.random.split(key, 3)
    algo_state = algo.init(k_algo)
    buffer = algo.make_buffer(_example_transition(env), num_envs=num_envs)
    env_state, obs = vec_reset(env, k_env, num_envs)

    carry = MARLCarry(
        algo_state=algo_state,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        key=k_loop,
        ep_return=jnp.zeros((num_envs, A), jnp.float32),
        done_prev=jnp.zeros((num_envs,), jnp.bool_),
        ep_counter=jnp.int32(0),
        episode_returns=jnp.zeros((record_cap, A), jnp.float32),
        total_steps=jnp.int32(0),
        update_count=jnp.int32(0),
    )

    def step_fn(carry: MARLCarry, _):
        k, k_act, k_step, k_learn = jax.random.split(carry.key, 4)
        total_env_steps = carry.total_steps * num_envs
        ctx = ExploreCtx(
            total_env_steps=total_env_steps,
            episodes=carry.ep_counter,
            done_prev=carry.done_prev,
            random_steps=cfg.random_steps,
        )
        algo_state, action = algo.explore(
            carry.algo_state, carry.obs, k_act, ctx
        )  # continuous: (N, A, act) in [-1, 1]; discrete: (N, A) ints
        env_action = (
            (action + 1.0) / 2.0 if env.dim_info.is_continue else action
        )
        out = vec_step_auto_reset(env, carry.env_state, env_action, k_step,
                                  num_envs)
        trans = Transition(
            obs=carry.obs,
            action=action,
            reward=out.reward,
            next_obs=out.next_obs,
            done=out.terminated,
            episode_done=out.episode_done,
        )
        buffer = carry.buffer.add(trans)

        ret = carry.ep_return + out.reward
        dones = out.episode_done
        offs = jnp.cumsum(dones.astype(jnp.int32)) - 1
        slot = jnp.where(dones, carry.ep_counter + offs, record_cap)
        episode_returns = carry.episode_returns.at[slot].set(
            ret, mode="drop"
        )
        ep_counter = carry.ep_counter + jnp.sum(dones.astype(jnp.int32))
        ep_return = jnp.where(dones[:, None], 0.0, ret)

        total_steps = carry.total_steps + 1
        do_learn = (total_steps * num_envs) > cfg.start_steps

        def burst(args):
            algo_state, buf, k = args

            def one(i, acc):
                s, b = acc
                kk = jax.random.fold_in(k, i)
                s, b, _ = algo.learn_step(s, b, kk, num_envs)
                return (s, b)

            algo_state, buf = jax.lax.fori_loop(
                0, cfg.updates_per_burst, one, (algo_state, buf)
            )
            return algo_state, buf

        algo_state, buffer = jax.lax.cond(
            do_learn, burst, lambda a: (a[0], a[1]),
            (algo_state, buffer, k_learn),
        )
        update_count = carry.update_count + jnp.where(
            do_learn, cfg.updates_per_burst, 0
        )

        return MARLCarry(
            algo_state=algo_state,
            buffer=buffer,
            env_state=out.state,
            obs=out.carry_obs,
            key=k,
            ep_return=ep_return,
            done_prev=dones,
            ep_counter=ep_counter,
            episode_returns=episode_returns,
            total_steps=total_steps,
            update_count=update_count,
        ), None

    # donate the carry so HBM buffers update in place across
    # chunk dispatches (no copy of the replay ring per chunk)
    @partial(jax.jit, donate_argnums=0)
    def run_chunk(carry):
        carry, _ = jax.lax.scan(step_fn, carry, None, length=cfg.chunk_size)
        return carry

    # donation requires unique buffers: the fresh algo state aliases
    # params/target_params (same array), so copy the carry once up front
    carry = jax.tree.map(jnp.copy, carry)

    t0 = time.time()
    chunk_i = 0
    n_eps = 0
    while True:
        carry = run_chunk(carry)
        chunk_i += 1
        n_steps = chunk_i * cfg.chunk_size * num_envs
        if (chunk_i % cfg.host_sync_every == 0
                or n_steps >= cfg.max_env_steps):
            n_eps = int(carry.ep_counter)
        if on_chunk is not None and chunk_i % cfg.log_every_chunks == 0:
            on_chunk(chunk_i, n_eps, n_steps, carry)
        if (cfg.checkpoint_dir and cfg.checkpoint_every
                and chunk_i % cfg.checkpoint_every == 0):
            from freerl_tpu.train.runio import save_checkpoint

            save_checkpoint(f"{cfg.checkpoint_dir}/ckpt", carry.algo_state)
        if n_eps >= cfg.max_episodes or n_steps >= cfg.max_env_steps:
            break

    elapsed = time.time() - t0
    n_eps = int(carry.ep_counter)
    returns = np.asarray(carry.episode_returns)[
        : min(n_eps, cfg.max_episodes)
    ]
    info = {
        "elapsed_s": elapsed,
        "env_steps": n_steps,
        "updates": int(carry.update_count),
        "env_steps_per_s": n_steps / max(elapsed, 1e-9),
        "episodes": n_eps,
    }
    return carry.algo_state, returns, info
