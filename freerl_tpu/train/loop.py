"""Vectorized actor-learner training loops, fully on-device.

Replaces the reference's python while-loop over a single env
(DQN_file/DQN.py:294-343) with a ``lax.scan`` over vectorized env steps:
action selection, env dynamics, buffer writes, learner updates and episode
accounting are one compiled XLA program per chunk. The host only dispatches
chunks and reads back aggregate metrics, so there is no per-step
host<->device traffic.

Reference conventions preserved:
  - ``start_steps`` warmup before learning, ``random_steps`` uniform-action
    warmup, ``learn_steps_interval`` cadence — all counted in TOTAL env steps
    (num_envs per vector step) so the update/env-step ratio stays comparable
    when scaling the env batch (SURVEY §7 'hard parts' #3);
  - ``done_bool`` = terminated only goes into the buffer; episode accounting
    uses terminated|truncated (DQN_file/DQN.py:317-318);
  - a chronological per-episode return curve is recorded exactly like the
    reference's ``train_return`` list -> .npy dump (DQN_file/DQN.py:331,349).
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
from freerl_tpu.envs.base import (Env, record_scalarize,
                                  vec_reset, vec_step_auto_reset)


@dataclasses.dataclass(frozen=True)
class OffPolicyConfig:
    seed: int = 0
    num_envs: int = 16
    max_episodes: int = 500
    max_env_steps: int = 10_000_000      # hard budget
    start_steps: int = 500               # env steps before learning
    random_steps: int = 0                # uniform-random action warmup
    learn_interval_steps: int = 1        # env steps between update bursts
    updates_per_burst: int = 1           # gradient updates per burst
    chunk_size: int = 256                # scan length per jit dispatch
    log_every_chunks: int = 8
    # periodic full-state checkpointing (the reference's save_freq-episodes
    # cadence, DQN_file/DQN.py:328-329, in chunk units; 0 = off)
    checkpoint_dir: Optional[str] = None
    checkpoint_every_chunks: int = 0
    # pull the episode counter from the device every N chunks (step
    # counts are computed host-side). Over a remote-tunnel TPU a host
    # readback costs ~60 ms (PROFILE.md) — syncing every chunk would
    # gate the whole loop on it. Termination on max_episodes can
    # overshoot by up to N-1 chunks; the record capacity and final
    # slicing already tolerate that.
    host_sync_every: int = 4


@struct.dataclass
class LoopCarry:
    algo_state: object
    buffer: object
    env_state: object
    obs: jnp.ndarray
    key: jax.Array
    ep_return: jnp.ndarray        # (num_envs,)
    done_prev: jnp.ndarray        # (num_envs,) episode ended last step
    ep_counter: jnp.ndarray       # scalar int32, completed episodes
    episode_returns: jnp.ndarray  # (capacity,) chronological return record
    total_steps: jnp.ndarray      # scalar int32, vector steps so far
    update_count: jnp.ndarray     # scalar int32


def _example_transition(env: Env, algo=None) -> Transition:
    di = env.dim_info
    if di.is_continue:
        action = jnp.zeros((di.action_dim,), jnp.float32)
    elif algo is not None and hasattr(algo, "stored_action_example"):
        # algos that store something richer than the env index (e.g.
        # discrete DDPG stores the behavior probs / gumbel one-hot)
        action = algo.stored_action_example()
    else:
        action = jnp.zeros((), jnp.int32)
    # multi-objective envs carry vector rewards (reward_dim > 1)
    rdim = getattr(env, "reward_dim", 1)
    reward = jnp.zeros((rdim,) if rdim > 1 else (), jnp.float32)
    return Transition(
        obs=jnp.zeros((di.obs_dim,), jnp.float32),
        action=action,
        reward=reward,
        next_obs=jnp.zeros((di.obs_dim,), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        episode_done=jnp.zeros((), jnp.bool_),
    )


def train_offpolicy(env: Env, algo, cfg: OffPolicyConfig,
                    on_chunk: Optional[Callable] = None, mesh=None):
    """Generic off-policy driver for DQN/DDPG/TD3/SAC-family algos.

    ``algo`` must expose: ``init(key)``, ``make_buffer(example)``,
    ``explore(state, obs, key, total_env_steps, random_steps)`` and
    ``learn_step(state, buffer, key, num_envs)``.

    With ``mesh`` (a jax.sharding.Mesh), the loop runs data-parallel over
    its devices via distributed/dp.py: per-device env slices + replay
    shards, pmean-synchronized learner (the algo's config must carry
    ``axis_name`` matching the mesh axis).

    Returns ``(algo_state, episode_returns ndarray, info dict)``.
    """
    if mesh is not None:
        from freerl_tpu.distributed.dp import train_offpolicy_sharded

        return train_offpolicy_sharded(env, algo, cfg, mesh,
                                       axis=mesh.axis_names[0],
                                       on_chunk=on_chunk)
    num_envs = cfg.num_envs
    # an episode costs >=1 env step, so the record never needs more
    # slots than the step budget (guards huge max_episodes sentinels).
    # The budget check runs per chunk, so the final chunk can overshoot
    # max_env_steps by chunk_size*num_envs steps — include that overshoot
    # so no episode finishing inside it is dropped from the record.
    record_cap = min(
        cfg.max_episodes,
        cfg.max_env_steps + cfg.chunk_size * num_envs,
    ) + num_envs + 1

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_env, k_loop = jax.random.split(key, 3)
    algo_state = algo.init(k_algo)
    buffer = algo.make_buffer(_example_transition(env, algo), num_envs=num_envs)
    env_state, obs = vec_reset(env, k_env, num_envs)

    carry = LoopCarry(
        algo_state=algo_state,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        key=k_loop,
        ep_return=jnp.zeros((num_envs,), jnp.float32),
        done_prev=jnp.zeros((num_envs,), jnp.bool_),
        ep_counter=jnp.int32(0),
        episode_returns=jnp.zeros((record_cap,), jnp.float32),
        total_steps=jnp.int32(0),
        update_count=jnp.int32(0),
    )

    def step_fn(carry: LoopCarry, _):
        k, k_act, k_step, k_learn = jax.random.split(carry.key, 4)
        total_env_steps = carry.total_steps * num_envs

        ctx = ExploreCtx(
            total_env_steps=total_env_steps,
            episodes=carry.ep_counter,
            done_prev=carry.done_prev,
            random_steps=cfg.random_steps,
        )
        if hasattr(algo, "explore_stored"):
            # (env_action, stored_action) split — e.g. discrete DDPG acts
            # with a sampled index but stores the behavior probs vector
            algo_state, action, stored = algo.explore_stored(
                carry.algo_state, carry.obs, k_act, ctx
            )
        else:
            algo_state, action = algo.explore(
                carry.algo_state, carry.obs, k_act, ctx
            )
            stored = action
        out = vec_step_auto_reset(env, carry.env_state, action, k_step,
                                  num_envs)
        algo_state, next_obs, carry_obs = algo.process_obs(
            algo_state, out.next_obs, out.carry_obs
        )
        trans = Transition(
            obs=carry.obs,
            action=stored,
            reward=out.reward,
            next_obs=next_obs,
            done=out.terminated,
            episode_done=out.episode_done,
        )
        if hasattr(algo, "add_transition"):
            # algo-mediated add (e.g. ENVELOPE's add-time priorities)
            algo_state, buffer = algo.add_transition(
                algo_state, carry.buffer, trans,
                jax.random.fold_in(k, 13),
            )
        else:
            buffer = carry.buffer.add(trans)

        # episode accounting: scatter finished returns chronologically
        # (vector rewards scalarize with the env's record weights)
        step_reward = record_scalarize(env, out.reward)
        ret = carry.ep_return + step_reward
        dones = out.episode_done
        offs = jnp.cumsum(dones.astype(jnp.int32)) - 1
        slot = jnp.where(dones, carry.ep_counter + offs, record_cap)
        episode_returns = carry.episode_returns.at[slot].set(
            ret, mode="drop"
        )
        ep_counter = carry.ep_counter + jnp.sum(dones.astype(jnp.int32))
        ep_return = jnp.where(dones, 0.0, ret)

        # learner burst
        total_steps = carry.total_steps + 1
        env_steps_now = total_steps * num_envs
        do_learn = jnp.logical_and(
            env_steps_now > cfg.start_steps,
            (total_steps % max(cfg.learn_interval_steps // num_envs, 1)) == 0,
        )

        def burst(args):
            algo_state, buf, k = args  # noqa: F811 — shadows outer on purpose

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
            do_learn,
            burst,
            lambda args: (args[0], args[1]),
            (algo_state, buffer, k_learn),
        )
        update_count = carry.update_count + jnp.where(
            do_learn, cfg.updates_per_burst, 0
        )

        new_carry = LoopCarry(
            algo_state=algo_state,
            buffer=buffer,
            env_state=out.state,
            obs=carry_obs,
            key=k,
            ep_return=ep_return,
            done_prev=dones,
            ep_counter=ep_counter,
            episode_returns=episode_returns,
            total_steps=total_steps,
            update_count=update_count,
        )
        return new_carry, None

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
        # chunks always run full length, so steps are known host-side;
        # the episode count needs a device readback — do it lazily
        n_steps = chunk_i * cfg.chunk_size * num_envs
        if (chunk_i % cfg.host_sync_every == 0
                or n_steps >= cfg.max_env_steps):
            n_eps = int(carry.ep_counter)
        if on_chunk is not None and chunk_i % cfg.log_every_chunks == 0:
            on_chunk(chunk_i, n_eps, n_steps, carry)
        if (cfg.checkpoint_dir and cfg.checkpoint_every_chunks
                and chunk_i % cfg.checkpoint_every_chunks == 0):
            from freerl_tpu.train.runio import save_checkpoint

            save_checkpoint(
                f"{cfg.checkpoint_dir}/ckpt", carry.algo_state
            )
        if n_eps >= cfg.max_episodes or n_steps >= cfg.max_env_steps:
            break

    elapsed = time.time() - t0
    n_eps = int(carry.ep_counter)
    returns = np.asarray(carry.episode_returns)[: min(n_eps, cfg.max_episodes)]
    info = {
        "elapsed_s": elapsed,
        "env_steps": int(carry.total_steps) * num_envs,
        "updates": int(carry.update_count),
        "env_steps_per_s": int(carry.total_steps) * num_envs / max(elapsed, 1e-9),
        "episodes": n_eps,
    }
    return carry.algo_state, returns, info
