"""On-policy (PPO-family) training driver.

Replaces the reference's horizon-gated python loop (PPO_file/PPO.py:428-459)
with a jitted rollout scan + fused update: each iteration collects
``horizon`` transitions across the vectorized env batch with ``lax.scan``,
then runs the full K-epoch minibatch update — two XLA programs per
iteration, no per-step host traffic.

Reference conventions preserved: episode returns are logged on RAW env
rewards while the stored rewards pass through reward_norm/reward_scaling
(PPO_with_tricks.py), and obs normalization updates during collection.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from freerl_tpu.algos.ppo import Rollout
from freerl_tpu.envs.base import Env, vec_reset, vec_step_auto_reset


@dataclasses.dataclass(frozen=True)
class OnPolicyConfig:
    seed: int = 0
    num_envs: int = 8
    max_episodes: int = 200
    max_env_steps: int = 50_000_000
    horizon: int = 2048             # total transitions per update
    log_every_iters: int = 10
    # rollout+update iterations fused into one XLA dispatch (see the
    # run_block note in train_onpolicy)
    iters_per_dispatch: int = 1
    # periodic full-state checkpointing (reference save_freq cadence in
    # dispatch units; 0 = off)
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    # lazy device->host episode-count sync cadence (see
    # OffPolicyConfig.host_sync_every; a remote-tunnel readback is
    # ~60 ms — syncing every iteration gated the whole on-policy loop,
    # measured 3.6 ms/vector-step of pure readback at bench shapes)
    host_sync_every: int = 4


@struct.dataclass
class OnPolicyCarry:
    algo_state: object
    env_state: object
    obs: jnp.ndarray
    key: jax.Array
    ep_return: jnp.ndarray
    ep_counter: jnp.ndarray
    episode_returns: jnp.ndarray
    total_steps: jnp.ndarray
    # recurrent algos (algos/rmappo.py) carry GRU hiddens + the previous
    # step's episode_done (hidden-reset signal) through the rollout
    policy_carry: object = ()
    done_prev: object = ()


def train_onpolicy(env: Env, algo, cfg: OnPolicyConfig,
                   on_iter: Optional[Callable] = None, mesh=None):
    """``algo`` must expose sample_action / process_obs / process_reward /
    update (see freerl_tpu/algos/ppo.py). Returns
    (algo_state, episode_returns, info).

    With ``mesh`` (a jax.sharding.Mesh), the rollout+update iteration runs
    data-parallel over its devices via distributed/dp.py: per-device env
    slices, pmean-synchronized gradients AND normalizer statistics (the
    algo's config must carry ``axis_name`` matching the mesh axis).
    """
    if mesh is not None:
        from freerl_tpu.distributed.dp import train_onpolicy_sharded

        return train_onpolicy_sharded(env, algo, cfg, mesh,
                                      axis=mesh.axis_names[0],
                                      on_iter=on_iter)
    num_envs = cfg.num_envs
    T = max(cfg.horizon // num_envs, 1)
    # an episode costs >=1 env step, so the record never needs more
    # slots than the step budget (guards huge max_episodes sentinels)
    # include the final dispatch block's overshoot past max_env_steps
    # (up to iters_per_dispatch*T*num_envs env steps) so episodes
    # finishing inside it are recorded
    record_cap = min(
        cfg.max_episodes,
        cfg.max_env_steps
        + max(cfg.iters_per_dispatch, 1) * T * num_envs,
    ) + num_envs + 1
    n_agents = getattr(env, "n_agents", 1)
    rew_shape = (num_envs, n_agents) if n_agents > 1 else (num_envs,)
    rec_shape = (record_cap, n_agents) if n_agents > 1 else (record_cap,)
    # MPE-style envs expect actions in [0,1]; policies act in [-1,1]
    remap01 = (
        getattr(env, "action_space_01", False) and env.dim_info.is_continue
    )

    recurrent = hasattr(algo, "init_policy_carry")

    key = jax.random.PRNGKey(cfg.seed)
    k_algo, k_env, k_loop = jax.random.split(key, 3)
    algo_state = algo.init(k_algo)
    env_state, obs = vec_reset(env, k_env, num_envs)
    algo_state, _, obs = algo.process_obs(algo_state, obs, obs)

    carry = OnPolicyCarry(
        algo_state=algo_state,
        env_state=env_state,
        obs=obs,
        key=k_loop,
        ep_return=jnp.zeros(rew_shape, jnp.float32),
        ep_counter=jnp.int32(0),
        episode_returns=jnp.zeros(rec_shape, jnp.float32),
        total_steps=jnp.int32(0),
        policy_carry=(
            algo.init_policy_carry(num_envs) if recurrent else ()
        ),
        done_prev=(
            jnp.zeros((num_envs,), jnp.bool_) if recurrent else ()
        ),
    )

    def rollout_step(carry: OnPolicyCarry, _):
        k, k_act, k_step = jax.random.split(carry.key, 3)
        if recurrent:
            env_a, stored_a, logp, policy_carry, extras = algo.sample_action(
                carry.algo_state, carry.obs, k_act,
                carry.policy_carry, carry.done_prev,
            )
        else:
            env_a, stored_a, logp = algo.sample_action(
                carry.algo_state, carry.obs, k_act
            )
            policy_carry, extras = (), ()
        if remap01:
            env_a = (env_a + 1.0) / 2.0
        out = vec_step_auto_reset(env, carry.env_state, env_a, k_step,
                                  num_envs)
        algo_state, reward = algo.process_reward(
            carry.algo_state, out.reward, out.episode_done
        )
        algo_state, next_obs, carry_obs = algo.process_obs(
            algo_state, out.next_obs, out.carry_obs
        )

        # episode accounting on RAW rewards
        ret = carry.ep_return + out.reward
        dones = out.episode_done
        offs = jnp.cumsum(dones.astype(jnp.int32)) - 1
        slot = jnp.where(dones, carry.ep_counter + offs, record_cap)
        episode_returns = carry.episode_returns.at[slot].set(
            ret, mode="drop"
        )
        ep_counter = carry.ep_counter + jnp.sum(dones.astype(jnp.int32))
        dmask = dones[:, None] if n_agents > 1 else dones
        ep_return = jnp.where(dmask, 0.0, ret)

        step_data = Rollout(
            obs=carry.obs,
            action=stored_a,
            log_pi=logp,
            reward=reward,
            next_obs=next_obs,
            done=out.terminated,
            adv_done=out.episode_done,
        )
        new_carry = OnPolicyCarry(
            algo_state=algo_state,
            env_state=out.state,
            obs=carry_obs,
            key=k,
            ep_return=ep_return,
            ep_counter=ep_counter,
            episode_returns=episode_returns,
            total_steps=carry.total_steps + 1,
            policy_carry=policy_carry,
            done_prev=dones if recurrent else (),
        )
        return new_carry, (step_data, extras)

    def one_iteration(carry: OnPolicyCarry, _):
        carry, (rollout, extras) = jax.lax.scan(
            rollout_step, carry, None, length=T
        )
        k, k_upd = jax.random.split(carry.key)
        if recurrent:
            algo_state, metrics = algo.update(
                carry.algo_state, rollout, k_upd,
                episodes=carry.ep_counter, extras=extras,
            )
        else:
            algo_state, metrics = algo.update(
                carry.algo_state, rollout, k_upd, episodes=carry.ep_counter
            )
        return carry.replace(algo_state=algo_state, key=k), metrics

    # batch K rollout+update iterations into ONE dispatch: over a
    # remote-tunnel TPU each dispatch/sync pair costs milliseconds
    # (PROFILE.md), so amortizing them is a direct throughput lever;
    # on directly-attached chips K=1 and K>1 behave identically
    K = max(cfg.iters_per_dispatch, 1)

    @jax.jit
    def run_block(carry: OnPolicyCarry):
        carry, metrics = jax.lax.scan(one_iteration, carry, None, length=K)
        # report the LAST iteration's metrics for logging
        return carry, jax.tree.map(lambda m: m[-1], metrics)

    t0 = time.time()
    it = 0
    n_eps = 0
    # with K-iteration blocks, "every N iterations" must fire once per
    # window for ANY K: it % N < K is true exactly once per N window
    hit = lambda every: every > 0 and it % every < K
    while True:
        carry, metrics = run_block(carry)
        it += K
        # iterations are fixed-length, so steps are known host-side;
        # the episode count needs a device readback — do it lazily
        n_steps = it * T * num_envs
        if hit(cfg.host_sync_every) or n_steps >= cfg.max_env_steps:
            n_eps = int(carry.ep_counter)
        if on_iter is not None and hit(cfg.log_every_iters):
            on_iter(it, n_eps, n_steps, carry, metrics)
        if (cfg.checkpoint_dir and cfg.checkpoint_every
                and hit(cfg.checkpoint_every)):
            from freerl_tpu.train.runio import save_checkpoint

            save_checkpoint(f"{cfg.checkpoint_dir}/ckpt", carry.algo_state)
        if n_eps >= cfg.max_episodes or n_steps >= cfg.max_env_steps:
            break

    elapsed = time.time() - t0
    n_eps = int(carry.ep_counter)
    returns = np.asarray(carry.episode_returns)[: min(n_eps, cfg.max_episodes)]
    info = {
        "elapsed_s": elapsed,
        "env_steps": n_steps,
        "iterations": it,
        "env_steps_per_s": n_steps / max(elapsed, 1e-9),
        "episodes": n_eps,
    }
    return carry.algo_state, returns, info
