"""Data-parallel actor-learner over a device mesh.

The reference has NO distributed backend (single process, `.to(device)` —
SURVEY §2.8); this layer is the TPU-native scale-out mandated by
BASELINE.json: envs and replay shards live per-device, parameters are
replicated, and gradients sync with a psum/pmean over ICI inside a
`shard_map`'d update — XLA collectives are the whole communication backend
(no NCCL/MPI analogue needed).

Layout: every device runs ``envs_per_device`` env instances and owns a
shard-local replay ring — experience never crosses chips, only gradients do,
which is the bandwidth-optimal layout for RL (transitions are bulky, grads of
a 128-wide MLP are ~100KB). The learner runs under ``axis_name='dp'``; the
algo's ``update`` pmean-reduces gradients when its config carries that axis
name, so all replicas apply identical optimizer steps and parameters stay
replicated with no broadcast.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import Env, vec_reset, vec_step_auto_reset

_BIG = jnp.int32(1_000_000_000)  # "past all warmups" step count


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(mesh_utils.create_device_mesh((n,), devs[:n]), (axis,))


def _example_transition(env: Env) -> Transition:
    di = env.dim_info
    action = (
        jnp.zeros((di.action_dim,), jnp.float32)
        if di.is_continue
        else jnp.zeros((), jnp.int32)
    )
    return Transition(
        obs=jnp.zeros((di.obs_dim,), jnp.float32),
        action=action,
        reward=jnp.zeros((), jnp.float32),
        next_obs=jnp.zeros((di.obs_dim,), jnp.float32),
        done=jnp.zeros((), jnp.bool_),
        episode_done=jnp.zeros((), jnp.bool_),
    )


def dp_env_learner_step(env: Env, algo, mesh: Mesh, envs_per_device: int,
                        axis: str = "dp"):
    """Build the sharded full training step.

    Returns ``(init_fn, step_fn)``:
      - ``init_fn(seed) -> carry``: replicated algo state, per-device env
        batches and replay shards (shard-local leading device axis);
      - ``step_fn(carry) -> (carry, metrics)``: one vectorized env step,
        shard-local buffer add + sample, and a collective-synchronized
        gradient update — one XLA program.
    """
    n_dev = mesh.devices.size

    # ------------------------------------------------------------------
    def _shard_init(key):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key, me)
        env_state, obs = vec_reset(env, k, envs_per_device)
        buffer = algo.make_buffer(_example_transition(env))
        # re-add the device axis stripped by out_specs=P(axis)
        buffer = jax.tree.map(lambda x: x[None], buffer)
        return env_state, obs, buffer

    def init_fn(seed: int):
        key = jax.random.PRNGKey(seed)
        k_algo, k_env = jax.random.split(key)
        algo_state = algo.init(k_algo)
        init_sharded = jax.jit(
            shard_map(
                _shard_init, mesh=mesh, in_specs=P(), out_specs=P(axis),
                check_rep=False,
            )
        )
        env_state, obs, buffer = init_sharded(k_env)
        return dict(
            algo_state=algo_state,
            env_state=env_state,
            obs=obs,
            buffer=buffer,
            key=key,
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _shard_step(algo_state, env_state, obs, buffer, key, step):
        me = jax.lax.axis_index(axis)
        k = jax.random.fold_in(jax.random.fold_in(key, me), step)
        k_act, k_step, k_learn = jax.random.split(k, 3)
        buffer = jax.tree.map(lambda x: x[0], buffer)  # strip device axis

        from freerl_tpu.algos.base import ExploreCtx

        ctx = ExploreCtx(
            total_env_steps=_BIG,
            episodes=jnp.int32(0),
            done_prev=jnp.zeros((envs_per_device,), jnp.bool_),
            random_steps=0,
        )
        algo_state, action = algo.explore(algo_state, obs, k_act, ctx)
        out = vec_step_auto_reset(env, env_state, action, k_step,
                                  envs_per_device)
        trans = Transition(
            obs=obs,
            action=action,
            reward=out.reward,
            next_obs=out.next_obs,
            done=out.terminated,
            episode_done=out.episode_done,
        )
        buffer = buffer.add(trans)
        algo_state, buffer, metrics = algo.learn_step(
            algo_state, buffer, k_learn, envs_per_device
        )
        buffer = jax.tree.map(lambda x: x[None], buffer)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        metrics = dict(
            metrics, mean_reward=jax.lax.pmean(jnp.mean(out.reward), axis)
        )
        return algo_state, out.state, out.carry_obs, buffer, metrics

    sharded = shard_map(
        _shard_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P(axis), P(axis), P()),
        check_rep=False,
    )

    @jax.jit
    def step_fn(carry):
        algo_state, env_state, obs, buffer, metrics = sharded(
            carry["algo_state"], carry["env_state"], carry["obs"],
            carry["buffer"], carry["key"], carry["step"],
        )
        new_carry = dict(
            algo_state=algo_state,
            env_state=env_state,
            obs=obs,
            buffer=buffer,
            key=carry["key"],
            step=carry["step"] + 1,
        )
        return new_carry, metrics

    return init_fn, step_fn
