"""Host-callback env bridge: run real python envs inside the jitted loops.

The pure-JAX envs are the TPU-native fast path, but the reference's
ecosystem includes envs that cannot be re-derived (SMACv2's StarCraft
binary — SURVEY §7 'wrap or defer') and users may want the original
gymnasium/PettingZoo implementations bit-for-bit. This bridge wraps ANY
host python vector of envs behind ``jax.experimental.io_callback`` so the
same jitted training drivers run unchanged: the device computes actions,
one ordered callback steps all N host envs, results flow back as fixed
shapes.

Auto-reset happens host-side (true ``next_obs`` is returned separately
from the post-reset ``carry_obs``, preserving the buffer semantics).
Throughput is host-bound — this is the compatibility path, not the fast
path.

Usage:
    env = HostVecEnv(lambda: gym.make("LunarLander-v3"), num_envs=16)
    train_offpolicy(env, algo, OffPolicyConfig(num_envs=16, ...))
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env, StepOut


@struct.dataclass
class HostEnvState:
    """Device-side token; the real state lives in host python envs."""

    tick: jnp.ndarray


class HostVecEnv(Env):
    """N host envs stepped in lockstep through one ordered io_callback."""

    def __init__(self, make_fn: Callable, num_envs: int,
                 max_steps: int | None = None):
        self.make_fn = make_fn
        self.num_envs = num_envs
        self._envs = [make_fn() for _ in range(num_envs)]
        probe = self._envs[0]
        # gymnasium-style spaces
        obs_space = probe.observation_space
        act_space = probe.action_space
        import gymnasium as gym

        if isinstance(act_space, gym.spaces.Box):
            self.dim_info = DimInfo(
                obs_dim=int(np.prod(obs_space.shape)),
                action_dim=int(act_space.shape[0]),
                is_continue=True,
                max_action=float(act_space.high[0]),
            )
        else:
            self.dim_info = DimInfo(
                obs_dim=int(np.prod(obs_space.shape or (1,))),
                action_dim=int(act_space.n),
                is_continue=False,
            )
        spec = getattr(probe, "spec", None)
        self.max_steps = max_steps or (
            getattr(spec, "max_episode_steps", None) or 1000
        )
        self.reward_threshold = getattr(spec, "reward_threshold", None)
        self.name = getattr(spec, "id", "HostVecEnv")
        self._obs_shape = (num_envs, self.dim_info.obs_dim)

    # ------------------------------------------------------------------
    def _host_reset(self, seed):
        obs = []
        for i, e in enumerate(self._envs):
            o, _ = e.reset(seed=int(seed) + i)
            obs.append(np.asarray(o, np.float32).reshape(-1))
        return np.stack(obs)

    def _host_step(self, actions):
        actions = np.asarray(actions)
        next_obs, carry_obs, rewards, terms, truncs = [], [], [], [], []
        for e, a in zip(self._envs, actions):
            if not self.dim_info.is_continue:
                a = int(a)
            o2, r, term, trunc, _ = e.step(a)
            o2 = np.asarray(o2, np.float32).reshape(-1)
            next_obs.append(o2)
            if term or trunc:
                o_new, _ = e.reset()
                carry_obs.append(np.asarray(o_new, np.float32).reshape(-1))
            else:
                carry_obs.append(o2)
            rewards.append(np.float32(r))
            terms.append(bool(term))
            truncs.append(bool(trunc))
        return (
            np.stack(next_obs), np.stack(carry_obs),
            np.asarray(rewards, np.float32),
            np.asarray(terms), np.asarray(truncs),
        )

    # ------------------------------------------------------------------
    # vectorized protocol consumed by the training drivers (envs/base.py
    # vec_reset / vec_step_auto_reset delegate here when present)
    def vec_reset(self, key, num_envs):
        assert num_envs == self.num_envs, (
            "HostVecEnv is fixed-size; construct with the loop's num_envs"
        )
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        obs = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct(self._obs_shape, jnp.float32),
            seed, ordered=True,
        )
        return HostEnvState(tick=jnp.int32(0)), obs

    def vec_step_auto_reset(self, state, action, key, num_envs) -> StepOut:
        n = self.num_envs
        out_shapes = (
            jax.ShapeDtypeStruct(self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct(self._obs_shape, jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.bool_),
            jax.ShapeDtypeStruct((n,), jnp.bool_),
        )
        next_obs, carry_obs, reward, term, trunc = (
            jax.experimental.io_callback(
                self._host_step, out_shapes, action, ordered=True
            )
        )
        return StepOut(
            state=HostEnvState(tick=state.tick + 1),
            carry_obs=carry_obs,
            next_obs=next_obs,
            reward=reward,
            terminated=term,
            truncated=trunc,
        )
