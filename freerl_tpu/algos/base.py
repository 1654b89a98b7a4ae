"""Shared off-policy algorithm protocol consumed by the train loop.

The loop (freerl_tpu/train/loop.py) drives any algo exposing:
  init(key) -> state
  make_buffer(example) -> buffer state
  explore(state, obs, key, ctx) -> (state, action)       # batched
  process_obs(state, next_obs, carry_obs) -> (state, next_obs, carry_obs)
  learn_step(state, buffer, key, num_envs) -> (state, buffer, metrics)

``ExploreCtx`` carries the loop counters algorithms need for schedules the
reference keys off the episode/step count (epsilon warmup, OU reset on
episode end, per-episode noise-scale decay — DDPG_file/DDPG.py:537-546).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import Transition


@struct.dataclass
class ExploreCtx:
    total_env_steps: jnp.ndarray   # scalar int32 (before this step)
    episodes: jnp.ndarray          # scalar int32, completed episodes
    done_prev: jnp.ndarray         # (num_envs,) episode ended last step
    random_steps: int = struct.field(pytree_node=False, default=0)


class OffPolicyAlgo:
    """Default hooks; algorithms override what they need."""

    def make_buffer(self, example: Transition, num_envs: int = 0):
        from freerl_tpu.buffers.uniform import ReplayBuffer

        return ReplayBuffer.create(
            self.cfg.buffer_size, example,
            bf16_storage=getattr(self.cfg, "bf16_replay", False),
            add_batch=num_envs,
        )

    def process_obs(self, state, next_obs, carry_obs):
        return state, next_obs, carry_obs

    def learn_step(self, state, buffer, key, num_envs: int):
        k_s, k_u = jax.random.split(key)
        batch = buffer.sample(k_s, self.cfg.batch_size)
        state, metrics, _ = self.update(state, batch, key=k_u)
        return state, buffer, metrics
