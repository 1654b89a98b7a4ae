"""Episode-major experience store.

Parity surface: PPO_advance/Buffer.py ``Buffer_episode_for_PPO`` (:325-373)
and ``Buffer_atari`` (:374-433) — the reference accumulates python lists of
whole episodes and ``all()`` concatenates them to one training batch; the
Atari variant adds pixel-normalization / frame-stack hooks (commented out
upstream; realized in-device by envs/pixel.py instead).

TPU-native redesign: a fixed (episodes x horizon) HBM ring of Transition
pytrees. Episodes arrive as stacked (T, ...) trajectories (the natural
output of a ``lax.scan`` rollout) with a validity mask derived from
``episode_done``; ``all()`` returns the flattened store plus mask so
variable-length episodes batch rectangularly (pad-and-mask, SURVEY §7.8).
All ops are pure state->state, jit/scan/shard-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import Transition


@struct.dataclass
class EpisodeBuffer:
    data: Transition            # leaves (E, T, ...)
    valid: jnp.ndarray          # (E, T) bool — within-episode steps
    ep_pos: jnp.ndarray         # int32 next episode slot
    ep_count: jnp.ndarray       # int32 episodes stored (<= capacity)
    capacity: int = struct.field(pytree_node=False)
    horizon: int = struct.field(pytree_node=False)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, capacity: int, horizon: int,
               example: Transition) -> "EpisodeBuffer":
        data = jax.tree.map(
            lambda x: jnp.zeros((capacity, horizon) + jnp.shape(x),
                                jnp.asarray(x).dtype),
            example,
        )
        return cls(
            data=data,
            valid=jnp.zeros((capacity, horizon), jnp.bool_),
            ep_pos=jnp.int32(0),
            ep_count=jnp.int32(0),
            capacity=capacity,
            horizon=horizon,
        )

    # ------------------------------------------------------------------
    def add_episode(self, traj: Transition) -> "EpisodeBuffer":
        """Store one stacked (T, ...) trajectory in the next slot.

        Steps after the first ``episode_done`` are masked invalid, so a
        scan trajectory longer than the episode is stored pad-and-masked.
        """
        T = jax.tree.leaves(traj)[0].shape[0]
        assert T == self.horizon, (T, self.horizon)
        done = traj.episode_done.astype(jnp.int32)
        # valid up to and including the first done step
        ended_before = jnp.cumsum(done) - done    # dones strictly before t
        mask = ended_before == 0
        data = jax.tree.map(
            lambda buf, new: buf.at[self.ep_pos].set(new), self.data, traj
        )
        return self.replace(
            data=data,
            valid=self.valid.at[self.ep_pos].set(mask),
            ep_pos=(self.ep_pos + 1) % self.capacity,
            ep_count=jnp.minimum(self.ep_count + 1, self.capacity),
        )

    def add_episodes(self, trajs: Transition) -> "EpisodeBuffer":
        """Store a batch of (N, T, ...) trajectories (vector envs)."""
        n = jax.tree.leaves(trajs)[0].shape[0]

        def body(buf, i):
            return buf.add_episode(
                jax.tree.map(lambda x: x[i], trajs)
            ), None

        buf, _ = jax.lax.scan(body, self, jnp.arange(n))
        return buf

    # ------------------------------------------------------------------
    def all(self):
        """(flattened Transition with leaves (E*T, ...), mask (E*T,))."""
        flat = jax.tree.map(
            lambda x: x.reshape((self.capacity * self.horizon,) + x.shape[2:]),
            self.data,
        )
        return flat, self.valid.reshape(-1)

    def sample_episodes(self, key: jax.Array, n: int):
        """n whole episodes: (Transition with leaves (n, T, ...), mask)."""
        idx = jax.random.randint(key, (n,), 0, jnp.maximum(self.ep_count, 1))
        return (
            jax.tree.map(lambda x: x[idx], self.data),
            self.valid[idx],
        )

    def clear(self) -> "EpisodeBuffer":
        return self.replace(
            valid=jnp.zeros_like(self.valid),
            ep_pos=jnp.int32(0),
            ep_count=jnp.int32(0),
        )

    def __len__(self):
        return int(self.ep_count)
