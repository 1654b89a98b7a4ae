"""Running-statistics normalizers as pure pytree transforms.

Capability parity with the reference's normalization toolkit:
  - Welford running mean/std obs-normalizer (DDPG_file/DDPG.py:336-403,
    PPO_file/normalization.py:17-84) — here one implementation covers both the
    per-sample and the batch variants, since updates are batched anyway under
    vmap'd envs.
  - RewardScaling — divide by running std of the *discounted return*, no mean
    subtraction, reset at episode starts (PPO_file/normalization.py:87-101).
  - PopArt normalized-target head statistics
    (DDPG_file/DDPG_simple_with_tricks.py:95-187).

All are flax.struct pytrees: state in, state out, jit/scan-safe, and shardable.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    """Parallel-Welford running first/second moments over a feature axis."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar float

    @classmethod
    def create(cls, shape) -> "RunningMeanStd":
        return cls(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch: jnp.ndarray,
               axis_name: str | None = None) -> "RunningMeanStd":
        """Fold a batch of samples (leading axes are batch axes) into stats.

        With ``axis_name`` (inside shard_map/pmap over a device mesh) the
        batch moments are first all-reduced over that axis, so every
        replica folds the GLOBAL batch: stats stay replicated and match
        what a single device would compute from the concatenated batch —
        the data-parallel drivers rely on this to keep the obs/reward
        normalization tricks exact under sharding.
        """
        x = batch.reshape((-1,) + self.mean.shape)
        b_count = jnp.asarray(x.shape[0], jnp.float32)
        b_mean = jnp.mean(x, axis=0)
        b_var = jnp.var(x, axis=0)
        if axis_name is not None:
            import jax

            g_mean = jax.lax.pmean(b_mean, axis_name)
            # law of total variance over equal-size shards
            b_var = jax.lax.pmean(
                b_var + jnp.square(b_mean - g_mean), axis_name
            )
            b_mean = g_mean
            b_count = jax.lax.psum(b_count, axis_name)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * (b_count / tot)
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + jnp.square(delta) * (self.count * b_count / tot)
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray, clip: float | None = None) -> jnp.ndarray:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-8)
        if clip is not None:
            y = jnp.clip(y, -clip, clip)
        return y

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * jnp.sqrt(self.var + 1e-8) + self.mean


@struct.dataclass
class RewardScaling:
    """Scale rewards by the running std of the discounted return.

    Matches the reference semantics: maintains R <- gamma*R + r per env,
    tracks mean/var of R, returns r / std(R) (no mean subtraction), and resets
    R to zero where an episode ends (PPO_file/normalization.py:87-101).
    Vectorized over the env axis.
    """

    stats: RunningMeanStd
    ret: jnp.ndarray  # (num_envs,) running discounted return
    gamma: float = struct.field(pytree_node=False, default=0.99)

    @classmethod
    def create(cls, num_envs: int, gamma: float) -> "RewardScaling":
        return cls(
            stats=RunningMeanStd.create(()),
            ret=jnp.zeros((num_envs,), jnp.float32),
            gamma=gamma,
        )

    def __call__(self, reward: jnp.ndarray, episode_done: jnp.ndarray,
                 axis_name: str | None = None):
        ret = self.gamma * self.ret + reward
        stats = self.stats.update(ret, axis_name=axis_name)
        scaled = reward / jnp.sqrt(stats.var + 1e-8)
        ret = jnp.where(episode_done, 0.0, ret)
        return RewardScaling(stats=stats, ret=ret, gamma=self.gamma), scaled


@struct.dataclass
class PopArt:
    """Preserving-Outputs-Precisely Adaptive-Rescaling-of-Targets statistics.

    The critic learns in normalized-target space; on every stats update the
    final linear layer (w, b) is rescaled so denormalized outputs are
    preserved (reference DDPG_file/DDPG_simple_with_tricks.py:95-187).
    ``adapt`` returns the new stats plus the (scale, shift) to apply to the
    output layer's kernel and bias.
    """

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray
    beta: float = struct.field(pytree_node=False, default=3e-4)

    @classmethod
    def create(cls, shape=()) -> "PopArt":
        return cls(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    @property
    def std(self) -> jnp.ndarray:
        return jnp.sqrt(self.var + 1e-8)

    def adapt(self, targets: jnp.ndarray):
        """Update stats with a batch of (denormalized) targets.

        Returns ``(new_stats, scale, shift)`` where the critic head transforms
        as ``w' = w * old_std / new_std`` and
        ``b' = (b * old_std + old_mean - new_mean) / new_std``.
        """
        old_mean, old_std = self.mean, self.std
        x = targets.reshape((-1,) + self.mean.shape)
        b_count = jnp.asarray(x.shape[0], jnp.float32)
        b_mean = jnp.mean(x, axis=0)
        b_var = jnp.var(x, axis=0)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * (b_count / tot)
        m2 = self.var * self.count + b_var * b_count + jnp.square(delta) * (
            self.count * b_count / tot
        )
        new = PopArt(mean=new_mean, var=m2 / tot, count=tot, beta=self.beta)
        scale = old_std / new.std
        shift = (old_mean - new.mean) / new.std
        return new, scale, shift

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.std

    def denormalize(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * self.std + self.mean
