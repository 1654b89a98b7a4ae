"""HBM-resident uniform replay buffer.

The reference keeps transitions in host numpy and pays 5 H2D copies per learn
call (DQN_file/Buffer.py:51-56). Here the ring lives in device HBM as a
Transition-of-arrays pytree; ``add`` scatters a whole vector-env batch of
transitions per step and ``sample`` gathers a batch in-device. All methods are
pure state->state functions, jit/scan-safe and shardable over a mesh.

Sampling is with replacement (the reference uses ``np.random.choice(...,
replace=False)`` — DQN_file/DQN.py:97); with capacity >> batch the difference
is statistically negligible and avoids an O(capacity) permutation per step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import Transition


@struct.dataclass
class ReplayBuffer:
    data: Transition           # arrays with leading dim = capacity
    pos: jnp.ndarray           # int32 next write index
    size: jnp.ndarray          # int32 current fill
    capacity: int = struct.field(pytree_node=False)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, capacity: int, example: Transition) -> "ReplayBuffer":
        """Allocate from a single example transition (no batch dim)."""
        data = jax.tree.map(
            lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
            example,
        )
        return cls(
            data=data,
            pos=jnp.int32(0),
            size=jnp.int32(0),
            capacity=capacity,
        )

    # ------------------------------------------------------------------
    def add(self, batch: Transition) -> "ReplayBuffer":
        """Scatter a batch of B transitions at the ring position."""
        b = jax.tree.leaves(batch)[0].shape[0]
        idx = (self.pos + jnp.arange(b)) % self.capacity
        data = jax.tree.map(
            lambda buf, new: buf.at[idx].set(new), self.data, batch
        )
        return self.replace(
            data=data,
            pos=(self.pos + b) % self.capacity,
            size=jnp.minimum(self.size + b, self.capacity),
        )

    # ------------------------------------------------------------------
    def sample(self, key: jax.Array, batch_size: int) -> Transition:
        idx = jax.random.randint(key, (batch_size,), 0, self.size)
        return jax.tree.map(lambda buf: buf[idx], self.data)

    def gather(self, idx: jnp.ndarray) -> Transition:
        return jax.tree.map(lambda buf: buf[idx], self.data)

    def __len__(self):  # host-side convenience
        return int(self.size)
