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
    # store float leaves in bfloat16: halves the ring's HBM footprint and
    # the add/sample bandwidth at >=100k-env scales; samples are upcast
    # back to float32 so the learner math is unchanged (opt-in — bf16
    # quantizes observations to 8 mantissa bits)
    bf16_storage: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, capacity: int, example: Transition,
               bf16_storage: bool = False) -> "ReplayBuffer":
        """Allocate from a single example transition (no batch dim)."""

        def alloc(x):
            dt = jnp.asarray(x).dtype
            if bf16_storage and dt == jnp.float32:
                dt = jnp.bfloat16
            return jnp.zeros((capacity,) + jnp.shape(x), dt)

        data = jax.tree.map(alloc, example)
        return cls(
            data=data,
            pos=jnp.int32(0),
            size=jnp.int32(0),
            capacity=capacity,
            bf16_storage=bf16_storage,
        )

    # ------------------------------------------------------------------
    def add(self, batch: Transition) -> "ReplayBuffer":
        """Write a batch of B transitions at the ring position.

        When ``capacity % B == 0`` (the common case: power-of-two sized
        rings, fixed env batch) the write position is always a multiple
        of B, so the write is a contiguous ``dynamic_update_slice`` —
        XLA updates the ring in place. The general path is a modular
        scatter, which XLA lowers with a full-ring copy (measured 463 us
        per 4096-env step on v5e vs ~40 us for the env step itself —
        scripts/profile_bench.py).
        """
        b = jax.tree.leaves(batch)[0].shape[0]
        if self.capacity % b == 0:
            data = jax.tree.map(
                lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                    buf, new.astype(buf.dtype), self.pos, axis=0
                ),
                self.data, batch,
            )
        else:
            idx = (self.pos + jnp.arange(b)) % self.capacity
            data = jax.tree.map(
                lambda buf, new: buf.at[idx].set(new.astype(buf.dtype)),
                self.data, batch,
            )
        return self.replace(
            data=data,
            pos=(self.pos + b) % self.capacity,
            size=jnp.minimum(self.size + b, self.capacity),
        )

    # ------------------------------------------------------------------
    def _upcast(self, batch: Transition) -> Transition:
        if not self.bf16_storage:
            return batch
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x,
            batch,
        )

    def sample(self, key: jax.Array, batch_size: int) -> Transition:
        idx = jax.random.randint(key, (batch_size,), 0, self.size)
        return self._upcast(jax.tree.map(lambda buf: buf[idx], self.data))

    def gather(self, idx: jnp.ndarray) -> Transition:
        return self._upcast(jax.tree.map(lambda buf: buf[idx], self.data))

    def __len__(self):  # host-side convenience
        return int(self.size)
