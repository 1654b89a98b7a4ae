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
    # creation-time add-batch contract: when > 0, EVERY add must carry
    # exactly this many rows (enforced loudly at trace time), capacity is
    # a multiple of it, and pos therefore stays aligned — making the
    # contiguous fast-path write provably wrap-safe.  0 = mixed add sizes
    # allowed (e.g. HER's T*num_envs + k*T*num_envs cycles), always via
    # the modular scatter path.
    align: int = struct.field(pytree_node=False, default=0)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, capacity: int, example: Transition,
               bf16_storage: bool = False,
               add_batch: int = 0) -> "ReplayBuffer":
        """Allocate from a single example transition (no batch dim).

        ``add_batch``: the fixed per-add row count (usually ``num_envs``).
        Capacity is rounded UP to the next multiple so the ring write is a
        contiguous ``dynamic_update_slice`` (never less than the requested
        capacity, preserving the reference's ``buffer_size=1e6`` floor —
        DQN_file/DQN.py:249).  Round-up matters: the round-3 profile
        measured the modular-scatter fallback at 463 us of a 544 us
        4096-env step (85%) because ``1e6 % 4096 != 0``.
        """
        if add_batch > 0 and capacity % add_batch != 0:
            capacity = ((capacity + add_batch - 1) // add_batch) * add_batch

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
            align=add_batch,
        )

    # ------------------------------------------------------------------
    def add(self, batch: Transition) -> "ReplayBuffer":
        """Write a batch of B transitions at the ring position.

        With an ``align`` contract (B fixed at creation) the write
        position is always a multiple of B and ``capacity % B == 0``, so
        the write is a contiguous ``dynamic_update_slice`` that can never
        clamp mid-ring — XLA updates the ring in place.  Without the
        contract the general path is a modular scatter, which XLA lowers
        with a full-ring copy (measured 463 us per 4096-env step on v5e
        vs ~40 us for the env step itself — scripts/profile_bench.py).
        """
        b = jax.tree.leaves(batch)[0].shape[0]
        if self.align > 0 and b != self.align:
            raise ValueError(
                f"ReplayBuffer was created with add_batch={self.align} but "
                f"this add carries {b} rows; mixed add sizes de-align the "
                f"ring position and would corrupt the contiguous write "
                f"path. Create the buffer with add_batch=0 for mixed-size "
                f"adds (scatter path)."
            )
        if self.align > 0:
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
