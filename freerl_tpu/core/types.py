"""Core pytree types shared across the framework.

The reference passes loose numpy tuples between Buffer/algorithm/train-loop
(e.g. DQN_file/Buffer.py:29-39 ``add(obs, action, reward, next_obs, done)``).
Here a transition is a typed pytree so it can flow through jit/vmap/scan and
live sharded in HBM.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Transition:
    """One (or a batch of) environment transition(s).

    ``done`` is the *bootstrap* mask — terminated only, excluding truncation —
    matching the reference's ``done_bool`` convention (DQN_file/DQN.py:317-318).
    ``episode_done`` is terminated-or-truncated (the reference's ``done``),
    used for episode accounting and GAE sequence cuts.
    """

    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    next_obs: jnp.ndarray
    done: jnp.ndarray           # terminated (bootstrap mask)
    episode_done: jnp.ndarray   # terminated | truncated


@struct.dataclass
class DimInfo:
    """Static env/action dimensionality record.

    Mirrors the reference's ``dim_info = [obs_dim, action_dim]`` plus
    ``max_action``/``is_continue`` returned by ``get_env``
    (DQN_file/DQN.py:142-170). Static — safe to close over in jitted fns.
    """

    obs_dim: int = struct.field(pytree_node=False)
    action_dim: int = struct.field(pytree_node=False)
    is_continue: bool = struct.field(pytree_node=False, default=False)
    max_action: float = struct.field(pytree_node=False, default=1.0)

    @property
    def act_store_dim(self) -> int:
        """Width of the action as stored in buffers.

        Reference convention (DQN_file/Buffer.py:4-10): discrete actions store
        a single index; continuous actions store the full action vector.
        """
        return self.action_dim if self.is_continue else 1


PyTree = Any
EnvStepOut = Tuple[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
