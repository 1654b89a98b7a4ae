"""Multi-objective environments (mo-gymnasium capability surface).

The reference's ENVELOPE family trains on mo-gymnasium's
``deep-sea-treasure-v0`` (ENVELOPE_MORL_file/ENVELOPE_DQN.py:390).
Re-derived here: the classic 11x11 submarine grid with the convex treasure
set; actions {0:up, 1:down, 2:left, 3:right}; vector reward
[treasure_value, -1 time penalty]; episode terminates on treasure pickup,
truncates at 100 steps. Observation is the (row, col) position as float32.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env

# classic DST treasure map: (row, col) -> value
_TREASURES = [
    (1, 0, 0.7), (2, 1, 8.2), (3, 2, 11.5), (4, 3, 14.0), (4, 4, 15.1),
    (4, 5, 16.1), (7, 6, 19.6), (7, 7, 20.3), (9, 8, 22.4), (10, 9, 23.7),
]
_ROWS, _COLS = 11, 11


def _build_maps():
    value = np.zeros((_ROWS, _COLS), np.float32)
    for r, c, v in _TREASURES:
        value[r, c] = v
    # seabed: cells below the treasure of each column are unreachable
    depth = np.full((_COLS,), _ROWS, np.int32)
    for r, c, _ in _TREASURES:
        depth[c] = r
    return value, depth


_VALUE_MAP, _DEPTH = _build_maps()


@struct.dataclass
class DSTState:
    row: jnp.ndarray
    col: jnp.ndarray
    t: jnp.ndarray


class DeepSeaTreasure(Env):
    """deep-sea-treasure-v0: 2-objective grid world."""

    name = "deep-sea-treasure-v0"
    max_steps = 100
    reward_dim = 2
    # training-curve scalarization w_set_1 (ENVELOPE_DQN.py:459,503)
    record_weights = (0.5, 0.5)
    dim_info = DimInfo(obs_dim=2, action_dim=4, is_continue=False)

    value_map = jnp.asarray(_VALUE_MAP)
    depth = jnp.asarray(_DEPTH)

    def reset(self, key):
        state = DSTState(row=jnp.int32(0), col=jnp.int32(0), t=jnp.int32(0))
        return state, self.observation(state)

    def observation(self, state):
        return jnp.stack(
            [state.row.astype(jnp.float32), state.col.astype(jnp.float32)]
        )

    def step(self, state, action, key):
        dr = jnp.array([-1, 1, 0, 0])[action]
        dc = jnp.array([0, 0, -1, 1])[action]
        row = jnp.clip(state.row + dr, 0, _ROWS - 1)
        col = jnp.clip(state.col + dc, 0, _COLS - 1)
        # cannot move below the seabed of the target column
        blocked = row > self.depth[col]
        row = jnp.where(blocked, state.row, row)
        col = jnp.where(blocked, state.col, col)
        t = state.t + 1
        new = DSTState(row=row, col=col, t=t)
        treasure = self.value_map[row, col]
        reward = jnp.stack([treasure, jnp.float32(-1.0)])
        terminated = treasure > 0
        truncated = jnp.logical_and(t >= self.max_steps, ~terminated)
        return new, self.observation(new), reward, terminated, truncated
