"""Goal-conditioned Pendulum for Hindsight Experience Replay.

Parity surface: DDPG_file/DDPG_simple_try_HER.py — the reference's HER
experiment runs DDPG on Pendulum-v1 with the observation augmented by a
3-dim goal (obs_dim doubled, :357), a sparse binary reward computed from
the goal/state distance (calcu_reward, :247-265: ``0 if costs < 0.5 else
-1`` with costs = (g_cos-cos)^2 + (g_sin-sin)^2 + 0.1*(g_w-w)^2), and a
fresh goal per episode (costheta ~ U[0,1), sintheta = sqrt(1-c^2),
w ~ U[0,2) — :435-439).

TPU-native redesign: the goal lives in the env state pytree so thousands
of goal-conditioned instances vmap cleanly; the binary reward is computed
in-device; the ``achieved``/``with_goal``/``goal_reward`` hooks below give
the HER relabel pass (train/her.py) a schema-free way to rewrite goals as
pure array ops instead of the reference's per-transition python loop
(:421-427).

Conventions kept from the reference:
  - the reward for transition (o, a, o') is computed from the CURRENT
    observation o, not the successor (calcu_reward(goal, obs, action_) at
    :397 — an idiosyncrasy of the reference implementation);
  - 'her' (binary) and 'shaping' (dense negative cost) reward modes
    (:250-263).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env
from freerl_tpu.envs.classic import Pendulum, PendulumState

_FALSE = jnp.zeros((), jnp.bool_)


@struct.dataclass
class GoalPendulumState:
    inner: PendulumState
    goal: jnp.ndarray          # (3,) [cos, sin, thdot] target


class GoalPendulum(Env):
    """Pendulum-v1 with a per-episode goal appended to the observation."""

    name = "GoalPendulum-v1"
    max_steps = 200
    reward_threshold = None
    goal_dim = 3
    # obs + goal, as in the reference's dim_info doubling (:357)
    dim_info = DimInfo(obs_dim=6, action_dim=1, is_continue=True,
                       max_action=2.0)

    def __init__(self, reward_mode: str = "her", tolerance: float = 0.5):
        assert reward_mode in ("her", "shaping")
        self.reward_mode = reward_mode
        self.tolerance = tolerance
        self._inner = Pendulum()

    # -- HER hooks ----------------------------------------------------------
    def achieved(self, obs: jnp.ndarray) -> jnp.ndarray:
        """Achieved goal of an (augmented) observation: its first 3 dims."""
        return obs[..., : self.goal_dim]

    def with_goal(self, obs: jnp.ndarray, goal: jnp.ndarray) -> jnp.ndarray:
        """Replace the goal slice of an augmented observation."""
        return jnp.concatenate([obs[..., : self.goal_dim], goal], axis=-1)

    def goal_reward(self, goal: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
        """calcu_reward: distance between goal and the CURRENT obs state."""
        cur = obs[..., : self.goal_dim]
        costs = (
            (goal[..., 0] - cur[..., 0]) ** 2
            + (goal[..., 1] - cur[..., 1]) ** 2
            + 0.1 * (goal[..., 2] - cur[..., 2]) ** 2
        )
        if self.reward_mode == "shaping":
            return -costs
        return jnp.where(costs < self.tolerance, 0.0, -1.0)

    def sample_goal(self, key: jax.Array) -> jnp.ndarray:
        """Reference goal distribution (:435-439)."""
        k1, k2 = jax.random.split(key)
        costheta = jax.random.uniform(k1, (), jnp.float32, 0.0, 1.0)
        sintheta = jnp.sqrt(1.0 - costheta**2)
        w = 2.0 * jax.random.uniform(k2, (), jnp.float32, 0.0, 1.0)
        return jnp.stack([costheta, sintheta, w])

    # -- Env protocol --------------------------------------------------------
    def reset(self, key):
        k_in, k_goal = jax.random.split(key)
        inner_state, inner_obs = self._inner.reset(k_in)
        goal = self.sample_goal(k_goal)
        state = GoalPendulumState(inner=inner_state, goal=goal)
        return state, jnp.concatenate([inner_obs, goal])

    def observation(self, state):
        return jnp.concatenate(
            [self._inner.observation(state.inner), state.goal]
        )

    def step(self, state, action, key):
        obs_now = self.observation(state)
        inner, inner_obs, _env_r, term, trunc = self._inner.step(
            state.inner, action, key
        )
        reward = self.goal_reward(state.goal, obs_now)
        new = GoalPendulumState(inner=inner, goal=state.goal)
        return new, jnp.concatenate([inner_obs, state.goal]), reward, \
            term, trunc
