"""Action-masked multi-agent envs (the SMACv2 capability surface).

The reference's mask-action MAPPO trains on SMACv2
(MAPPO_file/MAPPO_for_mask_action.py:417-493), an external StarCraft
binary that cannot run on TPU (SURVEY §7 non-goals: wrap or defer). The
CAPABILITY — per-step per-agent availability masks flowing through
rollout, policy and entropy (CategoricalMasked :191, mask-aware buffers
Buffer.py:434,498) — is covered here:

  - :class:`ActionMaskWrapper` appends the 0/1 availability mask to each
    agent's observation (the rollout then carries masks with no buffer
    schema change — the TPU analogue of Buffer_for_PPO_mask);
  - :class:`MaskedSpread` is a toy masked env for tests: discrete
    simple_spread where moves that would push an agent past the arena
    bound are unavailable.

A real SMACv2 adapter would implement the same interface host-side.
"""
from __future__ import annotations

import jax.numpy as jnp

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env
from freerl_tpu.envs.mpe import SimpleSpread


class ActionMaskWrapper(Env):
    """Append each agent's availability mask to its observation.

    ``mask_fn(env, state) -> (n_agents, n_actions)`` with 1 = available.
    Policies recover it from the obs tail (``mask_dim`` = n_actions).
    """

    def __init__(self, env: Env, mask_fn):
        self.env = env
        self.mask_fn = mask_fn
        self.n_agents = env.n_agents
        self.mask_dim = env.dim_info.action_dim
        self.agent_obs_dims = tuple(
            d + self.mask_dim for d in env.agent_obs_dims
        )
        self.agent_act_dims = env.agent_act_dims
        self.dim_info = DimInfo(
            obs_dim=env.dim_info.obs_dim + self.mask_dim,
            action_dim=env.dim_info.action_dim,
            is_continue=env.dim_info.is_continue,
            max_action=env.dim_info.max_action,
        )
        self.max_steps = env.max_steps
        self.reward_threshold = env.reward_threshold
        self.name = env.name + "-masked"

    def _augment(self, state, obs):
        mask = self.mask_fn(self.env, state).astype(jnp.float32)
        return jnp.concatenate([obs, mask], axis=-1)

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._augment(state, obs)

    def step(self, state, action, key):
        new, obs, r, term, trunc = self.env.step(state, action, key)
        return new, self._augment(new, obs), r, term, trunc

    def observation(self, state):
        return self._augment(state, self.env.observation(state))


def _bound_mask(env, state):
    """Moves that would leave the +-1.2 arena are unavailable.

    Discrete MPE actions: 0 noop, 1 +x, 2 -x, 3 +y, 4 -y.
    """
    pos = state.pos[: env.n_agents]                     # (A, 2)
    lim = 1.2
    ok_px = pos[:, 0] < lim
    ok_nx = pos[:, 0] > -lim
    ok_py = pos[:, 1] < lim
    ok_ny = pos[:, 1] > -lim
    noop = jnp.ones_like(ok_px)
    return jnp.stack([noop, ok_px, ok_nx, ok_py, ok_ny], axis=-1)


def MaskedSpread(N: int = 3) -> ActionMaskWrapper:
    return ActionMaskWrapper(
        SimpleSpread(N=N, continuous_actions=False), _bound_mask
    )
