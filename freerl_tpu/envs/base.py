"""Pure-JAX environment protocol.

The reference steps one python gymnasium env per process and crosses the
host<->device boundary twice per step (SURVEY §3.1). Here an environment is a
pair of pure functions

    reset(key)                -> (state, obs)
    step(state, action, key)  -> (state, obs, reward, terminated, truncated)

over a flax.struct state pytree, so the train loop can ``vmap`` thousands of
instances and roll them with ``lax.scan`` entirely on-device. Termination and
truncation are separate signals to preserve the reference's ``done`` vs
``done_bool`` bootstrap convention (DQN_file/DQN.py:317-318).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo


class Env:
    """Base class for pure-JAX environments. Subclasses are stateless; all
    dynamic state lives in the state pytree."""

    dim_info: DimInfo
    max_steps: int = 1000           # truncation horizon
    reward_threshold: float | None = None
    name: str = "Env"

    # multi-agent envs override these
    n_agents: int = 1
    agent_obs_dims: tuple = ()

    def reset(self, key: jax.Array):
        raise NotImplementedError

    def step(self, state, action: jnp.ndarray, key: jax.Array):
        raise NotImplementedError

    # -- conveniences -------------------------------------------------------
    def observation(self, state) -> jnp.ndarray:
        raise NotImplementedError


@struct.dataclass
class StepOut:
    """Output of an auto-resetting step.

    ``next_obs`` is the TRUE successor observation (pre-reset) — what goes in
    the replay buffer; ``carry_obs``/``state`` are post-reset and feed the next
    actor step.
    """

    state: object
    carry_obs: jnp.ndarray
    next_obs: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray

    @property
    def episode_done(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminated, self.truncated)


def record_scalarize(env: Env, reward):
    """Scalarize a (possibly vector) step reward for episode records.

    MORL envs provide ``record_weights`` (the reference's DST curve is
    reward . [0.5, 0.5] — ENVELOPE_DQN.py:459,503); scalar rewards pass
    through. Shared by all training drivers.
    """
    import numpy as _np

    if reward.ndim > 1:
        rw = jnp.asarray(
            getattr(env, "record_weights",
                    _np.ones((reward.shape[-1],), _np.float32)),
            jnp.float32,
        )
        return reward @ rw
    return reward


def step_auto_reset(env: Env, state, action, key) -> StepOut:
    """Step and, where the episode ended, reset in place.

    Replaces the reference's in-loop ``if done: env.reset(seed)`` branch
    (DQN_file/DQN.py:323-335) with a branch-free select so it is vmap/scan
    safe.
    """
    k_step, k_reset = jax.random.split(key)
    new_state, obs, reward, terminated, truncated = env.step(state, action, k_step)
    done = jnp.logical_or(terminated, truncated)  # scalar: one env instance
    reset_state, reset_obs = env.reset(k_reset)
    carry_state = jax.tree.map(
        lambda r, n: jnp.where(done, r, n), reset_state, new_state
    )
    carry_obs = jnp.where(done, reset_obs, obs)
    return StepOut(
        state=carry_state,
        carry_obs=carry_obs,
        next_obs=obs,
        reward=reward,
        terminated=terminated,
        truncated=truncated,
    )


def vec_reset(env: Env, key: jax.Array, num_envs: int):
    """Reset a batch of `num_envs` independent instances.

    Host-bridged envs (envs/host.py) provide their own vectorized protocol
    (one io_callback for the whole batch) instead of the vmap fast path.
    """
    if hasattr(env, "vec_reset"):
        return env.vec_reset(key, num_envs)
    keys = jax.random.split(key, num_envs)
    return jax.vmap(env.reset)(keys)


def vec_step_auto_reset(env: Env, state, action, key, num_envs: int) -> StepOut:
    if hasattr(env, "vec_step_auto_reset"):
        return env.vec_step_auto_reset(state, action, key, num_envs)
    keys = jax.random.split(key, num_envs)
    return jax.vmap(lambda s, a, k: step_auto_reset(env, s, a, k))(
        state, action, keys
    )


class FixedResetWrapper(Env):
    """Pin every reset (initial and auto-reset) to one start state.

    The reference resets its env with the SAME seed every episode during
    single-agent training (``env.reset(seed=args.seed)``,
    DQN_file/DQN.py:334 — documented as the determinism fixture, SURVEY
    §4.1). That convention is load-bearing for Noisy-net exploration:
    with a fixed start state the argmax-policy trajectory concentrates
    Q-updates on one tube of states, so action-gaps self-amplify and the
    policy stays consistent enough to resonate (measured: the reference
    code run here solves MountainCar 3/3 seeds with fixed starts; with
    random starts our otherwise-identical dynamics solved 0/18 — the Q
    landscape flattens and the noisy policy degenerates to a random
    walk).
    """

    def __init__(self, env: Env, seed: int = 0):
        self.env = env
        self._reset_key = jax.random.PRNGKey(seed)
        # mirror the public surface explicitly: Env's CLASS attribute
        # defaults (n_agents=1, agent_obs_dims=()) would otherwise shadow
        # __getattr__ forwarding and break MARL algos that read them
        self.dim_info = env.dim_info
        self.max_steps = env.max_steps
        self.reward_threshold = env.reward_threshold
        self.name = env.name
        self.n_agents = env.n_agents
        self.agent_obs_dims = env.agent_obs_dims
        if hasattr(env, "agent_act_dims"):
            self.agent_act_dims = env.agent_act_dims

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, key):
        del key
        return self.env.reset(self._reset_key)

    def step(self, state, action, key):
        return self.env.step(state, action, key)


class DisToConWrapper(Env):
    """Expose a continuous-action env through a discrete action set.

    TPU-native form of the reference's ``dis_to_con`` bridge
    (DQN_file/DQN.py:195-217): 1-D boxes get ``n_bins`` linearly interpolated
    actions; N-D boxes get ``bins_per_dim ** N`` actions decoded base-k per
    dimension (e.g. BipedalWalker 2**4 = 16).
    """

    def __init__(self, env: Env, n_bins: int = 16, bins_per_dim: int = 2):
        self.env = env
        inner = env.dim_info
        assert inner.is_continue, "DisToConWrapper wraps continuous envs only"
        self.act_shape = inner.action_dim
        if inner.action_dim == 1:
            self.n_actions = n_bins
            self.bins_per_dim = n_bins
        else:
            self.n_actions = bins_per_dim ** inner.action_dim
            self.bins_per_dim = bins_per_dim
        self.dim_info = DimInfo(
            obs_dim=inner.obs_dim,
            action_dim=self.n_actions,
            is_continue=False,
            max_action=inner.max_action,
        )
        self.max_steps = env.max_steps
        self.reward_threshold = env.reward_threshold
        self.name = env.name + f"-dis{self.n_actions}"
        self.low = -inner.max_action
        self.high = inner.max_action

    def to_continuous(self, action: jnp.ndarray) -> jnp.ndarray:
        k = self.bins_per_dim
        dims = self.act_shape
        digits = jnp.stack(
            [(action // (k ** i)) % k for i in range(dims)], axis=-1
        ).astype(jnp.float32)
        return self.low + digits / (k - 1) * (self.high - self.low)

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action, key):
        return self.env.step(state, self.to_continuous(action), key)

    def observation(self, state):
        return self.env.observation(state)
