"""REINFORCE (Karpathy-style Monte-Carlo policy gradient).

Parity surface (REINFORCE_file/REINFORCE.py): 1-hidden-layer-128 softmax
policy, discounted returns-to-go with done masking (:104-130), returns
normalized to zero-mean/unit-std WITHIN each episode, loss =
sum(-log_pi * G), and — crucially — one Adam step per finished episode
(:28 "每1个episode更新一次").

The reference updates from a python list buffer holding exactly one
episode. Here the rollout is a fixed (T, N) window from the on-policy
driver (freerl_tpu/train/onpolicy.py); ``update`` segments the window
into completed episodes and replays the reference cadence exactly: a
``lax.scan`` over episode slots takes one Adam step per completed
episode, normalizing returns within that episode. Transitions whose
episode does not finish inside the window are dropped (their
returns-to-go would be truncated, i.e. biased); choose
``horizon/num_envs`` comfortably above the env's max episode length so
the dropped tail stays small.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from freerl_tpu.algos.ppo import CategoricalPolicy, Rollout
from freerl_tpu.core.types import DimInfo
from freerl_tpu.nets import distributions as D


@dataclasses.dataclass(frozen=True)
class REINFORCEConfig:
    lr: float = 1e-3
    gamma: float = 0.99
    hidden: Sequence[int] = (128,)
    num_envs: int = 1
    normalize_returns: bool = True
    # episode slots per update window: one Adam step per completed
    # episode, up to this many (episodes beyond it in a single window
    # are dropped — raise it if the env's episodes are very short
    # relative to horizon/num_envs)
    max_eps_per_update: int = 64
    axis_name: Optional[str] = None


@struct.dataclass
class REINFORCEState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


class REINFORCE:
    def __init__(self, dim_info: DimInfo,
                 cfg: REINFORCEConfig = REINFORCEConfig()):
        assert not dim_info.is_continue, "REINFORCE here is discrete (softmax)"
        self.dim_info = dim_info
        self.cfg = cfg
        self.policy = CategoricalPolicy(
            dim_info.action_dim, tuple(cfg.hidden)
        )
        self.tx = optax.adam(cfg.lr, eps=1e-8)

    def init(self, key: jax.Array) -> REINFORCEState:
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        params = self.policy.init(key, obs)["params"]
        return REINFORCEState(
            params=params, opt_state=self.tx.init(params), step=jnp.int32(0)
        )

    # on-policy driver hooks -------------------------------------------
    def sample_action(self, state, obs, key):
        logits = self.policy.apply({"params": state.params}, obs)
        a = jax.random.categorical(key, logits)
        logp = D.categorical_log_prob(logits, a)
        return a, a, logp

    def evaluate_action(self, state, obs):
        logits = self.policy.apply({"params": state.params}, obs)
        return jnp.argmax(logits, axis=-1)

    def process_obs(self, state, next_obs, carry_obs):
        return state, next_obs, carry_obs

    def process_reward(self, state, reward, episode_done):
        return state, reward

    # ------------------------------------------------------------------
    def update(self, state: REINFORCEState, rollout: Rollout, key,
               episodes=None):
        cfg = self.cfg
        T, N = rollout.reward.shape

        # discounted returns-to-go, reverse scan cut at episode ends
        # (REINFORCE.py:109-113)
        def ret_scan(g, x):
            r, ep_done = x
            g = r + cfg.gamma * g * (1.0 - ep_done)
            return g, g

        _, returns = jax.lax.scan(
            ret_scan,
            jnp.zeros_like(rollout.reward[0]),
            (rollout.reward, rollout.adv_done.astype(jnp.float32)),
            reverse=True,
        )

        # episode segmentation: per-env exclusive cumsum of dones gives
        # each transition its within-column episode index; an episode is
        # complete (unbiased Monte-Carlo return) iff its done falls
        # inside this window. Global slot ids interleave env columns so
        # early episodes across envs update in round-robin order.
        d = rollout.adv_done.astype(jnp.int32)                   # (T, N)
        seg = jnp.cumsum(d, axis=0) - d                          # (T, N)
        n_done = jnp.sum(d, axis=0)                              # (N,)
        complete = seg < n_done[None, :]
        slot = seg * N + jnp.arange(N)[None, :]
        slot = jnp.where(complete, slot, -1)

        obs_f = rollout.obs.reshape((-1, self.dim_info.obs_dim))
        act_f = rollout.action.reshape(-1)
        g_f = jax.lax.stop_gradient(returns.reshape(-1))
        slot_f = slot.reshape(-1)

        def ep_step(carry, k):
            params, opt_state = carry
            mask = (slot_f == k).astype(jnp.float32)
            n = jnp.sum(mask)
            has = n > 0.5
            nz = jnp.maximum(n, 1.0)
            if cfg.normalize_returns:
                mean = jnp.sum(g_f * mask) / nz
                var = jnp.sum(jnp.square(g_f - mean) * mask) / nz
                g = (g_f - mean) / (jnp.sqrt(var) + 1e-8)
            else:
                g = g_f

            def loss_fn(p):
                logits = self.policy.apply({"params": p}, obs_f)
                logp = D.categorical_log_prob(logits, act_f)
                return jnp.sum(-logp * g * mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if cfg.axis_name is not None:
                grads = jax.lax.pmean(grads, cfg.axis_name)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(has, x, y), a, b
            )
            return (sel(new_params, params), sel(new_opt, opt_state)), loss

        (params, opt_state), losses = jax.lax.scan(
            ep_step, (state.params, state.opt_state),
            jnp.arange(cfg.max_eps_per_update),
        )
        return (
            state.replace(
                params=params, opt_state=opt_state, step=state.step + 1
            ),
            {"loss": jnp.sum(losses)},
        )
