"""REINFORCE (Karpathy-style Monte-Carlo policy gradient).

Parity surface (REINFORCE_file/REINFORCE.py): 1-hidden-layer-128 softmax
policy, discounted returns-to-go with done masking (:104-130), returns
normalized to zero-mean/unit-std, loss = sum(-log_pi * G), Adam.

The reference updates once per episode from a python list buffer; here the
rollout is a (T, N) scan and returns-to-go come from a reverse lax.scan
cut at episode boundaries — same estimator, vectorized. Runs on the
on-policy driver (freerl_tpu/train/onpolicy.py).
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

        def scan_fn(g, x):
            r, ep_done = x
            g = r + cfg.gamma * g * (1.0 - ep_done)
            return g, g

        _, returns = jax.lax.scan(
            scan_fn,
            jnp.zeros_like(rollout.reward[0]),
            (rollout.reward, rollout.adv_done.astype(jnp.float32)),
            reverse=True,
        )
        # Monte-Carlo validity: a transition's return-to-go is unbiased
        # only if its episode COMPLETES inside this window (the reference
        # updates strictly per finished episode, REINFORCE.py:104-130).
        # Mask the trailing incomplete-episode segment of each env column
        # — without this, long episodes get systematically penalized as
        # their tails are scored with truncated returns.
        def seen_scan(seen, d):
            seen = jnp.logical_or(seen, d)
            return seen, seen

        _, valid = jax.lax.scan(
            seen_scan, jnp.zeros_like(rollout.adv_done[0]),
            rollout.adv_done, reverse=True,
        )
        valid = valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        if cfg.normalize_returns:
            mean = jnp.sum(returns * valid) / n_valid
            var = jnp.sum(jnp.square(returns - mean) * valid) / n_valid
            returns = (returns - mean) / (jnp.sqrt(var) + 1e-8)
        returns = jax.lax.stop_gradient(returns)
        obs_f = rollout.obs.reshape((-1, self.dim_info.obs_dim))
        act_f = rollout.action.reshape(-1)
        g_f = returns.reshape(-1)
        v_f = valid.reshape(-1)

        def loss_fn(params):
            logits = self.policy.apply({"params": params}, obs_f)
            logp = D.categorical_log_prob(logits, act_f)
            return jnp.sum(-logp * g_f * v_f)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if cfg.axis_name is not None:
            grads = jax.lax.pmean(grads, cfg.axis_name)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=params, opt_state=opt_state, step=state.step + 1
            ),
            {"loss": loss},
        )
