"""SAC, continuous and discrete, with the reference's idiosyncrasies kept.

Parity surface (SAC_file/SAC.py, SAC_add_discrete.py):
  - squashed-Gaussian actor with a STATE-INDEPENDENT log_std parameter
    clamped to [-20, 2] and the SpinningUp softplus tanh log-prob
    correction (:60-97);
  - twin critic; min backup for the target (:224-227) but MEAN(Q1,Q2) for
    the actor loss (:250) — an unusual reference choice, preserved;
  - an actor TARGET network provides next actions (:222) — also unusual;
  - adaptive temperature via log_alpha (init alpha=0.01, Adam lr 1e-4),
    target entropy -dim(A) continuous, 0.6*log|A| discrete (:154-169);
  - discrete variant: softmax actor + per-action Q table critic
    (SAC_add_discrete.py:137-160), expectation-form backups;
  - exploration is sampling from the policy; uniform warmup random_steps
    (default 500).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from freerl_tpu.algos.base import ExploreCtx, OffPolicyAlgo
from freerl_tpu.algos.common import polyak
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.nets.distributions import squashed_sample_logp
from freerl_tpu.nets.mlp import Dense


class GaussianActor(nn.Module):
    """mean head + global log_std parameter (reference method 1)."""

    action_dim: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(Dense(h)(x))
        mean = Dense(self.action_dim)(x)
        log_std = self.param(
            "log_std", nn.initializers.zeros_init(), (self.action_dim,)
        )
        log_std = jnp.clip(log_std, -20.0, 2.0)
        return mean, jnp.broadcast_to(log_std, mean.shape)


class SoftmaxPolicy(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(Dense(h)(x))
        return Dense(self.action_dim)(x)  # logits


class TwinQTable(nn.Module):
    """Discrete twin critic: per-action Q values (B, A) x2."""

    action_dim: int
    hidden: Sequence[int] = (128, 128)

    def setup(self):
        self.q1_layers = [
            Dense(h, name=f"q1_{i}") for i, h in enumerate(self.hidden)
        ] + [Dense(self.action_dim, name="q1_out")]
        self.q2_layers = [
            Dense(h, name=f"q2_{i}") for i, h in enumerate(self.hidden)
        ] + [Dense(self.action_dim, name="q2_out")]

    @staticmethod
    def _run(layers, x):
        for layer in layers[:-1]:
            x = nn.relu(layer(x))
        return layers[-1](x)

    def __call__(self, obs):
        return self._run(self.q1_layers, obs), self._run(self.q2_layers, obs)


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """Defaults mirror SAC_file/SAC.py argparse (:432-467)."""

    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    alpha_lr: float = 1e-4
    alpha_init: float = 0.01
    adaptive_alpha: bool = True
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 64
    buffer_size: int = 1_000_000
    hidden: Sequence[int] = (128, 128)
    num_envs: int = 1
    # exploration-noise addon (the reference's OUNoise/gauss tricks — the
    # committed MountainCarContinuous curve is SAC+OUNoise)
    ou_noise: bool = False
    ou_theta: float = 0.15
    ou_sigma: float = 1.0
    ou_dt: float = 1.0
    noise_init_scale: Optional[float] = 1.0
    noise_final_scale: float = 0.0
    noise_decay_episodes: int = 500
    axis_name: Optional[str] = None


@struct.dataclass
class SACState:
    actor_params: dict
    actor_target: dict
    critic_params: dict
    critic_target: dict
    log_alpha: jnp.ndarray
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    ou_state: jnp.ndarray
    step: jnp.ndarray


class SAC(OffPolicyAlgo):
    def __init__(self, dim_info: DimInfo, cfg: SACConfig = SACConfig()):
        self.dim_info = dim_info
        self.cfg = cfg
        if dim_info.is_continue:
            from freerl_tpu.algos.td3 import TwinQCritic

            self.actor = GaussianActor(dim_info.action_dim, tuple(cfg.hidden))
            self.critic = TwinQCritic(tuple(cfg.hidden))
            self.target_entropy = -float(dim_info.action_dim)
        else:
            self.actor = SoftmaxPolicy(dim_info.action_dim, tuple(cfg.hidden))
            self.critic = TwinQTable(dim_info.action_dim, tuple(cfg.hidden))
            self.target_entropy = 0.6 * math.log(dim_info.action_dim)
        # reference clips actor/critic at norm 0.5 (SAC.py:144-150); the
        # alpha optimizer is unclipped there
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.actor_lr, eps=1e-8))
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.critic_lr, eps=1e-8))
        self.alpha_tx = optax.adam(cfg.alpha_lr, eps=1e-8)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> SACState:
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        actor_params = self.actor.init(ka, obs)["params"]
        if self.dim_info.is_continue:
            act = jnp.zeros((1, self.dim_info.action_dim))
            critic_params = self.critic.init(kc, obs, act)["params"]
        else:
            critic_params = self.critic.init(kc, obs)["params"]
        log_alpha = jnp.log(jnp.float32(self.cfg.alpha_init))
        return SACState(
            actor_params=actor_params,
            actor_target=actor_params,
            critic_params=critic_params,
            critic_target=critic_params,
            log_alpha=log_alpha,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(log_alpha),
            ou_state=jnp.zeros(
                (self.cfg.num_envs,
                 self.dim_info.action_dim if self.dim_info.is_continue
                 else 1)
            ),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _sample(self, params, obs, key):
        mean, log_std = self.actor.apply({"params": params}, obs)
        return squashed_sample_logp(
            key, mean, log_std, self.dim_info.max_action
        )

    def select_action(self, state: SACState, obs, key):
        if self.dim_info.is_continue:
            a, _ = self._sample(state.actor_params, obs, key)
            return a
        logits = self.actor.apply({"params": state.actor_params}, obs)
        return jax.random.categorical(key, logits)

    def evaluate_action(self, state: SACState, obs):
        if self.dim_info.is_continue:
            mean, _ = self.actor.apply({"params": state.actor_params}, obs)
            return jnp.tanh(mean) * self.dim_info.max_action
        logits = self.actor.apply({"params": state.actor_params}, obs)
        return jnp.argmax(logits, axis=-1)

    def explore(self, state: SACState, obs, key, ctx: ExploreCtx):
        k_a, k_r, k_n = jax.random.split(key, 3)
        action = self.select_action(state, obs, k_a)
        if self.cfg.ou_noise and self.dim_info.is_continue:
            cfg = self.cfg
            ou = jnp.where(ctx.done_prev[:, None], 0.0, state.ou_state)
            dx = cfg.ou_theta * (0.0 - ou) + jnp.sqrt(cfg.ou_dt) * (
                cfg.ou_sigma * jax.random.normal(k_n, ou.shape)
            )
            ou = ou + dx
            if cfg.noise_init_scale is None:
                scale = 1.0
            else:
                remaining = jnp.maximum(
                    0.0,
                    (cfg.noise_decay_episodes
                     - ctx.episodes.astype(jnp.float32))
                    / cfg.noise_decay_episodes,
                )
                scale = cfg.noise_final_scale + (
                    cfg.noise_init_scale - cfg.noise_final_scale
                ) * remaining
            action = jnp.clip(
                action + ou * scale,
                -self.dim_info.max_action, self.dim_info.max_action,
            )
            state = state.replace(ou_state=ou)
        if ctx.random_steps > 0:
            b = obs.shape[0]
            if self.dim_info.is_continue:
                rand = jax.random.uniform(
                    k_r, (b, self.dim_info.action_dim), jnp.float32,
                    -self.dim_info.max_action, self.dim_info.max_action,
                )
                action = jnp.where(
                    ctx.total_env_steps < ctx.random_steps, rand, action
                )
            else:
                rand = jax.random.randint(
                    k_r, (b,), 0, self.dim_info.action_dim
                )
                action = jnp.where(
                    ctx.total_env_steps < ctx.random_steps, rand, action
                )
        return state, action

    # ------------------------------------------------------------------
    def update(self, state: SACState, batch: Transition, key=None):
        if self.dim_info.is_continue:
            return self._update_continuous(state, batch, key)
        return self._update_discrete(state, batch, key)

    def _update_continuous(self, state, batch, key):
        cfg = self.cfg
        k_next, k_new = jax.random.split(key)
        reward = batch.reward.reshape(-1)
        done = batch.done.reshape(-1).astype(jnp.float32)
        action = batch.action.reshape(-1, self.dim_info.action_dim)
        alpha = jnp.exp(state.log_alpha)

        # critic: min target + entropy bonus; next action from ACTOR TARGET
        next_a, next_logp = self._sample(
            state.actor_target, batch.next_obs, k_next
        )
        q1_t, q2_t = self.critic.apply(
            {"params": state.critic_target}, batch.next_obs, next_a
        )
        next_q = jnp.minimum(q1_t, q2_t)
        target = jax.lax.stop_gradient(
            reward + cfg.gamma * (1.0 - done) * (next_q - alpha * next_logp)
        )

        def critic_loss_fn(params):
            q1, q2 = self.critic.apply({"params": params}, batch.obs, action)
            return jnp.mean(jnp.square(q1 - target)) + jnp.mean(
                jnp.square(q2 - target)
            )

        critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params
        )
        if cfg.axis_name is not None:
            c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # actor: mean(Q1,Q2) (reference keeps mean, not min)
        def actor_loss_fn(params):
            a, logp = self._sample(params, batch.obs, k_new)
            q1, q2 = self.critic.apply(
                {"params": critic_params}, batch.obs, a
            )
            q = 0.5 * (q1 + q2)
            return jnp.mean(alpha * logp - q), logp

        (actor_loss, logp), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(state.actor_params)
        if cfg.axis_name is not None:
            a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
        a_updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        # alpha: L = alpha * (entropy - target_entropy), entropy = -logp
        log_alpha, alpha_opt, alpha_loss = self._alpha_update(
            state, -logp
        )

        new_state = SACState(
            actor_params=actor_params,
            actor_target=polyak(state.actor_target, actor_params, cfg.tau),
            critic_params=critic_params,
            critic_target=polyak(state.critic_target, critic_params, cfg.tau),
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
            ou_state=state.ou_state,
            step=state.step + 1,
        )
        metrics = {
            "critic_loss": critic_loss,
            "actor_loss": actor_loss,
            "alpha": jnp.exp(log_alpha),
        }
        return new_state, metrics, None

    def _update_discrete(self, state, batch, key):
        cfg = self.cfg
        reward = batch.reward.reshape(-1)
        done = batch.done.reshape(-1).astype(jnp.float32)
        action = batch.action.reshape(-1).astype(jnp.int32)
        alpha = jnp.exp(state.log_alpha)
        bidx = jnp.arange(action.shape[0])

        # expectation-form target over next-state policy
        next_logits = self.actor.apply(
            {"params": state.actor_target}, batch.next_obs
        )
        next_logp = jax.nn.log_softmax(next_logits, axis=-1)
        next_p = jnp.exp(next_logp)
        q1_t, q2_t = self.critic.apply(
            {"params": state.critic_target}, batch.next_obs
        )
        next_q = jnp.minimum(q1_t, q2_t)
        next_v = jnp.sum(next_p * (next_q - alpha * next_logp), axis=-1)
        target = jax.lax.stop_gradient(
            reward + cfg.gamma * (1.0 - done) * next_v
        )

        def critic_loss_fn(params):
            q1, q2 = self.critic.apply({"params": params}, batch.obs)
            return jnp.mean(jnp.square(q1[bidx, action] - target)) + jnp.mean(
                jnp.square(q2[bidx, action] - target)
            )

        critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params
        )
        if cfg.axis_name is not None:
            c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        def actor_loss_fn(params):
            logits = self.actor.apply({"params": params}, batch.obs)
            logp = jax.nn.log_softmax(logits, axis=-1)
            p = jnp.exp(logp)
            q1, q2 = self.critic.apply(
                {"params": critic_params}, batch.obs
            )
            q = 0.5 * (q1 + q2)
            loss = jnp.mean(jnp.sum(p * (alpha * logp - q), axis=-1))
            entropy = -jnp.sum(p * logp, axis=-1)
            return loss, entropy

        (actor_loss, entropy), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(state.actor_params)
        if cfg.axis_name is not None:
            a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
        a_updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        log_alpha, alpha_opt, alpha_loss = self._alpha_update(state, entropy)

        new_state = SACState(
            actor_params=actor_params,
            actor_target=polyak(state.actor_target, actor_params, cfg.tau),
            critic_params=critic_params,
            critic_target=polyak(state.critic_target, critic_params, cfg.tau),
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
            ou_state=state.ou_state,
            step=state.step + 1,
        )
        metrics = {
            "critic_loss": critic_loss,
            "actor_loss": actor_loss,
            "alpha": jnp.exp(log_alpha),
        }
        return new_state, metrics, None

    def _alpha_update(self, state, entropy):
        """L = alpha * (entropy - target_entropy).detach (reference :259)."""
        if not self.cfg.adaptive_alpha:
            return state.log_alpha, state.alpha_opt, jnp.float32(0.0)
        err = jax.lax.stop_gradient(
            jnp.mean(entropy) - self.target_entropy
        )

        def loss_fn(log_alpha):
            return jnp.exp(log_alpha) * err

        alpha_loss, grad = jax.value_and_grad(loss_fn)(state.log_alpha)
        updates, alpha_opt = self.alpha_tx.update(
            grad, state.alpha_opt, state.log_alpha
        )
        log_alpha = optax.apply_updates(state.log_alpha, updates)
        return log_alpha, alpha_opt, alpha_loss

    def learn_step(self, state, buffer, key, num_envs: int):
        k_s, k_u = jax.random.split(key)
        batch = buffer.sample(k_s, self.cfg.batch_size)
        state, metrics, _ = self.update(state, batch, key=k_u)
        return state, buffer, metrics
