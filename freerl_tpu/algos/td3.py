"""TD3 with the reference's three 'realize' switches.

Parity surface (TD3_file/TD3.py): twin critic with a Q1-only path
(:85-121), ``realize`` dict {clip_double, policy_noise, twin_delay}:
clipped-double min backup (:202-204), target-policy smoothing noise
(default 0.1, clip 0.5, applied at sample time :196-198), delayed
actor/target updates every policy_freq=2 (:219-233). Shared skeleton:
2x128 nets, Adam 1e-3, tau 0.01, gaussian exploration noise with
episode-linear scale decay.

TPU-native: the delayed actor update is a ``lax.cond`` on the learner step
counter, so the whole learn call stays one compiled program for both
branches.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from freerl_tpu.algos.base import ExploreCtx, OffPolicyAlgo
from freerl_tpu.algos.common import polyak
from freerl_tpu.algos.ddpg import TanhActor
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.nets.mlp import Dense


class TwinQCritic(nn.Module):
    """Q1/Q2 heads; ``q1`` exposes the Q1-only path used for actor loss."""

    hidden: Sequence[int] = (128, 128)

    def setup(self):
        self.q1_layers = [
            Dense(h, name=f"q1_{i}") for i, h in enumerate(self.hidden)
        ] + [Dense(1, name="q1_out")]
        self.q2_layers = [
            Dense(h, name=f"q2_{i}") for i, h in enumerate(self.hidden)
        ] + [Dense(1, name="q2_out")]

    @staticmethod
    def _run(layers, x):
        for layer in layers[:-1]:
            x = nn.relu(layer(x))
        return layers[-1](x).squeeze(-1)

    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return self._run(self.q1_layers, x), self._run(self.q2_layers, x)

    def q1(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return self._run(self.q1_layers, x)


@dataclasses.dataclass(frozen=True)
class TD3Config:
    """Defaults mirror TD3_file/TD3.py argparse (:318-353)."""

    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 64
    buffer_size: int = 1_000_000
    hidden: Sequence[int] = (128, 128)
    num_envs: int = 1
    # exploration
    gauss_sigma: float = 0.1
    noise_init_scale: Optional[float] = 1.0
    noise_final_scale: float = 0.0
    noise_decay_episodes: int = 500
    # realize switches
    clip_double: bool = True
    policy_noise: bool = True
    twin_delay: bool = True
    policy_noise_sigma: float = 0.1
    noise_clip: float = 0.5
    policy_freq: int = 2
    axis_name: Optional[str] = None


@struct.dataclass
class TD3State:
    actor_params: dict
    actor_target: dict
    critic_params: dict
    critic_target: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    step: jnp.ndarray


class TD3(OffPolicyAlgo):
    def __init__(self, dim_info: DimInfo, cfg: TD3Config = TD3Config()):
        assert dim_info.is_continue, "TD3 is continuous-control"
        self.dim_info = dim_info
        self.cfg = cfg
        self.actor = TanhActor(
            dim_info.action_dim, tuple(cfg.hidden), dim_info.max_action
        )
        self.critic = TwinQCritic(tuple(cfg.hidden))
        # reference clips both nets at norm 0.5 every update (TD3.py:140-146)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.actor_lr, eps=1e-8))
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.critic_lr, eps=1e-8))

    def init(self, key: jax.Array) -> TD3State:
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        act = jnp.zeros((1, self.dim_info.action_dim))
        actor_params = self.actor.init(ka, obs)["params"]
        critic_params = self.critic.init(kc, obs, act)["params"]
        return TD3State(
            actor_params=actor_params,
            actor_target=actor_params,
            critic_params=critic_params,
            critic_target=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _noise_scale(self, episodes):
        cfg = self.cfg
        if cfg.noise_init_scale is None:
            return 1.0
        remaining = jnp.maximum(
            0.0,
            (cfg.noise_decay_episodes - episodes.astype(jnp.float32))
            / cfg.noise_decay_episodes,
        )
        return cfg.noise_final_scale + (
            cfg.noise_init_scale - cfg.noise_final_scale
        ) * remaining

    def select_action(self, state, obs):
        return self.actor.apply({"params": state.actor_params}, obs)

    evaluate_action = select_action

    def explore(self, state: TD3State, obs, key, ctx: ExploreCtx):
        cfg = self.cfg
        b = obs.shape[0]
        adim = self.dim_info.action_dim
        max_a = self.dim_info.max_action
        k_n, k_r = jax.random.split(key)
        a = self.select_action(state, obs)
        scale = self._noise_scale(ctx.episodes)
        noise = cfg.gauss_sigma * scale * jax.random.normal(k_n, (b, adim))
        action = jnp.clip(a + noise, -max_a, max_a)
        if ctx.random_steps > 0:
            rand = jax.random.uniform(
                k_r, (b, adim), jnp.float32, -max_a, max_a
            )
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    # ------------------------------------------------------------------
    def update(self, state: TD3State, batch: Transition, key=None):
        cfg = self.cfg
        max_a = self.dim_info.max_action
        reward = batch.reward.reshape(-1)
        done = batch.done.reshape(-1).astype(jnp.float32)
        action = batch.action.reshape(-1, self.dim_info.action_dim)

        next_action = self.actor.apply(
            {"params": state.actor_target}, batch.next_obs
        )
        if cfg.policy_noise:
            noise = jnp.clip(
                cfg.policy_noise_sigma
                * jax.random.normal(key, next_action.shape),
                -cfg.noise_clip,
                cfg.noise_clip,
            )
            next_action = jnp.clip(next_action + noise, -max_a, max_a)
        q1_t, q2_t = self.critic.apply(
            {"params": state.critic_target}, batch.next_obs, next_action
        )
        next_q = jnp.minimum(q1_t, q2_t) if cfg.clip_double else q1_t
        target = jax.lax.stop_gradient(
            reward + cfg.gamma * next_q * (1.0 - done)
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

        # --- delayed actor + target updates ---------------------------
        def do_actor(_):
            def actor_loss_fn(params):
                a = self.actor.apply({"params": params}, batch.obs)
                q1 = self.critic.apply(
                    {"params": critic_params}, batch.obs, a,
                    method=TwinQCritic.q1,
                )
                return -jnp.mean(q1)

            actor_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
                state.actor_params
            )
            if cfg.axis_name is not None:
                a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
            a_updates, actor_opt = self.actor_tx.update(
                a_grads, state.actor_opt, state.actor_params
            )
            actor_params = optax.apply_updates(
                state.actor_params, a_updates
            )
            return (
                actor_params,
                actor_opt,
                polyak(state.actor_target, actor_params, cfg.tau),
                polyak(state.critic_target, critic_params, cfg.tau),
                actor_loss,
            )

        def skip_actor(_):
            return (
                state.actor_params,
                state.actor_opt,
                state.actor_target,
                state.critic_target,
                jnp.float32(0.0),
            )

        freq = cfg.policy_freq if cfg.twin_delay else 1
        do = (state.step % freq) == (freq - 1)
        actor_params, actor_opt, actor_target, critic_target, actor_loss = (
            jax.lax.cond(do, do_actor, skip_actor, None)
        )

        new_state = TD3State(
            actor_params=actor_params,
            actor_target=actor_target,
            critic_params=critic_params,
            critic_target=critic_target,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            step=state.step + 1,
        )
        return new_state, {
            "critic_loss": critic_loss, "actor_loss": actor_loss
        }, None

    def learn_step(self, state, buffer, key, num_envs: int):
        k_s, k_u = jax.random.split(key)
        batch = buffer.sample(k_s, self.cfg.batch_size)
        state, metrics, _ = self.update(state, batch, key=k_u)
        return state, buffer, metrics
