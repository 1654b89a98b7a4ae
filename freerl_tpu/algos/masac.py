"""MASAC: multi-agent SAC with centralized twin critics.

Parity surface (MAAC_file/MASAC.py): per-agent squashed-Gaussian actor
(global log_std param, SpinningUp tanh correction), per-agent centralized
twin critic over concat of all agents' obs+actions, per-agent adaptive
alpha (init 0.01, lr 1e-4), min backup for targets, mean(Q1,Q2) for the
actor loss (same unusual choice as single-agent SAC), converged lr 1e-4
(README.md:149-158). No actor target in MASAC — next actions come from the
live actors (MASAC.py learn).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from freerl_tpu.algos.base import ExploreCtx, OffPolicyAlgo
from freerl_tpu.algos.common import polyak
from freerl_tpu.algos.sac import GaussianActor
from freerl_tpu.algos.td3 import TwinQCritic
from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import Env
from freerl_tpu.nets.distributions import squashed_sample_logp


@dataclasses.dataclass(frozen=True)
class MASACConfig:
    actor_lr: float = 1e-4
    critic_lr: float = 1e-4
    alpha_lr: float = 1e-4
    alpha_init: float = 0.01
    adaptive_alpha: bool = True
    gamma: float = 0.95
    tau: float = 0.01
    batch_size: int = 256
    buffer_size: int = 1_000_000
    hidden: Sequence[int] = (128, 128)
    num_envs: int = 1
    axis_name: Optional[str] = None


@struct.dataclass
class MASACState:
    actor_params: tuple
    critic_params: tuple
    critic_targets: tuple
    log_alphas: jnp.ndarray          # (A,)
    actor_opts: tuple
    critic_opts: tuple
    alpha_opts: tuple
    step: jnp.ndarray


class MASAC(OffPolicyAlgo):
    def __init__(self, env: Env, cfg: MASACConfig = MASACConfig()):
        self.cfg = cfg
        self.n_agents = env.n_agents
        self.obs_dims = tuple(env.agent_obs_dims)
        self.act_dims = tuple(env.agent_act_dims)
        self.act_pad = max(self.act_dims)
        hid = tuple(cfg.hidden)
        self.actors = [
            GaussianActor(self.act_dims[i], hid)
            for i in range(self.n_agents)
        ]
        self.critics = [TwinQCritic(hid) for _ in range(self.n_agents)]
        # reference clips actor/critic at norm 0.5 (MASAC.py update fns)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.actor_lr, eps=1e-8))
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.critic_lr, eps=1e-8))
        self.alpha_tx = optax.adam(cfg.alpha_lr, eps=1e-8)
        self.target_entropies = tuple(
            -float(d) for d in self.act_dims
        )

    def _agent_obs(self, obs, i):
        return obs[..., i, : self.obs_dims[i]]

    def _pad_act(self, a, i):
        """Zero-pad to the common act width (heterogeneous act dims)."""
        extra = self.act_pad - self.act_dims[i]
        if extra == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, extra)])

    def init(self, key: jax.Array) -> MASACState:
        keys = jax.random.split(key, 2 * self.n_agents)
        g_obs = sum(self.obs_dims)
        g_act = sum(self.act_dims)
        a_params = [
            self.actors[i].init(
                keys[2 * i], jnp.zeros((1, self.obs_dims[i]))
            )["params"]
            for i in range(self.n_agents)
        ]
        c_params = [
            self.critics[i].init(
                keys[2 * i + 1], jnp.zeros((1, g_obs)), jnp.zeros((1, g_act))
            )["params"]
            for i in range(self.n_agents)
        ]
        return MASACState(
            actor_params=tuple(a_params),
            critic_params=tuple(c_params),
            critic_targets=tuple(c_params),
            log_alphas=jnp.full(
                (self.n_agents,), jnp.log(self.cfg.alpha_init)
            ),
            actor_opts=tuple(self.actor_tx.init(p) for p in a_params),
            critic_opts=tuple(self.critic_tx.init(p) for p in c_params),
            alpha_opts=tuple(
                self.alpha_tx.init(jnp.float32(0.0))
                for _ in range(self.n_agents)
            ),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _sample_agent(self, params, obs_i, i, key):
        mean, log_std = self.actors[i].apply({"params": params}, obs_i)
        return squashed_sample_logp(key, mean, log_std, 1.0)

    def _critic_apply(self, params, obs, actions, i):
        g_obs = jnp.concatenate(
            [self._agent_obs(obs, j) for j in range(self.n_agents)], axis=-1
        )
        g_act = jnp.concatenate(
            [
                actions[..., j, : self.act_dims[j]]
                for j in range(self.n_agents)
            ],
            axis=-1,
        )
        return self.critics[i].apply({"params": params}, g_obs, g_act)

    def select_action(self, state: MASACState, obs, key):
        acts = []
        for i in range(self.n_agents):
            a, _ = self._sample_agent(
                state.actor_params[i], self._agent_obs(obs, i), i,
                jax.random.fold_in(key, i),
            )
            acts.append(self._pad_act(a, i))
        return jnp.stack(acts, axis=-2)

    def evaluate_action(self, state: MASACState, obs):
        acts = []
        for i in range(self.n_agents):
            mean, _ = self.actors[i].apply(
                {"params": state.actor_params[i]}, self._agent_obs(obs, i)
            )
            acts.append(self._pad_act(jnp.tanh(mean), i))
        return jnp.stack(acts, axis=-2)

    def explore(self, state: MASACState, obs, key, ctx: ExploreCtx):
        k_a, k_r = jax.random.split(key)
        action = self.select_action(state, obs, k_a)
        if ctx.random_steps > 0:
            rand = jax.random.uniform(
                k_r, action.shape, jnp.float32, -1.0, 1.0
            )
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    # ------------------------------------------------------------------
    def learn_step(self, state: MASACState, buffer, key, num_envs: int):
        cfg = self.cfg
        actor_params = list(state.actor_params)
        critic_params = list(state.critic_params)
        actor_opts = list(state.actor_opts)
        critic_opts = list(state.critic_opts)
        alpha_opts = list(state.alpha_opts)
        log_alphas = state.log_alphas
        metrics = {}

        for i in range(self.n_agents):
            k_s, k_next, k_new, key = jax.random.split(key, 4)
            batch: Transition = buffer.sample(k_s, cfg.batch_size)
            reward_i = batch.reward[:, i]
            done = batch.done.astype(jnp.float32)
            alpha = jnp.exp(log_alphas[i])

            # next actions sampled from all live actors; entropy of own
            next_acts, next_logp_i = [], None
            for j in range(self.n_agents):
                a_j, logp_j = self._sample_agent(
                    actor_params[j], self._agent_obs(batch.next_obs, j), j,
                    jax.random.fold_in(k_next, j),
                )
                next_acts.append(self._pad_act(a_j, j))
                if j == i:
                    next_logp_i = logp_j
            next_actions = jnp.stack(next_acts, axis=-2)
            q1t, q2t = self._critic_apply(
                state.critic_targets[i], batch.next_obs, next_actions, i
            )
            next_q = jnp.minimum(q1t, q2t)
            target = jax.lax.stop_gradient(
                reward_i + cfg.gamma * (1.0 - done)
                * (next_q - alpha * next_logp_i)
            )

            def critic_loss_fn(params):
                q1, q2 = self._critic_apply(
                    params, batch.obs, batch.action, i
                )
                return jnp.mean(jnp.square(q1 - target)) + jnp.mean(
                    jnp.square(q2 - target)
                )

            closs, c_grads = jax.value_and_grad(critic_loss_fn)(
                critic_params[i]
            )
            if cfg.axis_name is not None:
                c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
            c_up, critic_opts[i] = self.critic_tx.update(
                c_grads, critic_opts[i], critic_params[i]
            )
            critic_params[i] = optax.apply_updates(critic_params[i], c_up)

            def actor_loss_fn(params):
                # reference defaults (MAAC_file/MASAC.py:164-172):
                # action_way '1' — the joint critic input takes FRESH
                # actions from every agent's current actor (others
                # stop-gradient), and the actor target is min(Q1,Q2)
                a_i, logp = self._sample_agent(
                    params, self._agent_obs(batch.obs, i), i, k_new
                )
                acts = []
                for j in range(self.n_agents):
                    if j == i:
                        acts.append(self._pad_act(a_i, j))
                    else:
                        a_j, _ = self._sample_agent(
                            actor_params[j], self._agent_obs(batch.obs, j),
                            j, jax.random.fold_in(k_new, 1000 + j),
                        )
                        acts.append(
                            jax.lax.stop_gradient(self._pad_act(a_j, j))
                        )
                q1, q2 = self._critic_apply(
                    critic_params[i], batch.obs, jnp.stack(acts, axis=-2), i
                )
                q = jnp.minimum(q1, q2)
                return jnp.mean(alpha * logp - q), logp

            (aloss, logp), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_params[i])
            if cfg.axis_name is not None:
                a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
            a_up, actor_opts[i] = self.actor_tx.update(
                a_grads, actor_opts[i], actor_params[i]
            )
            actor_params[i] = optax.apply_updates(actor_params[i], a_up)

            if cfg.adaptive_alpha:
                err = jax.lax.stop_gradient(
                    jnp.mean(-logp) - self.target_entropies[i]
                )

                def alpha_loss_fn(la):
                    return jnp.exp(la) * err

                _, g = jax.value_and_grad(alpha_loss_fn)(log_alphas[i])
                up, alpha_opts[i] = self.alpha_tx.update(
                    g, alpha_opts[i], log_alphas[i]
                )
                log_alphas = log_alphas.at[i].set(
                    log_alphas[i] + up
                )
            metrics[f"critic_loss_{i}"] = closs
            metrics[f"actor_loss_{i}"] = aloss

        critic_targets = tuple(
            polyak(state.critic_targets[i], critic_params[i], cfg.tau)
            for i in range(self.n_agents)
        )
        new_state = MASACState(
            actor_params=tuple(actor_params),
            critic_params=tuple(critic_params),
            critic_targets=critic_targets,
            log_alphas=log_alphas,
            actor_opts=tuple(actor_opts),
            critic_opts=tuple(critic_opts),
            alpha_opts=tuple(alpha_opts),
            step=state.step + 1,
        )
        return new_state, buffer, metrics
