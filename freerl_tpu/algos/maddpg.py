"""MADDPG and MATD3: centralized-critic CTDE over MPE.

Parity surface (MADDPG_file/MADDPG_simple.py, MADDPG.py, MATD3_simple.py):
  - per-agent tanh actor (2x128) over own obs; per-agent centralized critic
    over concat of ALL agents' obs and actions
    (``global_obs_act_dim`` :66, Critic :64-80);
  - learn: per-agent critic TD with all target actors' next actions; actor
    update replaces own action with actor(obs) in the joint critic
    (:165-186); a FRESH batch is drawn per agent (:169 — the reference
    needs this for autograd, we keep it for sampling parity);
  - optional action regularizer +1e-3*mean(a^2) (:182-183);
  - MATD3 (MATD3_simple.py): twin centralized critic, target policy noise
    applied at sample time (:195-203), delayed actor/target updates
    (:245-256);
  - gamma 0.95, tau 0.01, batch 256, gaussian sigma 1 with linear
    episode decay 1 -> 0 (argparse :271-298); converged lr 5e-4
    (README.md:149-158).

Heterogeneous per-agent obs dims (simple_adversary/tag) are handled by
slicing each agent's true width from the padded (A, O_max) observation;
the agent loop unrolls at trace time (n_agents <= ~8), so the whole learn
step stays one fused XLA program.
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
from freerl_tpu.algos.ddpg import QCritic, TanhActor
from freerl_tpu.algos.td3 import TwinQCritic
from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import Env


class ATTCritic(nn.Module):
    """ATT-MADDPG attention critic (MADDPG_file/ATT.py:14-60).

    Encoder: embeddings of ALL agents' obs plus the OWN action feed a
    hidden state projected through ``head_count`` parallel heads (keys);
    decoder: the OTHER agents' action embeddings form the query; softmax
    over heads weights the contextual vector that produces Q.
    """

    obs_dims: Sequence[int]
    act_dims: Sequence[int]
    agent_idx: int
    hidden_dim: int = 128
    head_count: int = 8

    @nn.compact
    def __call__(self, obs_list, act_list):
        i = self.agent_idx
        A = len(self.obs_dims)
        obs_embs = [
            nn.relu(nn.Dense(self.hidden_dim, name=f"fc_obs_{j}")(
                obs_list[j]
            ))
            for j in range(A)
        ]
        act_embs = [
            nn.relu(nn.Dense(self.hidden_dim, name=f"fc_act_{j}")(
                act_list[j]
            ))
            for j in range(A)
        ]
        enc_in = jnp.concatenate(obs_embs + [act_embs[i]], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc_enc")(enc_in))
        heads = jnp.stack([
            nn.relu(nn.Dense(self.hidden_dim, name=f"head_{k}")(h))
            for k in range(self.head_count)
        ], axis=0)                                   # (H, B, D)
        dec_in = jnp.concatenate(
            [act_embs[j] for j in range(A) if j != i], axis=-1
        )
        query = nn.relu(nn.Dense(self.hidden_dim, name="fc_dec")(dec_in))
        scores = jnp.sum(heads * query[None], axis=-1)        # (H, B)
        w = jax.nn.softmax(scores.T, axis=-1)                 # (B, H)
        context = jnp.einsum("hbd,bh->bd", heads, w)
        return nn.Dense(1, name="fc_q")(context).squeeze(-1)


@dataclasses.dataclass(frozen=True)
class MADDPGConfig:
    actor_lr: float = 5e-4
    critic_lr: float = 5e-4
    gamma: float = 0.95
    tau: float = 0.01
    batch_size: int = 256
    buffer_size: int = 1_000_000
    hidden: Sequence[int] = (128, 128)
    num_envs: int = 1
    gauss_sigma: float = 1.0
    noise_init_scale: Optional[float] = 1.0
    noise_final_scale: float = 0.0
    noise_decay_episodes: int = 600
    regular: bool = False           # +1e-3 * mean(a^2) actor regularizer
    # MATD3 switches
    twin: bool = False
    policy_noise_sigma: float = 0.2
    noise_clip: float = 0.5
    policy_freq: int = 2
    # ATT-MADDPG trick ({'ATT'} in MADDPG_simple_with_tricks.py:95-96)
    att_critic: bool = False
    att_heads: int = 8
    # MADDPG_reproduction actor modes (:127-131,204-218): '0' = ensemble
    # (deterministic, known other policies); '1' = approximate — a
    # DiagGaussian stochastic actor trained by -(logp + lmbda*entropy)
    actor_learn_way: str = "0"
    approx_lmbda: float = 1e-3
    axis_name: Optional[str] = None


@struct.dataclass
class MADDPGState:
    actor_params: tuple
    actor_targets: tuple
    critic_params: tuple
    critic_targets: tuple
    actor_opts: tuple
    critic_opts: tuple
    step: jnp.ndarray


class MADDPG(OffPolicyAlgo):
    def __init__(self, env: Env, cfg: MADDPGConfig = MADDPGConfig()):
        self.cfg = cfg
        self.n_agents = env.n_agents
        self.obs_dims = tuple(env.agent_obs_dims)
        self.act_dims = tuple(env.agent_act_dims)
        self.obs_pad = env.dim_info.obs_dim
        self.act_pad = max(self.act_dims)
        hid = tuple(cfg.hidden)
        if cfg.actor_learn_way == "1":
            from freerl_tpu.algos.sac import GaussianActor

            self.actors = [
                GaussianActor(self.act_dims[i], hid)
                for i in range(self.n_agents)
            ]
        else:
            self.actors = [
                TanhActor(self.act_dims[i], hid, 1.0)
                for i in range(self.n_agents)
            ]
        if cfg.att_critic:
            assert not cfg.twin, "ATT critic is the single-Q variant"
            self.critics = [
                ATTCritic(self.obs_dims, self.act_dims, i,
                          head_count=cfg.att_heads)
                for i in range(self.n_agents)
            ]
        else:
            critic_cls = TwinQCritic if cfg.twin else QCritic
            self.critics = [critic_cls(hid) for _ in range(self.n_agents)]
        # reference clips both nets at norm 0.5 (MADDPG_simple.py,
        # MADDPG.py, MATD3_simple.py update_actor/update_critic)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.actor_lr, eps=1e-8))
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.critic_lr, eps=1e-8))

    # ------------------------------------------------------------------
    def _agent_obs(self, obs, i):
        """(..., A, O_pad) -> (..., obs_dims[i]) for agent i."""
        return obs[..., i, : self.obs_dims[i]]

    def _agent_act(self, actions, i):
        """(..., A, act_pad) -> (..., act_dims[i]) for agent i."""
        return actions[..., i, : self.act_dims[i]]

    def _pad_act(self, a, i):
        """Zero-pad agent i's action to the common padded width
        (heterogeneous act dims, e.g. simple_world_comm's 9-dim leader)."""
        extra = self.act_pad - self.act_dims[i]
        if extra == 0:
            return a
        pad = [(0, 0)] * (a.ndim - 1) + [(0, extra)]
        return jnp.pad(a, pad)

    def init(self, key: jax.Array) -> MADDPGState:
        keys = jax.random.split(key, 2 * self.n_agents)
        g_obs = sum(self.obs_dims)
        g_act = sum(self.act_dims)
        a_params, c_params = [], []
        for i in range(self.n_agents):
            a_params.append(
                self.actors[i].init(
                    keys[2 * i], jnp.zeros((1, self.obs_dims[i]))
                )["params"]
            )
            if self.cfg.att_critic:
                c_params.append(
                    self.critics[i].init(
                        keys[2 * i + 1],
                        [jnp.zeros((1, d)) for d in self.obs_dims],
                        [jnp.zeros((1, d)) for d in self.act_dims],
                    )["params"]
                )
            else:
                c_params.append(
                    self.critics[i].init(
                        keys[2 * i + 1],
                        jnp.zeros((1, g_obs)), jnp.zeros((1, g_act)),
                    )["params"]
                )
        return MADDPGState(
            actor_params=tuple(a_params),
            actor_targets=tuple(a_params),
            critic_params=tuple(c_params),
            critic_targets=tuple(c_params),
            actor_opts=tuple(self.actor_tx.init(p) for p in a_params),
            critic_opts=tuple(self.critic_tx.init(p) for p in c_params),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _actor_apply(self, params, obs_i, i, key=None):
        out = self.actors[i].apply({"params": params}, obs_i)
        if self.cfg.actor_learn_way == "1":
            mean, log_std = out
            if key is None:
                return jnp.tanh(mean)
            u = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
            return jnp.tanh(u)
        return out

    def _critic_apply(self, params, obs, actions, i):
        if self.cfg.att_critic:
            obs_list = [
                self._agent_obs(obs, j) for j in range(self.n_agents)
            ]
            act_list = [
                self._agent_act(actions, j) for j in range(self.n_agents)
            ]
            return self.critics[i].apply({"params": params}, obs_list,
                                         act_list)
        g_obs = jnp.concatenate(
            [self._agent_obs(obs, j) for j in range(self.n_agents)], axis=-1
        )
        g_act = jnp.concatenate(
            [self._agent_act(actions, j) for j in range(self.n_agents)],
            axis=-1,
        )
        return self.critics[i].apply({"params": params}, g_obs, g_act)

    def select_action(self, state: MADDPGState, obs, key=None):
        """obs (..., A, O_pad) -> actions (..., A, act) in [-1, 1]."""
        acts = [
            self._pad_act(
                self._actor_apply(
                    state.actor_params[i], self._agent_obs(obs, i), i,
                    None if key is None else jax.random.fold_in(key, i),
                ),
                i,
            )
            for i in range(self.n_agents)
        ]
        return jnp.stack(acts, axis=-2)

    evaluate_action = select_action

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

    def explore(self, state: MADDPGState, obs, key, ctx: ExploreCtx):
        cfg = self.cfg
        k_n, k_r, k_s = jax.random.split(key, 3)
        a = self.select_action(
            state, obs, k_s if cfg.actor_learn_way == "1" else None
        )
        noise = cfg.gauss_sigma * self._noise_scale(ctx.episodes) * (
            jax.random.normal(k_n, a.shape)
        )
        action = jnp.clip(a + noise, -1.0, 1.0)
        if ctx.random_steps > 0:
            rand = jax.random.uniform(
                k_r, a.shape, jnp.float32, -1.0, 1.0
            )
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    # ------------------------------------------------------------------
    def learn_step(self, state: MADDPGState, buffer, key, num_envs: int):
        cfg = self.cfg
        actor_params = list(state.actor_params)
        critic_params = list(state.critic_params)
        actor_opts = list(state.actor_opts)
        critic_opts = list(state.critic_opts)
        metrics = {}

        do_actor = (
            ((state.step % cfg.policy_freq) == (cfg.policy_freq - 1))
            if cfg.twin
            else jnp.asarray(True)
        )

        for i in range(self.n_agents):
            k_s, k_pn, key = jax.random.split(key, 3)
            batch: Transition = buffer.sample(k_s, cfg.batch_size)
            reward_i = batch.reward[:, i]
            done = batch.done.astype(jnp.float32)

            # all agents' next actions from target actors
            next_acts = []
            for j in range(self.n_agents):
                na = self._actor_apply(
                    state.actor_targets[j],
                    self._agent_obs(batch.next_obs, j), j,
                    jax.random.fold_in(k_pn, 100 + j)
                    if cfg.actor_learn_way == "1" else None,
                )
                if cfg.twin and cfg.policy_noise_sigma > 0:
                    pn = jnp.clip(
                        cfg.policy_noise_sigma
                        * jax.random.normal(
                            jax.random.fold_in(k_pn, j), na.shape
                        ),
                        -cfg.noise_clip, cfg.noise_clip,
                    )
                    na = jnp.clip(na + pn, -1.0, 1.0)
                next_acts.append(self._pad_act(na, j))
            next_actions = jnp.stack(next_acts, axis=-2)

            if cfg.twin:
                q1t, q2t = self._critic_apply(
                    state.critic_targets[i], batch.next_obs, next_actions, i
                )
                next_q = jnp.minimum(q1t, q2t)
            else:
                next_q = self._critic_apply(
                    state.critic_targets[i], batch.next_obs, next_actions, i
                )
            target = jax.lax.stop_gradient(
                reward_i + cfg.gamma * next_q * (1.0 - done)
            )

            def critic_loss_fn(params):
                if cfg.twin:
                    q1, q2 = self._critic_apply(
                        params, batch.obs, batch.action, i
                    )
                    return jnp.mean(jnp.square(q1 - target)) + jnp.mean(
                        jnp.square(q2 - target)
                    )
                q = self._critic_apply(params, batch.obs, batch.action, i)
                return jnp.mean(jnp.square(q - target))

            closs, c_grads = jax.value_and_grad(critic_loss_fn)(
                critic_params[i]
            )
            if cfg.axis_name is not None:
                c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
            c_up, critic_opts[i] = self.critic_tx.update(
                c_grads, critic_opts[i], critic_params[i]
            )
            critic_params[i] = optax.apply_updates(critic_params[i], c_up)

            # actor: mode '0' replaces the own action in the joint critic;
            # mode '1' uses the reference's -(logp + lmbda*entropy)
            def actor_loss_fn(params):
                if cfg.actor_learn_way == "1":
                    mean, log_std = self.actors[i].apply(
                        {"params": params}, self._agent_obs(batch.obs, i)
                    )
                    std = jnp.exp(log_std)
                    u = mean + std * jax.random.normal(
                        jax.random.fold_in(k_pn, 200 + i), mean.shape
                    )
                    a_i = jnp.tanh(jax.lax.stop_gradient(u))
                    from freerl_tpu.nets.distributions import (
                        normal_entropy,
                        normal_log_prob,
                    )

                    logp = normal_log_prob(
                        mean, std, jax.lax.stop_gradient(u)
                    )
                    ent = normal_entropy(std)
                    return -(jnp.mean(logp)
                             + cfg.approx_lmbda * jnp.mean(ent))
                a_i = self._actor_apply(
                    params, self._agent_obs(batch.obs, i), i
                )
                acts = batch.action.at[..., i, : self.act_dims[i]].set(a_i)
                if cfg.twin:
                    q = self._critic_apply(
                        critic_params[i], batch.obs, acts, i,
                    )[0]
                else:
                    q = self._critic_apply(
                        critic_params[i], batch.obs, acts, i
                    )
                loss = -jnp.mean(q)
                if cfg.regular:
                    loss = loss + 1e-3 * jnp.mean(jnp.square(a_i))
                return loss

            aloss, a_grads = jax.value_and_grad(actor_loss_fn)(
                actor_params[i]
            )
            if cfg.axis_name is not None:
                a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
            a_up, new_a_opt = self.actor_tx.update(
                a_grads, actor_opts[i], actor_params[i]
            )
            new_a_params = optax.apply_updates(actor_params[i], a_up)
            # delayed actor under MATD3
            actor_params[i] = jax.tree.map(
                lambda new, old: jnp.where(do_actor, new, old),
                new_a_params, actor_params[i],
            )
            actor_opts[i] = jax.tree.map(
                lambda new, old: jnp.where(do_actor, new, old),
                new_a_opt, actor_opts[i],
            )
            metrics[f"critic_loss_{i}"] = closs
            metrics[f"actor_loss_{i}"] = aloss

        # target updates for all agents (reference update_target :186-195)
        tau = cfg.tau
        actor_targets = tuple(
            jax.tree.map(
                lambda new, old: jnp.where(do_actor, new, old),
                polyak(state.actor_targets[i], actor_params[i], tau),
                state.actor_targets[i],
            )
            for i in range(self.n_agents)
        )
        critic_targets = tuple(
            polyak(state.critic_targets[i], critic_params[i], tau)
            for i in range(self.n_agents)
        )
        new_state = MADDPGState(
            actor_params=tuple(actor_params),
            actor_targets=actor_targets,
            critic_params=tuple(critic_params),
            critic_targets=critic_targets,
            actor_opts=tuple(actor_opts),
            critic_opts=tuple(critic_opts),
            step=state.step + 1,
        )
        return new_state, buffer, metrics


def MATD3(env: Env, cfg: MADDPGConfig = None) -> MADDPG:
    """MADDPG x TD3 (MADDPG_file/MATD3_simple.py): twin centralized critic,
    target policy smoothing, delayed updates."""
    if cfg is None:
        cfg = MADDPGConfig(twin=True)
    else:
        cfg = dataclasses.replace(cfg, twin=True)
    return MADDPG(env, cfg)
