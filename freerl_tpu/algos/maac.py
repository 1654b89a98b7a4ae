"""MAAC: Actor-Attention-Critic (discrete), paper-faithful per reference.

Parity surface (MAAC_file/Attention.py, MAAC_discrete.py):
  - shared multi-head Attention block: Q projection from the agent's own
    state embedding, K projections and LeakyReLU-activated V from the
    OTHER agents' state-action embeddings, scaled dot-product, fc_out
    (Attention.py:63-114);
  - per-agent Attention_Critic: own-state encoder + own-(s,a) encoder,
    attention over the other agents' (s,a) embeddings, Q head
    fc2(relu(fc1(concat[own_enc, attn]))) -> per-action Q table
    (Attention.py:116-233);
  - soft (entropy-regularized) targets with the expectation backup and a
    counterfactual baseline b_i = E_{a_i~pi}[Q_i] for the advantage actor
    update; all critics update jointly through the SHARED attention block
    (the reference holds one attention_block instance across agents);
  - converged lr 5e-4 discrete (README.md:149-158).

Runs on the MARL off-policy driver. The reference documents a
default-argument RNG pitfall for the shared block
(MAAC_file/Attention.py:24-60) — moot here since flax params are explicit.
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
from freerl_tpu.core.types import Transition
from freerl_tpu.envs.base import Env
from freerl_tpu.nets.mlp import Dense


class SharedAttention(nn.Module):
    """Q from self, K/V from others; LeakyReLU value; multi-head."""

    hidden_dim: int = 128
    num_heads: int = 4

    @nn.compact
    def __call__(self, e_q, e_k):
        """e_q (B, 1, D); e_k (B, n_others, D) -> (B, hidden)."""
        H = self.num_heads
        hd = self.hidden_dim // H
        q = nn.Dense(self.hidden_dim, use_bias=False, name="query")(e_q)
        k = nn.Dense(self.hidden_dim, use_bias=False, name="key")(e_k)
        v = nn.leaky_relu(nn.Dense(self.hidden_dim, name="value")(e_k))
        B, n = e_k.shape[0], e_k.shape[1]
        q = q.reshape(B, 1, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, n, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, n, H, hd).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(hd)
        w = jax.nn.softmax(scores, axis=-1)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(B, 1, self.hidden_dim)
        return nn.Dense(self.hidden_dim, name="fc_out")(out.squeeze(1))


class MAACCritics(nn.Module):
    """All agents' attention critics in one module (shared attention)."""

    obs_dims: Sequence[int]
    act_dims: Sequence[int]
    attention_dim: int = 128
    hidden: int = 128
    num_heads: int = 4

    def setup(self):
        A = len(self.obs_dims)
        self.attn = SharedAttention(self.attention_dim, self.num_heads)
        self.enc_s = [
            Dense(self.attention_dim, name=f"enc_s_{i}") for i in range(A)
        ]
        self.enc_sa = [
            Dense(self.attention_dim, name=f"enc_sa_{i}") for i in range(A)
        ]
        self.fc1 = [Dense(self.hidden, name=f"fc1_{i}") for i in range(A)]
        self.fc2 = [
            Dense(self.act_dims[i], name=f"fc2_{i}") for i in range(A)
        ]

    def __call__(self, obs_list, act_onehot_list):
        """obs_list[i]: (B, O_i); act_onehot_list[i]: (B, act_i).
        Returns list of per-action Q tables [(B, act_i)]."""
        A = len(self.obs_dims)
        e_sa = [
            nn.leaky_relu(self.enc_sa[i](jnp.concatenate(
                [obs_list[i], act_onehot_list[i]], axis=-1
            )))
            for i in range(A)
        ]
        e_s = [nn.leaky_relu(self.enc_s[i](obs_list[i])) for i in range(A)]
        qs = []
        for i in range(A):
            others = jnp.stack(
                [e_sa[j] for j in range(A) if j != i], axis=1
            )
            attn_out = self.attn(e_s[i][:, None, :], others)
            h = nn.relu(self.fc1[i](jnp.concatenate(
                [e_s[i], attn_out], axis=-1
            )))
            qs.append(self.fc2[i](h))
        return qs


class SoftmaxActorNet(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.leaky_relu(Dense(h)(x))
        return Dense(self.action_dim)(x)  # logits


@dataclasses.dataclass(frozen=True)
class MAACConfig:
    actor_lr: float = 5e-4
    critic_lr: float = 5e-4
    gamma: float = 0.95
    tau: float = 0.01
    batch_size: int = 256
    buffer_size: int = 1_000_000
    hidden: Sequence[int] = (128, 128)
    attention_dim: int = 128
    num_heads: int = 4
    alpha: float = 0.01            # entropy temperature
    num_envs: int = 1
    axis_name: Optional[str] = None


@struct.dataclass
class MAACState:
    actor_params: tuple
    critic_params: dict
    critic_target: dict
    actor_opts: tuple
    critic_opt: optax.OptState
    step: jnp.ndarray


class MAAC(OffPolicyAlgo):
    def __init__(self, env: Env, cfg: MAACConfig = MAACConfig()):
        assert not env.dim_info.is_continue, (
            "MAAC here is the discrete variant (MAAC_discrete.py); use "
            "MASAC for continuous"
        )
        self.cfg = cfg
        self.n_agents = env.n_agents
        self.obs_dims = tuple(env.agent_obs_dims)
        self.act_dims = tuple(env.agent_act_dims)
        self.actors = [
            SoftmaxActorNet(self.act_dims[i], tuple(cfg.hidden))
            for i in range(self.n_agents)
        ]
        self.critics = MAACCritics(
            self.obs_dims, self.act_dims, cfg.attention_dim, 128,
            cfg.num_heads,
        )
        # reference clips both nets at norm 0.5 (MAAC_discrete.py)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.actor_lr, eps=1e-8))
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(0.5), optax.adam(cfg.critic_lr, eps=1e-8))

    def _agent_obs(self, obs, i):
        return obs[..., i, : self.obs_dims[i]]

    def init(self, key: jax.Array) -> MAACState:
        keys = jax.random.split(key, self.n_agents + 1)
        a_params = [
            self.actors[i].init(
                keys[i], jnp.zeros((1, self.obs_dims[i]))
            )["params"]
            for i in range(self.n_agents)
        ]
        obs_list = [
            jnp.zeros((1, d)) for d in self.obs_dims
        ]
        act_list = [jnp.zeros((1, d)) for d in self.act_dims]
        c_params = self.critics.init(keys[-1], obs_list, act_list)["params"]
        return MAACState(
            actor_params=tuple(a_params),
            critic_params=c_params,
            critic_target=c_params,
            actor_opts=tuple(self.actor_tx.init(p) for p in a_params),
            critic_opt=self.critic_tx.init(c_params),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def select_action(self, state: MAACState, obs, key):
        acts = []
        for i in range(self.n_agents):
            logits = self.actors[i].apply(
                {"params": state.actor_params[i]}, self._agent_obs(obs, i)
            )
            acts.append(
                jax.random.categorical(jax.random.fold_in(key, i), logits)
            )
        return jnp.stack(acts, axis=-1)

    def evaluate_action(self, state: MAACState, obs):
        acts = []
        for i in range(self.n_agents):
            logits = self.actors[i].apply(
                {"params": state.actor_params[i]}, self._agent_obs(obs, i)
            )
            acts.append(jnp.argmax(logits, axis=-1))
        return jnp.stack(acts, axis=-1)

    def explore(self, state: MAACState, obs, key, ctx: ExploreCtx):
        k_a, k_r = jax.random.split(key)
        action = self.select_action(state, obs, k_a)
        if ctx.random_steps > 0:
            rand = jax.random.randint(
                k_r, action.shape, 0, max(self.act_dims)
            )
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    # ------------------------------------------------------------------
    def learn_step(self, state: MAACState, buffer, key, num_envs: int):
        cfg = self.cfg
        A = self.n_agents
        k_s, k_u = jax.random.split(key)
        batch: Transition = buffer.sample(k_s, cfg.batch_size)
        done = batch.done.astype(jnp.float32)
        obs_list = [self._agent_obs(batch.obs, i) for i in range(A)]
        next_obs_list = [
            self._agent_obs(batch.next_obs, i) for i in range(A)
        ]
        act_idx = batch.action.astype(jnp.int32)          # (B, A)
        act_onehot = [
            jax.nn.one_hot(act_idx[:, i], self.act_dims[i]) for i in range(A)
        ]

        # soft expectation target from current policies
        next_logits = [
            self.actors[i].apply(
                {"params": state.actor_params[i]}, next_obs_list[i]
            )
            for i in range(A)
        ]
        next_logp = [jax.nn.log_softmax(l, axis=-1) for l in next_logits]
        next_p = [jnp.exp(lp) for lp in next_logp]
        # sample next actions for the joint critic input (per paper)
        next_a = [
            jax.random.categorical(jax.random.fold_in(k_u, i), next_logits[i])
            for i in range(A)
        ]
        next_onehot = [
            jax.nn.one_hot(next_a[i], self.act_dims[i]) for i in range(A)
        ]
        next_qs = self.critics.apply(
            {"params": state.critic_target}, next_obs_list, next_onehot
        )
        targets = []
        for i in range(A):
            q_next_i = jnp.take_along_axis(
                next_qs[i], next_a[i][:, None], axis=-1
            ).squeeze(-1)
            logp_i = jnp.take_along_axis(
                next_logp[i], next_a[i][:, None], axis=-1
            ).squeeze(-1)
            y = batch.reward[:, i] + cfg.gamma * (1.0 - done) * (
                q_next_i - cfg.alpha * logp_i
            )
            targets.append(jax.lax.stop_gradient(y))

        def critic_loss_fn(params):
            qs = self.critics.apply({"params": params}, obs_list, act_onehot)
            loss = 0.0
            for i in range(A):
                q_i = jnp.take_along_axis(
                    qs[i], act_idx[:, i][:, None], axis=-1
                ).squeeze(-1)
                loss = loss + jnp.mean(jnp.square(q_i - targets[i]))
            return loss

        closs, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params
        )
        if cfg.axis_name is not None:
            c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
        c_up, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, c_up)

        # actors: advantage vs the counterfactual baseline E_pi[Q_i]
        qs_now = self.critics.apply(
            {"params": critic_params}, obs_list, act_onehot
        )
        actor_params = list(state.actor_params)
        actor_opts = list(state.actor_opts)
        metrics = {"critic_loss": closs}
        for i in range(A):
            q_table = jax.lax.stop_gradient(qs_now[i])      # (B, act_i)

            def actor_loss_fn(params):
                logits = self.actors[i].apply(
                    {"params": params}, obs_list[i]
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                p = jnp.exp(logp)
                baseline = jnp.sum(p * q_table, axis=-1)
                q_a = jnp.take_along_axis(
                    q_table, act_idx[:, i][:, None], axis=-1
                ).squeeze(-1)
                logp_a = jnp.take_along_axis(
                    logp, act_idx[:, i][:, None], axis=-1
                ).squeeze(-1)
                adv = jax.lax.stop_gradient(
                    q_a - baseline - cfg.alpha * logp_a
                )
                return -jnp.mean(logp_a * adv)

            aloss, a_grads = jax.value_and_grad(actor_loss_fn)(
                actor_params[i]
            )
            if cfg.axis_name is not None:
                a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
            a_up, actor_opts[i] = self.actor_tx.update(
                a_grads, actor_opts[i], actor_params[i]
            )
            actor_params[i] = optax.apply_updates(actor_params[i], a_up)
            metrics[f"actor_loss_{i}"] = aloss

        new_state = MAACState(
            actor_params=tuple(actor_params),
            critic_params=critic_params,
            critic_target=polyak(
                state.critic_target, critic_params, cfg.tau
            ),
            actor_opts=tuple(actor_opts),
            critic_opt=critic_opt,
            step=state.step + 1,
        )
        return new_state, buffer, metrics
