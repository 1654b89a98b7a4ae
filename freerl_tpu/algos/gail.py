"""GAIL: adversarial imitation on top of the PPO generator.

Parity surface (GAIL_file/GAIL.py, GAIL_utils.py, config.py):
  - Discriminator D(s,a): 2x128 MLP, LeakyReLU, optional LayerNorm;
    sigmoid head in the vanilla mode, raw logits under WGAN-GP
    (gp_coef>0) (GAIL.py:17-29);
  - reward relabeling (compute_reward :62): vanilla -log(1-D+1e-8);
    WGAN mode -log(max(1-sigmoid(logits), 1e-4)) * 2;
  - D training (trian_D :75): BCE expert->1 / policy->0; under WGAN-GP the
    BCE halves plus 5 * gradient penalty of D wrt the expert inputs, Adam
    betas (0.5, 0.9), d_lr 4e-4 (config.py:71-75); Wasserstein gap logged;
  - expert data pipeline: .npz dataset + infinite uniform sampler
    (GAIL_utils.py:9-75) — here an in-HBM array pair sampled with
    jax.random (no host loader needed);
  - alternating loop (train :122-187): explore with the generator, train D
    on expert-vs-policy batches, relabel rollout rewards with D, PPO
    update; timestamped log dir + config.json dump (PPO2.py:310-343).

The per-iteration composite (rollout -> D step -> relabel -> PPO update)
is jitted end-to-end.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from freerl_tpu.algos.ppo import PPO, PPOConfig, Rollout
from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env, vec_reset, vec_step_auto_reset


class Discriminator(nn.Module):
    hidden: Sequence[int] = (128, 128)
    layernorm: bool = False

    @nn.compact
    def __call__(self, sa):
        x = sa
        for h in self.hidden:
            x = nn.Dense(h)(x)
            if self.layernorm:
                x = nn.LayerNorm()(x)
            x = nn.leaky_relu(x)
        return nn.Dense(1)(x).squeeze(-1)  # logits


@dataclasses.dataclass(frozen=True)
class GAILConfig:
    d_lr: float = 4e-4
    d_hidden: Sequence[int] = (128, 128)
    d_layernorm: bool = False
    gp_coef: float = 0.0            # >0 enables the WGAN-GP variant
    d_batch_size: int = 256
    d_steps_per_iter: int = 1
    reward_scale: float = 2.0       # WGAN-mode disc reward scale


@struct.dataclass
class GAILState:
    ppo_state: object
    d_params: dict
    d_opt: optax.OptState
    step: jnp.ndarray


class ExpertData(struct.PyTreeNode):
    """HBM-resident expert (s, a) set with uniform infinite sampling
    (replaces GAIL_utils.ExpertDataset + InfiniteUniformSampler)."""

    states: jnp.ndarray
    actions: jnp.ndarray

    @classmethod
    def from_npz(cls, path: str, state_key="states", action_key="actions"):
        data = np.load(path)
        return cls(
            states=jnp.asarray(data[state_key], jnp.float32),
            actions=jnp.asarray(data[action_key], jnp.float32),
        )

    def sample(self, key, n: int):
        idx = jax.random.randint(key, (n,), 0, self.states.shape[0])
        return self.states[idx], self.actions[idx]


class GAIL:
    def __init__(self, dim_info: DimInfo, ppo_cfg: PPOConfig = PPOConfig(),
                 cfg: GAILConfig = GAILConfig()):
        self.dim_info = dim_info
        self.cfg = cfg
        self.ppo = PPO(dim_info, ppo_cfg)
        self.disc = Discriminator(tuple(cfg.d_hidden), cfg.d_layernorm)
        if cfg.gp_coef > 0:
            self.d_tx = optax.adam(cfg.d_lr, b1=0.5, b2=0.9)
        else:
            self.d_tx = optax.adam(cfg.d_lr)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> GAILState:
        k_ppo, k_d = jax.random.split(key)
        ppo_state = self.ppo.init(k_ppo)
        sa = jnp.zeros((1, self.dim_info.obs_dim + self.dim_info.action_dim))
        d_params = self.disc.init(k_d, sa)["params"]
        return GAILState(
            ppo_state=ppo_state,
            d_params=d_params,
            d_opt=self.d_tx.init(d_params),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def compute_reward(self, d_params, states, actions):
        sa = jnp.concatenate([states, actions], axis=-1)
        logits = self.disc.apply({"params": d_params}, sa)
        if self.cfg.gp_coef > 0:
            prob = jax.nn.sigmoid(logits)
            return self.cfg.reward_scale * (
                -jnp.log(jnp.maximum(1.0 - prob, 1e-4))
            )
        d = jax.nn.sigmoid(logits)
        return -jnp.log(1.0 - d + 1e-8)

    def train_d(self, state: GAILState, expert_s, expert_a, policy_s,
                policy_a):
        cfg = self.cfg

        def loss_fn(params):
            e_sa = jnp.concatenate([expert_s, expert_a], axis=-1)
            p_sa = jnp.concatenate([policy_s, policy_a], axis=-1)
            e_out = self.disc.apply({"params": params}, e_sa)
            p_out = self.disc.apply({"params": params}, p_sa)
            e_loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(e_out, jnp.ones_like(e_out))
            )
            p_loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    p_out, jnp.zeros_like(p_out)
                )
            )
            if cfg.gp_coef > 0:
                d_loss = 0.5 * (e_loss + p_loss)

                def d_scalar(sa):
                    return self.disc.apply({"params": params}, sa[None])[0]

                grads = jax.vmap(jax.grad(d_scalar))(e_sa)
                gp = jnp.mean(jnp.sum(jnp.square(grads), axis=-1))
                d_loss = d_loss + 5.0 * gp
            else:
                d_loss = e_loss + p_loss
            w_dis = jnp.mean(e_out) - jnp.mean(p_out)
            metrics = {
                "d_loss": d_loss,
                "expert_prob": jnp.mean(jax.nn.sigmoid(e_out))
                if cfg.gp_coef > 0 else jnp.mean(jax.nn.sigmoid(e_out)),
                "policy_prob": jnp.mean(jax.nn.sigmoid(p_out)),
                "w_dis": w_dis if cfg.gp_coef > 0 else jnp.float32(0.0),
            }
            return d_loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.d_params
        )
        updates, d_opt = self.d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=d_params, d_opt=d_opt), metrics


# ---------------------------------------------------------------------------
def init_logging(log_root: str, config: dict) -> str:
    """Timestamped run dir + config.json dump (PPO2.py:310-343)."""
    run_dir = os.path.join(log_root, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)
    return run_dir


def collect_expert_data(env: Env, act_fn, n_transitions: int, seed: int = 0,
                        out_path: Optional[str] = None):
    """Roll a (trained) deterministic policy and dump (s, a) pairs — the
    generator of the reference's eval_data.npz expert sets."""
    num_envs = 16
    T = (n_transitions + num_envs - 1) // num_envs
    key = jax.random.PRNGKey(seed)
    env_state, obs = vec_reset(env, key, num_envs)

    @jax.jit
    def run(env_state, obs):
        def step(carry, t):
            env_state, obs = carry
            action = act_fn(obs)
            out = vec_step_auto_reset(
                env, env_state, action, jax.random.fold_in(key, t), num_envs
            )
            return (out.state, out.carry_obs), (obs, action)

        (_, _), (states, actions) = jax.lax.scan(
            step, (env_state, obs), jnp.arange(T)
        )
        return states, actions

    states, actions = run(env_state, obs)
    states = np.asarray(states).reshape(-1, states.shape[-1])[:n_transitions]
    actions = np.asarray(actions).reshape(-1, actions.shape[-1])[
        :n_transitions
    ]
    if out_path:
        np.savez(out_path, states=states, actions=actions)
    return ExpertData(
        states=jnp.asarray(states), actions=jnp.asarray(actions)
    )


def train_gail(env: Env, gail: GAIL, expert: ExpertData, num_iterations: int,
               num_envs: int = 8, seed: int = 0):
    """Alternating GAIL loop (GAIL.py train :122-187), one jitted program
    per iteration: rollout -> D step(s) -> relabel rewards -> PPO update.

    Returns (state, episode_returns on TRUE env rewards, metrics history).
    """
    ppo = gail.ppo
    T = max(ppo.cfg.horizon // num_envs, 1)

    key = jax.random.PRNGKey(seed)
    k_init, k_env, k_loop = jax.random.split(key, 3)
    state = gail.init(k_init)
    env_state, obs = vec_reset(env, k_env, num_envs)
    record = []

    @jax.jit
    def iteration(state, env_state, obs, key):
        k, k_roll, k_d, k_upd = jax.random.split(key, 4)

        def rollout_step(carry, t):
            env_state, obs, ppo_state = carry
            kk = jax.random.fold_in(k_roll, t)
            env_a, stored_a, logp = ppo.sample_action(ppo_state, obs, kk)
            out = vec_step_auto_reset(env, env_state, env_a, kk, num_envs)
            data = (obs, stored_a, logp, out.reward, out.next_obs,
                    out.terminated, out.episode_done)
            return (out.state, out.carry_obs, ppo_state), data

        (env_state, obs, _), (obs_t, act_t, logp_t, true_r, next_obs_t,
                              done_t, ep_done_t) = jax.lax.scan(
            rollout_step, (env_state, obs, state.ppo_state), jnp.arange(T)
        )

        # D step(s) on expert vs policy batches
        flat_s = obs_t.reshape(-1, obs_t.shape[-1])
        flat_a = act_t.reshape(-1, act_t.shape[-1]) if act_t.ndim > 2 else (
            act_t.reshape(-1, 1).astype(jnp.float32)
        )
        d_metrics = {}
        for i in range(gail.cfg.d_steps_per_iter):
            ke, kp = jax.random.split(jax.random.fold_in(k_d, i))
            e_s, e_a = expert.sample(ke, gail.cfg.d_batch_size)
            idx = jax.random.randint(
                kp, (gail.cfg.d_batch_size,), 0, flat_s.shape[0]
            )
            state, d_metrics = gail.train_d(
                state, e_s, e_a, flat_s[idx], flat_a[idx]
            )

        # relabel rewards with the (updated) discriminator
        gail_r = gail.compute_reward(
            state.d_params, flat_s, flat_a
        ).reshape(true_r.shape)

        roll = Rollout(
            obs=obs_t, action=act_t, log_pi=logp_t, reward=gail_r,
            next_obs=next_obs_t, done=done_t, adv_done=ep_done_t,
        )
        ppo_state, ppo_metrics = ppo.update(state.ppo_state, roll, k_upd)
        state = state.replace(
            ppo_state=ppo_state, step=state.step + 1
        )
        mean_true_r = jnp.mean(true_r)
        return state, env_state, obs, k, dict(
            d_metrics, mean_true_reward=mean_true_r, **ppo_metrics
        )

    history = []
    for it in range(num_iterations):
        state, env_state, obs, k_loop, metrics = iteration(
            state, env_state, obs, k_loop
        )
        history.append({k: float(v) for k, v in metrics.items()})
        record.append(history[-1]["mean_true_reward"])
    return state, np.asarray(record), history
