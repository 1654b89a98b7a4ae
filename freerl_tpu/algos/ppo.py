"""PPO with the reference's 7-trick set, Beta policy, and variants.

Parity surface (PPO_file/PPO.py, PPO_with_tricks.py):
  - clipped surrogate with stored old log-probs, GAE(lambda=0.95) with the
    done (dead) vs adv_done (dead-or-truncated) mask split (:213-286);
  - K_epochs=10 over shuffled minibatches of 64 from a 2048 horizon;
  - merged actor+critic optimizer: AdamW eps 1e-6 (the vendored
    transformers AdamW, c_adamw.py) or Adam eps 1e-5 under the adam_eps
    trick;
  - diag-Gaussian actor with state-independent log_std (:64), discrete
    softmax twin, Beta-distribution actor (softplus+1, :119-152);
  - tricks {adv_norm, ObsNorm, reward_norm, reward_scaling, lr_decay,
    orthogonal_init, adam_eps, tanh} (:462-465); orthogonal init uses gain
    sqrt(2) hidden / 0.01 policy-out / 1.0 value-out (:71-76); lr decays
    linearly with episode progress (:357-364).

TPU-native: GAE is a reverse lax.scan over the (T, N)-shaped rollout;
each PPO update (all K epochs x minibatches) is ONE jitted call using
fori_loop over shuffled index blocks; the optimizer lr is injected as a
dynamic hyperparameter so the linear decay needs no recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from freerl_tpu.algos.common import clip_grads_by_norm
from freerl_tpu.algos.common import gae as gae_fn
from freerl_tpu.core.normalization import RewardScaling, RunningMeanStd
from freerl_tpu.core.types import DimInfo
from freerl_tpu.nets import distributions as D
from freerl_tpu.nets.mlp import Dense


# ---------------------------------------------------------------------------
def _maybe_conv(module, x):
    """Prepend a conv trunk when the module was built for pixel obs
    (the reference's Atari gesture, PPO_advance/Buffer.py:374-433)."""
    if module.obs_shape is not None:
        from freerl_tpu.nets.cnn import ConvTrunk

        x = ConvTrunk(obs_shape=tuple(module.obs_shape),
                      features=module.cnn_features,
                      arch=module.conv_arch)(x)
    return x


class GaussianPolicy(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)
    activation: str = "relu"        # 'tanh' under the tanh trick
    orthogonal: bool = False
    max_action: float = 1.0
    obs_shape: tuple = None
    conv_arch: str = "small"
    cnn_features: int = 256

    @nn.compact
    def __call__(self, x):
        x = _maybe_conv(self, x)
        act = jnp.tanh if self.activation == "tanh" else nn.relu
        scheme = "orthogonal" if self.orthogonal else "torch"
        for h in self.hidden:
            x = act(Dense(h, scheme=scheme)(x))
        mean = Dense(
            self.action_dim, scheme=scheme, gain=0.01
        )(x)
        mean = jnp.tanh(mean) * self.max_action
        log_std = self.param(
            "log_std", nn.initializers.zeros_init(), (self.action_dim,)
        )
        return mean, jnp.broadcast_to(log_std, mean.shape)


class BetaPolicy(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)
    activation: str = "relu"
    orthogonal: bool = False
    obs_shape: tuple = None
    conv_arch: str = "small"
    cnn_features: int = 256

    @nn.compact
    def __call__(self, x):
        x = _maybe_conv(self, x)
        act = jnp.tanh if self.activation == "tanh" else nn.relu
        scheme = "orthogonal" if self.orthogonal else "torch"
        for h in self.hidden:
            x = act(Dense(h, scheme=scheme)(x))
        raw_a = Dense(self.action_dim, scheme=scheme, gain=0.01)(x)
        raw_b = Dense(self.action_dim, scheme=scheme, gain=0.01)(x)
        return D.beta_params(raw_a, raw_b)


class CategoricalPolicy(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)
    activation: str = "relu"
    orthogonal: bool = False
    obs_shape: tuple = None
    conv_arch: str = "small"
    cnn_features: int = 256

    @nn.compact
    def __call__(self, x):
        x = _maybe_conv(self, x)
        act = jnp.tanh if self.activation == "tanh" else nn.relu
        scheme = "orthogonal" if self.orthogonal else "torch"
        for h in self.hidden:
            x = act(Dense(h, scheme=scheme)(x))
        return Dense(self.action_dim, scheme=scheme, gain=0.01)(x)


class VCritic(nn.Module):
    hidden: Sequence[int] = (128, 128)
    activation: str = "relu"
    orthogonal: bool = False
    obs_shape: tuple = None
    conv_arch: str = "small"
    cnn_features: int = 256

    @nn.compact
    def __call__(self, x):
        x = _maybe_conv(self, x)
        act = jnp.tanh if self.activation == "tanh" else nn.relu
        scheme = "orthogonal" if self.orthogonal else "torch"
        for h in self.hidden:
            x = act(Dense(h, scheme=scheme)(x))
        return Dense(1, scheme=scheme, gain=1.0)(x).squeeze(-1)


# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Defaults mirror PPO_file/PPO.py argparse (:359-386)."""

    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    gamma: float = 0.99
    lmbda: float = 0.95
    clip_param: float = 0.2
    K_epochs: int = 10
    entropy_coefficient: float = 0.01
    horizon: int = 2048            # total transitions per update
    minibatch_size: int = 64
    hidden: Sequence[int] = (128, 128)
    num_envs: int = 1
    # tricks (PPO_with_tricks.py:462-465)
    adv_norm: bool = False
    obs_norm: bool = False
    reward_norm: bool = False      # normalize raw rewards (RunningMeanStd)
    reward_scaling: bool = False   # scale by running std of discounted return
    lr_decay: bool = False
    lr_decay_episodes: int = 200
    orthogonal_init: bool = False
    adam_eps: bool = False         # Adam eps 1e-5 instead of AdamW eps 1e-6
    tanh: bool = False
    beta_dist: bool = False
    # variants (PPO_file/PPO_d.py, PPO_no_minibatch.py, PPO_std_decay.py)
    recompute_logp: bool = False   # PPO_d: no stored log-pi; recompute
    std_decay: bool = False        # trainable mean, externally decayed std
    std_init: float = 0.6
    std_min: float = 0.1
    std_decay_episodes: int = 200
    axis_name: Optional[str] = None
    # pixel observations (the Atari path): (H, W, C) enables a conv trunk
    obs_shape: Optional[tuple] = None
    conv_arch: str = "small"
    cnn_features: int = 256

    def __post_init__(self):
        # reference validator (PPO_with_tricks): the two reward
        # normalizers are mutually exclusive
        if self.reward_norm and self.reward_scaling:
            raise ValueError(
                "reward_norm and reward_scaling cannot both be on"
            )
        if self.beta_dist and self.std_decay:
            raise ValueError("std_decay applies to the Gaussian actor")


@struct.dataclass
class PPOState:
    actor_params: dict
    critic_params: dict
    opt_state: optax.OptState
    obs_rms: RunningMeanStd
    rew_rms: RunningMeanStd
    rew_scale: RewardScaling
    lr_frac: jnp.ndarray          # current lr multiplier (lr_decay trick)
    ext_std: jnp.ndarray          # externally scheduled std (std_decay)
    step: jnp.ndarray


@struct.dataclass
class Rollout:
    """(T, N, ...) time-major on-policy batch."""

    obs: jnp.ndarray
    action: jnp.ndarray
    log_pi: jnp.ndarray
    reward: jnp.ndarray
    next_obs: jnp.ndarray
    done: jnp.ndarray          # dead only (bootstrap mask)
    adv_done: jnp.ndarray      # dead or truncated (GAE cut)


class PPO:
    def __init__(self, dim_info: DimInfo, cfg: PPOConfig = PPOConfig()):
        self.dim_info = dim_info
        self.cfg = cfg
        activation = "tanh" if cfg.tanh else "relu"
        ortho = cfg.orthogonal_init
        hid = tuple(cfg.hidden)
        conv = dict(obs_shape=cfg.obs_shape, conv_arch=cfg.conv_arch,
                    cnn_features=cfg.cnn_features)
        if not dim_info.is_continue:
            self.actor = CategoricalPolicy(
                dim_info.action_dim, hid, activation, ortho, **conv
            )
        elif cfg.beta_dist:
            self.actor = BetaPolicy(dim_info.action_dim, hid, activation,
                                    ortho, **conv)
        else:
            self.actor = GaussianPolicy(
                dim_info.action_dim, hid, activation, ortho,
                dim_info.max_action, **conv,
            )
        self.critic = VCritic(hid, activation, ortho, **conv)
        # merged actor+critic optimizer (reference PPO.py:121-152);
        # AdamW eps 1e-6 parity with the vendored c_adamw, or Adam eps 1e-5
        # under the adam_eps trick. lr is injected so lr_decay is dynamic.
        if cfg.adam_eps:
            base = optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg.actor_lr, eps=1e-5
            )
        else:
            base = optax.inject_hyperparams(optax.adamw)(
                learning_rate=cfg.actor_lr, eps=1e-6, weight_decay=0.0
            )
        self.tx = base

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> PPOState:
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        actor_params = self.actor.init(ka, obs)["params"]
        critic_params = self.critic.init(kc, obs)["params"]
        return PPOState(
            actor_params=actor_params,
            critic_params=critic_params,
            opt_state=self.tx.init(
                {"actor": actor_params, "critic": critic_params}
            ),
            obs_rms=RunningMeanStd.create((self.dim_info.obs_dim,)),
            rew_rms=RunningMeanStd.create(()),
            rew_scale=RewardScaling.create(self.cfg.num_envs, self.cfg.gamma),
            lr_frac=jnp.float32(1.0),
            ext_std=jnp.float32(self.cfg.std_init),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _dist_logp_entropy(self, params, obs, action, ext_std=None):
        if not self.dim_info.is_continue:
            logits = self.actor.apply({"params": params}, obs)
            logp = D.categorical_log_prob(logits, action)
            ent = D.categorical_entropy(logits)
            return logp, ent
        if self.cfg.beta_dist:
            alpha, beta = self.actor.apply({"params": params}, obs)
            logp = D.beta_log_prob(alpha, beta, action)
            ent = D.beta_entropy(alpha, beta)
            return logp, ent
        mean, log_std = self.actor.apply({"params": params}, obs)
        if self.cfg.std_decay and ext_std is not None:
            std = jnp.broadcast_to(ext_std, mean.shape)
        else:
            std = jnp.exp(log_std)
        logp = D.normal_log_prob(mean, std, action)
        ent = D.normal_entropy(std)
        return logp, ent

    def sample_action(self, state: PPOState, obs, key):
        """Returns (env_action, stored_action, log_pi)."""
        if not self.dim_info.is_continue:
            logits = self.actor.apply({"params": state.actor_params}, obs)
            a = jax.random.categorical(key, logits)
            logp = D.categorical_log_prob(logits, a)
            return a, a, logp
        if self.cfg.beta_dist:
            alpha, beta = self.actor.apply(
                {"params": state.actor_params}, obs
            )
            x = D.beta_sample(key, alpha, beta)
            logp = D.beta_log_prob(alpha, beta, x)
            return D.beta_to_action(x, self.dim_info.max_action), x, logp
        mean, log_std = self.actor.apply({"params": state.actor_params}, obs)
        if self.cfg.std_decay:
            std = jnp.broadcast_to(state.ext_std, mean.shape)
        else:
            std = jnp.exp(log_std)
        a = D.normal_sample(key, mean, std)
        logp = D.normal_log_prob(mean, std, a)
        env_a = jnp.clip(
            a, -self.dim_info.max_action, self.dim_info.max_action
        )
        return env_a, a, logp

    def evaluate_action(self, state: PPOState, obs):
        # offline eval feeds RAW observations; with the ObsNorm trick the
        # policy was trained on normalized ones, so apply the saved
        # running stats (reference PPO_with_tricks evaluate path)
        if self.cfg.obs_norm:
            obs = state.obs_rms.normalize(obs)
        if not self.dim_info.is_continue:
            logits = self.actor.apply({"params": state.actor_params}, obs)
            return jnp.argmax(logits, axis=-1)
        if self.cfg.beta_dist:
            alpha, beta = self.actor.apply(
                {"params": state.actor_params}, obs
            )
            return D.beta_to_action(
                D.beta_mean(alpha, beta), self.dim_info.max_action
            )
        mean, _ = self.actor.apply({"params": state.actor_params}, obs)
        return mean

    def value(self, state: PPOState, obs):
        return self.critic.apply({"params": state.critic_params}, obs)

    # -- trick hooks used by the on-policy loop -------------------------
    # Under the data-parallel driver (distributed/dp.py) these run inside
    # shard_map; passing cfg.axis_name keeps the running stats replicated
    # (global-batch moments via pmean) so the normalization tricks stay
    # exact under sharding.
    def process_obs(self, state: PPOState, next_obs, carry_obs):
        if not self.cfg.obs_norm:
            return state, next_obs, carry_obs
        rms = state.obs_rms.update(next_obs, axis_name=self.cfg.axis_name)
        return (
            state.replace(obs_rms=rms),
            rms.normalize(next_obs),
            rms.normalize(carry_obs),
        )

    def process_reward(self, state: PPOState, reward, episode_done):
        if self.cfg.reward_scaling:
            rs, scaled = state.rew_scale(reward, episode_done,
                                         axis_name=self.cfg.axis_name)
            return state.replace(rew_scale=rs), scaled
        if self.cfg.reward_norm:
            rms = state.rew_rms.update(reward,
                                       axis_name=self.cfg.axis_name)
            return state.replace(rew_rms=rms), rms.normalize(reward)
        return state, reward

    # ------------------------------------------------------------------
    def update(self, state: PPOState, rollout: Rollout, key,
               episodes=None):
        """One full PPO update: GAE + K epochs of shuffled minibatches."""
        cfg = self.cfg
        T, N = rollout.reward.shape
        B = T * N
        mb = cfg.minibatch_size
        n_mb = B // mb

        vs = self.value(state, rollout.obs)          # (T, N)
        vs_next = self.value(state, rollout.next_obs)
        adv, v_target = gae_fn(
            rollout.reward, vs, vs_next,
            rollout.done.astype(jnp.float32),
            rollout.adv_done.astype(jnp.float32),
            cfg.gamma, cfg.lmbda,
        )
        if cfg.adv_norm:
            if cfg.axis_name is not None:
                # global-batch advantage moments across the dp shards
                m = jax.lax.pmean(jnp.mean(adv), cfg.axis_name)
                sq = jax.lax.pmean(
                    jnp.mean(jnp.square(adv)), cfg.axis_name
                )
                std = jnp.sqrt(jnp.maximum(sq - jnp.square(m), 0.0))
                adv = (adv - m) / (std + 1e-5)
            else:
                adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-5)
        flat = lambda x: x.reshape((B,) + x.shape[2:])
        obs_f = flat(rollout.obs)
        act_f = flat(rollout.action)
        if cfg.recompute_logp:
            # PPO_d: old log-probs recomputed from the pre-update policy
            logp_old_f, _ = self._dist_logp_entropy(
                state.actor_params, obs_f, act_f, state.ext_std
            )
            logp_old_f = jax.lax.stop_gradient(logp_old_f)
        else:
            logp_old_f = flat(rollout.log_pi)
        adv_f = jax.lax.stop_gradient(flat(adv))
        vt_f = jax.lax.stop_gradient(flat(v_target))

        # lr decay (linear in episode progress, reference :357-364)
        if cfg.lr_decay and episodes is not None:
            frac = jnp.maximum(
                1.0 - episodes.astype(jnp.float32) / cfg.lr_decay_episodes,
                1e-3,
            )
        else:
            frac = state.lr_frac

        def loss_fn(params, idx):
            logp, ent = self._dist_logp_entropy(
                params["actor"], obs_f[idx], act_f[idx], state.ext_std
            )
            ratio = jnp.exp(logp - logp_old_f[idx])
            surr1 = ratio * adv_f[idx]
            surr2 = jnp.clip(
                ratio, 1 - cfg.clip_param, 1 + cfg.clip_param
            ) * adv_f[idx]
            actor_loss = -jnp.mean(jnp.minimum(surr1, surr2)) - (
                cfg.entropy_coefficient * jnp.mean(ent)
            )
            v = self.critic.apply({"params": params["critic"]}, obs_f[idx])
            critic_loss = jnp.mean(jnp.square(vt_f[idx] - v))
            return actor_loss + critic_loss, (actor_loss, critic_loss)

        def epoch_body(e, carry):
            params, opt_state, k = carry
            k, k_perm = jax.random.split(k)
            perm = jax.random.permutation(k_perm, B)

            def mb_body(i, inner):
                params, opt_state = inner
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                grads, _ = jax.grad(loss_fn, has_aux=True)(params, idx)
                if cfg.axis_name is not None:
                    grads = jax.lax.pmean(grads, cfg.axis_name)
                # reference clips actor and critic grad norms at 0.5 on
                # EVERY update (PPO.py:127-151) — load-bearing for
                # post-convergence stability (without it the policy
                # suffers late-run collapse dips the reference avoids)
                grads = {
                    "actor": clip_grads_by_norm(grads["actor"], 0.5),
                    "critic": clip_grads_by_norm(grads["critic"], 0.5),
                }
                opt_state.hyperparams["learning_rate"] = (
                    cfg.actor_lr * frac
                )
                updates, opt_state = self.tx.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return params, opt_state

            params, opt_state = jax.lax.fori_loop(
                0, n_mb, mb_body, (params, opt_state)
            )
            return params, opt_state, k

        params = {"actor": state.actor_params, "critic": state.critic_params}
        params, opt_state, _ = jax.lax.fori_loop(
            0, cfg.K_epochs, epoch_body, (params, state.opt_state, key)
        )

        if cfg.std_decay and episodes is not None:
            prog = jnp.minimum(
                episodes.astype(jnp.float32) / cfg.std_decay_episodes, 1.0
            )
            ext_std = cfg.std_init + (cfg.std_min - cfg.std_init) * prog
        else:
            ext_std = state.ext_std
        new_state = state.replace(
            actor_params=params["actor"],
            critic_params=params["critic"],
            opt_state=opt_state,
            lr_frac=frac * jnp.float32(1.0),
            ext_std=ext_std,
            step=state.step + 1,
        )
        metrics = {
            "adv_mean": jnp.mean(adv_f),
            "v_target_mean": jnp.mean(vt_f),
        }
        return new_state, metrics
