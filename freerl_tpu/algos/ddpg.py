"""DDPG with the reference's four paper "supplements" and tricks.

Parity surface (DDPG_file/DDPG.py, DDPG_simple.py, DDPG_simple_with_tricks.py,
DDPG_simple_add_discrete.py):
  - 2x128 ReLU actor (tanh out, scaled by max_action) and obs||act critic;
  - supplements dict {weight_decay, OUNoise, ObsNorm, net_init,
    Batch_ObsNorm}: critic Adam weight decay 1e-3 (:131-134), OU exploration
    noise theta=0.15 with per-episode reset and linear scale decay
    (:305-326, :537-546), Welford obs normalization (:336-403), fan-in
    uniform init with final layers U(+-3e-3) (:58-68);
  - gradient clip 0.5 on both nets, always on (:142-148);
  - PopArt normalized-target critic (DDPG_simple_with_tricks.py:95-187);
  - discrete-action variant via a softmax actor
    (DDPG_simple_add_discrete.py:79-90) — the critic consumes action
    probabilities so the actor update stays differentiable.

TPU-native: the whole learn step (sample gather, twin forwards, both Adam
updates, polyak, PopArt rescale) is one fused XLA program; exploration noise
is vectorized over the env batch with explicit keys instead of stateful
np.random.
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
from freerl_tpu.core.normalization import PopArt, RunningMeanStd
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.nets.mlp import Dense


# ---------------------------------------------------------------------------
# Networks
# ---------------------------------------------------------------------------
class TanhActor(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (128, 128)
    max_action: float = 1.0
    scheme: str = "torch"      # 'torch' or 'ddpg' (fan-in + final U(3e-3))

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = Dense(h, scheme="torch" if self.scheme == "torch" else "fanin")(x)
            x = nn.relu(x)
        out_scheme = "torch" if self.scheme == "torch" else "final"
        x = Dense(self.action_dim, scheme=out_scheme)(x)
        return jnp.tanh(x) * self.max_action


class SoftmaxActor(nn.Module):
    """Discrete DDPG actor: action probabilities (reference Actor_discrete).

    ``logits_out=True`` skips the softmax — the gumbel variant
    (DDPG_simple_add_discrete_gumbel(lose).py) acts on raw logits.
    """

    action_dim: int
    hidden: Sequence[int] = (128, 128)
    scheme: str = "torch"
    logits_out: bool = False

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = Dense(h, scheme="torch" if self.scheme == "torch" else "fanin")(x)
            x = nn.relu(x)
        out_scheme = "torch" if self.scheme == "torch" else "final"
        logits = Dense(self.action_dim, scheme=out_scheme)(x)
        if self.logits_out:
            return logits
        return jax.nn.softmax(logits, axis=-1)


def gumbel_softmax(key, logits, temperature=1.0, hard=True):
    """Categorical reparameterization (Jang et al. 2016; the reference's
    misc.gumbel_softmax). ``hard=True`` is the straight-through one-hot:
    forward pass is argmax, gradients flow through the soft sample."""
    g = jax.random.gumbel(key, logits.shape)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1])
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y


class QCritic(nn.Module):
    """Q(obs, act) -> scalar."""

    hidden: Sequence[int] = (128, 128)
    scheme: str = "torch"

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        for h in self.hidden:
            x = Dense(h, scheme="torch" if self.scheme == "torch" else "fanin")(x)
            x = nn.relu(x)
        out_scheme = "torch" if self.scheme == "torch" else "final"
        return Dense(1, scheme=out_scheme)(x).squeeze(-1)


# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    """Defaults mirror DDPG_file/DDPG.py argparse (:415-466)."""

    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 64
    buffer_size: int = 1_000_000
    hidden: Sequence[int] = (128, 128)
    grad_clip: float = 0.5
    num_envs: int = 1              # env batch (for OU noise state shape)
    # exploration
    gauss_sigma: float = 0.1
    noise_init_scale: Optional[float] = None   # None -> constant scale 1
    noise_final_scale: float = 0.0
    noise_decay_episodes: int = 500
    # supplements (reference ``supplement`` dict)
    weight_decay: bool = False     # critic Adam weight decay 1e-3
    ou_noise: bool = False
    obs_norm: bool = False         # Welford running obs normalization
    net_init: bool = False         # DDPG paper fan-in/final-uniform init
    # tricks
    popart: bool = False
    # discrete variant: gumbel-softmax straight-through actor instead of
    # the softmax-probability actor (the reference kept its attempt as
    # DDPG_simple_add_discrete_gumbel(lose).py — its softmax variant won)
    discrete_gumbel: bool = False
    gumbel_temperature: float = 1.0
    # OU parameters (reference defaults)
    ou_theta: float = 0.15
    ou_sigma: float = 1.0
    ou_dt: float = 1.0
    axis_name: Optional[str] = None


@struct.dataclass
class DDPGState:
    actor_params: dict
    actor_target: dict
    critic_params: dict
    critic_target: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    ou_state: jnp.ndarray            # (num_envs, action_dim)
    obs_rms: RunningMeanStd
    popart: PopArt
    step: jnp.ndarray


class DDPG(OffPolicyAlgo):
    def __init__(self, dim_info: DimInfo, cfg: DDPGConfig = DDPGConfig()):
        self.dim_info = dim_info
        self.cfg = cfg
        scheme = "ddpg" if cfg.net_init else "torch"
        if dim_info.is_continue:
            self.actor = TanhActor(
                dim_info.action_dim, tuple(cfg.hidden), dim_info.max_action,
                scheme,
            )
        else:
            self.actor = SoftmaxActor(
                dim_info.action_dim, tuple(cfg.hidden), scheme,
                logits_out=cfg.discrete_gumbel,
            )
        self.critic = QCritic(tuple(cfg.hidden), scheme)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(cfg.actor_lr, eps=1e-8),
        )
        if cfg.weight_decay:
            self.critic_tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adamw(cfg.critic_lr, eps=1e-8, weight_decay=1e-3),
            )
        else:
            self.critic_tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adam(cfg.critic_lr, eps=1e-8),
            )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> DDPGState:
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        act = jnp.zeros((1, self.dim_info.action_dim))
        actor_params = self.actor.init(ka, obs)["params"]
        critic_params = self.critic.init(kc, obs, act)["params"]
        return DDPGState(
            actor_params=actor_params,
            actor_target=actor_params,
            critic_params=critic_params,
            critic_target=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            ou_state=jnp.zeros(
                (self.cfg.num_envs, self.dim_info.action_dim)
            ),
            obs_rms=RunningMeanStd.create((self.dim_info.obs_dim,)),
            popart=PopArt.create(()),
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

    def select_action(self, state: DDPGState, obs):
        return self.actor.apply({"params": state.actor_params}, obs)

    def evaluate_action(self, state: DDPGState, obs):
        # offline eval feeds RAW observations; the ObsNorm supplement
        # trained the actor on normalized ones (saved running stats)
        if self.cfg.obs_norm:
            obs = state.obs_rms.normalize(obs)
        a = self.select_action(state, obs)
        if not self.dim_info.is_continue:
            return jnp.argmax(a, axis=-1)
        return a

    def explore(self, state: DDPGState, obs, key, ctx: ExploreCtx):
        cfg = self.cfg
        b = obs.shape[0]
        adim = self.dim_info.action_dim
        max_a = self.dim_info.max_action
        k_n, k_r, k_c = jax.random.split(key, 3)
        scale = self._noise_scale(ctx.episodes)

        if not self.dim_info.is_continue:
            out = self.select_action(state, obs)
            # softmax actor emits probs; gumbel actor emits logits —
            # categorical-over-logits IS the gumbel-max sample (:152)
            logits = out if cfg.discrete_gumbel else jnp.log(out + 1e-8)
            action = jax.random.categorical(k_c, logits)
            if ctx.random_steps > 0:
                rand = jax.random.randint(k_r, (b,), 0, adim)
                action = jnp.where(
                    ctx.total_env_steps < ctx.random_steps, rand, action
                )
            return state, action

        a = self.select_action(state, obs)
        if cfg.ou_noise:
            # reset where an episode just ended (reference resets per episode)
            ou = jnp.where(ctx.done_prev[:, None], 0.0, state.ou_state)
            dx = cfg.ou_theta * (0.0 - ou) + jnp.sqrt(cfg.ou_dt) * (
                cfg.ou_sigma * jax.random.normal(k_n, ou.shape)
            )
            ou = ou + dx
            noise = ou * scale
            state = state.replace(ou_state=ou)
        else:
            noise = (
                cfg.gauss_sigma * scale
                * jax.random.normal(k_n, (b, adim))
            )
        action = jnp.clip(a + noise, -max_a, max_a)
        if ctx.random_steps > 0:
            rand = jax.random.uniform(k_r, (b, adim), jnp.float32,
                                      -max_a, max_a)
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    def stored_action_example(self):
        """Discrete DDPG stores a VECTOR action (behavior probs for the
        softmax variant :412 'action = probs'; the hard gumbel one-hot
        for the gumbel variant), not the env index."""
        return jnp.zeros((self.dim_info.action_dim,), jnp.float32)

    def explore_stored(self, state: DDPGState, obs, key, ctx: ExploreCtx):
        """(state, env_action, stored_action) — consumed by the off-policy
        driver when present. Continuous: stored == env action. Discrete:
        env acts on a sampled index, the buffer keeps the probs / one-hot
        the critic trains on (reference DDPG_simple_add_discrete.py:412,
        DDPG_simple_add_discrete_gumbel(lose).py:152)."""
        state, action = self.explore(state, obs, key, ctx)
        if self.dim_info.is_continue:
            return state, action, action
        if self.cfg.discrete_gumbel:
            stored = jax.nn.one_hot(action, self.dim_info.action_dim)
        else:
            stored = self.select_action(state, obs)      # behavior probs
        return state, action, stored

    # ------------------------------------------------------------------
    def process_obs(self, state: DDPGState, next_obs, carry_obs):
        if not self.cfg.obs_norm:
            return state, next_obs, carry_obs
        # axis_name: global-batch moments under the dp sharded driver
        rms = state.obs_rms.update(next_obs, axis_name=self.cfg.axis_name)
        return (
            state.replace(obs_rms=rms),
            rms.normalize(next_obs),
            rms.normalize(carry_obs),
        )

    # ------------------------------------------------------------------
    def _critic_out_path(self, params):
        """Key of the critic's final Dense (for PopArt rescaling)."""
        last = sorted(params.keys())[-1]
        return last

    def update(self, state: DDPGState, batch: Transition, key=None):
        cfg = self.cfg
        reward = batch.reward.reshape(-1)
        done = batch.done.reshape(-1).astype(jnp.float32)
        adim = self.dim_info.action_dim
        if (not self.dim_info.is_continue
                and (batch.action.ndim < 2 or batch.action.shape[-1] != adim)):
            # index-stored batches (direct update() calls in tests); the
            # driver path stores vector actions via explore_stored
            action = jax.nn.one_hot(
                batch.action.reshape(-1).astype(jnp.int32), adim
            )
        else:
            action = batch.action.reshape(-1, adim)

        gumbel = (not self.dim_info.is_continue) and cfg.discrete_gumbel
        if gumbel:
            k_new = key if key is not None else jax.random.PRNGKey(0)

        # --- critic ----------------------------------------------------
        next_action = self.actor.apply(
            {"params": state.actor_target}, batch.next_obs
        )
        if gumbel:
            # target logits -> DETERMINISTIC one-hot (the reference's
            # onehot_from_logits(eps=0), :190 — not a gumbel sample)
            next_action = jax.nn.one_hot(
                jnp.argmax(next_action, axis=-1), self.dim_info.action_dim
            )
        next_q = self.critic.apply(
            {"params": state.critic_target}, batch.next_obs, next_action
        )
        if cfg.popart:
            next_q = state.popart.denormalize(next_q)
        target = reward + cfg.gamma * next_q * (1.0 - done)
        target = jax.lax.stop_gradient(target)

        popart = state.popart
        critic_params = state.critic_params
        if cfg.popart:
            popart, scale, shift = state.popart.adapt(target)
            # preserve outputs: rescale the critic head (and target head)
            def rescale(params):
                p = dict(params)
                head_key = self._critic_out_path(p)
                inner = dict(p[head_key])
                dkey = next(iter(inner))
                lin = dict(inner[dkey])
                lin["kernel"] = lin["kernel"] * scale
                lin["bias"] = lin["bias"] * scale + shift
                inner[dkey] = lin
                p[head_key] = inner
                return p

            critic_params = rescale(state.critic_params)
            critic_target = rescale(state.critic_target)
            target_n = popart.normalize(target)
        else:
            critic_target = state.critic_target
            target_n = target

        def critic_loss_fn(params):
            q = self.critic.apply({"params": params}, batch.obs, action)
            return jnp.mean(jnp.square(q - target_n))

        critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            critic_params
        )
        if cfg.axis_name is not None:
            c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, critic_params
        )
        critic_params = optax.apply_updates(critic_params, c_updates)

        # --- actor -----------------------------------------------------
        def actor_loss_fn(params):
            a = self.actor.apply({"params": params}, batch.obs)
            if gumbel:
                # straight-through hard sample, temperature 1 (:206)
                a = gumbel_softmax(k_new, a, 1.0, hard=True)
            q = self.critic.apply({"params": critic_params}, batch.obs, a)
            return -jnp.mean(q)

        actor_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params
        )
        if cfg.axis_name is not None:
            a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
        a_updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        new_state = state.replace(
            actor_params=actor_params,
            actor_target=polyak(state.actor_target, actor_params, cfg.tau),
            critic_params=critic_params,
            critic_target=polyak(critic_target, critic_params, cfg.tau),
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            popart=popart,
            step=state.step + 1,
        )
        metrics = {"critic_loss": critic_loss, "actor_loss": actor_loss}
        return new_state, metrics, None
