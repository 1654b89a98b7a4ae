"""MAPPO (12-trick set) and IPPO on the agent-axis rollout.

Parity surface (MAPPO_file/MAPPO.py, MAPPO_discrete.py, IPPO.py):
  - separated parameters: per-agent actor over own obs; per-agent
    CENTRALIZED V-critic over concat of all agents' obs (Critic:188-218);
  - joint GAE over agent-stacked rewards (learn:357-386) — each agent's
    surrogate broadcasts its scalar ratio against the (mb, n_agents)
    advantage, and its critic output is repeated across the agent axis
    against the joint v_target (:415-436), exactly as the reference does;
  - trick set {adv_norm, ObsNorm, reward_norm, reward_scaling,
    orthogonal_init (calculated gain), adam_eps (merged Adam eps 1e-5,
    Agent:230), lr_decay, ValueClip, huber_loss (delta 10), LayerNorm,
    feature_norm} (:600-607);
  - hyperparams: horizon 256, minibatch 256, K_epochs 15, gamma 0.95,
    clip 0.2, entropy 0.01 (:573-597); converged lr 5e-4
    (README.md:149-158);
  - IPPO (IPPO.py): per-agent critic on OWN obs, per-agent GAE on own
    reward — for competitive envs (simple_adversary/tag).

The agent loop unrolls at trace time; the full learn (GAE + per-agent
K-epoch minibatch loops) is one jitted program.
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
from freerl_tpu.algos.common import huber as huber_fn
from freerl_tpu.core.normalization import RewardScaling, RunningMeanStd
from freerl_tpu.envs.base import Env
from freerl_tpu.nets import distributions as D
from freerl_tpu.nets.mlp import Dense


class MLPTrunk(nn.Module):
    """Hidden trunk with the MAPPO LayerNorm / feature_norm tricks."""

    hidden: Sequence[int]
    orthogonal: bool = False
    layer_norm: bool = False
    feature_norm: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        act = jnp.tanh if self.activation == "tanh" else nn.relu
        scheme = "orthogonal" if self.orthogonal else "torch"
        if self.feature_norm:
            x = nn.LayerNorm()(x)
        for h in self.hidden:
            x = Dense(h, scheme=scheme)(x)
            if self.layer_norm:
                x = nn.LayerNorm()(x)
            x = act(x)
        return x


class AgentActor(nn.Module):
    action_dim: int
    is_continue: bool
    hidden: Sequence[int] = (128, 128)
    orthogonal: bool = False
    layer_norm: bool = False
    feature_norm: bool = False

    @nn.compact
    def __call__(self, x):
        x = MLPTrunk(self.hidden, self.orthogonal, self.layer_norm,
                     self.feature_norm)(x)
        scheme = "orthogonal" if self.orthogonal else "torch"
        out = Dense(self.action_dim, scheme=scheme, gain=0.01)(x)
        if not self.is_continue:
            return out  # logits
        mean = jnp.tanh(out)
        log_std = self.param(
            "log_std", nn.initializers.zeros_init(), (self.action_dim,)
        )
        return mean, jnp.broadcast_to(log_std, mean.shape)


class SharedAttnVCritics(nn.Module):
    """MAPPO_attention's centralized critics: per-agent obs encoders, ONE
    shared attention block across agents (MAPPO_file/MAPPO_attention.py
    :250-254, attention.py:85-135), per-agent V heads.

    Returns (B, A) values for all agents in one call.
    """

    obs_dims: Sequence[int]
    attention_dim: int = 128
    num_heads: int = 4
    hidden: int = 128

    def setup(self):
        from freerl_tpu.algos.maac import SharedAttention

        A = len(self.obs_dims)
        self.attn = SharedAttention(self.attention_dim, self.num_heads)
        self.encoders = [
            Dense(self.attention_dim, name=f"enc_{i}") for i in range(A)
        ]
        self.fc1 = [Dense(self.hidden, name=f"fc1_{i}") for i in range(A)]
        self.heads = [Dense(1, name=f"v_{i}") for i in range(A)]

    def __call__(self, obs_list):
        A = len(self.obs_dims)
        embs = [
            nn.leaky_relu(self.encoders[i](obs_list[i])) for i in range(A)
        ]
        vs = []
        for i in range(A):
            others = jnp.stack(
                [embs[j] for j in range(A) if j != i], axis=1
            )
            attn_out = self.attn(embs[i][:, None, :], others)
            h = nn.relu(self.fc1[i](jnp.concatenate(
                [embs[i], attn_out], axis=-1
            )))
            vs.append(self.heads[i](h).squeeze(-1))
        return jnp.stack(vs, axis=-1)


class AgentVCritic(nn.Module):
    hidden: Sequence[int] = (128, 128)
    orthogonal: bool = False
    layer_norm: bool = False
    feature_norm: bool = False

    @nn.compact
    def __call__(self, x):
        x = MLPTrunk(self.hidden, self.orthogonal, self.layer_norm,
                     self.feature_norm)(x)
        scheme = "orthogonal" if self.orthogonal else "torch"
        return Dense(1, scheme=scheme, gain=1.0)(x).squeeze(-1)


@dataclasses.dataclass(frozen=True)
class MAPPOConfig:
    actor_lr: float = 5e-4
    critic_lr: float = 5e-4
    gamma: float = 0.95
    lmbda: float = 0.95
    clip_param: float = 0.2
    K_epochs: int = 15
    entropy_coefficient: float = 0.01
    horizon: int = 256
    minibatch_size: int = 256
    hidden: Sequence[int] = (128, 128)
    num_envs: int = 1
    huber_delta: float = 10.0
    independent: bool = False       # IPPO mode
    # per-net grad-norm clip. The reference's MAPPO has its clip lines
    # commented out (MAPPO.py:244-268 '###') — so MAPPO defaults to
    # None — while IPPO actively clips at 0.5 (IPPO.py:174-180); the
    # IPPO() factory sets this.
    max_grad_norm: Optional[float] = None
    # tricks (MAPPO.py:600-607)
    adv_norm: bool = False
    obs_norm: bool = False
    reward_norm: bool = False
    reward_scaling: bool = False
    orthogonal_init: bool = False
    adam_eps: bool = False          # merged Adam eps 1e-5
    lr_decay: bool = False
    lr_decay_episodes: int = 200
    value_clip: bool = False
    huber_loss: bool = False
    layer_norm: bool = False
    feature_norm: bool = False
    # MAPPO_attention's improvement={'attention': True}: the centralized
    # critics share one attention block over per-agent obs embeddings
    attention: bool = False
    attention_heads: int = 4
    # mask-action mode (MAPPO_for_mask_action.py CategoricalMasked :191):
    # the env appends the 0/1 availability mask to each agent's obs
    # (envs/masked.py); invalid logits are pushed to -1e8 and their
    # entropy terms zeroed
    masked: bool = False
    mask_dim: int = 0
    # state-augmented centralized critic
    # (MAPPO_file/MAPPO_for_mask_action_state.py:122-130): the env's
    # GLOBAL state (SMAC env.get_state(), NOT the obs concat) rides in
    # each agent's obs as [raw_obs, state, mask]; actors see raw+mask
    # only (the reference actor input is the agent obs, :100-120) while
    # the centralized critic input is concat(raw+mask per agent) with
    # the state appended ONCE (global_obs_dim += state_dim, :127).
    state_dim: int = 0
    axis_name: Optional[str] = None

    def __post_init__(self):
        # reference validators (MAPPO.py:612-627 consistency rules)
        if self.reward_norm and self.reward_scaling:
            raise ValueError(
                "reward_norm and reward_scaling cannot both be on"
            )
        if self.masked and self.mask_dim <= 0:
            raise ValueError("masked mode needs mask_dim > 0")
        if self.attention and self.independent:
            raise ValueError("attention critic is centralized")
        if self.state_dim > 0 and (self.independent or self.attention):
            raise ValueError(
                "state-augmented critic is the plain centralized variant "
                "(reference MAPPO_for_mask_action_state.py supports only "
                "use_state=True there)"
            )


@struct.dataclass
class MAPPOState:
    actor_params: tuple
    critic_params: tuple
    opt_states: tuple
    obs_rms: RunningMeanStd
    rew_rms: RunningMeanStd
    rew_scale: RewardScaling
    step: jnp.ndarray


@struct.dataclass
class MARollout:
    obs: jnp.ndarray        # (T, N, A, O_pad)
    action: jnp.ndarray     # (T, N, A, act) or (T, N, A) ints
    log_pi: jnp.ndarray     # (T, N, A)
    reward: jnp.ndarray     # (T, N, A)
    next_obs: jnp.ndarray
    done: jnp.ndarray       # (T, N)
    adv_done: jnp.ndarray   # (T, N)


class MAPPO:
    def __init__(self, env: Env, cfg: MAPPOConfig = MAPPOConfig()):
        # variant-specific reference grad-clip defaults when unset:
        # MAPPO.py's clips are commented out (None), but
        # MAPPO_attention.py clips each net at 0.5 and MAPPO_discrete.py
        # clips the merged group at 10
        if cfg.max_grad_norm is None:
            if cfg.attention:
                cfg = dataclasses.replace(cfg, max_grad_norm=0.5)
            elif not env.dim_info.is_continue:
                cfg = dataclasses.replace(cfg, max_grad_norm=10.0)
        self.cfg = cfg
        self.n_agents = env.n_agents
        self.obs_dims = tuple(env.agent_obs_dims)
        self.act_dims = tuple(env.agent_act_dims)
        self.act_pad = max(self.act_dims)
        self.is_continue = env.dim_info.is_continue
        self.obs_pad = env.dim_info.obs_dim
        hid = tuple(cfg.hidden)
        kw = dict(
            hidden=hid, orthogonal=cfg.orthogonal_init,
            layer_norm=cfg.layer_norm, feature_norm=cfg.feature_norm,
        )
        self.actors = [
            AgentActor(self.act_dims[i], self.is_continue, **kw)
            for i in range(self.n_agents)
        ]
        if cfg.attention:
            assert not cfg.independent, "attention critic is centralized"
            self.att_critics = SharedAttnVCritics(
                self.obs_dims, num_heads=cfg.attention_heads
            )
            self.critics = None
        else:
            self.critics = [AgentVCritic(**kw) for _ in range(self.n_agents)]
        eps = 1e-5 if cfg.adam_eps else 1e-8
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.actor_lr, eps=eps
        )
        # homogeneous agent dims allow the stacked (vmap-over-agents)
        # actor/critic fast paths in sample_action/update
        self._stackable = (
            not cfg.attention
            and len(set(self.obs_dims)) == 1
            and len(set(self.act_dims)) == 1
        )

    # ------------------------------------------------------------------
    def _agent_obs(self, obs, i):
        return obs[..., i, : self.obs_dims[i]]

    def _actor_obs(self, obs, i):
        """Actor input: the agent obs with the global-state slice (layout
        [raw_obs, state, mask]) removed — the reference actor consumes
        only the agent's own obs (MAPPO_for_mask_action_state.py:100)."""
        o = self._agent_obs(obs, i)
        s = self.cfg.state_dim
        if s == 0:
            return o
        m = self.cfg.mask_dim
        if m == 0:
            return o[..., :-s]
        return jnp.concatenate([o[..., : -(s + m)], o[..., -m:]], axis=-1)

    def _global_state(self, obs):
        """The once-per-env global state, sliced from agent 0's obs."""
        s, m = self.cfg.state_dim, self.cfg.mask_dim
        o = self._agent_obs(obs, 0)
        return o[..., -(s + m): -m] if m else o[..., -s:]

    def _pad_act(self, a, i):
        """Zero-pad agent i's continuous action to the common padded
        width (heterogeneous act dims, e.g. simple_world_comm's 9-dim
        leader vs 5-dim others); learn() slices back per agent."""
        extra = self.act_pad - self.act_dims[i]
        if extra == 0:
            return a
        pad = [(0, 0)] * (a.ndim - 1) + [(0, extra)]
        return jnp.pad(a, pad)

    def _critic_input(self, obs, i):
        if self.cfg.independent:
            return self._agent_obs(obs, i)
        parts = [self._actor_obs(obs, j) for j in range(self.n_agents)]
        if self.cfg.state_dim > 0:
            # the global state joins the concat ONCE (reference
            # Critic.forward: cat([concat_obs, state]) — :140-143)
            parts.append(self._global_state(obs))
        return jnp.concatenate(parts, axis=-1)

    def _obs_list(self, obs):
        return [self._agent_obs(obs, j) for j in range(self.n_agents)]

    def init(self, key: jax.Array) -> MAPPOState:
        keys = jax.random.split(key, 2 * self.n_agents)
        a_params, c_params, opts = [], [], []
        sdim = self.cfg.state_dim
        for i in range(self.n_agents):
            a_params.append(self.actors[i].init(
                keys[2 * i], jnp.zeros((1, self.obs_dims[i] - sdim))
            )["params"])
            if self.cfg.attention:
                # one shared attention-critic tree, carried in slot 0
                c_params.append(
                    self.att_critics.init(
                        keys[1], [jnp.zeros((1, d)) for d in self.obs_dims]
                    )["params"] if i == 0 else {}
                )
            else:
                cdim = (
                    self.obs_dims[i] if self.cfg.independent
                    # per-agent slices lose their state copy; it joins once
                    else sum(self.obs_dims) - sdim * self.n_agents + sdim
                )
                c_params.append(self.critics[i].init(
                    keys[2 * i + 1], jnp.zeros((1, cdim))
                )["params"])
            opts.append(self.tx.init(
                {"actor": a_params[-1], "critic": c_params[-1]}
            ))
        return MAPPOState(
            actor_params=tuple(a_params),
            critic_params=tuple(c_params),
            opt_states=tuple(opts),
            obs_rms=RunningMeanStd.create((self.n_agents, self.obs_pad)),
            rew_rms=RunningMeanStd.create((self.n_agents,)),
            rew_scale=RewardScaling.create(
                self.cfg.num_envs * self.n_agents, self.cfg.gamma
            ),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _logp_ent(self, params, obs_i, action_i, i):
        out = self.actors[i].apply({"params": params}, obs_i)
        if not self.is_continue:
            if self.cfg.masked:
                mask = obs_i[..., -self.cfg.mask_dim:]
                out = D.masked_logits(out, mask)
                return (
                    D.categorical_log_prob(out, action_i),
                    D.masked_categorical_entropy(out, mask),
                )
            return (
                D.categorical_log_prob(out, action_i),
                D.categorical_entropy(out),
            )
        mean, log_std = out
        std = jnp.exp(log_std)
        return (
            D.normal_log_prob(mean, std, action_i),
            D.normal_entropy(std),
        )

    def sample_action(self, state: MAPPOState, obs, key):
        """obs (..., A, O_pad) -> (env_action, stored, logp (..., A))."""
        if self._stackable:
            return self._sample_action_stacked(state, obs, key)
        env_as, stored, logps = [], [], []
        for i in range(self.n_agents):
            k = jax.random.fold_in(key, i)
            out = self.actors[i].apply(
                {"params": state.actor_params[i]}, self._actor_obs(obs, i)
            )
            if not self.is_continue:
                if self.cfg.masked:
                    out = D.masked_logits(
                        out, self._actor_obs(obs, i)[..., -self.cfg.mask_dim:]
                    )
                a = jax.random.categorical(k, out)
                logp = D.categorical_log_prob(out, a)
                env_as.append(a)
                stored.append(a)
            else:
                mean, log_std = out
                std = jnp.exp(log_std)
                a = D.normal_sample(k, mean, std)
                logp = D.normal_log_prob(mean, std, a)
                env_as.append(self._pad_act(jnp.clip(a, -1.0, 1.0), i))
                stored.append(self._pad_act(a, i))
            logps.append(logp)
        stack = lambda xs: jnp.stack(xs, axis=-2 if self.is_continue else -1)
        return stack(env_as), stack(stored), jnp.stack(logps, axis=-1)

    def _sample_action_stacked(self, state: MAPPOState, obs, key):
        """Homogeneous-dims fast path: all A actor passes as one batched
        matmul per layer (vmap over stacked params), same per-agent
        fold_in keys as the loop path."""
        A = self.n_agents
        a_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *state.actor_params)
        keys = jnp.stack([jax.random.fold_in(key, i) for i in range(A)])
        aobs = jnp.stack([self._actor_obs(obs, i) for i in range(A)])

        def one(params, obs_i, k):
            out = self.actors[0].apply({"params": params}, obs_i)
            if not self.is_continue:
                if self.cfg.masked:
                    out = D.masked_logits(
                        out, obs_i[..., -self.cfg.mask_dim:]
                    )
                a = jax.random.categorical(k, out)
                return a, a, D.categorical_log_prob(out, a)
            mean, log_std = out
            std = jnp.exp(log_std)
            a = D.normal_sample(k, mean, std)
            logp = D.normal_log_prob(mean, std, a)
            return jnp.clip(a, -1.0, 1.0), a, logp

        env_a, stored, logp = jax.vmap(one)(a_stack, aobs, keys)
        ax = -2 if self.is_continue else -1
        mv = lambda x: jnp.moveaxis(x, 0, ax)
        return mv(env_a), mv(stored), jnp.moveaxis(logp, 0, -1)

    def evaluate_action(self, state: MAPPOState, obs):
        # offline eval feeds RAW observations (eval.py); with ObsNorm the
        # actors were trained on normalized ones
        if self.cfg.obs_norm:
            obs = state.obs_rms.normalize(obs)
        outs = []
        for i in range(self.n_agents):
            aobs = self._actor_obs(obs, i)
            out = self.actors[i].apply(
                {"params": state.actor_params[i]}, aobs
            )
            if not self.is_continue:
                if self.cfg.masked:
                    # eval must honor availability exactly like the
                    # sampling path — an argmax over raw logits could
                    # pick a masked-out action
                    out = D.masked_logits(
                        out, aobs[..., -self.cfg.mask_dim:]
                    )
                outs.append(jnp.argmax(out, axis=-1))
            else:
                outs.append(self._pad_act(out[0], i))
        return jnp.stack(outs, axis=-2 if self.is_continue else -1)

    # trick hooks -------------------------------------------------------
    # axis_name keeps the running stats replicated under the
    # data-parallel shard_map driver (global-batch pmean moments) — see
    # core/normalization.py RunningMeanStd.update.
    def process_obs(self, state: MAPPOState, next_obs, carry_obs):
        if not self.cfg.obs_norm:
            return state, next_obs, carry_obs
        rms = state.obs_rms.update(next_obs, axis_name=self.cfg.axis_name)
        return (
            state.replace(obs_rms=rms),
            rms.normalize(next_obs),
            rms.normalize(carry_obs),
        )

    def process_reward(self, state: MAPPOState, reward, episode_done):
        if self.cfg.reward_scaling:
            flat = reward.reshape(-1)
            ep = jnp.broadcast_to(
                episode_done[:, None], reward.shape
            ).reshape(-1)
            rs, scaled = state.rew_scale(flat, ep,
                                         axis_name=self.cfg.axis_name)
            return state.replace(rew_scale=rs), scaled.reshape(reward.shape)
        if self.cfg.reward_norm:
            rms = state.rew_rms.update(reward,
                                       axis_name=self.cfg.axis_name)
            return state.replace(rew_rms=rms), rms.normalize(reward)
        return state, reward

    # ------------------------------------------------------------------
    def update(self, state: MAPPOState, rollout: MARollout, key,
               episodes=None):
        cfg = self.cfg
        A = self.n_agents
        T, N = rollout.reward.shape[:2]
        B = T * N
        mb = min(cfg.minibatch_size, B)
        n_mb = B // mb

        # stacked-agent fast path (TPU: one batched matmul per layer for
        # all agents instead of A small ones — the per-agent python loop
        # was the measured MARL update bottleneck): legal whenever agent
        # dims are homogeneous, since every agent's loss touches only its
        # own params (MAPPO updates agents simultaneously, unlike HAPPO)
        use_stacked = self._stackable

        # per-agent values over the joint (or own) obs
        if cfg.attention:
            vs = self.att_critics.apply(
                {"params": state.critic_params[0]},
                self._obs_list(rollout.obs.reshape((-1, A,
                                                    rollout.obs.shape[-1]))),
            ).reshape(T, N, A)
            vs_next = self.att_critics.apply(
                {"params": state.critic_params[0]},
                self._obs_list(rollout.next_obs.reshape(
                    (-1, A, rollout.next_obs.shape[-1])
                )),
            ).reshape(T, N, A)
        elif use_stacked:
            c_stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs), *state.critic_params
            )
            if cfg.independent:
                cin = jnp.stack(
                    [self._critic_input(rollout.obs, i) for i in range(A)]
                )
                cin_next = jnp.stack([
                    self._critic_input(rollout.next_obs, i)
                    for i in range(A)
                ])
                in_ax = (0, 0)
            else:
                # the centralized critic input is identical for every
                # agent — broadcast it, vmap over params only
                cin = self._critic_input(rollout.obs, 0)
                cin_next = self._critic_input(rollout.next_obs, 0)
                in_ax = (0, None)
            apply_v = jax.vmap(
                lambda p, x: self.critics[0].apply({"params": p}, x),
                in_axes=in_ax,
            )
            vs = jnp.moveaxis(apply_v(c_stacked, cin), 0, -1)  # (T, N, A)
            vs_next = jnp.moveaxis(apply_v(c_stacked, cin_next), 0, -1)
        else:
            vs = jnp.stack([
                self.critics[i].apply(
                    {"params": state.critic_params[i]},
                    self._critic_input(rollout.obs, i),
                )
                for i in range(A)
            ], axis=-1)                                # (T, N, A)
            vs_next = jnp.stack([
                self.critics[i].apply(
                    {"params": state.critic_params[i]},
                    self._critic_input(rollout.next_obs, i),
                )
                for i in range(A)
            ], axis=-1)

        done = rollout.done.astype(jnp.float32)[..., None]
        adv_done = rollout.adv_done.astype(jnp.float32)[..., None]
        deltas = rollout.reward + cfg.gamma * (1.0 - done) * vs_next - vs

        def scan_fn(g, x):
            d, ad = x
            g = d + cfg.gamma * cfg.lmbda * (1.0 - ad) * g
            return g, g

        _, adv = jax.lax.scan(
            scan_fn, jnp.zeros_like(deltas[0]), (deltas, adv_done),
            reverse=True,
        )
        v_target = adv + vs
        if cfg.adv_norm:
            if cfg.axis_name is not None:
                m = jax.lax.pmean(jnp.mean(adv), cfg.axis_name)
                sq = jax.lax.pmean(
                    jnp.mean(jnp.square(adv)), cfg.axis_name
                )
                std = jnp.sqrt(jnp.maximum(sq - jnp.square(m), 0.0))
                adv = (adv - m) / (std + 1e-8)
            else:
                adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        obs_f = rollout.obs.reshape((B, A, -1))
        act_f = (
            rollout.action.reshape((B, A, -1))
            if self.is_continue else rollout.action.reshape((B, A))
        )
        logp_old_f = rollout.log_pi.reshape((B, A))
        adv_f = jax.lax.stop_gradient(adv.reshape((B, A)))
        vt_f = jax.lax.stop_gradient(v_target.reshape((B, A)))

        if cfg.lr_decay and episodes is not None:
            frac = jnp.maximum(
                1.0 - episodes.astype(jnp.float32) / cfg.lr_decay_episodes,
                1e-3,
            )
        else:
            frac = 1.0

        if use_stacked:
            return self._update_stacked(
                state, cfg, A, B, mb, n_mb, obs_f, act_f, logp_old_f,
                adv_f, vt_f, frac, key,
            )

        actor_params = list(state.actor_params)
        critic_params = list(state.critic_params)
        opt_states = list(state.opt_states)

        for i in range(A):
            act_i = act_f[:, i] if not self.is_continue else act_f[:, i, : self.act_dims[i]]

            def loss_fn(params, idx):
                logp, ent = self._logp_ent(
                    params["actor"], self._actor_obs(obs_f[idx], i),
                    act_i[idx], i,
                )
                ratio = jnp.exp(logp - logp_old_f[idx, i])
                if cfg.independent:
                    adv_i = adv_f[idx, i]
                else:
                    adv_i = adv_f[idx]            # (mb, A): joint broadcast
                    ratio = ratio[:, None]
                surr1 = ratio * adv_i
                surr2 = jnp.clip(
                    ratio, 1 - cfg.clip_param, 1 + cfg.clip_param
                ) * adv_i
                actor_loss = -jnp.mean(jnp.minimum(surr1, surr2)) - (
                    cfg.entropy_coefficient * jnp.mean(ent)
                )
                if cfg.attention:
                    if i == 0:
                        # shared attention critic trains once, jointly
                        v = self.att_critics.apply(
                            {"params": params["critic"]},
                            self._obs_list(obs_f[idx]),
                        )                          # (mb, A)
                        vt = vt_f[idx]
                    else:
                        return actor_loss          # actor-only for i > 0
                else:
                    v = self.critics[i].apply(
                        {"params": params["critic"]},
                        self._critic_input(obs_f[idx], i),
                    )
                    if cfg.independent:
                        vt = vt_f[idx, i]
                    else:
                        v = v[:, None]            # repeat over agent axis
                        vt = vt_f[idx]
                if cfg.value_clip:
                    vt_clip = jnp.clip(
                        vt, v - cfg.clip_param, v + cfg.clip_param
                    )
                    if cfg.huber_loss:
                        c1 = jnp.mean(huber_fn(vt - v, cfg.huber_delta))
                        c2 = jnp.mean(huber_fn(vt_clip - v, cfg.huber_delta))
                    else:
                        c1 = jnp.mean(jnp.square(vt - v))
                        c2 = jnp.mean(jnp.square(vt_clip - v))
                    critic_loss = jnp.maximum(c1, c2)
                elif cfg.huber_loss:
                    critic_loss = jnp.mean(huber_fn(vt - v, cfg.huber_delta))
                else:
                    critic_loss = jnp.mean(jnp.square(vt - v))
                return actor_loss + critic_loss

            def epoch_body(e, carry):
                params, opt_state, k = carry
                k, k_perm = jax.random.split(k)
                perm = jax.random.permutation(k_perm, B)

                def mb_body(m, inner):
                    params, opt_state = inner
                    idx = jax.lax.dynamic_slice_in_dim(perm, m * mb, mb)
                    grads = jax.grad(loss_fn)(params, idx)
                    if cfg.axis_name is not None:
                        grads = jax.lax.pmean(grads, cfg.axis_name)
                    if cfg.max_grad_norm is not None:
                        # IPPO clips each net at 0.5 (IPPO.py:174-180);
                        # on the stacked path the clip group spans the
                        # stacked agent axis
                        grads = {
                            k: clip_grads_by_norm(v, cfg.max_grad_norm)
                            for k, v in grads.items()
                        }
                    opt_state.hyperparams["learning_rate"] = (
                        cfg.actor_lr * frac
                    )
                    updates, opt_state = self.tx.update(
                        grads, opt_state, params
                    )
                    return optax.apply_updates(params, updates), opt_state

                params, opt_state = jax.lax.fori_loop(
                    0, n_mb, mb_body, (params, opt_state)
                )
                return params, opt_state, k

            params = {"actor": actor_params[i], "critic": critic_params[i]}
            params, opt_state, _ = jax.lax.fori_loop(
                0, cfg.K_epochs, epoch_body,
                (params, opt_states[i], jax.random.fold_in(key, i)),
            )
            actor_params[i] = params["actor"]
            critic_params[i] = params["critic"]
            opt_states[i] = opt_state

        new_state = state.replace(
            actor_params=tuple(actor_params),
            critic_params=tuple(critic_params),
            opt_states=tuple(opt_states),
            step=state.step + 1,
        )
        return new_state, {"adv_mean": jnp.mean(adv_f)}

    # ------------------------------------------------------------------
    def _update_stacked(self, state, cfg, A, B, mb, n_mb, obs_f, act_f,
                        logp_old_f, adv_f, vt_f, frac, key):
        """vmapped-over-agents K-epoch minibatch optimization.

        Numerically the same per-agent computation as the loop path
        (same losses, same per-agent permutation keys, same Adam), but
        every actor/critic pass runs as ONE batched matmul per layer
        across the agent axis — the per-agent python loop issued 2*A
        small matmuls per layer, which profiling showed dominating the
        MARL update phase on TPU shapes.
        """
        stack = lambda trees: jax.tree.map(
            lambda *xs: jnp.stack(xs), *trees
        )
        a_stack = stack(state.actor_params)
        c_stack = stack(state.critic_params)
        o_stack = stack(state.opt_states)
        keys = jnp.stack(
            [jax.random.fold_in(key, i) for i in range(A)]
        )
        aobs = jnp.stack(
            [self._actor_obs(obs_f, i) for i in range(A)]
        )                                              # (A, B, O')
        if self.is_continue:
            acts = jnp.moveaxis(
                act_f[..., : self.act_dims[0]], 1, 0
            )                                          # (A, B, act)
        else:
            acts = jnp.moveaxis(act_f, 1, 0)           # (A, B)
        lps = jnp.moveaxis(logp_old_f, 1, 0)           # (A, B)
        if cfg.independent:
            cin = jnp.stack(
                [self._critic_input(obs_f, i) for i in range(A)]
            )
            adv_pa = jnp.moveaxis(adv_f, 1, 0)         # (A, B)
            vt_pa = jnp.moveaxis(vt_f, 1, 0)
            cin_ax = adv_ax = 0
        else:
            cin = self._critic_input(obs_f, 0)         # (B, D) shared
            adv_pa, vt_pa = adv_f, vt_f                # (B, A) broadcast
            cin_ax = adv_ax = None

        def run_agent(aparams, cparams, opt_state, obs_a, act_a, lp_a,
                      cin_a, adv_a, vt_a, k):
            def loss_fn(params, idx):
                logp, ent = self._logp_ent(
                    params["actor"], obs_a[idx], act_a[idx], 0
                )
                ratio = jnp.exp(logp - lp_a[idx])
                adv_i = adv_a[idx]
                if not cfg.independent:
                    ratio = ratio[:, None]             # joint broadcast
                surr1 = ratio * adv_i
                surr2 = jnp.clip(
                    ratio, 1 - cfg.clip_param, 1 + cfg.clip_param
                ) * adv_i
                actor_loss = -jnp.mean(jnp.minimum(surr1, surr2)) - (
                    cfg.entropy_coefficient * jnp.mean(ent)
                )
                v = self.critics[0].apply(
                    {"params": params["critic"]}, cin_a[idx]
                )
                vt = vt_a[idx]
                if not cfg.independent:
                    v = v[:, None]                     # repeat over agents
                if cfg.value_clip:
                    vt_clip = jnp.clip(
                        vt, v - cfg.clip_param, v + cfg.clip_param
                    )
                    if cfg.huber_loss:
                        c1 = jnp.mean(huber_fn(vt - v, cfg.huber_delta))
                        c2 = jnp.mean(
                            huber_fn(vt_clip - v, cfg.huber_delta)
                        )
                    else:
                        c1 = jnp.mean(jnp.square(vt - v))
                        c2 = jnp.mean(jnp.square(vt_clip - v))
                    critic_loss = jnp.maximum(c1, c2)
                elif cfg.huber_loss:
                    critic_loss = jnp.mean(
                        huber_fn(vt - v, cfg.huber_delta)
                    )
                else:
                    critic_loss = jnp.mean(jnp.square(vt - v))
                return actor_loss + critic_loss

            def epoch_body(e, carry):
                params, opt_state, k = carry
                k, k_perm = jax.random.split(k)
                perm = jax.random.permutation(k_perm, B)

                def mb_body(m, inner):
                    params, opt_state = inner
                    idx = jax.lax.dynamic_slice_in_dim(perm, m * mb, mb)
                    grads = jax.grad(loss_fn)(params, idx)
                    if cfg.axis_name is not None:
                        grads = jax.lax.pmean(grads, cfg.axis_name)
                    if cfg.max_grad_norm is not None:
                        # IPPO clips each net at 0.5 (IPPO.py:174-180);
                        # on the stacked path the clip group spans the
                        # stacked agent axis
                        grads = {
                            k: clip_grads_by_norm(v, cfg.max_grad_norm)
                            for k, v in grads.items()
                        }
                    opt_state.hyperparams["learning_rate"] = (
                        cfg.actor_lr * frac
                    )
                    updates, opt_state = self.tx.update(
                        grads, opt_state, params
                    )
                    return optax.apply_updates(params, updates), opt_state

                params, opt_state = jax.lax.fori_loop(
                    0, n_mb, mb_body, (params, opt_state)
                )
                return params, opt_state, k

            params = {"actor": aparams, "critic": cparams}
            params, opt_state, _ = jax.lax.fori_loop(
                0, cfg.K_epochs, epoch_body, (params, opt_state, k)
            )
            return params["actor"], params["critic"], opt_state

        new_a, new_c, new_o = jax.vmap(
            run_agent,
            in_axes=(0, 0, 0, 0, 0, 0, cin_ax, adv_ax, adv_ax, 0),
        )(a_stack, c_stack, o_stack, aobs, acts, lps, cin, adv_pa,
          vt_pa, keys)

        unstack = lambda t: tuple(
            jax.tree.map(lambda x: x[i], t) for i in range(A)
        )
        new_state = state.replace(
            actor_params=unstack(new_a),
            critic_params=unstack(new_c),
            opt_states=unstack(new_o),
            step=state.step + 1,
        )
        return new_state, {"adv_mean": jnp.mean(adv_f)}


def IPPO(env: Env, cfg: MAPPOConfig = None) -> MAPPO:
    """Independent PPO (MAPPO_file/IPPO.py): per-agent critic on own obs,
    per-agent GAE — for competitive MPE scenarios."""
    if cfg is None:
        cfg = MAPPOConfig(independent=True)
    else:
        cfg = dataclasses.replace(cfg, independent=True)
    if cfg.max_grad_norm is None:
        cfg = dataclasses.replace(cfg, max_grad_norm=0.5)
    return MAPPO(env, cfg)
