"""Recurrent MAPPO (rMAPPO) — GRU actors/critics with truncated BPTT.

The reference notes recurrent MAPPO as NOT implemented (MAPPO_file/
MAPPO.py:82-83 "rmappo"); this module supplies it TPU-natively, following
the published rMAPPO recipe (Yu et al., "The Surprising Effectiveness of
PPO in Cooperative Multi-Agent Games"):

  - per-agent GRU actor over own obs; per-agent GRU centralized critic
    over concat obs (or own obs in independent mode);
  - hidden states are carried by the rollout driver (one fused cell step
    per env step inside the rollout `lax.scan`) and zeroed at episode
    boundaries;
  - the update replays the horizon in fixed-length data chunks
    (`data_chunk_length`), initializing each chunk from the hidden state
    recorded at collection time (the standard stale-initial-state
    truncated-BPTT treatment), scanning the cells over the chunk;
  - PPO machinery (joint GAE over the agent axis, clipped surrogate,
    value clip + huber, adv_norm/lr_decay tricks) matches algos/mappo.py.

Driver protocol: exposing ``init_policy_carry`` opts into the recurrent
path of train/onpolicy.py — ``sample_action`` then receives (and returns)
the hidden-state carry plus a per-step extras pytree that the driver
stacks and hands back to ``update``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from freerl_tpu.algos.common import huber as huber_fn
from freerl_tpu.core.normalization import RewardScaling, RunningMeanStd
from freerl_tpu.envs.base import Env
from freerl_tpu.nets import distributions as D
from freerl_tpu.nets.rnn import RecurrentActor, RecurrentVCritic


@dataclasses.dataclass(frozen=True)
class RMAPPOConfig:
    actor_lr: float = 5e-4
    gamma: float = 0.95
    lmbda: float = 0.95
    clip_param: float = 0.2
    K_epochs: int = 15
    entropy_coefficient: float = 0.01
    horizon: int = 256
    minibatch_size: int = 256        # in transitions; >= data_chunk_length
    data_chunk_length: int = 10      # truncated-BPTT window
    hidden: Sequence[int] = (128,)
    rnn_hidden: int = 64
    num_envs: int = 1
    huber_delta: float = 10.0
    independent: bool = False        # rIPPO mode: own-obs critic + GAE
    # tricks (subset of MAPPO.py:600-607 that interacts with recurrence)
    adv_norm: bool = False
    obs_norm: bool = False
    reward_norm: bool = False
    reward_scaling: bool = False
    orthogonal_init: bool = False
    adam_eps: bool = False
    lr_decay: bool = False
    lr_decay_episodes: int = 200
    value_clip: bool = False
    huber_loss: bool = False
    layer_norm: bool = False
    masked: bool = False
    mask_dim: int = 0
    axis_name: Optional[str] = None

    def __post_init__(self):
        if self.reward_norm and self.reward_scaling:
            raise ValueError(
                "reward_norm and reward_scaling cannot both be on"
            )
        if self.masked and self.mask_dim <= 0:
            raise ValueError("masked mode needs mask_dim > 0")


@struct.dataclass
class RMAPPOState:
    actor_params: tuple
    critic_params: tuple
    opt_states: tuple
    obs_rms: RunningMeanStd
    rew_rms: RunningMeanStd
    rew_scale: RewardScaling
    step: jnp.ndarray


@struct.dataclass
class HiddenCarry:
    """Rollout-time GRU state: (N, A, H) each, pre-reset (the reset mask
    is applied inside the cell from ``done_prev``)."""

    h_actor: jnp.ndarray
    h_critic: jnp.ndarray


class RMAPPO:
    def __init__(self, env: Env, cfg: RMAPPOConfig = RMAPPOConfig()):
        self.cfg = cfg
        self.n_agents = env.n_agents
        self.obs_dims = tuple(env.agent_obs_dims)
        self.act_dims = tuple(env.agent_act_dims)
        self.act_pad = max(self.act_dims)
        self.is_continue = env.dim_info.is_continue
        self.obs_pad = env.dim_info.obs_dim
        kw = dict(
            hidden=tuple(cfg.hidden), rnn_hidden=cfg.rnn_hidden,
            orthogonal=cfg.orthogonal_init, layer_norm=cfg.layer_norm,
        )
        self.actors = [
            RecurrentActor(self.act_dims[i], self.is_continue, **kw)
            for i in range(self.n_agents)
        ]
        self.critics = [
            RecurrentVCritic(**kw) for _ in range(self.n_agents)
        ]
        eps = 1e-5 if cfg.adam_eps else 1e-8
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.actor_lr, eps=eps
        )

    # ------------------------------------------------------------------
    def _agent_obs(self, obs, i):
        return obs[..., i, : self.obs_dims[i]]

    def _pad_act(self, a, i):
        extra = self.act_pad - self.act_dims[i]
        if extra == 0:
            return a
        pad = [(0, 0)] * (a.ndim - 1) + [(0, extra)]
        return jnp.pad(a, pad)

    def _critic_input(self, obs, i):
        if self.cfg.independent:
            return self._agent_obs(obs, i)
        return jnp.concatenate(
            [self._agent_obs(obs, j) for j in range(self.n_agents)], axis=-1
        )

    def init(self, key: jax.Array) -> RMAPPOState:
        keys = jax.random.split(key, 2 * self.n_agents)
        H = self.cfg.rnn_hidden
        a_params, c_params, opts = [], [], []
        h0 = jnp.zeros((1, H))
        r0 = jnp.zeros((1,), jnp.bool_)
        for i in range(self.n_agents):
            a_params.append(self.actors[i].init(
                keys[2 * i], jnp.zeros((1, self.obs_dims[i])), h0, r0
            )["params"])
            cdim = (
                self.obs_dims[i] if self.cfg.independent
                else sum(self.obs_dims)
            )
            c_params.append(self.critics[i].init(
                keys[2 * i + 1], jnp.zeros((1, cdim)), h0, r0
            )["params"])
            opts.append(self.tx.init(
                {"actor": a_params[-1], "critic": c_params[-1]}
            ))
        return RMAPPOState(
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

    def init_policy_carry(self, num_envs: int) -> HiddenCarry:
        H = self.cfg.rnn_hidden
        z = jnp.zeros((num_envs, self.n_agents, H), jnp.float32)
        return HiddenCarry(h_actor=z, h_critic=z)

    # ------------------------------------------------------------------
    def _dist(self, out, obs_i):
        """Returns (logits-or-(mean,std)) with masking applied."""
        if not self.is_continue:
            if self.cfg.masked:
                return D.masked_logits(out, obs_i[..., -self.cfg.mask_dim:])
            return out
        mean, log_std = out
        return mean, jnp.exp(log_std)

    def sample_action(self, state: RMAPPOState, obs, key,
                      carry: HiddenCarry, done_prev):
        """obs (N, A, O_pad), done_prev (N,) ->
        (env_action, stored, logp (N, A), new_carry, extras).

        extras records the PRE-reset hiddens plus done_prev — what the
        update needs to replay this step exactly.
        """
        extras = {
            "h_actor": carry.h_actor,
            "h_critic": carry.h_critic,
            "done_prev": done_prev,
        }
        env_as, stored, logps = [], [], []
        h_as, h_cs = [], []
        for i in range(self.n_agents):
            k = jax.random.fold_in(key, i)
            obs_i = self._agent_obs(obs, i)
            out, h_a = self.actors[i].apply(
                {"params": state.actor_params[i]},
                obs_i, carry.h_actor[:, i], done_prev,
            )
            _, h_c = self.critics[i].apply(
                {"params": state.critic_params[i]},
                self._critic_input(obs, i), carry.h_critic[:, i], done_prev,
            )
            h_as.append(h_a)
            h_cs.append(h_c)
            if not self.is_continue:
                logits = self._dist(out, obs_i)
                a = jax.random.categorical(k, logits)
                logp = D.categorical_log_prob(logits, a)
                env_as.append(a)
                stored.append(a)
            else:
                mean, std = self._dist(out, obs_i)
                a = D.normal_sample(k, mean, std)
                logp = D.normal_log_prob(mean, std, a)
                env_as.append(self._pad_act(jnp.clip(a, -1.0, 1.0), i))
                stored.append(self._pad_act(a, i))
            logps.append(logp)
        stack = lambda xs: jnp.stack(xs, axis=-2 if self.is_continue else -1)
        new_carry = HiddenCarry(
            h_actor=jnp.stack(h_as, axis=1),
            h_critic=jnp.stack(h_cs, axis=1),
        )
        return (stack(env_as), stack(stored), jnp.stack(logps, axis=-1),
                new_carry, extras)

    def evaluate_action(self, state: RMAPPOState, obs, carry: HiddenCarry,
                        done_prev):
        """Deterministic act: (actions, new_carry)."""
        # offline eval feeds RAW observations; with ObsNorm the actors
        # were trained on normalized ones (saved running stats)
        if self.cfg.obs_norm:
            obs = state.obs_rms.normalize(obs)
        outs, h_as = [], []
        for i in range(self.n_agents):
            obs_i = self._agent_obs(obs, i)
            out, h_a = self.actors[i].apply(
                {"params": state.actor_params[i]},
                obs_i, carry.h_actor[:, i], done_prev,
            )
            h_as.append(h_a)
            if not self.is_continue:
                outs.append(jnp.argmax(self._dist(out, obs_i), axis=-1))
            else:
                outs.append(self._pad_act(out[0], i))
        new_carry = carry.replace(h_actor=jnp.stack(h_as, axis=1))
        return (
            jnp.stack(outs, axis=-2 if self.is_continue else -1), new_carry
        )

    # trick hooks (same semantics as MAPPO) ------------------------------
    def process_obs(self, state, next_obs, carry_obs):
        if not self.cfg.obs_norm:
            return state, next_obs, carry_obs
        rms = state.obs_rms.update(next_obs)
        return (
            state.replace(obs_rms=rms),
            rms.normalize(next_obs),
            rms.normalize(carry_obs),
        )

    def process_reward(self, state, reward, episode_done):
        if self.cfg.reward_scaling:
            flat = reward.reshape(-1)
            ep = jnp.broadcast_to(
                episode_done[:, None], reward.shape
            ).reshape(-1)
            rs, scaled = state.rew_scale(flat, ep)
            return state.replace(rew_scale=rs), scaled.reshape(reward.shape)
        if self.cfg.reward_norm:
            rms = state.rew_rms.update(reward)
            return state.replace(rew_rms=rms), rms.normalize(reward)
        return state, reward

    # ------------------------------------------------------------------
    def _values_full(self, state, rollout, extras):
        """Replay the critic GRUs over the whole horizon: returns
        vs, vs_next of shape (T, N, A)."""
        A = self.n_agents

        def one_agent(i):
            params = {"params": state.critic_params[i]}

            def step(h, x):
                obs_t, next_obs_t, dp_t = x
                v, h = self.critics[i].apply(
                    params, self._critic_input(obs_t, i), h, dp_t
                )
                # branch one extra cell step onto the TRUE successor obs
                # (pre-reset) for the bootstrap value
                v_next, _ = self.critics[i].apply(
                    params, self._critic_input(next_obs_t, i), h,
                    jnp.zeros_like(dp_t),
                )
                return h, (v, v_next)

            _, (vs, vs_next) = jax.lax.scan(
                step, extras["h_critic"][0, :, i],
                (rollout.obs, rollout.next_obs, extras["done_prev"]),
            )
            return vs, vs_next               # (T, N) each

        vs, vs_next = zip(*[one_agent(i) for i in range(A)])
        return jnp.stack(vs, -1), jnp.stack(vs_next, -1)

    def update(self, state: RMAPPOState, rollout, key, episodes=None,
               extras=None):
        assert extras is not None, "rMAPPO needs the driver's extras"
        cfg = self.cfg
        A = self.n_agents
        T, N = rollout.reward.shape[:2]
        L = min(cfg.data_chunk_length, T)
        if T % L:
            # trace-time fallback: largest divisor of T not above the
            # requested chunk length, so any horizon/num_envs pair works
            L = next(d for d in range(L, 0, -1) if T % d == 0)
        C = T // L                           # chunks per env
        S = C * N                            # total sequences
        chunks_per_mb = max(1, min(cfg.minibatch_size // L, S))
        n_mb = max(S // chunks_per_mb, 1)

        vs, vs_next = self._values_full(state, rollout, extras)

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
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        # ---- chunk the horizon: (T, N, ...) -> (S, L, ...) -------------
        def to_chunks(x):
            x = x.reshape((C, L) + x.shape[1:])          # (C, L, N, ...)
            x = jnp.moveaxis(x, 2, 1)                    # (C, N, L, ...)
            return x.reshape((S, L) + x.shape[3:])

        obs_c = to_chunks(rollout.obs)                   # (S, L, A, O)
        act_c = to_chunks(rollout.action)
        logp_old_c = to_chunks(rollout.log_pi)           # (S, L, A)
        dp_c = to_chunks(extras["done_prev"])            # (S, L)
        adv_c = jax.lax.stop_gradient(to_chunks(adv))    # (S, L, A)
        vt_c = jax.lax.stop_gradient(to_chunks(v_target))
        # chunk-start hiddens: extras["h_*"] is (T, N, A, H); take t=0,L,...
        h_a0 = extras["h_actor"][::L]                     # (C, N, A, H)
        h_a0 = h_a0.reshape((S,) + h_a0.shape[2:])        # (S, A, H)
        h_c0 = extras["h_critic"][::L].reshape((S, A, -1))

        if cfg.lr_decay and episodes is not None:
            frac = jnp.maximum(
                1.0 - episodes.astype(jnp.float32) / cfg.lr_decay_episodes,
                1e-3,
            )
        else:
            frac = 1.0

        actor_params = list(state.actor_params)
        critic_params = list(state.critic_params)
        opt_states = list(state.opt_states)

        for i in range(A):
            act_i = (
                act_c[..., i, : self.act_dims[i]] if self.is_continue
                else act_c[..., i]
            )                                            # (S, L[, act])

            def loss_fn(params, idx):
                # gather the minibatch of sequences
                o = obs_c[idx]                           # (mb, L, A, O)
                a = act_i[idx]                           # (mb, L[, act])
                dp = dp_c[idx]                           # (mb, L)
                ha0 = h_a0[idx, i]                       # (mb, H)
                hc0 = h_c0[idx, i]

                def bptt(h, x):
                    h_a, h_c = h
                    o_t, dp_t = x                        # (mb, A, O), (mb,)
                    obs_i = self._agent_obs(o_t, i)
                    out, h_a = self.actors[i].apply(
                        {"params": params["actor"]}, obs_i, h_a, dp_t
                    )
                    v, h_c = self.critics[i].apply(
                        {"params": params["critic"]},
                        self._critic_input(o_t, i), h_c, dp_t,
                    )
                    if not self.is_continue:
                        logits = self._dist(out, obs_i)
                        if cfg.masked:
                            mask = obs_i[..., -cfg.mask_dim:]
                            ent = D.masked_categorical_entropy(logits, mask)
                        else:
                            ent = D.categorical_entropy(logits)
                        return (h_a, h_c), (logits, v, ent)
                    mean, std = self._dist(out, obs_i)
                    return (h_a, h_c), ((mean, std), v, D.normal_entropy(std))

                # scan over the chunk's time axis (xs leading dim = L)
                (_, _), (outs, v, ent) = jax.lax.scan(
                    bptt, (ha0, hc0),
                    (jnp.moveaxis(o, 1, 0), jnp.moveaxis(dp, 1, 0)),
                )
                a_t = jnp.moveaxis(a, 1, 0)              # (L, mb[, act])
                if not self.is_continue:
                    logp = D.categorical_log_prob(outs, a_t)
                else:
                    mean, std = outs
                    logp = D.normal_log_prob(mean, std, a_t)
                logp = jnp.moveaxis(logp, 0, 1)          # (mb, L)
                v = jnp.moveaxis(v, 0, 1)                # (mb, L)
                ent = jnp.moveaxis(ent, 0, 1)

                ratio = jnp.exp(logp - logp_old_c[idx, :, i])
                if cfg.independent:
                    adv_i = adv_c[idx, :, i]
                    vt = vt_c[idx, :, i]
                else:
                    adv_i = adv_c[idx]                   # (mb, L, A)
                    ratio = ratio[..., None]
                    vt = vt_c[idx]
                    v = v[..., None]
                surr1 = ratio * adv_i
                surr2 = jnp.clip(
                    ratio, 1 - cfg.clip_param, 1 + cfg.clip_param
                ) * adv_i
                actor_loss = -jnp.mean(jnp.minimum(surr1, surr2)) - (
                    cfg.entropy_coefficient * jnp.mean(ent)
                )
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

            def epoch_body(e, carry_):
                params, opt_state, k = carry_
                k, k_perm = jax.random.split(k)
                perm = jax.random.permutation(k_perm, S)

                def mb_body(m, inner):
                    params, opt_state = inner
                    idx = jax.lax.dynamic_slice_in_dim(
                        perm, m * chunks_per_mb, chunks_per_mb
                    )
                    grads = jax.grad(loss_fn)(params, idx)
                    if cfg.axis_name is not None:
                        grads = jax.lax.pmean(grads, cfg.axis_name)
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
        return new_state, {"adv_mean": jnp.mean(adv)}


def RIPPO(env: Env, cfg: RMAPPOConfig = None) -> RMAPPO:
    """Independent recurrent PPO: own-obs GRU critic, per-agent GAE."""
    if cfg is None:
        cfg = RMAPPOConfig(independent=True)
    else:
        cfg = dataclasses.replace(cfg, independent=True)
    return RMAPPO(env, cfg)
