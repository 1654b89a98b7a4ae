"""MAT: Multi-Agent Transformer (shared parameters, sequence over agents).

Parity surface (MAPPO_file/ma_transformer.py, transformer_act.py, MAT.py):
  - encoder: LayerNorm obs embed -> n_block post-LN blocks (unmasked
    self-attention over the agent axis) -> per-agent V head + obs_rep
    (ma_transformer.py:117-154); state input is unused/zeroed (:3-5);
  - decoder: action embedding (discrete: one-hot + start-token column,
    bias-free; continuous: linear), DecodeBlocks with causal
    (n_agent+1-sized tril) masked self-attn + masked cross-attn where the
    encoder rep is the query (:93-114), head -> logits / tanh mean with a
    global log_std parameter initialized to ONES and clamped [-20, 2]
    (transformer_act.py:45-73);
  - acting: autoregressive over agents with teacher-forced shifted actions
    at training time (discrete_parallel_act / continuous_parallel_act);
  - learn quirks preserved (MAT.py:394-471): values are MEANED over the
    agent axis before the TD delta; ratios are per-action-dim (no logp sum
    before exp) with the min-surrogate summed over act dims; clip 0.05;
    single optimizer over the whole transformer, lr 5e-4, linear decay;
  - sizes: n_block 1, n_embd 64, n_head 1 (MAT.py:581-584).

TPU-native: the autoregressive decode unrolls over the (small) agent axis
inside one jit; training is fully parallel teacher forcing — the MXU sees
(B*A, n_embd) matmuls.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from freerl_tpu.algos.common import clip_grads_by_norm
from freerl_tpu.algos.common import huber as huber_fn
from freerl_tpu.envs.base import Env

_ORTH_ACT = nn.initializers.orthogonal(scale=float(np.sqrt(2)))
_ORTH = nn.initializers.orthogonal(scale=1.0)


class MATAttention(nn.Module):
    n_embd: int
    n_head: int
    masked: bool = False

    @nn.compact
    def __call__(self, key_in, value, query):
        B, L, D = query.shape
        H = self.n_head
        dense = lambda name: nn.Dense(self.n_embd, kernel_init=_ORTH,
                                      name=name)
        k = dense("key")(key_in).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
        q = dense("query")(query).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
        v = dense("value")(value).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
        att = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(D // H)
        if self.masked:
            mask = jnp.tril(jnp.ones((L, L), bool))
            att = jnp.where(mask[None, None], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        y = (att @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
        return dense("proj")(y)


class EncodeBlock(nn.Module):
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x):
        attn = MATAttention(self.n_embd, self.n_head, masked=False)
        x = nn.LayerNorm()(x + attn(x, x, x))
        mlp = nn.Sequential([
            nn.Dense(self.n_embd, kernel_init=_ORTH_ACT), nn.gelu,
            nn.Dense(self.n_embd, kernel_init=_ORTH),
        ])
        return nn.LayerNorm()(x + mlp(x))


class DecodeBlock(nn.Module):
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x, rep_enc):
        attn1 = MATAttention(self.n_embd, self.n_head, masked=True)
        attn2 = MATAttention(self.n_embd, self.n_head, masked=True)
        x = nn.LayerNorm()(x + attn1(x, x, x))
        # cross: keys/values from the action stream, query is the enc rep
        x = nn.LayerNorm()(rep_enc + attn2(x, x, rep_enc))
        mlp = nn.Sequential([
            nn.Dense(self.n_embd, kernel_init=_ORTH_ACT), nn.gelu,
            nn.Dense(self.n_embd, kernel_init=_ORTH),
        ])
        return nn.LayerNorm()(x + mlp(x))


class MATEncoder(nn.Module):
    n_block: int
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, obs):
        x = nn.LayerNorm()(obs)
        x = nn.Dense(self.n_embd, kernel_init=_ORTH_ACT)(x)
        x = nn.gelu(x)
        x = nn.LayerNorm()(x)
        for _ in range(self.n_block):
            x = EncodeBlock(self.n_embd, self.n_head)(x)
        rep = x
        v = nn.Sequential([
            nn.Dense(self.n_embd, kernel_init=_ORTH_ACT), nn.gelu,
            nn.LayerNorm(),
            nn.Dense(1, kernel_init=_ORTH),
        ])(rep)
        return v.squeeze(-1), rep


class MATDecoder(nn.Module):
    action_dim: int
    n_block: int
    n_embd: int
    n_head: int
    discrete: bool = True

    @nn.compact
    def __call__(self, shifted_action, obs_rep):
        if self.discrete:
            x = nn.Dense(self.n_embd, use_bias=False,
                         kernel_init=_ORTH_ACT)(shifted_action)
        else:
            x = nn.Dense(self.n_embd, kernel_init=_ORTH_ACT)(shifted_action)
        x = nn.gelu(x)
        x = nn.LayerNorm()(x)
        for _ in range(self.n_block):
            x = DecodeBlock(self.n_embd, self.n_head)(x, obs_rep)
        logit = nn.Sequential([
            nn.Dense(self.n_embd, kernel_init=_ORTH_ACT), nn.gelu,
            nn.LayerNorm(),
            nn.Dense(self.action_dim, kernel_init=_ORTH),
        ])(x)
        if not self.discrete:
            log_std = self.param(
                "log_std", nn.initializers.ones_init(), (self.action_dim,)
            )
            return logit, log_std
        return logit


@dataclasses.dataclass(frozen=True)
class MATConfig:
    lr: float = 5e-4
    gamma: float = 0.95
    lmbda: float = 0.95
    clip_param: float = 0.05
    K_epochs: int = 15
    entropy_coefficient: float = 0.01
    horizon: int = 256
    minibatch_size: int = 256
    n_block: int = 1
    n_embd: int = 64
    n_head: int = 1
    num_envs: int = 1
    huber_loss: bool = False
    huber_delta: float = 10.0
    value_clip: bool = False
    adv_norm: bool = False
    lr_decay: bool = False
    lr_decay_episodes: int = 1000
    axis_name: Optional[str] = None


@struct.dataclass
class MATState:
    enc_params: dict
    dec_params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


class MAT:
    """Runs on the on-policy driver (freerl_tpu/train/onpolicy.py)."""

    def __init__(self, env: Env, cfg: MATConfig = MATConfig()):
        if len(set(env.agent_act_dims)) > 1:
            raise ValueError(
                "MAT requires equal per-agent action dims (the reference "
                "makes the same assumption, MAPPO_file/MAT.py:316); got "
                f"{tuple(env.agent_act_dims)} — use MAPPO/HAPPO/MADDPG/"
                "MASAC for heterogeneous-action scenarios like "
                "simple_world_comm_v3"
            )
        self.cfg = cfg
        self.n_agents = env.n_agents
        self.obs_dim = env.dim_info.obs_dim  # MAT assumes equal dims
        self.action_dim = env.dim_info.action_dim
        self.discrete = not env.dim_info.is_continue
        self.encoder = MATEncoder(cfg.n_block, cfg.n_embd, cfg.n_head)
        self.decoder = MATDecoder(
            self.action_dim, cfg.n_block, cfg.n_embd, cfg.n_head,
            discrete=self.discrete,
        )
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr, eps=1e-5
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> MATState:
        ke, kd = jax.random.split(key)
        A = self.n_agents
        obs = jnp.zeros((1, A, self.obs_dim))
        enc_params = self.encoder.init(ke, obs)["params"]
        sa_dim = self.action_dim + 1 if self.discrete else self.action_dim
        dec_params = self.decoder.init(
            kd, jnp.zeros((1, A, sa_dim)), jnp.zeros((1, A, self.cfg.n_embd))
        )["params"]
        return MATState(
            enc_params=enc_params,
            dec_params=dec_params,
            opt_state=self.tx.init(
                {"enc": enc_params, "dec": dec_params}
            ),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _decode(self, params, shifted, rep):
        return self.decoder.apply({"params": params}, shifted, rep)

    def sample_action(self, state: MATState, obs, key):
        """Autoregressive decode over agents via ``lax.scan``. obs (B, A, O).

        The reference's per-agent python loop (transformer_act.py:13-26,
        :51-68) would unroll A decoder forwards into the trace; scanning
        over the agent axis keeps trace/compile cost O(1) in A (SURVEY
        §7.6 — required for large agent counts). The RNG stream
        (fold_in(key, i)) and all numerics match the unrolled form.
        """
        B, A = obs.shape[:2]
        _, rep = self.encoder.apply({"params": state.enc_params}, obs)
        if self.discrete:
            shifted0 = jnp.zeros((B, A, self.action_dim + 1))
            shifted0 = shifted0.at[:, 0, 0].set(1.0)

            def body(shifted, i):
                out = self._decode(state.dec_params, shifted, rep)
                logits = jax.lax.dynamic_index_in_dim(
                    out, i, axis=1, keepdims=False
                )
                a = jax.random.categorical(jax.random.fold_in(key, i), logits)
                logp = jnp.take_along_axis(
                    jax.nn.log_softmax(logits), a[:, None], axis=-1
                ).squeeze(-1)
                # next agent's input token; i+1 == A drops (past the seq)
                shifted = shifted.at[:, i + 1, 1:].set(
                    jax.nn.one_hot(a, self.action_dim), mode="drop"
                )
                shifted = shifted.at[:, i + 1, 0].set(0.0, mode="drop")
                return shifted, (a, logp)

            _, (a_seq, logp_seq) = jax.lax.scan(
                body, shifted0, jnp.arange(A)
            )
            actions = jnp.moveaxis(a_seq, 0, 1)       # (B, A)
            logps = jnp.moveaxis(logp_seq, 0, 1)
            return actions, actions, logps

        shifted0 = jnp.zeros((B, A, self.action_dim))

        def body(shifted, i):
            out, log_std = self._decode(state.dec_params, shifted, rep)
            mean = jnp.tanh(
                jax.lax.dynamic_index_in_dim(out, i, axis=1, keepdims=False)
            )
            log_std = jnp.clip(log_std, -20.0, 2.0)
            std = jnp.exp(log_std)
            a = mean + std * jax.random.normal(
                jax.random.fold_in(key, i), mean.shape
            )
            logp = (
                -0.5 * ((a - mean) / std) ** 2
                - log_std - 0.5 * jnp.log(2 * jnp.pi)
            )
            shifted = shifted.at[:, i + 1].set(a, mode="drop")
            return shifted, (a, logp)

        _, (a_seq, logp_seq) = jax.lax.scan(body, shifted0, jnp.arange(A))
        actions = jnp.moveaxis(a_seq, 0, 1)           # (B, A, D)
        logps = jnp.moveaxis(logp_seq, 0, 1)
        env_a = jnp.clip(actions, -1.0, 1.0)
        return env_a, actions, logps

    def evaluate_action(self, state: MATState, obs):
        B, A = obs.shape[:2]
        _, rep = self.encoder.apply({"params": state.enc_params}, obs)
        if self.discrete:
            shifted0 = jnp.zeros((B, A, self.action_dim + 1))
            shifted0 = shifted0.at[:, 0, 0].set(1.0)

            def body(shifted, i):
                out = self._decode(state.dec_params, shifted, rep)
                logits = jax.lax.dynamic_index_in_dim(
                    out, i, axis=1, keepdims=False
                )
                a = jnp.argmax(logits, axis=-1)
                shifted = shifted.at[:, i + 1, 1:].set(
                    jax.nn.one_hot(a, self.action_dim), mode="drop"
                )
                shifted = shifted.at[:, i + 1, 0].set(0.0, mode="drop")
                return shifted, a

            _, a_seq = jax.lax.scan(body, shifted0, jnp.arange(A))
            return jnp.moveaxis(a_seq, 0, 1)

        shifted0 = jnp.zeros((B, A, self.action_dim))

        def body(shifted, i):
            out, _ = self._decode(state.dec_params, shifted, rep)
            a = jnp.tanh(
                jax.lax.dynamic_index_in_dim(out, i, axis=1, keepdims=False)
            )
            shifted = shifted.at[:, i + 1].set(a, mode="drop")
            return shifted, a

        _, a_seq = jax.lax.scan(body, shifted0, jnp.arange(A))
        return jnp.moveaxis(a_seq, 0, 1)

    # hooks for the on-policy driver -----------------------------------
    def process_obs(self, state, next_obs, carry_obs):
        return state, next_obs, carry_obs

    def process_reward(self, state, reward, episode_done):
        return state, reward

    # ------------------------------------------------------------------
    def _parallel_logp_ent_v(self, params, obs, action):
        """Teacher-forced forward. obs (B, A, O)."""
        v, rep = self.encoder.apply({"params": params["enc"]}, obs)
        B, A = obs.shape[:2]
        if self.discrete:
            one_hot = jax.nn.one_hot(action, self.action_dim)
            shifted = jnp.zeros((B, A, self.action_dim + 1))
            shifted = shifted.at[:, 0, 0].set(1.0)
            shifted = shifted.at[:, 1:, 1:].set(one_hot[:, :-1])
            logits = self._decode(params["dec"], shifted, rep)
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(
                logp_all, action[..., None], axis=-1
            ).squeeze(-1)                                    # (B, A)
            p = jnp.exp(logp_all)
            ent = -jnp.sum(p * logp_all, axis=-1)            # (B, A)
            return logp[..., None], ent[..., None], v
        shifted = jnp.zeros((B, A, self.action_dim))
        shifted = shifted.at[:, 1:].set(action[:, :-1])
        out, log_std = self._decode(params["dec"], shifted, rep)
        mean = jnp.tanh(out)
        log_std = jnp.clip(log_std, -20.0, 2.0)
        std = jnp.exp(log_std)
        logp = (
            -0.5 * ((action - mean) / std) ** 2
            - log_std - 0.5 * jnp.log(2 * jnp.pi)
        )                                                    # (B, A, act)
        ent = jnp.broadcast_to(
            0.5 + 0.5 * jnp.log(2 * jnp.pi) + log_std, logp.shape
        )
        return logp, ent, v

    def update(self, state: MATState, rollout, key, episodes=None):
        cfg = self.cfg
        A = self.n_agents
        T, N = rollout.reward.shape[:2]
        B = T * N
        mb = min(cfg.minibatch_size, B)
        n_mb = B // mb

        params = {"enc": state.enc_params, "dec": state.dec_params}
        obs_all = rollout.obs.reshape((B, A, -1))
        act_all = (
            rollout.action.reshape((B, A))
            if self.discrete
            else rollout.action.reshape((B, A, self.action_dim))
        )
        logp_old = (
            rollout.log_pi.reshape((B, A, 1))
            if self.discrete
            else rollout.log_pi.reshape((B, A, self.action_dim))
        )

        # values, MEANED over agents before the TD delta (MAT.py:408-409)
        v_obs, _ = self.encoder.apply(
            {"params": state.enc_params}, obs_all
        )
        v_next, _ = self.encoder.apply(
            {"params": state.enc_params},
            rollout.next_obs.reshape((B, A, -1)),
        )
        vs = jnp.mean(v_obs, axis=-1, keepdims=True).reshape(T, N, 1)
        vs_next = jnp.mean(v_next, axis=-1, keepdims=True).reshape(T, N, 1)
        done = rollout.done.astype(jnp.float32)[..., None]
        adv_done = rollout.adv_done.astype(jnp.float32)[..., None]
        deltas = rollout.reward + cfg.gamma * (1.0 - done) * vs_next - vs
        # deltas: (T, N, A)

        def scan_fn(g, x):
            d, ad = x
            g = d + cfg.gamma * cfg.lmbda * (1.0 - ad) * g
            return g, g

        _, adv = jax.lax.scan(
            scan_fn, jnp.zeros_like(deltas[0]), (deltas, adv_done),
            reverse=True,
        )
        v_target = adv + vs                                  # (T, N, A)
        if cfg.adv_norm:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        adv_f = jax.lax.stop_gradient(adv.reshape((B, A)))
        vt_f = jax.lax.stop_gradient(v_target.reshape((B, A)))

        if cfg.lr_decay and episodes is not None:
            frac = jnp.maximum(
                1.0 - episodes.astype(jnp.float32) / cfg.lr_decay_episodes,
                1e-3,
            )
        else:
            frac = 1.0

        def loss_fn(params, idx):
            logp, ent, v = self._parallel_logp_ent_v(
                params, obs_all[idx], act_all[idx]
            )
            ratio = jnp.exp(logp - logp_old[idx])   # (mb, A, act|1)
            a = adv_f[idx][..., None]
            surr1 = ratio * a
            surr2 = jnp.clip(
                ratio, 1 - cfg.clip_param, 1 + cfg.clip_param
            ) * a
            # sum over act dims THEN mean (MAT.py:445)
            actor_loss = -jnp.mean(
                jnp.sum(jnp.minimum(surr1, surr2), axis=-1)
            ) - cfg.entropy_coefficient * jnp.mean(ent)
            vt = vt_f[idx]
            if cfg.value_clip:
                vt_clip = jnp.clip(vt, v - cfg.clip_param, v + cfg.clip_param)
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
                # reference clips the transformer's grads at norm 10
                # every update (MAT.py update_ac:
                # clip_grad_norm_(self.transformer.parameters(), 10))
                grads = clip_grads_by_norm(grads, 10.0)
                opt_state.hyperparams["learning_rate"] = cfg.lr * frac
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state

            params, opt_state = jax.lax.fori_loop(
                0, n_mb, mb_body, (params, opt_state)
            )
            return params, opt_state, k

        params, opt_state, _ = jax.lax.fori_loop(
            0, cfg.K_epochs, epoch_body, (params, state.opt_state, key)
        )
        new_state = MATState(
            enc_params=params["enc"],
            dec_params=params["dec"],
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"adv_mean": jnp.mean(adv_f)}
