"""ENVELOPE multi-objective Q-learning (preference-conditioned).

Parity surface (ENVELOPE_MORL_file/ENVELOPE_DQN.py, Buffer.py):
  - Q(s, w) -> (action_dim, reward_dim) vector values from a 2x256 MLP over
    concat(obs, preference) (:36-59);
  - acting: a fresh |randn| L1-normalized preference per step scalarizes Q
    (:105-125);
  - HER-like add-time priority |w.r + gamma*w.hQ - w.Q| (+1e-5) from a
    sampled preference; priority-proportional sampling (:139-200);
  - homotopy beta annealing beta -> 1 with the exponential schedule
    (tau=1000, per-episode-end update, :94-101,184);
  - learn (:210-256): batch repeated ``weight_num`` times with fresh
    preferences, double-DQN action choice on scalarized ONLINE Q, target
    vector Q gather, loss = beta*mse(wQ, wTQ) + (1-beta)*mse(Q, TQ),
    grad-clip 1.0, polyak target;
  - vector rewards in the replay ring (MO_Buffer) — here the standard HBM
    Transition ring already carries (reward_dim,) rewards.
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
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.nets.mlp import Dense


def random_preference(key, reward_dim, shape=()):
    """|N(0,1)| / L1-norm — the reference's preference sampler."""
    w = jnp.abs(jax.random.normal(key, shape + (reward_dim,)))
    return w / jnp.sum(w, axis=-1, keepdims=True)


class MOQNet(nn.Module):
    action_dim: int
    reward_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, preference):
        x = jnp.concatenate([obs, preference], axis=-1)
        for h in self.hidden:
            x = nn.relu(Dense(h)(x))
        q = Dense(self.action_dim * self.reward_dim)(x)
        return q.reshape(x.shape[:-1] + (self.action_dim, self.reward_dim))


@dataclasses.dataclass(frozen=True)
class EnvelopeConfig:
    lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 256
    buffer_size: int = 100_000
    hidden: Sequence[int] = (256, 256)
    epsilon: float = 0.1
    # reference protocol: epsilon 0.4 decaying linearly to 0.05 over
    # max_episodes (ENVELOPE_DQN.py:408-409,431-432,523-525)
    epsilon_decay: bool = False
    epsilon_final: float = 0.05
    weight_num: int = 4
    # reference default --beta 0.95 (ENVELOPE_DQN.py:410): the homotopy
    # path runs 0.95 -> 1.0, i.e. the SCALARIZED auxiliary loss dominates
    # from the start.  (A 0.01 start — vector-loss-dominant — was measured
    # here to diverge along the preference axis on DST: Q_time reached
    # +636 when every time reward is -1.)
    beta_init: float = 0.95
    beta_uplim: float = 1.0
    homotopy_tau: float = 1000.0
    max_episodes: int = 500
    # the reference calls clip_grad_norm_ BEFORE backward()
    # (ENVELOPE_DQN.py:70-74) so its clip is a no-op; None matches that.
    grad_clip: Optional[float] = None
    axis_name: Optional[str] = None


@struct.dataclass
class EnvelopeState:
    params: dict
    target_params: dict
    opt_state: optax.OptState
    beta: jnp.ndarray
    beta_delta: jnp.ndarray
    step: jnp.ndarray


@struct.dataclass
class MOReplay:
    """Transition ring + aligned add-time priorities."""

    data: Transition
    priorities: jnp.ndarray
    pos: jnp.ndarray
    size: jnp.ndarray
    capacity: int = struct.field(pytree_node=False)


class Envelope(OffPolicyAlgo):
    def __init__(self, dim_info: DimInfo, reward_dim: int,
                 cfg: EnvelopeConfig = EnvelopeConfig()):
        assert not dim_info.is_continue
        self.dim_info = dim_info
        self.reward_dim = reward_dim
        self.cfg = cfg
        self.net = MOQNet(dim_info.action_dim, reward_dim, tuple(cfg.hidden))
        self.tx = optax.chain(
            *([optax.clip_by_global_norm(cfg.grad_clip)]
              if cfg.grad_clip is not None else []),
            optax.adam(cfg.lr, eps=1e-8),
        )
        # exponential homotopy schedule (reference :94-101)
        self.beta_expbase = float(
            (cfg.homotopy_tau * (cfg.beta_uplim - cfg.beta_init))
            ** (1.0 / cfg.max_episodes)
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> EnvelopeState:
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        w = jnp.zeros((1, self.reward_dim))
        params = self.net.init(key, obs, w)["params"]
        return EnvelopeState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            beta=jnp.float32(self.cfg.beta_init),
            beta_delta=jnp.float32(self.beta_expbase / self.cfg.homotopy_tau),
            step=jnp.int32(0),
        )

    def make_buffer(self, example: Transition, num_envs: int = 0) -> MOReplay:
        cap = self.cfg.buffer_size
        if num_envs > 0 and cap % num_envs != 0:
            cap = ((cap + num_envs - 1) // num_envs) * num_envs
        data = jax.tree.map(
            lambda x: jnp.zeros((cap,) + jnp.shape(x), jnp.asarray(x).dtype),
            example,
        )
        return MOReplay(
            data=data,
            priorities=jnp.zeros((cap,), jnp.float32),
            pos=jnp.int32(0),
            size=jnp.int32(0),
            capacity=cap,
        )

    # ------------------------------------------------------------------
    def _scalarized_q(self, params, obs, w):
        q = self.net.apply({"params": params}, obs, w)   # (..., A, R)
        return jnp.einsum("...ar,...r->...a", q, w), q

    def select_action(self, state: EnvelopeState, obs, key):
        b = obs.shape[0]
        w = random_preference(key, self.reward_dim, (b,))
        wq, _ = self._scalarized_q(state.params, obs, w)
        return jnp.argmax(wq, axis=-1)

    def evaluate_action(self, state: EnvelopeState, obs, preference):
        w = jnp.broadcast_to(preference, obs.shape[:-1] + (self.reward_dim,))
        wq, _ = self._scalarized_q(state.params, obs, w)
        return jnp.argmax(wq, axis=-1)

    def explore(self, state: EnvelopeState, obs, key, ctx: ExploreCtx):
        k_q, k_e, k_r = jax.random.split(key, 3)
        b = obs.shape[0]
        greedy = self.select_action(state, obs, k_q)
        rand = jax.random.randint(k_r, (b,), 0, self.dim_info.action_dim)
        eps = jnp.float32(self.cfg.epsilon)
        if self.cfg.epsilon_decay:
            frac = ctx.episodes.astype(jnp.float32) / self.cfg.max_episodes
            eps = jnp.maximum(
                self.cfg.epsilon
                - (self.cfg.epsilon - self.cfg.epsilon_final) * frac,
                self.cfg.epsilon_final,
            )
        use_rand = jax.random.uniform(k_e, (b,)) < eps
        action = jnp.where(use_rand, rand, greedy)
        if ctx.random_steps > 0:
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    # ------------------------------------------------------------------
    def add_with_priority(self, state: EnvelopeState, buffer: MOReplay,
                          batch: Transition, key):
        """Buffer add + the reference's HER-like add-time priority
        (ENVELOPE_DQN.py:139-190) + per-episode homotopy beta step."""
        cfg = self.cfg
        b = batch.reward.shape[0]
        w = random_preference(key, self.reward_dim, (b,))
        q = self.net.apply({"params": state.params}, batch.obs, w)
        q_a = jnp.take_along_axis(
            q, batch.action.reshape(-1, 1, 1).astype(jnp.int32).repeat(
                self.reward_dim, axis=2
            ), axis=1,
        ).squeeze(1)                                         # (B, R)
        wq = jnp.sum(w * q_a, axis=-1)
        wr = jnp.sum(w * batch.reward, axis=-1)
        next_q = self.net.apply({"params": state.params}, batch.next_obs, w)
        scal = jnp.einsum("bar,br->ba", next_q, w)
        inds = jnp.argmax(scal, axis=-1)
        hq = jnp.take_along_axis(
            next_q, inds.reshape(-1, 1, 1).repeat(self.reward_dim, axis=2),
            axis=1,
        ).squeeze(1)
        whq = jnp.sum(w * hq, axis=-1)
        done = batch.done.astype(jnp.float32)
        p = jnp.abs(
            wr + (1.0 - done) * cfg.gamma * whq - wq
        ) + 1e-5

        idx = (buffer.pos + jnp.arange(b)) % buffer.capacity
        data = jax.tree.map(
            lambda buf, new: buf.at[idx].set(new), buffer.data, batch
        )
        priorities = buffer.priorities.at[idx].set(p)
        buffer = buffer.replace(
            data=data,
            priorities=priorities,
            pos=(buffer.pos + b) % buffer.capacity,
            size=jnp.minimum(buffer.size + b, buffer.capacity),
        )
        # homotopy beta advances once per TERMINATED transition — the
        # reference bumps inside ``add``'s ``done`` branch where done is
        # done_bool=terminated (:182-184, :498-500).  The recurrence
        #   beta += delta; delta = (beta - beta0)*(E - 1)
        # makes (beta - beta0) grow geometrically by E per bump, landing
        # exactly on beta_uplim at max_episodes.  With a vectorized env
        # several episodes can terminate in one step, so apply the bump
        # n_done times (b is small and static: a masked fori_loop).
        n_done = jnp.sum(batch.done.astype(jnp.int32))

        def bump(i, acc):
            beta, delta = acc
            nb = jnp.minimum(beta + delta, cfg.beta_uplim)
            nd = (nb - cfg.beta_init) * (self.beta_expbase - 1.0)
            live = i < n_done
            return (jnp.where(live, nb, beta), jnp.where(live, nd, delta))

        beta, beta_delta = jax.lax.fori_loop(
            0, b, bump, (state.beta, state.beta_delta)
        )
        return state.replace(beta=beta, beta_delta=beta_delta), buffer

    # loop hook: the generic driver routes adds through the algo so the
    # add-time priority and homotopy schedule run in-graph
    add_transition = add_with_priority

    def sample(self, buffer: MOReplay, key, batch_size):
        """Priority-proportional sampling WITHOUT replacement.

        The reference draws ``np.random.choice(..., replace=False,
        p=priorities/sum)`` over the whole buffer (ENVELOPE_DQN.py:191-196).
        Without-replacement matters: add-time priorities are never
        refreshed, so with replacement a few stale high-priority entries
        dominate the batch as near-duplicates (measured here as part of
        the preference-axis Q divergence).  The Gumbel-top-k trick gives
        the exact same Plackett-Luce draw as sequential no-replacement
        sampling, in one fused XLA op.
        """
        logits = jnp.where(
            jnp.arange(buffer.capacity) < buffer.size,
            jnp.log(buffer.priorities + 1e-12),
            -jnp.inf,
        )
        g = jax.random.gumbel(key, logits.shape)
        _, idx = jax.lax.top_k(logits + g, batch_size)
        # size < batch_size (possible only when learning starts before
        # batch_size transitions exist): top_k must fill the tail from
        # -inf-masked unwritten slots — fold those back onto valid
        # entries (the reference instead shrinks the batch via
        # batch_size=min(total, batch) — ENVELOPE_DQN.py:193; a static
        # batch shape needs duplication rather than shrinking)
        idx = jnp.where(idx < buffer.size, idx,
                        idx % jnp.maximum(buffer.size, 1))
        return jax.tree.map(lambda x: x[idx], buffer.data)

    # ------------------------------------------------------------------
    def update(self, state: EnvelopeState, batch: Transition, key):
        cfg = self.cfg
        B = batch.reward.shape[0]
        W = cfg.weight_num
        rep = lambda x: jnp.concatenate([x] * W, axis=0)
        obs = rep(batch.obs)
        actions = rep(batch.action.reshape(-1)).astype(jnp.int32)
        rewards = rep(batch.reward)
        next_obs = rep(batch.next_obs)
        dones = rep(batch.done.astype(jnp.float32))

        w = random_preference(key, self.reward_dim, (W,))
        w = jnp.repeat(w, B, axis=0)                        # (B*W, R)

        # double-DQN: online scalarized argmax, target vector gather
        tmp_q = self.net.apply({"params": state.params}, next_obs, w)
        scal = jnp.einsum("bar,br->ba", tmp_q, w)
        next_actions = jnp.argmax(scal, axis=-1)
        next_q_t = self.net.apply(
            {"params": state.target_params}, next_obs, w
        )
        hq = jnp.take_along_axis(
            next_q_t,
            next_actions.reshape(-1, 1, 1).repeat(self.reward_dim, axis=2),
            axis=1,
        ).squeeze(1)                                        # (B*W, R)
        target_q = rewards + cfg.gamma * hq * (1.0 - dones[:, None])
        target_q = jax.lax.stop_gradient(target_q)
        wtq = jnp.sum(w * target_q, axis=-1)

        def loss_fn(params):
            q = self.net.apply({"params": params}, obs, w)
            q_a = jnp.take_along_axis(
                q, actions.reshape(-1, 1, 1).repeat(self.reward_dim, axis=2),
                axis=1,
            ).squeeze(1)
            wq = jnp.sum(w * q_a, axis=-1)
            aux = jnp.mean(jnp.square(wq - wtq))
            main = jnp.mean(jnp.square(q_a - target_q))
            return state.beta * aux + (1.0 - state.beta) * main

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if cfg.axis_name is not None:
            grads = jax.lax.pmean(grads, cfg.axis_name)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            target_params=polyak(state.target_params, params, cfg.tau),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "beta": state.beta}, None

    def learn_step(self, state, buffer, key, num_envs: int):
        k_s, k_u = jax.random.split(key)
        batch = self.sample(buffer, k_s, self.cfg.batch_size)
        state, metrics, _ = self.update(state, batch, k_u)
        return state, buffer, metrics


# ---------------------------------------------------------------------------
class MOActor(nn.Module):
    """Preference-conditioned tanh actor a = pi(obs, w)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, w):
        x = jnp.concatenate([obs, w], axis=-1)
        for h in self.hidden:
            x = nn.relu(Dense(h)(x))
        return jnp.tanh(Dense(self.action_dim)(x))


class MOCritic(nn.Module):
    """Vector critic Q(obs, a, w) -> (reward_dim,)."""

    reward_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, act, w):
        x = jnp.concatenate([obs, act, w], axis=-1)
        for h in self.hidden:
            x = nn.relu(Dense(h)(x))
        return Dense(self.reward_dim)(x)


@struct.dataclass
class EnvelopeDDPGState:
    actor_params: dict
    actor_target: dict
    critic_params: dict
    critic_target: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    beta: jnp.ndarray
    beta_delta: jnp.ndarray
    step: jnp.ndarray


class EnvelopeDDPG(OffPolicyAlgo):
    """Continuous ENVELOPE (ENVELOPE_MORL_file/ENVELOPE_DDPG.py):
    preference-conditioned actor + vector critic with the same homotopy
    beta-blended scalarized/vector loss as the DQN variant."""

    def __init__(self, dim_info: DimInfo, reward_dim: int,
                 cfg: EnvelopeConfig = EnvelopeConfig()):
        assert dim_info.is_continue
        self.dim_info = dim_info
        self.reward_dim = reward_dim
        self.cfg = cfg
        self.actor = MOActor(dim_info.action_dim, tuple(cfg.hidden))
        self.critic = MOCritic(reward_dim, tuple(cfg.hidden))
        clip = ([optax.clip_by_global_norm(cfg.grad_clip)]
                if cfg.grad_clip is not None else [])
        self.actor_tx = optax.chain(*clip, optax.adam(cfg.lr, eps=1e-8))
        self.critic_tx = optax.chain(*clip, optax.adam(cfg.lr, eps=1e-8))
        self.beta_expbase = float(
            (cfg.homotopy_tau * (cfg.beta_uplim - cfg.beta_init))
            ** (1.0 / cfg.max_episodes)
        )

    def init(self, key: jax.Array) -> EnvelopeDDPGState:
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        w = jnp.zeros((1, self.reward_dim))
        act = jnp.zeros((1, self.dim_info.action_dim))
        a_params = self.actor.init(ka, obs, w)["params"]
        c_params = self.critic.init(kc, obs, act, w)["params"]
        return EnvelopeDDPGState(
            actor_params=a_params, actor_target=a_params,
            critic_params=c_params, critic_target=c_params,
            actor_opt=self.actor_tx.init(a_params),
            critic_opt=self.critic_tx.init(c_params),
            beta=jnp.float32(self.cfg.beta_init),
            beta_delta=jnp.float32(self.beta_expbase / self.cfg.homotopy_tau),
            step=jnp.int32(0),
        )

    def evaluate_action(self, state, obs, preference):
        w = jnp.broadcast_to(preference, obs.shape[:-1] + (self.reward_dim,))
        return self.actor.apply(
            {"params": state.actor_params}, obs, w
        ) * self.dim_info.max_action

    def explore(self, state, obs, key, ctx: ExploreCtx):
        k_w, k_n, k_r = jax.random.split(key, 3)
        b = obs.shape[0]
        max_a = self.dim_info.max_action
        w = random_preference(k_w, self.reward_dim, (b,))
        a = self.actor.apply({"params": state.actor_params}, obs, w) * max_a
        noise = 0.1 * max_a * jax.random.normal(k_n, a.shape)
        action = jnp.clip(a + noise, -max_a, max_a)
        if ctx.random_steps > 0:
            rand = jax.random.uniform(
                k_r, a.shape, jnp.float32, -max_a, max_a
            )
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    def learn_step(self, state, buffer, key, num_envs: int):
        cfg = self.cfg
        k_s, k_w, k_u = jax.random.split(key, 3)
        batch = buffer.sample(k_s, cfg.batch_size)
        B = batch.reward.shape[0]
        W = cfg.weight_num
        rep = lambda x: jnp.concatenate([x] * W, axis=0)
        obs = rep(batch.obs)
        actions = rep(batch.action)
        rewards = rep(batch.reward)
        next_obs = rep(batch.next_obs)
        dones = rep(batch.done.astype(jnp.float32))
        w = jnp.repeat(
            random_preference(k_w, self.reward_dim, (W,)), B, axis=0
        )

        next_a = self.actor.apply(
            {"params": state.actor_target}, next_obs, w
        )
        hq = self.critic.apply(
            {"params": state.critic_target}, next_obs, next_a, w
        )
        target_q = jax.lax.stop_gradient(
            rewards + cfg.gamma * hq * (1.0 - dones[:, None])
        )
        wtq = jnp.sum(w * target_q, axis=-1)

        def critic_loss_fn(params):
            q = self.critic.apply({"params": params}, obs, actions, w)
            wq = jnp.sum(w * q, axis=-1)
            aux = jnp.mean(jnp.square(wq - wtq))
            main = jnp.mean(jnp.square(q - target_q))
            return state.beta * aux + (1.0 - state.beta) * main

        closs, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params
        )
        if cfg.axis_name is not None:
            c_grads = jax.lax.pmean(c_grads, cfg.axis_name)
        c_up, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, c_up)

        def actor_loss_fn(params):
            a = self.actor.apply({"params": params}, obs, w)
            q = self.critic.apply(
                {"params": critic_params}, obs, a, w
            )
            return -jnp.mean(jnp.sum(w * q, axis=-1))

        aloss, a_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params
        )
        if cfg.axis_name is not None:
            a_grads = jax.lax.pmean(a_grads, cfg.axis_name)
        a_up, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_up)

        # homotopy beta advances per learn (episode granularity is handled
        # by the DQN variant's add hook; DDPG keeps the simpler schedule)
        new_beta = jnp.minimum(state.beta + state.beta_delta, cfg.beta_uplim)
        new_delta = (
            (new_beta - cfg.beta_init) * self.beta_expbase
            + cfg.beta_init - new_beta
        )
        new_state = EnvelopeDDPGState(
            actor_params=actor_params,
            actor_target=polyak(state.actor_target, actor_params, cfg.tau),
            critic_params=critic_params,
            critic_target=polyak(state.critic_target, critic_params, cfg.tau),
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            beta=new_beta,
            beta_delta=new_delta,
            step=state.step + 1,
        )
        return new_state, buffer, {
            "critic_loss": closs, "actor_loss": aloss, "beta": state.beta
        }
