"""DQN and its trick matrix (Double / Dueling / PER / Noisy / N-step /
Categorical-C51 / all-on = Rainbow) as fused jitted updates.

Behavioral parity with the reference's DQN (DQN_file/DQN.py) and trick
dispatch (DQN_file/DQN_with_tricks.py:242-284): TD backup
``r + gamma^m * max_a Q'(s',a) * (1-d)``, per-step polyak tau (not hard
copies), Adam(lr 1e-3, eps 1e-8), MSE loss (IS-weighted under PER,
cross-entropy under C51), Double-DQN argmax from the online net
(:263-265), C51 with 51 atoms on [-100, 100] (:81-160).

TPU-native shape: one ``update`` call is a single XLA program — sample
indices, gathers, forward, loss, backward, Adam, polyak all fuse; no
host<->device traffic. All 2^6 trick combos resolve at trace time from the
static config (python ifs on config fields), so each combo compiles to its
own specialized kernel.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from freerl_tpu.algos.base import OffPolicyAlgo
from freerl_tpu.algos.common import c51_project, polyak
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.nets.mlp import Dense
from freerl_tpu.nets.noisy import NoisyDense


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """Static hyperparameters. Defaults mirror the reference argparse
    (DQN_file/DQN.py:227-253)."""

    lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 256
    hidden: Sequence[int] = (128,)
    buffer_size: int = 1_000_000
    epsilon: float = 0.1
    # trick flags (the reference's ``trick`` dict)
    double: bool = False
    dueling: bool = False
    per: bool = False
    # PER sampling backend: 'cumsum' (dense inverse-CDF — measured
    # 17% faster per add+sample+update cycle on v5e at 1M capacity,
    # results/per_bench.json: 471.8 us vs tree 569.3 / tree+pallas
    # 560.9) or 'tree' (the reference-shaped sum-tree descent; +
    # use_pallas routing). Identical sampling distribution either way
    # (tests/test_pallas_ops.py).
    per_sampler: str = "cumsum"
    noisy: bool = False
    n_step: int = 1          # >1 enables the N_Step trick
    categorical: bool = False
    n_atoms: int = 51
    v_min: float = -100.0
    v_max: float = 100.0
    # pixel observations: set to the env's (H, W, C) to prepend a conv
    # trunk (nets/cnn.py) that consumes the flat obs vector
    obs_shape: Optional[tuple] = None
    conv_arch: str = "small"
    cnn_features: int = 256
    # store the replay ring's float leaves in bfloat16 (halved HBM
    # footprint/bandwidth; samples upcast to f32 for the update math)
    bf16_replay: bool = False
    # when set, updates pmean-reduce gradients over this mesh axis (the
    # shard_map data-parallel learner — freerl_tpu/distributed/dp.py)
    axis_name: Optional[str] = None

    @property
    def explore_epsilon(self) -> float:
        """Noisy nets replace epsilon-greedy exploration."""
        return 0.0 if self.noisy else self.epsilon


class QNetwork(nn.Module):
    """One module covering all 8 head combos: (noisy) x (dueling) x (C51).

    Plain output: (..., A) Q-values. Categorical output: (..., A, atoms)
    logits.
    """

    action_dim: int
    hidden: Sequence[int] = (128,)
    noisy: bool = False
    dueling: bool = False
    categorical: bool = False
    n_atoms: int = 51
    obs_shape: Optional[tuple] = None     # pixel input -> conv trunk
    conv_arch: str = "small"
    cnn_features: int = 256

    def _dense(self, features):
        return NoisyDense(features) if self.noisy else Dense(features)

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        if self.obs_shape is not None:
            from freerl_tpu.nets.cnn import ConvTrunk

            x = ConvTrunk(obs_shape=tuple(self.obs_shape),
                          features=self.cnn_features,
                          arch=self.conv_arch)(x)
        call = (lambda m, v: m(v, deterministic)) if self.noisy else (
            lambda m, v: m(v)
        )
        # hidden trunk stays ORDINARY even with the Noisy trick: the
        # reference replaces only the heads with NoisyLinear
        # (DQN_with_tricks.py:49-51 'l1' plain / 'l2' noisy, :68-70 V/A
        # heads, :91-95 atom head)
        for h in self.hidden:
            x = nn.relu(Dense(h)(x))
        per_action = self.n_atoms if self.categorical else 1
        a_out = call(self._dense(self.action_dim * per_action), x)
        if self.categorical:
            a_out = a_out.reshape(x.shape[:-1] + (self.action_dim, self.n_atoms))
        if self.dueling:
            v_out = call(self._dense(per_action), x)
            if self.categorical:
                v_out = v_out.reshape(x.shape[:-1] + (1, self.n_atoms))
                a_out = v_out + a_out - jnp.mean(a_out, axis=-2, keepdims=True)
            else:
                a_out = v_out + a_out - jnp.mean(a_out, axis=-1, keepdims=True)
        return a_out


@struct.dataclass
class DQNState:
    params: dict
    target_params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


class DQN(OffPolicyAlgo):
    """Functional DQN: static config in the object, dynamic state in
    :class:`DQNState`. API parity: select_action / evaluate_action / update
    mirror the reference's select_action / evaluate_action / learn."""

    def __init__(self, dim_info: DimInfo, cfg: DQNConfig = DQNConfig()):
        assert not dim_info.is_continue, (
            "DQN is discrete-action; wrap continuous envs with "
            "DisToConWrapper (the reference's dis_to_con)"
        )
        self.dim_info = dim_info
        self.cfg = cfg
        self.net = QNetwork(
            action_dim=dim_info.action_dim,
            hidden=tuple(cfg.hidden),
            noisy=cfg.noisy,
            dueling=cfg.dueling,
            categorical=cfg.categorical,
            n_atoms=cfg.n_atoms,
            obs_shape=cfg.obs_shape,
            conv_arch=cfg.conv_arch,
            cnn_features=cfg.cnn_features,
        )
        self.tx = optax.adam(cfg.lr, eps=1e-8)
        if cfg.categorical:
            self.atoms = jnp.linspace(cfg.v_min, cfg.v_max, cfg.n_atoms)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> DQNState:
        k_param, k_noise = jax.random.split(key)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        rngs = {"params": k_param}
        if self.cfg.noisy:
            rngs["noise"] = k_noise
        params = self.net.init(rngs, obs)["params"]
        return DQNState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _apply(self, params, obs, key=None, deterministic=True):
        if self.cfg.noisy:
            rngs = None if deterministic else {"noise": key}
            return self.net.apply(
                {"params": params}, obs, deterministic, rngs=rngs
            )
        return self.net.apply({"params": params}, obs)

    def _q_values(self, params, obs, key=None, deterministic=True):
        out = self._apply(params, obs, key, deterministic)
        if self.cfg.categorical:
            probs = jax.nn.softmax(out, axis=-1)
            return jnp.sum(probs * self.atoms, axis=-1)
        return out

    # ------------------------------------------------------------------
    def select_action(self, state: DQNState, obs, key=None):
        """Greedy (batched) action; exploration noise (epsilon / noisy-net
        sampling) is composed by the train loop.

        Noisy nets draw INDEPENDENT noise per env row: the reference's
        single env resamples noise every step (Noisy_net.py:41), so each
        of its 500 episodes is an independent noisy trajectory. Sharing
        one draw across the vector batch collapses that diversity ~B-fold
        (measured: MountainCar never solved at 8 envs with shared noise);
        per-env noise restores one independent explorer per env.
        """
        if self.cfg.noisy and key is not None:
            keys = jax.random.split(key, obs.shape[0])
            q = jax.vmap(
                lambda o, k: self._q_values(
                    state.params, o[None], k, deterministic=False
                )[0]
            )(obs, keys)
        else:
            q = self._q_values(
                state.params, obs, key, deterministic=not self.cfg.noisy
            )
        return jnp.argmax(q, axis=-1)

    def evaluate_action(self, state: DQNState, obs):
        q = self._q_values(state.params, obs, deterministic=True)
        return jnp.argmax(q, axis=-1)

    # ------------------------------------------------------------------
    def update(self, state: DQNState, batch: Transition,
               eff_gamma: Optional[jnp.ndarray] = None,
               is_weights: Optional[jnp.ndarray] = None,
               key: Optional[jax.Array] = None):
        """One fused learner step. Returns (state, metrics, priorities)."""
        cfg = self.cfg
        gamma = eff_gamma if eff_gamma is not None else cfg.gamma
        w = is_weights if is_weights is not None else 1.0
        action = batch.action.reshape(-1).astype(jnp.int32)
        reward = batch.reward.reshape(-1)
        done = batch.done.reshape(-1).astype(jnp.float32)
        if cfg.noisy:
            k_online, k_target, k_double = jax.random.split(key, 3)
        else:
            k_online = k_target = k_double = None
        b = action.shape[0]
        bidx = jnp.arange(b)

        if cfg.categorical:
            # target distribution
            next_out_t = self._apply(
                state.target_params, batch.next_obs, k_target,
                deterministic=not cfg.noisy,
            )
            next_probs_t = jax.nn.softmax(next_out_t, axis=-1)
            if cfg.double:
                next_q_online = self._q_values(
                    state.params, batch.next_obs, k_double,
                    deterministic=not cfg.noisy,
                )
                next_a = jnp.argmax(next_q_online, axis=-1)
            else:
                next_q_t = jnp.sum(next_probs_t * self.atoms, axis=-1)
                next_a = jnp.argmax(next_q_t, axis=-1)
            next_dist = next_probs_t[bidx, next_a]              # (B, N)
            g = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32), (b,))
            tz = reward[:, None] + (g * (1.0 - done))[:, None] * self.atoms
            proj = c51_project(next_dist, tz, self.atoms)
            proj = jax.lax.stop_gradient(proj)

            def loss_fn(params):
                out = self._apply(
                    params, batch.obs, k_online, deterministic=not cfg.noisy
                )
                logp = jax.nn.log_softmax(out, axis=-1)[bidx, action]  # (B,N)
                ce = -jnp.sum(proj * logp, axis=-1)
                loss = jnp.mean(w * ce)
                return loss, ce

            (loss, per_sample), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            priorities = per_sample
        else:
            if cfg.double:
                next_q_online = self._q_values(
                    state.params, batch.next_obs, k_double,
                    deterministic=not cfg.noisy,
                )
                next_a = jnp.argmax(next_q_online, axis=-1)
                next_q_t_all = self._q_values(
                    state.target_params, batch.next_obs, k_target,
                    deterministic=not cfg.noisy,
                )
                next_v = next_q_t_all[bidx, next_a]
            else:
                next_q_t_all = self._q_values(
                    state.target_params, batch.next_obs, k_target,
                    deterministic=not cfg.noisy,
                )
                next_v = jnp.max(next_q_t_all, axis=-1)
            target = reward + gamma * next_v * (1.0 - done)
            target = jax.lax.stop_gradient(target)

            def loss_fn(params):
                q_all = self._q_values(
                    params, batch.obs, k_online, deterministic=not cfg.noisy
                )
                q = q_all[bidx, action]
                td = q - target
                loss = jnp.mean(w * jnp.square(td))
                return loss, jnp.abs(td)

            (loss, priorities), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)

        if cfg.axis_name is not None:
            grads = jax.lax.pmean(grads, cfg.axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        target_params = polyak(state.target_params, params, cfg.tau)
        new_state = DQNState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "td_abs_mean": jnp.mean(priorities)}
        return new_state, metrics, priorities

    # ------------------------------------------------------------------
    # Train-loop adapter (consumed by freerl_tpu.train.loop.train_offpolicy)
    # ------------------------------------------------------------------
    def make_buffer(self, example: Transition, num_envs: int = 0):
        from freerl_tpu.buffers.per import PERBuffer
        from freerl_tpu.buffers.uniform import ReplayBuffer

        if self.cfg.per:
            # PER rounds capacity to the next power of two itself, so the
            # usual power-of-two env batches stay slice-aligned.
            return PERBuffer.create(self.cfg.buffer_size, example,
                                    sampler=self.cfg.per_sampler)
        return ReplayBuffer.create(
            self.cfg.buffer_size, example, add_batch=num_envs
        )

    def explore(self, state: DQNState, obs, key, ctx):
        """Epsilon-greedy (or pure noisy-net) exploration, batched.

        Mirrors the reference's action branch (DQN_file/DQN.py:296-310):
        uniform-random during warmup, then epsilon-greedy with fixed epsilon.
        """
        k_q, k_e, k_r = jax.random.split(key, 3)
        b = obs.shape[0]
        greedy = self.select_action(state, obs, k_q)
        rand = jax.random.randint(k_r, (b,), 0, self.dim_info.action_dim)
        eps = self.cfg.explore_epsilon
        use_rand = jax.random.uniform(k_e, (b,)) < eps
        action = jnp.where(use_rand, rand, greedy)
        if ctx.random_steps > 0:
            action = jnp.where(
                ctx.total_env_steps < ctx.random_steps, rand, action
            )
        return state, action

    def learn_step(self, state: DQNState, buffer, key, num_envs: int):
        """Sample (uniform / PER / n-step) + update + priority write-back,
        fused. ``num_envs`` is the ring stride between same-env successors
        (see buffers/nstep.py)."""
        from freerl_tpu.buffers.nstep import nstep_fold, nstep_sample_range

        cfg = self.cfg
        k_s, k_u = jax.random.split(key)
        eff_gamma = None
        if cfg.per:
            if cfg.n_step > 1:
                buffer, idx, w = buffer.sample_idx(k_s, cfg.batch_size)
                batch, eff_gamma = nstep_fold(
                    buffer.data, idx, num_envs, cfg.n_step, cfg.gamma
                )
            else:
                buffer, batch, idx, w = buffer.sample(k_s, cfg.batch_size)
            state, metrics, prio = self.update(state, batch, eff_gamma, w, k_u)
            buffer = buffer.update_priorities(idx, prio)
        else:
            if cfg.n_step > 1:
                idx = nstep_sample_range(
                    buffer.size, buffer.capacity, buffer.pos, num_envs,
                    cfg.n_step, k_s, cfg.batch_size,
                )
                batch, eff_gamma = nstep_fold(
                    buffer.data, idx, num_envs, cfg.n_step, cfg.gamma
                )
            else:
                batch = buffer.sample(k_s, cfg.batch_size)
            state, metrics, _ = self.update(state, batch, eff_gamma, None, k_u)
        return state, buffer, metrics
