"""CEM-GD3PG: evolutionary + gradient hybrid (guided dual-actor DDPG).

Parity surface (CEM_GD3PG_file/CEM_GD3PG.py, ES.py):
  - sepCEM population over FLAT actor parameter vectors (get/set_params
    :51-68 — here jax.flatten_util.ravel_pytree);
  - dual gradient actors f1/f2 with EMA fitness (alpha=0.2 :446-448) and
    the domain actor copying the stronger one; the weaker actor is pulled
    toward the domain policy with lambda=10 * delta * RMS action gap
    (:197-215) where delta = 1 - f_weak/f_strong clipped to 1 (:451-460);
  - best ES member mixes into the weaker actor with beta=0.5 (:435-438);
  - DUAL replay buffers (population rollouts vs domain rollouts), learn
    samples half from each (:161-176);
  - critic: single Q with min over the two actor targets' bootstraps
    (:183-188); per-env-step gradient updates.

TPU-native: population fitness evaluation is a VMAPPED rollout — all
pop_size candidate actors step their own env instance in lockstep in one
XLA program (the reference evaluates candidates one sequential episode at
a time).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from freerl_tpu.algos.common import polyak
from freerl_tpu.algos.ddpg import QCritic, TanhActor
from freerl_tpu.algos.es import sepCEM
from freerl_tpu.buffers.uniform import ReplayBuffer
from freerl_tpu.core.types import DimInfo, Transition
from freerl_tpu.envs.base import Env, step_auto_reset


@dataclasses.dataclass(frozen=True)
class CEMGD3PGConfig:
    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 64
    buffer_size: int = 200_000
    hidden: Sequence[int] = (128, 128)
    lambda_: float = 10.0           # guidance weight (:42)
    alpha: float = 0.2              # fitness EMA
    beta_mix: float = 0.5           # ES-elite mixing into the weak actor
    pop_size: int = 10
    sigma_init: float = 1e-3
    damp: float = 1e-3
    damp_limit: float = 1e-5
    elitism: bool = False
    gauss_sigma: float = 0.1
    sigma_decay: float = 0.999
    sigma_min: float = 0.05
    axis_name: Optional[str] = None


@struct.dataclass
class CEMGD3PGState:
    actor1: dict
    actor2: dict
    actor1_target: dict
    actor2_target: dict
    domain: dict
    critic: dict
    critic_target: dict
    actor1_opt: optax.OptState
    actor2_opt: optax.OptState
    critic_opt: optax.OptState
    f1_total: jnp.ndarray
    f2_total: jnp.ndarray
    step: jnp.ndarray


class CEMGD3PG:
    def __init__(self, dim_info: DimInfo,
                 cfg: CEMGD3PGConfig = CEMGD3PGConfig()):
        assert dim_info.is_continue
        self.dim_info = dim_info
        self.cfg = cfg
        self.actor = TanhActor(
            dim_info.action_dim, tuple(cfg.hidden), dim_info.max_action
        )
        self.critic = QCritic(tuple(cfg.hidden))
        # reference clips actor_1/actor_2/critic at norm 0.5 every update
        # (CEM_GD3PG.py:114-126)
        self.actor_tx = optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adam(cfg.actor_lr, eps=1e-8),
        )
        self.critic_tx = optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adam(cfg.critic_lr, eps=1e-8),
        )
        self._unravel = None
        # jitted population-rollout programs keyed by (env id, P, T) —
        # defining the closure per call would recompile the full
        # episode scan on EVERY fitness evaluation
        self._eval_cache = {}

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> CEMGD3PGState:
        k1, k2, kc = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.dim_info.obs_dim))
        act = jnp.zeros((1, self.dim_info.action_dim))
        a1 = self.actor.init(k1, obs)["params"]
        a2 = self.actor.init(k2, obs)["params"]
        c = self.critic.init(kc, obs, act)["params"]
        flat, unravel = jax.flatten_util.ravel_pytree(a1)
        self._unravel = unravel
        self.num_params = flat.shape[0]
        return CEMGD3PGState(
            actor1=a1, actor2=a2, actor1_target=a1, actor2_target=a2,
            domain=a1, critic=c, critic_target=c,
            actor1_opt=self.actor_tx.init(a1),
            actor2_opt=self.actor_tx.init(a2),
            critic_opt=self.critic_tx.init(c),
            f1_total=jnp.float32(0.0),
            f2_total=jnp.float32(0.0),
            step=jnp.int32(0),
        )

    def get_params(self, actor_params) -> np.ndarray:
        return np.asarray(jax.flatten_util.ravel_pytree(actor_params)[0])

    def set_params(self, flat: np.ndarray):
        return self._unravel(jnp.asarray(flat, jnp.float32))

    # ------------------------------------------------------------------
    def select_action(self, actor_params, obs):
        return self.actor.apply({"params": actor_params}, obs)

    def eval_population(self, env: Env, flat_params: np.ndarray, key,
                        max_steps: Optional[int] = None):
        """Fitness of P candidate actors, each driving its own env — one
        vmapped scan. Returns (fitness (P,), transitions for the buffer)."""
        P = flat_params.shape[0]
        T = max_steps or env.max_steps
        pop = jax.vmap(self._unravel)(jnp.asarray(flat_params, jnp.float32))

        cached = self._eval_cache.get((id(env), P, T))
        if cached is not None:
            return cached(pop, jnp.asarray(key))

        @jax.jit
        def run(pop, key):
            keys = jax.random.split(key, P)
            state, obs = jax.vmap(env.reset)(keys)

            def step(carry, t):
                state, obs, ret, done_once = carry
                action = jax.vmap(
                    lambda p, o: self.actor.apply({"params": p}, o)
                )(pop, obs)
                ks = jax.random.split(jax.random.fold_in(key, t), P)
                out = jax.vmap(
                    lambda s, a, k: step_auto_reset(env, s, a, k)
                )(state, action, ks)
                # fitness = FIRST episode's return per candidate
                ret = ret + out.reward * (~done_once)
                done_once = done_once | out.episode_done
                trans = Transition(
                    obs=obs, action=action, reward=out.reward,
                    next_obs=out.next_obs, done=out.terminated,
                    episode_done=out.episode_done,
                )
                return (out.state, out.carry_obs, ret, done_once), trans

            (_, _, ret, _), transitions = jax.lax.scan(
                step,
                (state, obs, jnp.zeros((P,)), jnp.zeros((P,), bool)),
                jnp.arange(T),
            )
            return ret, transitions

        self._eval_cache[(id(env), P, T)] = run
        return run(pop, jnp.asarray(key))

    # ------------------------------------------------------------------
    def learn(self, state: CEMGD3PGState, batch: Transition,
              is_f1_more, delta):
        """One gradient step (reference learn :181-221). ``is_f1_more`` and
        ``delta`` are traced scalars; both guidance branches are computed
        and selected — one compiled program."""
        cfg = self.cfg
        reward = batch.reward.reshape(-1)
        done = batch.done.reshape(-1).astype(jnp.float32)
        action = batch.action.reshape(-1, self.dim_info.action_dim)

        # critic: min over the two actor targets' bootstraps
        na1 = self.actor.apply({"params": state.actor1_target},
                               batch.next_obs)
        na2 = self.actor.apply({"params": state.actor2_target},
                               batch.next_obs)
        q1 = self.critic.apply({"params": state.critic_target},
                               batch.next_obs, na1)
        q2 = self.critic.apply({"params": state.critic_target},
                               batch.next_obs, na2)
        target = jax.lax.stop_gradient(
            reward + cfg.gamma * jnp.minimum(q1, q2) * (1.0 - done)
        )

        def critic_loss_fn(params):
            q = self.critic.apply({"params": params}, batch.obs, action)
            return jnp.mean(jnp.square(q - target))

        closs, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic)
        c_up, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic
        )
        critic = optax.apply_updates(state.critic, c_up)

        domain_a = self.actor.apply({"params": state.domain}, batch.obs)

        def actor_loss(params, guided):
            a = self.actor.apply({"params": params}, batch.obs)
            q = jnp.mean(self.critic.apply({"params": critic},
                                           batch.obs, a))
            gap = a - domain_a
            # eps keeps the sqrt gradient finite when the actor IS the
            # domain policy (gap=0 -> d sqrt = inf -> 0*inf = NaN)
            kl = jnp.sqrt(jnp.sum(gap * gap) / gap.shape[0] + 1e-8)
            return -q + guided * cfg.lambda_ * delta * kl

        # actor1 guided when f2 is stronger; actor2 guided when f1 is
        g1 = jnp.where(is_f1_more, 0.0, 1.0)
        g2 = jnp.where(is_f1_more, 1.0, 0.0)
        l1, a1_grads = jax.value_and_grad(actor_loss)(state.actor1, g1)
        l2, a2_grads = jax.value_and_grad(actor_loss)(state.actor2, g2)
        a1_up, actor1_opt = self.actor_tx.update(
            a1_grads, state.actor1_opt, state.actor1
        )
        actor1 = optax.apply_updates(state.actor1, a1_up)
        a2_up, actor2_opt = self.actor_tx.update(
            a2_grads, state.actor2_opt, state.actor2
        )
        actor2 = optax.apply_updates(state.actor2, a2_up)

        new_state = state.replace(
            actor1=actor1, actor2=actor2,
            actor1_target=polyak(state.actor1_target, actor1, cfg.tau),
            actor2_target=polyak(state.actor2_target, actor2, cfg.tau),
            critic=critic,
            critic_target=polyak(state.critic_target, critic, cfg.tau),
            actor1_opt=actor1_opt, actor2_opt=actor2_opt,
            critic_opt=critic_opt,
            step=state.step + 1,
        )
        return new_state, {"critic_loss": closs}


def train_cem_gd3pg(env: Env, algo: CEMGD3PG, max_episodes: int = 200,
                    seed: int = 0, start_steps: int = 1000,
                    updates_per_episode: Optional[int] = None,
                    full_ratio: bool = False,
                    on_episode=None):
    """The reference's ES/gradient interleave (CEM_GD3PG.py:398-487) with
    TPU-parallel population evaluation. Returns (state, returns, info).

    ``full_ratio=True`` reproduces the reference's update cadence exactly
    (``for _ in range(steps): policy.learn(...)`` :483-485 — one gradient
    step per domain-episode env step, up to 1600/episode on
    BipedalWalker); the default caps at 100 updates/episode for test
    economy. The update loop runs as ONE jitted fori_loop burst —
    sampling both buffers and stepping the learner on-device — so the
    full-protocol run costs one dispatch per episode, not 1600."""
    import time as _time

    cfg = algo.cfg
    key = jax.random.PRNGKey(seed)
    k_init, key = jax.random.split(key)
    state = algo.init(k_init)
    example = Transition(
        obs=jnp.zeros((env.dim_info.obs_dim,)),
        action=jnp.zeros((env.dim_info.action_dim,)),
        reward=jnp.float32(0),
        next_obs=jnp.zeros((env.dim_info.obs_dim,)),
        done=jnp.bool_(False),
        episode_done=jnp.bool_(False),
    )
    buffer = ReplayBuffer.create(cfg.buffer_size, example)
    buffer_domain = ReplayBuffer.create(cfg.buffer_size, example)

    es = sepCEM(
        algo.num_params, mu_init=algo.get_params(state.actor1),
        sigma_init=cfg.sigma_init, damp=cfg.damp,
        damp_limit=cfg.damp_limit, pop_size=cfg.pop_size,
        antithetic=not cfg.pop_size % 2, parents=cfg.pop_size // 2,
        elitism=cfg.elitism,
    )
    P = cfg.pop_size
    es_params = es.ask(P * 2)
    k_eval, key = jax.random.split(key)
    fitness_arr, trans = algo.eval_population(env, es_params[:P], k_eval)
    fitness = list(np.asarray(fitness_arr))
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), trans)
    buffer = buffer.add(flat)

    half_b = cfg.batch_size // 2

    @jax.jit
    def learn_burst(state, buffer, buffer_domain, key, n_upd,
                    is_f1_more, delta):
        def body(i, carry):
            st, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            b1 = buffer.sample(k1, half_b)
            b2 = buffer_domain.sample(k2, half_b)
            batch = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), b1, b2
            )
            st, _ = algo.learn(st, batch, is_f1_more, delta)
            return (st, k)
        return jax.lax.fori_loop(0, n_upd, body, (state, key))[0]

    gauss_sigma = cfg.gauss_sigma
    returns = []
    cnt_es = 0
    t0 = _time.time()
    total_steps = int(np.asarray(trans.reward).size)

    # ---- fused per-episode program -----------------------------------
    # The reference runs THREE sequential full episodes per training
    # episode (f1 eval, f2 eval, domain rollout — CEM_GD3PG.py:442-470).
    # The walker physics step is op-count-heavy (unrolled joint/contact
    # solver), so an UNBATCHED 1600-step scan costs seconds of pure
    # per-op overhead; three of them dominated the wall-clock. Fused
    # version: ONE 4-lane vmapped scan per episode — lanes 0/1 are the
    # clean f1/f2 evals, lanes 2/3 are noisy domain rollouts for BOTH
    # candidates (the reference picks the domain actor only after the
    # evals; rolling both and keeping the chosen lane reproduces its
    # ordering with one program) — executed in early-exit CHUNKS so
    # short episodes stop after their chunk instead of scanning all
    # max_steps.
    T = env.max_steps
    CH = T // 10 if T % 10 == 0 and T > 256 else T
    n_chunks = T // CH
    ma = algo.dim_info.max_action

    @jax.jit
    def reset4(key):
        return jax.vmap(env.reset)(jax.random.split(key, 4))

    @jax.jit
    def fused_chunk(params4, st, obs, ret, ep_len, done_once, key, sig4):
        def step(carry, t):
            st, obs, ret, ep_len, done_once, k = carry
            k, kn, kt = jax.random.split(k, 3)
            a = jax.vmap(
                lambda p, o: algo.actor.apply({"params": p}, o)
            )(params4, obs)
            a = jnp.clip(
                a + sig4[:, None] * ma * jax.random.normal(kn, a.shape),
                -ma, ma,
            )
            ks = jax.random.split(kt, 4)
            out = jax.vmap(
                lambda s_, a_, k_: step_auto_reset(env, s_, a_, k_)
            )(st, a, ks)
            ret = ret + out.reward * (~done_once)
            ep_len = ep_len + (~done_once).astype(jnp.int32)
            done_once = done_once | out.episode_done
            trans = Transition(
                obs=obs[2:], action=a[2:], reward=out.reward[2:],
                next_obs=out.next_obs[2:], done=out.terminated[2:],
                episode_done=out.episode_done[2:],
            )
            return (out.state, out.carry_obs, ret, ep_len, done_once, k), \
                trans

        (st, obs, ret, ep_len, done_once, key), trans = jax.lax.scan(
            step, (st, obs, ret, ep_len, done_once, key), jnp.arange(CH)
        )
        return st, obs, ret, ep_len, done_once, key, trans, \
            jnp.all(done_once)

    def fused_episode(a1, a2, key, sigma):
        """Returns (f1, f2, ep_len4, chunks, n_chunks_run) — chunks hold
        the (CH, 2, ...) noisy-lane transitions per chunk."""
        params4 = jax.tree.map(
            lambda x, y: jnp.stack([x, y, x, y]), a1, a2
        )
        sig4 = jnp.array([0.0, 0.0, sigma, sigma], jnp.float32)
        k0, key = jax.random.split(key)
        st, obs = reset4(k0)
        ret = jnp.zeros((4,))
        ep_len = jnp.zeros((4,), jnp.int32)
        done_once = jnp.zeros((4,), bool)
        chunks = []
        for _ in range(n_chunks):
            st, obs, ret, ep_len, done_once, key, trans, all_done = \
                fused_chunk(params4, st, obs, ret, ep_len, done_once,
                            key, sig4)
            chunks.append(trans)
            if bool(all_done):     # one scalar readback per chunk
                break
        return ret, ep_len, chunks

    for ep in range(max_episodes):
        if cnt_es == P:
            es.tell(es_params, fitness)
            half = es.ask(P)
            k_eval, key = jax.random.split(key)
            fit_arr, trans = algo.eval_population(env, half, k_eval)
            fitness = list(np.asarray(fit_arr))
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), trans
            )
            buffer = buffer.add(flat)
            total_steps += int(np.asarray(trans.reward).size)
            cnt_es = 0
            best = int(np.argmax(fitness))
            if float(state.f1_total) >= float(state.f2_total):
                mixed = (half[best] + algo.get_params(state.actor2)) / 2
                state = state.replace(actor2=algo.set_params(mixed))
            else:
                mixed = (half[best] + algo.get_params(state.actor1)) / 2
                state = state.replace(actor1=algo.set_params(mixed))
            es_params[:P] = half

        # evaluate both gradient actors + roll both candidate domain
        # episodes in ONE fused 4-lane program
        k_ep, key = jax.random.split(key)
        ret4, ep_len4, dom_chunks = fused_episode(
            state.actor1, state.actor2, k_ep, gauss_sigma
        )
        ret4_h = np.asarray(ret4)
        ep_len4_h = np.asarray(ep_len4)
        f1, f2 = float(ret4_h[0]), float(ret4_h[1])
        f1_total = (1 - cfg.alpha) * float(state.f1_total) + cfg.alpha * f1
        f2_total = (1 - cfg.alpha) * float(state.f2_total) + cfg.alpha * f2
        is_f1_more = f1_total >= f2_total
        # reference delta (:451-460): ratio gap clipped at 1; when the
        # stronger EMA is non-positive, flip the ratio (both negative)
        if is_f1_more:
            domain = state.actor1
            if f1_total > 0:
                delta = min(1.0, 1 - f2_total / f1_total)
            else:
                delta = 1 - f1_total / f2_total if f2_total != 0 else 1.0
        else:
            domain = state.actor2
            if f2_total > 0:
                delta = min(1.0, 1 - f1_total / f2_total)
            else:
                delta = 1 - f2_total / f1_total if f1_total != 0 else 1.0
        state = state.replace(
            f1_total=jnp.float32(f1_total), f2_total=jnp.float32(f2_total),
            domain=domain,
        )
        es_params[cnt_es + P] = algo.get_params(domain)
        fitness.append(max(f1, f2))
        cnt_es += 1

        # chosen domain lane -> domain buffer. The chunks cover whole
        # CH-step windows (auto-reset rolls into follow-on episodes —
        # extra in-distribution data the reference lacks), but the
        # RECORDED return and update count use the FIRST episode only,
        # matching the reference's one-episode/ep_len-updates cadence.
        lane = 0 if is_f1_more else 1
        for trans in dom_chunks:
            buffer_domain = buffer_domain.add(
                jax.tree.map(lambda x: x[:, lane], trans)
            )
        ep_ret = float(ret4_h[2 + lane])
        ep_len = int(ep_len4_h[2 + lane])
        n_steps = ep_len if full_ratio else len(dom_chunks) * CH
        total_steps += n_steps
        gauss_sigma = max(cfg.sigma_min, gauss_sigma * cfg.sigma_decay)
        returns.append(float(ep_ret))

        if total_steps > start_steps:
            n_upd = updates_per_episode or (
                n_steps if full_ratio else min(n_steps, 100)
            )
            k_b, key = jax.random.split(key)
            state = learn_burst(
                state, buffer, buffer_domain, k_b, jnp.int32(n_upd),
                jnp.bool_(is_f1_more), jnp.float32(delta),
            )

        if on_episode is not None:
            on_episode(ep, returns, total_steps)

    info = {
        "elapsed_s": _time.time() - t0,
        "episodes": len(returns),
        "env_steps": total_steps,
    }
    return state, np.asarray(returns), info
