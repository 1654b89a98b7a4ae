"""HAPPO: heterogeneous-agent trust-region PPO with the sequential
importance factor chain.

Parity surface (MAPPO_file/HAPPO.py:339-457): MAPPO's joint-GAE +
centralized critics, but agents update SEQUENTIALLY in a random
permutation (:376); a compound ``factor`` (horizon, 1), initialized to
ones (:373), multiplies each agent's clipped surrogate (:415) and is
updated after each agent's K epochs via exp(new_logp - old_logp) over the
full horizon (:444-453). Actor and critic use separate Adam optimizers
(HAPPO keeps them split, unlike MAPPO's merged one). Converged lr 1e-4
(README.md:149-158).

TPU-native: the permutation is a traced array; each position dispatches a
``lax.switch`` over per-agent update branches, so the random order needs
no recompilation while per-agent parameter pytrees stay heterogeneous.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import optax
from flax import struct

from freerl_tpu.algos.common import clip_grads_by_norm
from freerl_tpu.algos.common import huber as huber_fn
from freerl_tpu.algos.mappo import MAPPO, MAPPOConfig, MAPPOState
from freerl_tpu.envs.base import Env


@dataclasses.dataclass(frozen=True)
class HAPPOConfig(MAPPOConfig):
    actor_lr: float = 1e-4
    critic_lr: float = 1e-4


@struct.dataclass
class HAPPOState(MAPPOState):
    actor_opts: tuple = ()
    critic_opts: tuple = ()


class HAPPO(MAPPO):
    def __init__(self, env: Env, cfg: HAPPOConfig = None):
        super().__init__(env, cfg or HAPPOConfig())
        cfg = self.cfg
        eps = 1e-5 if cfg.adam_eps else 1e-8
        self.actor_tx = optax.adam(cfg.actor_lr, eps=eps)
        self.critic_tx = optax.adam(cfg.critic_lr, eps=eps)

    def init(self, key: jax.Array) -> HAPPOState:
        base = super().init(key)
        return HAPPOState(
            actor_params=base.actor_params,
            critic_params=base.critic_params,
            opt_states=base.opt_states,
            obs_rms=base.obs_rms,
            rew_rms=base.rew_rms,
            rew_scale=base.rew_scale,
            step=base.step,
            actor_opts=tuple(
                self.actor_tx.init(p) for p in base.actor_params
            ),
            critic_opts=tuple(
                self.critic_tx.init(p) for p in base.critic_params
            ),
        )

    # ------------------------------------------------------------------
    def update(self, state: HAPPOState, rollout, key, episodes=None):
        cfg = self.cfg
        A = self.n_agents
        T, N = rollout.reward.shape[:2]
        B = T * N
        mb = min(cfg.minibatch_size, B)
        n_mb = B // mb

        vs = jnp.stack([
            self.critics[i].apply(
                {"params": state.critic_params[i]},
                self._critic_input(rollout.obs, i),
            )
            for i in range(A)
        ], axis=-1)
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
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        obs_f = rollout.obs.reshape((B, A, -1))
        act_f = (
            rollout.action.reshape((B, A, -1))
            if self.is_continue else rollout.action.reshape((B, A))
        )
        logp_old_f = rollout.log_pi.reshape((B, A))
        adv_f = jax.lax.stop_gradient(adv.reshape((B, A)))
        vt_f = jax.lax.stop_gradient(v_target.reshape((B, A)))

        def full_logp(a_params, i):
            act_i = (
                act_f[:, i, : self.act_dims[i]] if self.is_continue
                else act_f[:, i]
            )
            # _actor_obs strips the global-state slice when state_dim>0
            # (the actors are built on state-stripped input dims)
            logp, _ = self._logp_ent(a_params, self._actor_obs(obs_f, i),
                                     act_i, i)
            return logp

        def make_agent_update(i):
            """Branch updating agent i; returns the updated carry."""

            def branch(carry):
                (actor_params, critic_params, actor_opts, critic_opts,
                 factor, k) = carry
                old_logp = full_logp(actor_params[i], i)
                act_i = (
                    act_f[:, i, : self.act_dims[i]] if self.is_continue
                    else act_f[:, i]
                )

                def actor_loss_fn(params, idx):
                    logp, ent = self._logp_ent(
                        params, self._actor_obs(obs_f[idx], i),
                        act_i[idx], i,
                    )
                    ratio = jnp.exp(logp - logp_old_f[idx, i])[:, None]
                    surr1 = ratio * adv_f[idx]
                    surr2 = jnp.clip(
                        ratio, 1 - cfg.clip_param, 1 + cfg.clip_param
                    ) * adv_f[idx]
                    return (
                        -jnp.mean(
                            factor[idx][:, None]
                            * jnp.minimum(surr1, surr2)
                        )
                        - cfg.entropy_coefficient * jnp.mean(ent)
                    )

                def critic_loss_fn(params, idx):
                    v = self.critics[i].apply(
                        {"params": params}, self._critic_input(obs_f[idx], i)
                    )[:, None]
                    vt = vt_f[idx]
                    if cfg.huber_loss:
                        return jnp.mean(huber_fn(vt - v, cfg.huber_delta))
                    return jnp.mean(jnp.square(vt - v))

                def epoch_body(e, ec):
                    ap, ao, cp, co, kk = ec
                    kk, k_perm = jax.random.split(kk)
                    perm = jax.random.permutation(k_perm, B)

                    def mb_body(m, inner):
                        ap, ao, cp, co = inner
                        idx = jax.lax.dynamic_slice_in_dim(perm, m * mb, mb)
                        a_g = jax.grad(actor_loss_fn)(ap, idx)
                        c_g = jax.grad(critic_loss_fn)(cp, idx)
                        if cfg.axis_name is not None:
                            a_g = jax.lax.pmean(a_g, cfg.axis_name)
                            c_g = jax.lax.pmean(c_g, cfg.axis_name)
                        # reference HAPPO clips each net at 0.5 every
                        # update (HAPPO.py:247-253)
                        a_g = clip_grads_by_norm(a_g, 0.5)
                        c_g = clip_grads_by_norm(c_g, 0.5)
                        a_up, ao = self.actor_tx.update(a_g, ao, ap)
                        ap = optax.apply_updates(ap, a_up)
                        c_up, co = self.critic_tx.update(c_g, co, cp)
                        cp = optax.apply_updates(cp, c_up)
                        return ap, ao, cp, co

                    ap, ao, cp, co = jax.lax.fori_loop(
                        0, n_mb, mb_body, (ap, ao, cp, co)
                    )
                    return ap, ao, cp, co, kk

                ap, ao, cp, co, k = jax.lax.fori_loop(
                    0, cfg.K_epochs, epoch_body,
                    (actor_params[i], actor_opts[i], critic_params[i],
                     critic_opts[i], k),
                )
                new_logp = full_logp(ap, i)
                factor = factor * jnp.exp(
                    jax.lax.stop_gradient(new_logp - old_logp)
                )
                actor_params = tuple(
                    ap if j == i else actor_params[j] for j in range(A)
                )
                critic_params = tuple(
                    cp if j == i else critic_params[j] for j in range(A)
                )
                actor_opts = tuple(
                    ao if j == i else actor_opts[j] for j in range(A)
                )
                critic_opts = tuple(
                    co if j == i else critic_opts[j] for j in range(A)
                )
                return (actor_params, critic_params, actor_opts,
                        critic_opts, factor, k)

            return branch

        branches = [make_agent_update(i) for i in range(A)]
        k_perm, key = jax.random.split(key)
        order = jax.random.permutation(k_perm, A)
        carry = (
            state.actor_params, state.critic_params, state.actor_opts,
            state.critic_opts, jnp.ones((B,), jnp.float32), key,
        )
        for pos in range(A):
            carry = jax.lax.switch(order[pos], branches, carry)
        actor_params, critic_params, actor_opts, critic_opts, factor, _ = carry

        new_state = state.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opts=actor_opts,
            critic_opts=critic_opts,
            step=state.step + 1,
        )
        return new_state, {
            "adv_mean": jnp.mean(adv_f),
            "factor_mean": jnp.mean(factor),
        }
