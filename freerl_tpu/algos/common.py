"""Shared algorithmic building blocks — fused, jit-friendly.

The reference re-implements these inline in every algorithm file; here they
are single definitions composed by all algos:
  - polyak target update (DQN_file/DQN.py:120-128) as one tree_map (the
    reference loops per-parameter eagerly);
  - TD / twin-min backups (TD3_file/TD3.py:202-204);
  - GAE as a reverse ``lax.scan`` (replaces the python loop over the horizon,
    PPO_file/PPO.py:221-233);
  - clipped surrogate, value clipping and huber loss
    (PPO_file/PPO.py:265-268, MAPPO_file/MAPPO.py:273-276,422-436);
  - C51 categorical projection (DQN_file/DQN_with_tricks.py:81-160) as a
    batched scatter-add instead of torch ``index_add_``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def polyak(target_params, online_params, tau: float):
    """theta_target <- tau*theta + (1-tau)*theta_target, one fused tree_map."""
    return jax.tree.map(
        lambda t, o: t * (1.0 - tau) + o * tau, target_params, online_params
    )


def td_target(reward, gamma, next_value, done):
    """r + gamma * V' * (1 - done); gamma may be per-sample (n-step)."""
    return reward + gamma * next_value * (1.0 - done.astype(jnp.float32))


def huber(x, delta: float = 10.0):
    """Reference huber: delta=10 (MAPPO_file/MAPPO.py:273-276)."""
    ax = jnp.abs(x)
    return jnp.where(ax <= delta, 0.5 * x**2, delta * (ax - 0.5 * delta))


def gae(rewards, values, next_values, dones, episode_dones, gamma, lam):
    """Generalized advantage estimation over a (T, ...) time-major rollout.

    ``dones`` masks bootstrapping (terminated only); ``episode_dones`` cuts
    the advantage recursion at episode ends (terminated OR truncated) —
    preserving the reference's done vs adv_done distinction
    (PPO_file/PPO.py:221-233).
    """
    deltas = rewards + gamma * next_values * (1.0 - dones) - values

    def scan_fn(carry, x):
        delta, ep_done = x
        adv = delta + gamma * lam * (1.0 - ep_done) * carry
        return adv, adv

    _, advs = jax.lax.scan(
        scan_fn,
        jnp.zeros_like(deltas[0]),
        (deltas, episode_dones.astype(jnp.float32)),
        reverse=True,
    )
    return advs, advs + values


def clip_grads_by_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics over one parameter group:
    compute the group's global L2 norm and scale by
    ``max_norm / (norm + 1e-6)`` when it exceeds ``max_norm`` (the
    reference applies this per-net at 0.5 — PPO.py:127-151,
    HAPPO.py:247-253, IPPO.py:174-180)."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


def clipped_surrogate(ratio, adv, clip_eps: float):
    return -jnp.minimum(
        ratio * adv, jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    )


def value_clip_loss(values, old_values, returns, clip_eps: float,
                    use_huber: bool = False, huber_delta: float = 10.0):
    """MAPPO ValueClip: max of clipped/unclipped value errors."""
    clipped = old_values + jnp.clip(values - old_values, -clip_eps, clip_eps)
    if use_huber:
        e1 = huber(returns - values, huber_delta)
        e2 = huber(returns - clipped, huber_delta)
    else:
        e1 = 0.5 * (returns - values) ** 2
        e2 = 0.5 * (returns - clipped) ** 2
    return jnp.maximum(e1, e2)


def c51_project(next_probs, tz, atoms):
    """Project the shifted atom distribution back onto the fixed support.

    next_probs: (B, N) probabilities of the target distribution.
    tz:         (B, N) shifted atom positions r + gamma*z*(1-d), pre-clip.
    atoms:      (N,) fixed support.
    Returns (B, N) projected probabilities.
    """
    v_min, v_max = atoms[0], atoms[-1]
    n = atoms.shape[0]
    dz = (v_max - v_min) / (n - 1)
    tz = jnp.clip(tz, v_min, v_max)
    b = (tz - v_min) / dz
    low = jnp.floor(b).astype(jnp.int32)
    high = jnp.ceil(b).astype(jnp.int32)
    eq = (low == high).astype(jnp.float32)
    w_low = next_probs * (high.astype(jnp.float32) - b) + next_probs * eq
    w_high = next_probs * (b - low.astype(jnp.float32))
    proj = jnp.zeros_like(next_probs)
    bidx = jnp.arange(next_probs.shape[0])[:, None]
    bidx = jnp.broadcast_to(bidx, next_probs.shape)
    proj = proj.at[bidx, low].add(w_low)
    proj = proj.at[bidx, jnp.clip(high, 0, n - 1)].add(w_high)
    return proj


def explained_variance(returns, values):
    var_r = jnp.var(returns)
    return 1.0 - jnp.var(returns - values) / jnp.maximum(var_r, 1e-8)


def global_grad_norm(grads):
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
    )
