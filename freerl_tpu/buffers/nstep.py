"""N-step return folding, computed at sample time on-device.

The reference maintains a host-side deque of the last n transitions and folds
the return backwards when emitting (DQN_file/Buffer.py:199-293). On TPU the
idiomatic form stores RAW transitions in the ring and folds at sample time:
with a vector of E envs written per step, the time-successor of slot ``i``
(same env) is slot ``i + E`` (mod capacity), so an n-step target is a strided
gather of n slots plus a masked fold:

    R = sum_{k < m} gamma^k r_k,   m = min(n, first done + 1)
    next_obs = obs after step m,   effective discount = gamma^m * (1 - done_m)

This is branch-free, O(n) gathers per sample, and works for both uniform and
PER buffers (fold from the prioritized start slot).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from freerl_tpu.core.types import Transition


def nstep_sample_range(size: jnp.ndarray, capacity: int, pos: jnp.ndarray,
                       stride: int, n: int, key, batch_size: int):
    """Sample start indices whose n-1 same-env successors are all written.

    When the ring has not wrapped, valid starts are [0, size - (n-1)*stride).
    When full, the oldest slot sits at ``pos``; valid offsets from it are
    [0, capacity - (n-1)*stride).
    """
    span = (n - 1) * stride
    not_full_count = jnp.maximum(size - span, 1)
    full_count = jnp.maximum(capacity - span, 1)
    is_full = size >= capacity
    count = jnp.where(is_full, full_count, not_full_count)
    d = jax.random.randint(key, (batch_size,), 0, count)
    return jnp.where(is_full, (pos + d) % capacity, d)


def nstep_fold(data: Transition, idx: jnp.ndarray, stride: int, n: int,
               gamma: float):
    """Gather n successor slots per start index and fold the n-step target.

    Returns a Transition whose ``reward`` is the folded n-step return,
    ``next_obs``/``done`` are taken at the fold horizon, plus the per-sample
    effective discount ``gamma^m`` to use in the TD backup (the reference's
    stored ``n_step_gamma``).
    """
    ks = jnp.arange(n)
    cap = jax.tree.leaves(data)[0].shape[0]
    gidx = (idx[:, None] + ks[None, :] * stride) % cap  # (B, n)
    rewards = data.reward[gidx]                          # (B, n)
    dones = data.done[gidx].astype(jnp.float32)          # (B, n)
    ep_dones = data.episode_done[gidx].astype(jnp.float32)

    # alive[k] = 1 if step k is within this episode (no episode_done before k)
    prev_done = jnp.concatenate(
        [jnp.zeros_like(ep_dones[:, :1]), ep_dones[:, :-1]], axis=1
    )
    alive = jnp.cumprod(1.0 - prev_done, axis=1)         # (B, n)
    discounts = jnp.power(gamma, ks)[None, :]
    ret = jnp.sum(rewards * alive * discounts, axis=1)

    # horizon index m-1 = last alive step
    m = jnp.sum(alive, axis=1).astype(jnp.int32)         # in [1, n]
    last = jnp.clip(m - 1, 0, n - 1)
    bidx = jnp.arange(idx.shape[0])
    last_gidx = gidx[bidx, last]
    next_obs = data.next_obs[last_gidx]
    done = data.done[last_gidx]
    eff_gamma = jnp.power(gamma, m.astype(jnp.float32))

    return Transition(
        obs=data.obs[idx],
        action=data.action[idx],
        reward=ret,
        next_obs=next_obs,
        done=done,
        episode_done=data.episode_done[last_gidx],
    ), eff_gamma


class NStepAccumulator:
    """Namespace façade bundling the two functions above (API parity with the
    reference's N_Step_Buffer family)."""

    sample_range = staticmethod(nstep_sample_range)
    fold = staticmethod(nstep_fold)
