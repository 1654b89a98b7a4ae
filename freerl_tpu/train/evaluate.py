"""Offline evaluation harness — the reference's empirical test fixture.

Parity surface (DQN_file/evaluate.py, MADDPG_file/MA_evaluate.py):
  - re-run N=100 episodes on held-out seeds the policy never trained on
    (:107-124), score against gymnasium's reward_threshold goal line;
  - exp-smoothed evaluation plot saved as evaluate.png (:24-43);
  - multi-agent twin returning per-agent returns.

TPU-native: the evaluation rollout is a single jitted scan over a batch of
n_episodes envs (one env instance per held-out seed), not a python episode
loop — 100 episodes cost one compile + one device call.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.envs.base import Env


def evaluate(env: Env, act_fn, n_episodes: int = 100, seed0: int = 0,
             max_steps: Optional[int] = None, multi_agent: bool = False,
             remap01: Optional[bool] = None, carry_init=None):
    """Score a policy over ``n_episodes`` held-out seeds.

    ``act_fn(obs) -> action`` must be a deterministic batched policy (the
    reference's ``evaluate_action``). Recurrent policies (algos/rmappo.py)
    pass ``carry_init`` (e.g. ``algo.init_policy_carry(n_episodes)``) and
    an ``act_fn(obs, carry) -> (action, carry)``; episodes here never
    reset mid-scan (finished ones freeze), so no hidden resets are needed.
    Returns (n_episodes,) returns, or (n_episodes, n_agents) for
    multi-agent envs.
    """
    T = max_steps or env.max_steps
    if remap01 is None:
        remap01 = (
            getattr(env, "action_space_01", False)
            and env.dim_info.is_continue
        )

    keys = jax.random.split(jax.random.PRNGKey(seed0), n_episodes)

    @jax.jit
    def run():
        state, obs = jax.vmap(env.reset)(keys)

        def step(carry, t):
            state, obs, ret, done, pc = carry
            if carry_init is not None:
                action, pc = act_fn(obs, pc)
            else:
                action = act_fn(obs)
            if remap01:
                action = (action + 1.0) / 2.0
            k = jax.random.fold_in(jax.random.PRNGKey(seed0 + 7), t)
            ks = jax.random.split(k, n_episodes)
            state2, obs2, r, term, trunc = jax.vmap(env.step)(
                state, action, ks
            )
            alive = ~done
            if multi_agent:
                ret = ret + r * alive[:, None]
            else:
                # vector (multi-objective) rewards scalarize by sum
                r_scalar = r.sum(axis=-1) if r.ndim > 1 else r
                ret = ret + r_scalar * alive
            done = done | term | trunc
            # freeze finished episodes
            state = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
                ) if new.ndim > 0 else jnp.where(done, old, new),
                state2, state,
            )
            obs = jnp.where(
                done.reshape((-1,) + (1,) * (obs2.ndim - 1)), obs, obs2
            )
            return (state, obs, ret, done, pc), None

        n_agents = getattr(env, "n_agents", 1)
        ret0 = (
            jnp.zeros((n_episodes, n_agents))
            if multi_agent else jnp.zeros((n_episodes,))
        )
        (_, _, ret, done, _), _ = jax.lax.scan(
            step,
            (state, obs, ret0, jnp.zeros((n_episodes,), bool),
             carry_init if carry_init is not None else ()),
            jnp.arange(T),
        )
        return ret

    return np.asarray(run())


def plot_evaluate(returns: np.ndarray, goal: Optional[float] = None,
                  out_path: str = "evaluate.png", alpha: float = 0.9):
    """Exp-smoothed per-episode evaluation plot with the threshold goal
    line (reference DQN_file/evaluate.py:24-43)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    smoothed = np.zeros_like(returns, dtype=np.float64)
    run = returns[0]
    for i, r in enumerate(returns):
        run = alpha * run + (1 - alpha) * r
        smoothed[i] = run
    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.plot(returns, alpha=0.3, label="return")
    ax.plot(smoothed, label=f"smoothed (a={alpha})")
    if goal is not None:
        ax.axhline(goal, color="red", ls="--", label=f"goal {goal}")
    ax.set_xlabel("episode")
    ax.set_ylabel("return")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
