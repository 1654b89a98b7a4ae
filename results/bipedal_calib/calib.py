"""Calibrate freerl_tpu BipedalWalker against gym Box2D side by side.

Measures (a) zero-torque collapse time, (b) hull height/angle trajectories
under fixed torque patterns, (c) random-policy returns.
"""
import os
import sys

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

import gymnasium as gym


def run_gym(policy, max_t=600, seed=0):
    env = gym.make("BipedalWalker-v3")
    obs, _ = env.reset(seed=seed)
    hull = env.unwrapped.hull
    ys, angs, rets = [], [], 0.0
    for t in range(max_t):
        a = policy(t, obs)
        obs, r, term, trunc, _ = env.step(a)
        ys.append(hull.position[1]); angs.append(hull.angle)
        rets += r
        if term or trunc:
            break
    env.close()
    return np.array(ys), np.array(angs), rets, t, term


def run_ours(policy, max_t=600, seed=0):
    from freerl_tpu.envs.bipedal import BipedalWalker
    env = BipedalWalker()
    step = jax.jit(env.step)
    s, obs = env.reset(jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 99)
    ys, angs, rets = [], [], 0.0
    for t in range(max_t):
        a = jnp.asarray(policy(t, np.asarray(obs)), jnp.float32)
        s, obs, r, term, trunc = step(s, a, jax.random.fold_in(key, t))
        ys.append(float(s.pos[0, 1])); angs.append(float(s.angle[0]))
        rets += float(r)
        if bool(term) or bool(trunc):
            break
    return np.array(ys), np.array(angs), rets, t, bool(term)


POLICIES = {
    "zero": lambda t, o: np.zeros(4, np.float32),
    "stand": lambda t, o: np.array([0.0, 0.3, 0.0, 0.3], np.float32),
    "hipfwd": lambda t, o: np.array([0.6, -0.2, -0.6, -0.2], np.float32),
    "sine": lambda t, o: np.array([
        0.5 * np.sin(t / 10), 0.3, -0.5 * np.sin(t / 10), 0.3
    ], np.float32),
}

if __name__ == "__main__":
    for name, pol in POLICIES.items():
        g = run_gym(pol, seed=0)
        o = run_ours(pol, seed=0)
        T = min(len(g[0]), len(o[0]), 100)
        dy = np.abs(g[0][:T] - o[0][:T]).mean() if T else float("nan")
        da = np.abs(g[1][:T] - o[1][:T]).mean() if T else float("nan")
        print(f"{name:8s} gym: len={g[3]:4d} ret={g[2]:8.1f} term={g[4]} | "
              f"ours: len={o[3]:4d} ret={o[2]:8.1f} term={o[4]} | "
              f"mean|dy|={dy:.3f} mean|dang|={da:.3f}")
    # random-policy returns, 5 seeds each
    for src, runner in (("gym", run_gym), ("ours", run_ours)):
        rets, lens = [], []
        for seed in range(5):
            rng = np.random.RandomState(seed)
            pol = lambda t, o: rng.uniform(-1, 1, 4).astype(np.float32)
            _, _, ret, L, _ = runner(pol, max_t=1600, seed=seed)
            rets.append(ret); lens.append(L)
        print(f"random {src}: ret={np.mean(rets):.1f}+-{np.std(rets):.1f} "
              f"len={np.mean(lens):.0f}")
