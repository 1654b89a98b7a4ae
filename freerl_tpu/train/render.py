"""Episode rendering to GIF — the reference's ``render()`` path.

The reference's evaluate.py replays one random episode with
``render_mode='rgb_array'`` and writes ``evaluate.gif`` via imageio
(DQN_file/evaluate.py:45-64; MARL twin in MADDPG_file/MA_evaluate.py).
Our envs are pure-JAX state machines with no C renderer, so frames are
drawn from the state trace with matplotlib: purpose-built views for the
classic-control / lunar-lander / MPE families and a phase-space fallback
for everything else.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from freerl_tpu.envs.base import Env


def rollout_trace(env: Env, act_fn: Callable, seed: int = 0,
                  max_steps: Optional[int] = None,
                  remap01: Optional[bool] = None, carry_init=None):
    """Play ONE episode; return (stacked states over T, returns, length).

    ``act_fn(obs) -> action`` takes a single unbatched observation (use a
    batched policy via ``lambda o: algo.evaluate_action(s, o[None])[0]``
    composition — here we vmap-free single-env step, so obs is unbatched).
    Stateful (recurrent) policies pass ``carry_init`` and an
    ``act_fn(obs, carry) -> (action, carry)`` form, as in
    train/evaluate.py.
    """
    T = max_steps or env.max_steps
    if remap01 is None:
        remap01 = (
            getattr(env, "action_space_01", False)
            and env.dim_info.is_continue
        )

    @jax.jit
    def run():
        state0, obs0 = env.reset(jax.random.PRNGKey(seed))

        def step(carry, t):
            state, obs, ret, done, pc = carry
            if carry_init is not None:
                action, pc = act_fn(obs, pc)
            else:
                action = act_fn(obs)
            if remap01:
                action = (action + 1.0) / 2.0
            k = jax.random.fold_in(jax.random.PRNGKey(seed + 13), t)
            state2, obs2, r, term, trunc = env.step(state, action, k)
            alive = ~done
            # scalarize vector (multi-objective) rewards by sum so the
            # scan carry keeps a fixed shape (matches train/evaluate.py)
            if jnp.ndim(r) > ret.ndim:
                r = r.sum(axis=-1)
            ret = ret + r * alive
            done = done | term | trunc
            state = jax.tree.map(
                lambda new, old: jnp.where(done, old, new), state2, state
            )
            obs = jnp.where(done, obs, obs2)
            return (state, obs, ret, done, pc), (state, done)

        n_agents = getattr(env, "n_agents", 1)
        ret0 = jnp.zeros((n_agents,)) if n_agents > 1 else jnp.float32(0.0)
        pc0 = carry_init if carry_init is not None else ()
        (_, _, ret, _, _), (states, dones) = jax.lax.scan(
            step, (state0, obs0, ret0, jnp.bool_(False), pc0),
            jnp.arange(T)
        )
        # if the episode never finished within T the +1 would index past
        # the trace — clamp to the trace length
        length = jnp.minimum(jnp.sum(~dones) + 1, T)
        return states, ret, length

    states, ret, length = run()
    return (
        jax.tree.map(np.asarray, states),
        np.asarray(ret),
        int(length),
    )


# ---------------------------------------------------------------------------
def _fig_to_rgb(fig):
    fig.canvas.draw()
    w, h = fig.canvas.get_width_height()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    return buf.reshape(h, w, 4)[..., :3].copy()


def _draw_cartpole(ax, s, i):
    from matplotlib.patches import Rectangle

    x, theta = float(s.x[i]), float(s.theta[i])
    ax.set_xlim(-2.6, 2.6)
    ax.set_ylim(-0.5, 1.5)
    ax.plot([-2.4, 2.4], [0, 0], color="k", lw=1)
    ax.add_patch(Rectangle((x - 0.2, -0.1), 0.4, 0.2, color="tab:blue"))
    ax.plot([x, x + np.sin(theta)], [0.0, np.cos(theta)],
            color="tab:orange", lw=4)


def _draw_mountain_car(ax, s, i):
    pos = float(s.position[i])
    xs = np.linspace(-1.2, 0.6, 100)
    ax.plot(xs, np.sin(3 * xs) * 0.45 + 0.55, color="k", lw=1)
    ax.plot([pos], [np.sin(3 * pos) * 0.45 + 0.57], "o", ms=10,
            color="tab:blue")
    ax.plot([0.5], [np.sin(3 * 0.5) * 0.45 + 0.6], "*", ms=14,
            color="tab:orange")
    ax.set_xlim(-1.3, 0.7)
    ax.set_ylim(0.0, 1.2)


def _draw_pendulum(ax, s, i):
    th = float(s.theta[i])
    ax.set_xlim(-1.3, 1.3)
    ax.set_ylim(-1.3, 1.3)
    ax.plot([0, np.sin(th)], [0, np.cos(th)], lw=5, color="tab:blue")
    ax.plot([0], [0], "ko", ms=6)


def _draw_lander(ax, s, i):
    x, y, ang = float(s.x[i]), float(s.y[i]), float(s.angle[i])
    ax.set_xlim(-1.2, 1.2)
    ax.set_ylim(-0.2, 1.6)
    ax.plot([-0.25, 0.25], [0, 0], color="tab:orange", lw=3)  # pad
    ax.plot([-1.2, 1.2], [0, 0], color="k", lw=1)
    dx, dy = 0.09 * np.cos(ang), 0.09 * np.sin(ang)
    ax.plot([x - dx, x + dx], [y - dy, y + dy], lw=6, color="tab:blue")


def _draw_mpe(ax, s, i, env):
    from matplotlib.patches import Circle

    pos = s.pos[i]
    ax.set_xlim(-1.5, 1.5)
    ax.set_ylim(-1.5, 1.5)
    nA = env.n_agents
    for e in range(pos.shape[0]):
        color = (
            f"C{e}" if e < nA else ("0.6" if env.collide[e] else "0.85")
        )
        ax.add_patch(Circle(pos[e], float(env.sizes[e]), color=color,
                            alpha=0.9 if e < nA else 0.5))


def _draw_fallback(ax, trace, i):
    obs = trace[: i + 1]
    ax.plot(obs[:, 0], obs[:, 1] if obs.shape[1] > 1 else obs[:, 0],
            color="tab:blue", lw=1)
    ax.plot([obs[-1, 0]], [obs[-1, 1] if obs.shape[1] > 1 else obs[-1, 0]],
            "o", color="tab:orange")


def render_episode_gif(env: Env, act_fn: Callable, out_path: str,
                       seed: int = 0, fps: int = 25,
                       max_steps: Optional[int] = None,
                       carry_init=None) -> str:
    """Replay one episode and write a GIF (reference evaluate.py:45-64)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    inner = getattr(env, "env", env)   # unwrap DisToConWrapper
    states, ret, length = rollout_trace(env, act_fn, seed, max_steps,
                                        carry_init=carry_init)
    length = min(length, 400)          # keep the artifact small

    name = env.name
    obs_trace = None
    known = (
        hasattr(states, "theta") or hasattr(states, "position")
        or hasattr(states, "leg1")
        or (hasattr(states, "pos") and getattr(inner, "n_agents", 1) > 1)
    )
    if not known:
        obs_trace = np.stack([
            np.asarray(env.observation(
                jax.tree.map(lambda a: a[j], states)
            )) for j in range(length)
        ])
    frames = []
    fig, ax = plt.subplots(figsize=(4, 4), dpi=64)
    for i in range(length):
        ax.clear()
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
        if hasattr(states, "theta") and hasattr(states, "x"):
            _draw_cartpole(ax, states, i)
        elif hasattr(states, "position"):
            _draw_mountain_car(ax, states, i)
        elif hasattr(states, "theta"):
            _draw_pendulum(ax, states, i)
        elif hasattr(states, "leg1"):
            _draw_lander(ax, states, i)
        elif hasattr(states, "pos") and getattr(inner, "n_agents", 1) > 1:
            _draw_mpe(ax, states, i, inner)
        else:
            _draw_fallback(ax, obs_trace, i)
        ax.set_title(f"{name}  t={i}", fontsize=8)
        frames.append(_fig_to_rgb(fig))
    plt.close(fig)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    import imageio

    imageio.mimsave(out_path, frames, fps=fps, loop=0)
    return out_path
