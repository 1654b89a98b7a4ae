"""Tabular envs (FrozenLake, Taxi) as device-resident transition tables.

The reference trains DQN on these with obs_dim=1 — the integer state fed
as a scalar float (DQN_file/DQN.py:147,221-226). The dynamics are built
once on the host as dense (S, A) next-state/reward/terminal tables, then
stepping is a single gather — thousands of vmapped instances cost one
indexed load each.

FrozenLake-v1: 4x4 map SFFF/FHFH/FFFH/HFFG, is_slippery=True (intended
move + both perpendiculars, 1/3 each), reward 1 at G, episode ends at
holes/goal, 100-step truncation.
Taxi-v3: the classic 5x5 gridworld, 500 states, deterministic; -1/step,
-10 illegal pickup/dropoff, +20 success, 200-step truncation.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env


@struct.dataclass
class TabularState:
    s: jnp.ndarray
    t: jnp.ndarray


class _TabularEnv(Env):
    """next_state (S, A, K), reward (S, A, K), prob (S, A, K),
    terminal (S, A, K): K stochastic outcomes per (s, a)."""

    n_states: int
    start_states: np.ndarray

    def reset(self, key):
        idx = jax.random.randint(key, (), 0, len(self.start_states))
        s = jnp.asarray(self.start_states)[idx]
        state = TabularState(s=s, t=jnp.int32(0))
        return state, self.observation(state)

    def observation(self, state):
        return state.s.astype(jnp.float32).reshape(1)

    def step(self, state, action, key):
        a = action.astype(jnp.int32)
        probs = self.prob[state.s, a]
        k = jax.random.categorical(key, jnp.log(probs + 1e-12))
        s2 = self.next_state[state.s, a, k]
        r = self.reward[state.s, a, k]
        term = self.terminal[state.s, a, k]
        t = state.t + 1
        new = TabularState(s=s2, t=t)
        trunc = jnp.logical_and(t >= self.max_steps, ~term)
        return new, self.observation(new), r, term, trunc


# ---------------------------------------------------------------------------
_FL_MAP = ["SFFF", "FHFH", "FFFH", "HFFG"]


def _build_frozenlake(slippery: bool = True):
    n = 4
    S, A = n * n, 4
    K = 3 if slippery else 1
    next_s = np.zeros((S, A, K), np.int32)
    rew = np.zeros((S, A, K), np.float32)
    prob = np.zeros((S, A, K), np.float32)
    term = np.zeros((S, A, K), bool)

    def to_rc(s):
        return divmod(s, n)

    def move(s, a):
        r, c = to_rc(s)
        if a == 0:
            c = max(c - 1, 0)          # left
        elif a == 1:
            r = min(r + 1, n - 1)      # down
        elif a == 2:
            c = min(c + 1, n - 1)      # right
        elif a == 3:
            r = max(r - 1, 0)          # up
        return r * n + c

    for s in range(S):
        r0, c0 = to_rc(s)
        cell = _FL_MAP[r0][c0]
        for a in range(A):
            outcomes = (
                [(a - 1) % 4, a, (a + 1) % 4] if slippery else [a]
            )
            for k, b in enumerate(outcomes):
                if cell in "HG":       # absorbing
                    s2 = s
                else:
                    s2 = move(s, b)
                r2, c2 = to_rc(s2)
                cell2 = _FL_MAP[r2][c2]
                next_s[s, a, k] = s2
                prob[s, a, k] = 1.0 / len(outcomes)
                rew[s, a, k] = 1.0 if (cell not in "HG" and cell2 == "G") else 0.0
                term[s, a, k] = cell2 in "HG"
    return next_s, rew, prob, term


class FrozenLake(_TabularEnv):
    name = "FrozenLake-v1"
    max_steps = 100
    reward_threshold = 0.7
    dim_info = DimInfo(obs_dim=1, action_dim=4, is_continue=False)
    n_states = 16
    start_states = np.array([0])

    def __init__(self, is_slippery: bool = True):
        ns, r, p, t = _build_frozenlake(is_slippery)
        self.next_state = jnp.asarray(ns)
        self.reward = jnp.asarray(r)
        self.prob = jnp.asarray(p)
        self.terminal = jnp.asarray(t)


# ---------------------------------------------------------------------------
# Taxi-v3: 5x5 grid, 4 depots R(0,0) G(0,4) Y(4,0) B(4,3), walls
_TAXI_LOCS = [(0, 0), (0, 4), (4, 0), (4, 3)]
# vertical walls between (row, col) and (row, col+1)
_TAXI_WALLS = {(0, 1), (1, 1), (3, 0), (4, 0), (3, 2), (4, 2)}


def _taxi_encode(row, col, pidx, didx):
    return ((row * 5 + col) * 5 + pidx) * 4 + didx


def _build_taxi():
    S, A = 500, 6
    next_s = np.zeros((S, A, 1), np.int32)
    rew = np.zeros((S, A, 1), np.float32)
    prob = np.ones((S, A, 1), np.float32)
    term = np.zeros((S, A, 1), bool)
    starts = []
    for row in range(5):
        for col in range(5):
            for pidx in range(5):          # 4 depots + 4=in taxi
                for didx in range(4):
                    s = _taxi_encode(row, col, pidx, didx)
                    if pidx < 4 and pidx != didx:
                        starts.append(s)
                    for a in range(A):
                        nr, nc, npi = row, col, pidx
                        r = -1.0
                        done = False
                        if a == 0:
                            nr = min(row + 1, 4)           # south
                        elif a == 1:
                            nr = max(row - 1, 0)           # north
                        elif a == 2:                        # east
                            if (row, col) not in _TAXI_WALLS:
                                nc = min(col + 1, 4)
                        elif a == 3:                        # west
                            if (row, col - 1) not in _TAXI_WALLS:
                                nc = max(col - 1, 0)
                        elif a == 4:                        # pickup
                            if pidx < 4 and (row, col) == _TAXI_LOCS[pidx]:
                                npi = 4
                            else:
                                r = -10.0
                        elif a == 5:                        # dropoff
                            if pidx == 4 and (row, col) == _TAXI_LOCS[didx]:
                                npi = didx
                                r = 20.0
                                done = True
                            elif pidx == 4 and (row, col) in _TAXI_LOCS:
                                npi = _TAXI_LOCS.index((row, col))
                                r = -10.0
                            else:
                                r = -10.0
                        s2 = _taxi_encode(nr, nc, npi, didx)
                        next_s[s, a, 0] = s2
                        rew[s, a, 0] = r
                        term[s, a, 0] = done
    return next_s, rew, prob, term, np.array(starts)


class Taxi(_TabularEnv):
    name = "Taxi-v3"
    max_steps = 200
    reward_threshold = 8.0
    dim_info = DimInfo(obs_dim=1, action_dim=6, is_continue=False)
    n_states = 500

    def __init__(self):
        ns, r, p, t, starts = _build_taxi()
        self.next_state = jnp.asarray(ns)
        self.reward = jnp.asarray(r)
        self.prob = jnp.asarray(p)
        self.terminal = jnp.asarray(t)
        self.start_states = starts
