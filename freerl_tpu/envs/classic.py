"""Classic-control dynamics re-derived as pure-JAX step functions.

These reimplement the published gymnasium classic-control dynamics (the envs
the reference trains on via ``get_env`` — DQN_file/DQN.py:219-226) from their
equations of motion, with identical constants, observation spaces, reward
functions and termination/truncation rules, so learning curves are comparable
to the reference's committed artifacts. No rendering; float32 throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env

_FALSE = jnp.asarray(False)


# ---------------------------------------------------------------------------
# CartPole-v1
# ---------------------------------------------------------------------------
@struct.dataclass
class CartPoleState:
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


class CartPole(Env):
    """CartPole-v1: 2 discrete actions, reward 1/step, 500-step truncation."""

    name = "CartPole-v1"
    max_steps = 500
    reward_threshold = 475.0
    dim_info = DimInfo(obs_dim=4, action_dim=2, is_continue=False)

    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    total_mass = masscart + masspole
    length = 0.5  # half the pole length
    polemass_length = masspole * length
    force_mag = 10.0
    tau = 0.02
    theta_threshold = 12 * 2 * jnp.pi / 360
    x_threshold = 2.4

    def reset(self, key):
        vals = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = CartPoleState(vals[0], vals[1], vals[2], vals[3], jnp.int32(0))
        return state, self.observation(state)

    def observation(self, state):
        return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot])

    def step(self, state, action, key):
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (
            force + self.polemass_length * state.theta_dot**2 * sintheta
        ) / self.total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length
            * (4.0 / 3.0 - self.masspole * costheta**2 / self.total_mass)
        )
        xacc = temp - self.polemass_length * thetaacc * costheta / self.total_mass
        # semi-implicit? No: gymnasium default integrator is explicit euler.
        x = state.x + self.tau * state.x_dot
        x_dot = state.x_dot + self.tau * xacc
        theta = state.theta + self.tau * state.theta_dot
        theta_dot = state.theta_dot + self.tau * thetaacc
        t = state.t + 1
        new = CartPoleState(x, x_dot, theta, theta_dot, t)
        terminated = (
            (jnp.abs(x) > self.x_threshold)
            | (jnp.abs(theta) > self.theta_threshold)
        )
        truncated = jnp.logical_and(t >= self.max_steps, ~terminated)
        reward = jnp.float32(1.0)
        return new, self.observation(new), reward, terminated, truncated


# ---------------------------------------------------------------------------
# MountainCar-v0 / MountainCarContinuous-v0
# ---------------------------------------------------------------------------
@struct.dataclass
class MountainCarState:
    position: jnp.ndarray
    velocity: jnp.ndarray
    t: jnp.ndarray


class MountainCar(Env):
    """MountainCar-v0: 3 discrete actions, -1/step, 200-step truncation."""

    name = "MountainCar-v0"
    max_steps = 200
    reward_threshold = -110.0
    dim_info = DimInfo(obs_dim=2, action_dim=3, is_continue=False)

    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.5
    force = 0.001
    gravity = 0.0025

    def reset(self, key):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = MountainCarState(pos, jnp.float32(0.0), jnp.int32(0))
        return state, self.observation(state)

    def observation(self, state):
        return jnp.stack([state.position, state.velocity])

    def step(self, state, action, key):
        velocity = state.velocity + (
            (action.astype(jnp.float32) - 1.0) * self.force
            + jnp.cos(3 * state.position) * (-self.gravity)
        )
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(
            state.position + velocity, self.min_position, self.max_position
        )
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity
        )
        t = state.t + 1
        new = MountainCarState(position, velocity, t)
        terminated = position >= self.goal_position
        truncated = jnp.logical_and(t >= self.max_steps, ~terminated)
        reward = jnp.float32(-1.0)
        return new, self.observation(new), reward, terminated, truncated


class MountainCarContinuous(Env):
    """MountainCarContinuous-v0: 1-D box action in [-1,1], 999-step horizon."""

    name = "MountainCarContinuous-v0"
    max_steps = 999
    reward_threshold = 90.0
    dim_info = DimInfo(obs_dim=2, action_dim=1, is_continue=True, max_action=1.0)

    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.45
    goal_velocity = 0.0
    power = 0.0015

    def reset(self, key):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = MountainCarState(pos, jnp.float32(0.0), jnp.int32(0))
        return state, self.observation(state)

    def observation(self, state):
        return jnp.stack([state.position, state.velocity])

    def step(self, state, action, key):
        force = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0)
        velocity = state.velocity + force * self.power - 0.0025 * jnp.cos(
            3 * state.position
        )
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(
            state.position + velocity, self.min_position, self.max_position
        )
        velocity = jnp.where(
            (position <= self.min_position) & (velocity < 0), 0.0, velocity
        )
        t = state.t + 1
        new = MountainCarState(position, velocity, t)
        terminated = (position >= self.goal_position) & (
            velocity >= self.goal_velocity
        )
        truncated = jnp.logical_and(t >= self.max_steps, ~terminated)
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        return new, self.observation(new), reward, terminated, truncated


# ---------------------------------------------------------------------------
# Pendulum-v1
# ---------------------------------------------------------------------------
@struct.dataclass
class PendulumState:
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


class Pendulum(Env):
    """Pendulum-v1: 1-D torque in [-2,2], cost-based reward, 200-step horizon."""

    name = "Pendulum-v1"
    max_steps = 200
    reward_threshold = None
    dim_info = DimInfo(obs_dim=3, action_dim=1, is_continue=True, max_action=2.0)

    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    l = 1.0

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = PendulumState(theta, theta_dot, jnp.int32(0))
        return state, self.observation(state)

    def observation(self, state):
        return jnp.stack(
            [jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot]
        )

    def step(self, state, action, key):
        u = jnp.clip(jnp.reshape(action, ()), -self.max_torque, self.max_torque)
        th, thdot = state.theta, state.theta_dot
        norm_th = ((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = norm_th**2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3 * self.g / (2 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        t = state.t + 1
        new = PendulumState(newth, newthdot, t)
        terminated = _FALSE
        truncated = t >= self.max_steps
        return new, self.observation(new), -cost, terminated, truncated
