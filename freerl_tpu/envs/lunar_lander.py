"""LunarLander-v2 re-derived as a pure-JAX rigid-body simulation.

The reference trains DQN on gymnasium's Box2D LunarLander
(DQN_file/DQN.py:221, README headline curve). Box2D cannot run on TPU, so the
physics is re-derived from the environment's published specification: one
rigid hull with two landing legs, gravity -10, impulse-based main/side
engines with stochastic dispersion, shaping reward, crash/land termination,
and the same observation normalization. Constants match gymnasium
(FPS=50, SCALE=30, MAIN_ENGINE_POWER=13, SIDE_ENGINE_POWER=0.6,
INITIAL_RANDOM=1000, LEG_AWAY=20, LEG_DOWN=18, helipad at H/4).

Deliberate simplifications (documented deviations from Box2D):
  - terrain is flat at helipad height everywhere (the real env randomizes
    terrain only OUTSIDE the landing pad; trajectories that reach there have
    already failed the task);
  - legs are rigidly attached (no revolute joint springs); contacts resolve
    with one-shot normal/friction impulses + Baumgarte positional correction
    instead of Box2D's iterative solver;
  - the 'body at rest' (+100) check uses an explicit sleep timer like
    Box2D's (linear tol 0.01, 0.5 s) instead of island sleeping;
  - no wind option (gym default enable_wind=False).

Dynamics are step-for-step deterministic given the key, vmap/scan-safe, and
float32.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env

# --- gymnasium constants -------------------------------------------------
FPS = 50.0
DT = 1.0 / FPS
SCALE = 30.0
MAIN_ENGINE_POWER = 13.0
SIDE_ENGINE_POWER = 0.6
INITIAL_RANDOM = 1000.0
LEG_AWAY = 20.0 / SCALE
LEG_DOWN = 18.0 / SCALE
LEG_W, LEG_H = 2.0 / SCALE, 8.0 / SCALE
SIDE_ENGINE_HEIGHT = 14.0 / SCALE
SIDE_ENGINE_AWAY = 12.0 / SCALE
VIEWPORT_W, VIEWPORT_H = 600.0, 400.0
W = VIEWPORT_W / SCALE           # 20
H = VIEWPORT_H / SCALE           # 13.33
HELIPAD_Y = H / 4.0
GRAVITY = -10.0

# hull polygon (body frame, metres) — the gym lander shape, density 5
_LANDER_POLY = np.array(
    [(-14, 17), (-17, 0), (-17, -10), (17, -10), (17, 0), (14, 17)],
    np.float64,
) / SCALE
_HULL_DENSITY = 5.0
_LEG_DENSITY = 1.0


def _poly_mass_inertia(poly, density):
    """Area, centroid and moment of inertia of a polygon (about centroid)."""
    x, y = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y1 - x1 * y
    area = 0.5 * np.sum(cross)
    cx = np.sum((x + x1) * cross) / (6 * area)
    cy = np.sum((y + y1) * cross) / (6 * area)
    # second moment about origin
    ix = np.sum(cross * (y**2 + y * y1 + y1**2)) / 12.0
    iy = np.sum(cross * (x**2 + x * x1 + x1**2)) / 12.0
    i_origin = density * (ix + iy)
    mass = density * area
    i_centroid = i_origin - mass * (cx**2 + cy**2)
    return mass, (cx, cy), i_centroid


_HULL_MASS, _HULL_C, _HULL_I = _poly_mass_inertia(_LANDER_POLY, _HULL_DENSITY)
_LEG_MASS = _LEG_DENSITY * LEG_W * LEG_H
# leg tip offsets in body frame: at rest the center sits LEG_DOWN above ground
_LEG_TIPS = np.array(
    [(-LEG_AWAY, -LEG_DOWN), (LEG_AWAY, -LEG_DOWN)], np.float64
)
_MASS = _HULL_MASS + 2 * _LEG_MASS
_INERTIA = _HULL_I + sum(
    _LEG_MASS * (t[0] ** 2 + t[1] ** 2) for t in _LEG_TIPS
)
# hull sample points for crash detection (bottom corners + sides)
_HULL_PTS = _LANDER_POLY.copy()


@struct.dataclass
class LanderState:
    x: jnp.ndarray
    y: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    angle: jnp.ndarray
    omega: jnp.ndarray
    leg1: jnp.ndarray          # contact flags (float 0/1)
    leg2: jnp.ndarray
    prev_shaping: jnp.ndarray
    rest_time: jnp.ndarray     # seconds below sleep tolerance
    t: jnp.ndarray


class _LunarLanderBase(Env):
    max_steps = 1000
    reward_threshold = 200.0
    continuous: bool = False

    mass = float(_MASS)
    inertia = float(_INERTIA)
    leg_tips = jnp.asarray(_LEG_TIPS, jnp.float32)
    hull_pts = jnp.asarray(_HULL_PTS, jnp.float32)

    # ------------------------------------------------------------------
    def reset(self, key):
        k1, k2 = jax.random.split(key)
        f = jax.random.uniform(
            k1, (2,), jnp.float32, -INITIAL_RANDOM, INITIAL_RANDOM
        )
        # gym applies the random force to the center during the first step;
        # equivalently seed the velocity with F/m * dt
        vx = f[0] / _MASS * DT * FPS * DT  # = f/m * dt (one physics step)
        vy = f[1] / _MASS * DT * FPS * DT
        state = LanderState(
            x=jnp.float32(W / 2),
            y=jnp.float32(H),
            vx=jnp.float32(vx),
            vy=jnp.float32(vy),
            angle=jnp.float32(0.0),
            omega=jnp.float32(0.0),
            leg1=jnp.float32(0.0),
            leg2=jnp.float32(0.0),
            prev_shaping=jnp.float32(0.0),
            rest_time=jnp.float32(0.0),
            t=jnp.int32(0),
        )
        obs = self.observation(state)
        shaping = self._shaping(obs)
        state = state.replace(prev_shaping=shaping)
        del k2
        return state, obs

    # ------------------------------------------------------------------
    def observation(self, state):
        return jnp.stack([
            (state.x - W / 2) / (W / 2),
            (state.y - (HELIPAD_Y + LEG_DOWN)) / (H / 2),
            state.vx * (W / 2) / FPS,
            state.vy * (H / 2) / FPS,
            state.angle,
            20.0 * state.omega / FPS,
            state.leg1,
            state.leg2,
        ])

    @staticmethod
    def _shaping(obs):
        return (
            -100.0 * jnp.sqrt(obs[0] ** 2 + obs[1] ** 2)
            - 100.0 * jnp.sqrt(obs[2] ** 2 + obs[3] ** 2)
            - 100.0 * jnp.abs(obs[4])
            + 10.0 * obs[6]
            + 10.0 * obs[7]
        )

    # ------------------------------------------------------------------
    def _engine_powers(self, action, key):
        raise NotImplementedError

    def step(self, state, action, key):
        m_power, s_power, direction = self._engine_powers(action, key)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
        disp = jax.random.uniform(k1, (2,), jnp.float32, -1.0, 1.0) / SCALE

        sin, cos = jnp.sin(state.angle), jnp.cos(state.angle)
        tip = jnp.stack([sin, cos])       # body 'up' axis in world frame
        side = jnp.stack([-cos, sin])

        fx = jnp.float32(0.0)
        fy = jnp.float32(GRAVITY * self.mass)
        torque = jnp.float32(0.0)

        # main engine: impulse -(ox,oy)*POWER*m_power at offset (ox,oy)
        ox = tip[0] * (4.0 / SCALE + 2.0 * disp[0]) + side[0] * disp[1]
        oy = -tip[1] * (4.0 / SCALE + 2.0 * disp[0]) - side[1] * disp[1]
        jx = -ox * MAIN_ENGINE_POWER * m_power
        jy = -oy * MAIN_ENGINE_POWER * m_power
        rx, ry = ox, oy                   # impulse applied at (x+ox, y+oy)
        fx = fx + jx / DT
        fy = fy + jy / DT
        torque = torque + (rx * jy - ry * jx) / DT

        # side engines
        sx = tip[0] * disp[0] + side[0] * (
            3.0 * disp[1] + direction * SIDE_ENGINE_AWAY
        )
        sy = -tip[1] * disp[0] - side[1] * (
            3.0 * disp[1] + direction * SIDE_ENGINE_AWAY
        )
        jsx = -sx * SIDE_ENGINE_POWER * s_power
        jsy = -sy * SIDE_ENGINE_POWER * s_power
        rsx = sx - tip[0] * 17.0 / SCALE
        rsy = sy + tip[1] * SIDE_ENGINE_HEIGHT
        fx = fx + jsx / DT
        fy = fy + jsy / DT
        torque = torque + (rsx * jsy - rsy * jsx) / DT

        # semi-implicit Euler
        vx = state.vx + fx / self.mass * DT
        vy = state.vy + fy / self.mass * DT
        omega = state.omega + torque / self.inertia * DT

        # --- leg ground contacts (impulse-based, e=0) ------------------
        # Two point contacts solved as an exact 2-contact LCP for the normal
        # impulses (sequential Gauss-Seidel couples normal torque into
        # friction and leaks momentum every step), then friction clamped by
        # the Coulomb cone. Penetration is corrected positionally below — a
        # Baumgarte velocity bias pumps energy and makes the lander hop.
        sin2, cos2 = jnp.sin(state.angle), jnp.cos(state.angle)
        inv_m = 1.0 / self.mass
        inv_i = 1.0 / self.inertia
        mu = 0.8

        rx = self.leg_tips[:, 0] * cos2 - self.leg_tips[:, 1] * sin2  # (2,)
        ry = self.leg_tips[:, 0] * sin2 + self.leg_tips[:, 1] * cos2
        pen = HELIPAD_Y - (state.y + ry)
        # slop window keeps resting contacts active across the
        # integrate/project cycle (Box2D linearSlop analogue)
        touch = pen > -0.01
        vpy = vy + omega * rx
        b = jnp.where(touch, -vpy, 0.0)
        a00 = inv_m + rx[0] * rx[0] * inv_i
        a11 = inv_m + rx[1] * rx[1] * inv_i
        a01 = inv_m + rx[0] * rx[1] * inv_i
        det = a00 * a11 - a01 * a01
        # candidate: both contacts active
        j0_bb = (b[0] * a11 - b[1] * a01) / det
        j1_bb = (b[1] * a00 - b[0] * a01) / det
        # candidates: single contact active
        j0_s = jnp.maximum(b[0] / a00, 0.0)
        j1_s = jnp.maximum(b[1] / a11, 0.0)
        both_ok = (j0_bb >= 0.0) & (j1_bb >= 0.0)
        j0 = jnp.where(both_ok, j0_bb, jnp.where(j1_bb < 0.0, j0_s, 0.0))
        j1 = jnp.where(both_ok, j1_bb, jnp.where(j0_bb < 0.0, j1_s, 0.0))
        vy = vy + (j0 + j1) * inv_m
        omega = omega + (rx[0] * j0 + rx[1] * j1) * inv_i

        # friction (after normals): zero tangential tip velocity within cone
        jns = jnp.stack([j0, j1])
        vpx = vx - omega * ry
        k_t = inv_m + ry * ry * inv_i
        jt = jnp.clip(-vpx / k_t * 0.5, -mu * jns, mu * jns) * touch
        vx = vx + jnp.sum(jt) * inv_m
        omega = omega - jnp.sum(ry * jt) * inv_i

        c1 = touch[0].astype(jnp.float32)
        c2 = touch[1].astype(jnp.float32)
        # mild angular damping stands in for the leg revolute-joint springs
        # (LEG_SPRING_TORQUE) that dissipate rocking in the real env
        touch_any = jnp.maximum(c1, c2)
        omega = omega * (1.0 - 0.15 * touch_any)

        x = state.x + vx * DT
        y = state.y + vy * DT
        angle = state.angle + omega * DT

        # positional projection: lift the body out of the ground by the
        # deepest leg penetration (velocity untouched — no energy injection)
        sin3, cos3 = jnp.sin(angle), jnp.cos(angle)
        tip_ys = (
            y
            + self.leg_tips[:, 0] * sin3
            + self.leg_tips[:, 1] * cos3
        )
        max_pen = jnp.maximum(jnp.max(HELIPAD_Y - tip_ys) - 0.005, 0.0)
        y = y + 0.5 * max_pen

        # --- hull crash check -----------------------------------------
        hpx = self.hull_pts[:, 0] * jnp.cos(angle) - self.hull_pts[:, 1] * jnp.sin(angle)
        hpy = self.hull_pts[:, 0] * jnp.sin(angle) + self.hull_pts[:, 1] * jnp.cos(angle)
        hull_low = jnp.min(y + hpy)
        # crash if the hull reaches the ground, or the touchdown impulse
        # exceeds what the legs can absorb (~1.5 m/s vertical) — the Box2D
        # env's leg joints give way and the hull strikes on hard impacts,
        # while this solver would otherwise stop any speed inelastically
        hard_impact = (j0 + j1) > self.mass * 1.5
        body_contact = (hull_low <= HELIPAD_Y) | hard_impact
        del hpx

        new = LanderState(
            x=x, y=y, vx=vx, vy=vy, angle=angle, omega=omega,
            leg1=c1, leg2=c2,
            prev_shaping=state.prev_shaping,
            rest_time=state.rest_time,
            t=state.t + 1,
        )
        obs = self.observation(new)

        shaping = self._shaping(obs)
        reward = shaping - state.prev_shaping
        reward = reward - 0.30 * m_power - 0.03 * s_power

        # sleep detection (Box2D: linear tol 0.01 m/s for 0.5 s)
        still = (
            (jnp.abs(vx) < 0.05)
            & (jnp.abs(vy) < 0.08)
            & (jnp.abs(omega) < 0.08)
            & ((c1 + c2) > 0)
        )
        rest_time = jnp.where(still, state.rest_time + DT, 0.0)
        landed = rest_time >= 0.5

        game_over = body_contact | (jnp.abs(obs[0]) >= 1.0)
        terminated = game_over | landed
        reward = jnp.where(game_over, -100.0, jnp.where(landed, 100.0, reward))
        truncated = jnp.logical_and(new.t >= self.max_steps, ~terminated)

        new = new.replace(prev_shaping=shaping, rest_time=rest_time)
        return new, obs, reward, terminated, truncated


class LunarLander(_LunarLanderBase):
    """Discrete: 0 noop, 1 fire left (push right), 2 main, 3 fire right."""

    name = "LunarLander-v2"
    dim_info = DimInfo(obs_dim=8, action_dim=4, is_continue=False)

    def _engine_powers(self, action, key):
        m_power = (action == 2).astype(jnp.float32)
        is_side = (action == 1) | (action == 3)
        s_power = is_side.astype(jnp.float32)
        # gym: direction = action - 2 (1 -> -1 left engine, 3 -> +1 right)
        direction = (action.astype(jnp.float32) - 2.0) * is_side
        return m_power, s_power, direction


class LunarLanderContinuous(_LunarLanderBase):
    """Continuous: a0 in [-1,1] main throttle, a1 in [-1,1] lateral."""

    name = "LunarLanderContinuous-v2"
    continuous = True
    dim_info = DimInfo(obs_dim=8, action_dim=2, is_continue=True,
                       max_action=1.0)

    def _engine_powers(self, action, key):
        a = jnp.clip(jnp.reshape(action, (2,)), -1.0, 1.0)
        fire_main = a[0] > 0.0
        m_power = jnp.where(
            fire_main, 0.5 + 0.5 * jnp.clip(a[0], 0.0, 1.0), 0.0
        )
        fire_side = jnp.abs(a[1]) > 0.5
        s_power = jnp.where(fire_side, jnp.clip(jnp.abs(a[1]), 0.5, 1.0), 0.0)
        direction = jnp.sign(a[1]) * fire_side
        return m_power, s_power, direction
