"""Pixel-observation environments with frame stacking, fully in-device.

Completes the reference's Atari-pixels gesture (PPO_advance/Buffer.py:374-433
``Buffer_atari`` — its frame-stack transform is commented out and no conv
net or pixel env exists) as a working TPU-native pipeline: a procedural
renderer draws the env state into a grayscale frame with pure jnp ops, the
last ``n_stack`` frames ride in the env state pytree, and the flattened
stack is the observation — so the entire replay/rollout machinery (HBM
ring, PER, scans) works on pixels unchanged, and thousands of pixel envs
vmap on the VPU.

``PixelCartPole``: CartPole-v1 rendered at 48x48 — cart body, pole segment,
track line — with 2-frame stacking (velocity is recoverable from the
temporal difference, as in the Atari convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from freerl_tpu.core.types import DimInfo
from freerl_tpu.envs.base import Env
from freerl_tpu.envs.classic import CartPole


@struct.dataclass
class PixelCartPoleState:
    inner: object
    frames: jnp.ndarray      # (n_stack, H, W) newest last


class PixelCartPole(Env):
    """CartPole from 48x48x2 stacked grayscale frames."""

    name = "PixelCartPole-v1"
    H = W = 48
    n_stack = 2
    max_steps = 500
    reward_threshold = 475.0
    dim_info = DimInfo(obs_dim=n_stack * H * W, action_dim=2,
                       is_continue=False)
    obs_shape = (H, W, n_stack)   # channel-last view for conv trunks

    def __init__(self):
        self._inner = CartPole()

    # -- rendering -----------------------------------------------------------
    def render_frame(self, inner_state) -> jnp.ndarray:
        """(H, W) grayscale in [0,1]: track, cart, pole."""
        H, W = self.H, self.W
        xs = jnp.arange(W, dtype=jnp.float32)[None, :]   # pixel columns
        ys = jnp.arange(H, dtype=jnp.float32)[:, None]   # pixel rows (down)
        # world->pixel: x in [-2.4, 2.4] -> [4, W-4]
        px_per_unit = (W - 8) / 4.8
        cart_px = (inner_state.x + 2.4) * px_per_unit + 4.0
        cart_py = H - 10.0                                # cart center row
        # track line
        img = jnp.where(jnp.abs(ys - (H - 7.0)) < 0.6, 0.3, 0.0) * jnp.ones(
            (H, W)
        )
        # cart: 7x3 rectangle
        cart = (jnp.abs(xs - cart_px) < 3.5) & (jnp.abs(ys - cart_py) < 2.0)
        img = jnp.where(cart, 1.0, img)
        # pole: segment from cart center, length ~0.8*H/2 px, angle theta
        # (theta=0 is upright; screen y grows downward)
        plen = 0.8 * H / 2.0
        dx = jnp.sin(inner_state.theta)
        dy = -jnp.cos(inner_state.theta)
        # distance from each pixel to the segment
        rx = xs - cart_px
        ry = ys - cart_py
        tproj = jnp.clip(rx * dx + ry * dy, 0.0, plen)
        dist2 = (rx - tproj * dx) ** 2 + (ry - tproj * dy) ** 2
        img = jnp.where(dist2 < 1.2**2, 0.7, img)
        return img

    def _obs(self, frames):
        # (n_stack, H, W) -> flat with channel-last layout (H, W, n_stack)
        return jnp.transpose(frames, (1, 2, 0)).reshape(-1)

    # -- Env protocol ----------------------------------------------------------
    def reset(self, key):
        inner_state, _ = self._inner.reset(key)
        frame = self.render_frame(inner_state)
        frames = jnp.broadcast_to(frame, (self.n_stack,) + frame.shape)
        state = PixelCartPoleState(inner=inner_state, frames=frames)
        return state, self._obs(frames)

    def observation(self, state):
        return self._obs(state.frames)

    def step(self, state, action, key):
        inner, _, reward, term, trunc = self._inner.step(
            state.inner, action, key
        )
        frame = self.render_frame(inner)
        frames = jnp.concatenate(
            [state.frames[1:], frame[None]], axis=0
        )
        new = PixelCartPoleState(inner=inner, frames=frames)
        return new, self._obs(frames), reward, term, trunc
