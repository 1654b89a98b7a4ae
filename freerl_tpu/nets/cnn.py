"""Convolutional trunks for pixel observations.

The reference gestures at Atari pixels with ``Buffer_atari`` whose
frame-stack transform is commented out (PPO_advance/Buffer.py:374-433) and
never ships a conv net. This module completes that capability TPU-natively:
conv trunks that consume flat pixel observations (the whole buffer/loop
stack stays schema-free on (obs_dim,) vectors) and reshape internally.

Two architectures:
  - 'nature': the DQN-Nature stack (32@8x8/4, 64@4x4/2, 64@3x3/1, FC-512)
    for 84x84 Atari-scale frames;
  - 'small': 16@3x3/1 + 32@3x3/2 + FC for coarse procedural frames
    (envs/pixel.py renders 48x48).

TPU notes: convs lower onto the MXU as implicit GEMMs; NHWC layout with
channel-last matches XLA's preferred TPU layout. Inputs arrive in [0,1]
floats (the pixel envs emit normalized intensities, so no /255 rescale).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from freerl_tpu.nets.mlp import torch_bias_init, torch_default_init


class ConvTrunk(nn.Module):
    """Flat pixels (..., H*W*C) -> features (..., features)."""

    obs_shape: Tuple[int, int, int]      # (H, W, C)
    features: int = 512
    arch: str = "nature"                 # 'nature' | 'small'

    @nn.compact
    def __call__(self, x):
        lead = x.shape[:-1]
        h, w, c = self.obs_shape
        x = x.reshape((-1, h, w, c))
        if self.arch == "nature":
            layers = [(32, (8, 8), (4, 4)), (64, (4, 4), (2, 2)),
                      (64, (3, 3), (1, 1))]
        elif self.arch == "small":
            layers = [(16, (3, 3), (1, 1)), (32, (3, 3), (2, 2))]
        else:
            raise ValueError(f"unknown conv arch {self.arch!r}")
        for f, k, s in layers:
            x = nn.Conv(f, k, s, padding="VALID",
                        kernel_init=nn.initializers.he_uniform())(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.features, kernel_init=torch_default_init,
                     bias_init=torch_bias_init(x.shape[-1]))(x)
        x = nn.relu(x)
        return x.reshape(lead + (self.features,))
