"""MLP trunks, initialization schemes, and Q-value heads.

Capability parity targets:
  - 1-hidden-layer 128-wide MLP, the reference's universal trunk
    (DQN_file/DQN.py:32-45);
  - init schemes that are part of the reference's capability surface:
    torch-default (uniform +-1/sqrt(fan_in) — the implicit default everywhere),
    DDPG fan-in + final uniform +-3e-3 (DDPG_file/DDPG.py:58-68), and
    orthogonal with calculated gain (PPO_with_tricks.py:71-76,
    MAPPO_file/MAPPO.py:106-125);
  - Dueling head V + A - mean(A) (DQN_file/DQN_with_tricks.py:60-79);
  - Categorical/C51 head: 51 atoms on [-100, 100]
    (DQN_file/DQN_with_tricks.py:81-160).

All modules are flax.linen; compute in float32 (these nets are tiny — MXU
bfloat16 only pays off at larger widths, and parity wants f32 math).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------
def torch_default_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0] if len(shape) == 2 else shape[-1]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def fanin_uniform_init(key, shape, dtype=jnp.float32):
    """DDPG 'other layers' init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return torch_default_init(key, shape, dtype)


def final_uniform_init(scale: float = 3e-3):
    """DDPG final-layer init: U(-3e-3, 3e-3)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def orthogonal_init(gain: float = math.sqrt(2.0)):
    return nn.initializers.orthogonal(scale=gain)


class Dense(nn.Module):
    """Linear layer with the framework's init-scheme vocabulary.

    scheme: 'torch' | 'orthogonal' | 'final' | 'fanin', with optional gain for
    orthogonal. Bias always starts per-scheme (torch: fan-in uniform;
    orthogonal: zeros; final: same uniform as kernel).
    """

    features: int
    scheme: str = "torch"
    gain: float = math.sqrt(2.0)
    final_scale: float = 3e-3

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.scheme == "orthogonal":
            kinit = nn.initializers.orthogonal(scale=self.gain)
            binit = nn.initializers.zeros_init()
        elif self.scheme == "final":
            kinit = final_uniform_init(self.final_scale)
            binit = final_uniform_init(self.final_scale)
        else:  # 'torch' / 'fanin'
            kinit = torch_default_init
            binit = torch_bias_init(fan_in)
        return nn.Dense(self.features, kernel_init=kinit, bias_init=binit)(x)


_ACTS: dict[str, Callable] = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "leaky_relu": nn.leaky_relu,
    "gelu": nn.gelu,
}


class MLP(nn.Module):
    """Trunk + linear head. hidden=(128,) matches the reference default."""

    out_dim: int
    hidden: Sequence[int] = (128,)
    activation: str = "relu"
    scheme: str = "torch"           # init for hidden layers
    out_scheme: str | None = None   # init for the output layer
    out_gain: float = 1.0           # orthogonal gain for output layer

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.activation]
        for h in self.hidden:
            x = Dense(h, scheme=self.scheme)(x)
            x = act(x)
        out_scheme = self.out_scheme or self.scheme
        return Dense(self.out_dim, scheme=out_scheme, gain=self.out_gain)(x)


class DuelingQNet(nn.Module):
    """Dueling head: Q = V + A - mean_a(A)."""

    action_dim: int
    hidden: Sequence[int] = (128,)
    activation: str = "relu"
    scheme: str = "torch"

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.activation]
        for h in self.hidden:
            x = Dense(h, scheme=self.scheme)(x)
            x = act(x)
        v = Dense(1, scheme=self.scheme)(x)
        a = Dense(self.action_dim, scheme=self.scheme)(x)
        return v + a - jnp.mean(a, axis=-1, keepdims=True)


class CategoricalQNet(nn.Module):
    """C51 head: per-action atom logits, shape (..., action_dim, n_atoms)."""

    action_dim: int
    n_atoms: int = 51
    hidden: Sequence[int] = (128,)
    activation: str = "relu"
    scheme: str = "torch"

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.activation]
        for h in self.hidden:
            x = Dense(h, scheme=self.scheme)(x)
            x = act(x)
        logits = Dense(self.action_dim * self.n_atoms, scheme=self.scheme)(x)
        return logits.reshape(x.shape[:-1] + (self.action_dim, self.n_atoms))
