"""Factorized-Gaussian noisy linear layers (NoisyNet exploration).

Parity with the reference's NoisyLinear (DQN_file/Noisy_net.py:17-76):
sigma_init = 0.05 scaled by 1/sqrt(fan_in), factorized noise
f(x) = sign(x)*sqrt(|x|), fresh noise each forward during training, noiseless
in eval. The torch version hides RNG in module state; here noise draws come
from an explicit 'noise' RNG collection so the layer stays pure and vmappable.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from freerl_tpu.nets.mlp import Dense


def _f(x):
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


class NoisyDense(nn.Module):
    features: int
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        fan_in = x.shape[-1]
        bound = 1.0 / jnp.sqrt(fan_in)

        def mu_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def sigma_init_fn(key, shape, dtype=jnp.float32):
            return jnp.full(shape, self.sigma_init / jnp.sqrt(fan_in), dtype)

        def bias_sigma_init_fn(key, shape, dtype=jnp.float32):
            # reference divides the BIAS sigma by sqrt(out_dim), not
            # fan_in (Noisy_net.py:62 "bias的sigma要除以out_dim"):
            # on a wide->narrow output layer this keeps the bias noise
            # large enough to dither the argmax — the exploration signal
            return jnp.full(
                shape, self.sigma_init / jnp.sqrt(self.features), dtype
            )

        w_mu = self.param("w_mu", mu_init, (fan_in, self.features))
        w_sigma = self.param("w_sigma", sigma_init_fn, (fan_in, self.features))
        b_mu = self.param("b_mu", mu_init, (self.features,))
        b_sigma = self.param("b_sigma", bias_sigma_init_fn, (self.features,))

        if deterministic:
            return x @ w_mu + b_mu

        key = self.make_rng("noise")
        k_in, k_out = jax.random.split(key)
        eps_in = _f(jax.random.normal(k_in, (fan_in,)))
        eps_out = _f(jax.random.normal(k_out, (self.features,)))
        w = w_mu + w_sigma * (eps_in[:, None] * eps_out[None, :])
        b = b_mu + b_sigma * eps_out
        return x @ w + b


class NoisyMLP(nn.Module):
    """Ordinary hidden layers + NoisyDense OUTPUT layer.

    The reference replaces only the head with NoisyLinear
    (DQN_with_tricks.py:49-51 — 'l1' stays nn.Linear, 'l2' is noisy;
    the Noisy_net.py banner notes head-only is enough for exploration).
    """

    out_dim: int
    hidden: Sequence[int] = (128,)
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        for h in self.hidden:
            x = nn.relu(Dense(h, scheme="torch")(x))
        return NoisyDense(self.out_dim, sigma_init=self.sigma_init)(
            x, deterministic
        )


class NoisyDuelingQNet(nn.Module):
    """Ordinary trunk; noisy V and A heads (DQN_with_tricks.py:68-70)."""

    out_dim: int
    hidden: Sequence[int] = (128,)
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        for h in self.hidden:
            x = nn.relu(Dense(h, scheme="torch")(x))
        v = NoisyDense(1, sigma_init=self.sigma_init)(x, deterministic)
        a = NoisyDense(self.out_dim, sigma_init=self.sigma_init)(
            x, deterministic
        )
        return v + a - jnp.mean(a, axis=-1, keepdims=True)


class NoisyCategoricalQNet(nn.Module):
    """Ordinary trunk; noisy atom-logit head (DQN_with_tricks.py:91-95)."""

    action_dim: int
    n_atoms: int = 51
    hidden: Sequence[int] = (128,)
    sigma_init: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        for h in self.hidden:
            x = nn.relu(Dense(h, scheme="torch")(x))
        logits = NoisyDense(self.action_dim * self.n_atoms,
                            sigma_init=self.sigma_init)(x, deterministic)
        return logits.reshape(x.shape[:-1] + (self.action_dim, self.n_atoms))
