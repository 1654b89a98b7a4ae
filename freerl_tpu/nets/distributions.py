"""Action distributions as small pure-function namespaces.

Replaces torch.distributions usage across the reference:
  - Categorical softmax policies (REINFORCE/PPO_discrete/SAC_discrete);
  - CategoricalMasked with -1e8 invalid-logit masking and zeroed entropy
    terms (MAPPO_file/MAPPO_for_mask_action.py:191);
  - diagonal Gaussian with state-independent log_std (PPO_file/PPO.py:64);
  - tanh-squashed Gaussian with the SpinningUp softplus log-prob correction
    (SAC_file/SAC.py:70-97);
  - Beta policy, softplus(x)+1 parameterization (PPO_with_tricks.py:119-152).

Everything operates on explicit params (no dist objects needed under jit), is
batched over leading axes, and uses float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LOG2 = jnp.log(2.0)


# ---------------------------------------------------------------------------
# Categorical
# ---------------------------------------------------------------------------
def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits, action):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(
        logp, action[..., None].astype(jnp.int32), axis=-1
    ).squeeze(-1)


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def masked_logits(logits, mask):
    """mask: 1 for valid actions. Invalid logits pushed to -1e8."""
    return jnp.where(mask > 0, logits, -1e8)


def masked_categorical_entropy(logits, mask):
    """Entropy with masked terms zeroed (reference CategoricalMasked)."""
    ml = masked_logits(logits, mask)
    logp = jax.nn.log_softmax(ml, axis=-1)
    p = jnp.exp(logp)
    terms = jnp.where(mask > 0, p * logp, 0.0)
    return -jnp.sum(terms, axis=-1)


# ---------------------------------------------------------------------------
# Diagonal Gaussian
# ---------------------------------------------------------------------------
def normal_sample(key, mean, std):
    return mean + std * jax.random.normal(key, mean.shape)


def normal_log_prob(mean, std, x):
    var = std**2
    return jnp.sum(
        -0.5 * ((x - mean) ** 2 / var) - jnp.log(std)
        - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


def normal_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std), axis=-1)


# ---------------------------------------------------------------------------
# Tanh-squashed Gaussian (SAC)
# ---------------------------------------------------------------------------
def squashed_sample_logp(key, mean, log_std, max_action: float = 1.0):
    """rsample -> tanh -> scale; log-prob with the stable softplus correction

    logp(a) = logp_normal(u) - sum_i 2*(log2 - u_i - softplus(-2 u_i))
    """
    std = jnp.exp(log_std)
    u = mean + std * jax.random.normal(key, mean.shape)
    logp = jnp.sum(
        -0.5 * ((u - mean) ** 2 / std**2) - log_std
        - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )
    logp = logp - jnp.sum(
        2.0 * (LOG2 - u - jax.nn.softplus(-2.0 * u)), axis=-1
    )
    action = jnp.tanh(u) * max_action
    return action, logp


def squashed_mode(mean, max_action: float = 1.0):
    return jnp.tanh(mean) * max_action


# ---------------------------------------------------------------------------
# Beta (PPO trick)
# ---------------------------------------------------------------------------
def beta_params(raw_alpha, raw_beta):
    """softplus(x) + 1 parameterization (keeps the density unimodal)."""
    return jax.nn.softplus(raw_alpha) + 1.0, jax.nn.softplus(raw_beta) + 1.0


def beta_sample(key, alpha, beta):
    return jax.random.beta(key, alpha, beta)


def beta_log_prob(alpha, beta, x):
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    lb = (
        jax.scipy.special.gammaln(alpha + beta)
        - jax.scipy.special.gammaln(alpha)
        - jax.scipy.special.gammaln(beta)
    )
    return jnp.sum(
        lb + (alpha - 1) * jnp.log(x) + (beta - 1) * jnp.log1p(-x), axis=-1
    )


def beta_entropy(alpha, beta):
    dg = jax.scipy.special.digamma
    lb = (
        jax.scipy.special.gammaln(alpha)
        + jax.scipy.special.gammaln(beta)
        - jax.scipy.special.gammaln(alpha + beta)
    )
    h = (
        lb
        - (alpha - 1) * dg(alpha)
        - (beta - 1) * dg(beta)
        + (alpha + beta - 2) * dg(alpha + beta)
    )
    return jnp.sum(h, axis=-1)


def beta_mean(alpha, beta):
    return alpha / (alpha + beta)


def beta_to_action(x, max_action: float):
    """Map Beta support [0,1] to the env box [-max, max]."""
    return (2.0 * x - 1.0) * max_action


def action_to_beta(a, max_action: float):
    return (a / max_action + 1.0) / 2.0
