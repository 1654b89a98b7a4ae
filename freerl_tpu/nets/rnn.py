"""Recurrent (GRU) policy/value trunks for rMAPPO.

The reference leaves recurrent policies unimplemented (MAPPO_file/
MAPPO.py:82-83 notes rmappo as absent); this module supplies the missing
capability in TPU-native form: a single fused GRU step usable both inside
the rollout `lax.scan` (one cell step per env step, hidden carried in the
driver loop) and inside the update's truncated-BPTT chunk scan.

Hidden-state convention: callers pass ``reset`` (bool, broadcastable to the
batch) marking "an episode ended in the previous step"; the cell zeroes the
incoming hidden there, which is the standard rMAPPO episode-boundary
treatment.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from freerl_tpu.nets.mlp import Dense


class RecurrentTrunk(nn.Module):
    """MLP encoder -> GRU cell (one step). Returns (features, new_hidden)."""

    hidden: Sequence[int] = (128,)
    rnn_hidden: int = 128
    orthogonal: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, h, reset):
        scheme = "orthogonal" if self.orthogonal else "torch"
        for n in self.hidden:
            x = Dense(n, scheme=scheme)(x)
            if self.layer_norm:
                x = nn.LayerNorm()(x)
            x = nn.relu(x)
        mask = jnp.broadcast_to(
            reset.astype(x.dtype)[..., None], h.shape
        )
        h = h * (1.0 - mask)
        h, out = nn.GRUCell(features=self.rnn_hidden)(h, x)
        if self.layer_norm:
            out = nn.LayerNorm()(out)
        return out, h


class RecurrentActor(nn.Module):
    """One-step recurrent actor head.

    Continuous: (tanh mean, broadcast log_std) like AgentActor; discrete:
    logits. Call with (obs, hidden, reset) -> (dist params, new hidden).
    """

    action_dim: int
    is_continue: bool
    hidden: Sequence[int] = (128,)
    rnn_hidden: int = 128
    orthogonal: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, h, reset):
        x, h = RecurrentTrunk(self.hidden, self.rnn_hidden,
                              self.orthogonal, self.layer_norm)(x, h, reset)
        scheme = "orthogonal" if self.orthogonal else "torch"
        out = Dense(self.action_dim, scheme=scheme, gain=0.01)(x)
        if not self.is_continue:
            return out, h
        mean = jnp.tanh(out)
        log_std = self.param(
            "log_std", nn.initializers.zeros_init(), (self.action_dim,)
        )
        return (mean, jnp.broadcast_to(log_std, mean.shape)), h


class RecurrentVCritic(nn.Module):
    """One-step recurrent V(s) head: (obs, hidden, reset) -> (v, hidden)."""

    hidden: Sequence[int] = (128,)
    rnn_hidden: int = 128
    orthogonal: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, h, reset):
        x, h = RecurrentTrunk(self.hidden, self.rnn_hidden,
                              self.orthogonal, self.layer_norm)(x, h, reset)
        scheme = "orthogonal" if self.orthogonal else "torch"
        return Dense(1, scheme=scheme, gain=1.0)(x).squeeze(-1), h
