"""Euclidean -> Poincare-ball embedders.

Behavioral reference: /root/reference/hpcs/nn/hyperbolic/hyp_embed.py:6-23 and
the MLP factory (/root/reference/hpcs/nn/__init__.py:4-9).  The reference MLP
accepts a negative_slope argument but never inserts an activation — so
MLPExpMap is exactly Linear(bias=False) + exp map at the origin; we keep that
semantics (documented quirk, not a bug to fix: it defines the architecture).
"""
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..geometry import expmap0


class ExpMap(nn.Module):
    """Exponential map at the origin (used when eucl dim == hyp dim)."""

    @nn.compact
    def __call__(self, x):
        return expmap0(x)


class MLPExpMap(nn.Module):
    """Linear projection to the ball dimension, then exp map at the origin."""

    out_features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_features, use_bias=False)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return expmap0(x)


def make_embedder(eucl_dim: int, hyp_dim: int):
    """Dimension-equality dispatch of the reference
    (train.py:99-105: ExpMap if dims match else MLPExpMap)."""
    if eucl_dim == hyp_dim:
        return ExpMap()
    return MLPExpMap(out_features=hyp_dim)
