"""Shared network blocks (flax.linen)."""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_LOG2 = 0.6931471805599453


def shifted_softplus(x):
    """softplus(x) - log(2) — SchNet's activation (reference schnet.py:97)."""
    return jax.nn.softplus(x) - _LOG2


def swish(x):
    return jax.nn.silu(x)


class ShiftedSoftplus(nn.Module):
    @nn.compact
    def __call__(self, x):
        return shifted_softplus(x)


class MLP(nn.Module):
    """Dense stack with activation between layers (not after the last,
    unless ``act_last``)."""

    features: Sequence[int]
    act: Callable = shifted_softplus
    act_last: bool = False
    use_bias: bool = True
    kernel_init: Callable = jax.nn.initializers.glorot_uniform()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias,
                         kernel_init=self.kernel_init,
                         bias_init=jax.nn.initializers.zeros,
                         dtype=self.dtype)(x)
            if i < len(self.features) - 1 or self.act_last:
                x = self.act(x)
        return x
