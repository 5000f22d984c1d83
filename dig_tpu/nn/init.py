"""Parameter initializers matching the reference's conventions.

``glorot_orthogonal`` mirrors torch_geometric.nn.inits.glorot_orthogonal
(used at ``dig/threedgraph/method/spherenet/spherenet.py:126-148``):
orthogonal init rescaled so the variance matches Glorot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def glorot_orthogonal(scale: float = 2.0):
    ortho = jax.nn.initializers.orthogonal()

    def init(key, shape, dtype=jnp.float32):
        w = ortho(key, shape, dtype)
        fan_in, fan_out = shape[0], shape[-1]
        var = jnp.mean(w ** 2)
        w = w * jnp.sqrt(scale / ((fan_in + fan_out) * var))
        return w

    return init


def xavier_uniform():
    return jax.nn.initializers.glorot_uniform()
