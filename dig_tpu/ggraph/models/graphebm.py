"""GraphEBM — energy-based molecule generation with Langevin dynamics.

Parity with ``dig/ggraph/method/GraphEBM/{graphebm.py,energy_func.py}``:
multi-relational graph-conv energy over dense (adj, x), contrastive
divergence training (pos = dequantized data, neg = Langevin samples from
uniform noise with gradient clamping and [0, 1+c] box projection), plus
goal-directed (property-weighted) and compositional (two-energy) sampling.

TPU design: the entire ld_step Langevin loop is a single jitted
``lax.scan`` — the reference replays autograd per step in eager mode.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = jax.nn.initializers.glorot_uniform()


def swish(x):
    return x * jax.nn.sigmoid(x)


class EBMGraphConv(nn.Module):
    """Per-edge-type dense conv (reference energy_func.py:12-103):
    out = sum_e adj[e] @ (x W_e) (+ self term)."""

    out_ch: int
    num_edge_type: int = 4
    add_self: bool = False

    @nn.compact
    def __call__(self, adj, h):
        w = self.param("weight", xavier,
                       (self.num_edge_type, h.shape[-1], self.out_ch))
        support = jnp.einsum("bnd,edh->benh", h, w)
        out = jnp.einsum("benj,bejh->benh", adj, support).sum(axis=1)
        if self.add_self:
            out = out + nn.Dense(self.out_ch, kernel_init=xavier)(h)
        b = self.param("bias", jax.nn.initializers.zeros, (self.out_ch,))
        return out + b


class EnergyFunc(nn.Module):
    """Energy E(adj, x) -> [B, 1] (reference energy_func.py:105-142)."""

    hidden: int = 64
    num_edge_type: int = 4
    depth: int = 2
    use_swish: bool = True

    @nn.compact
    def __call__(self, adj, x):
        act = swish if self.use_swish else partial(jax.nn.leaky_relu,
                                                   negative_slope=0.2)
        out = EBMGraphConv(self.hidden, self.num_edge_type)(adj, x)
        out = act(out)
        for _ in range(self.depth):
            out = EBMGraphConv(self.hidden, self.num_edge_type)(adj, out)
            out = act(out)
        out = out.sum(axis=1)
        return nn.Dense(1, kernel_init=xavier)(out)


def rescale_adj(adj):
    """Normalize adjacency by node degree over all edge types (reference
    util: keeps energies scale-stable)."""
    deg = jnp.sum(adj, axis=(1, 2), keepdims=True)  # [B, 1, 1, N]
    return adj / jnp.maximum(deg, 1.0)


def langevin_sample(energy_apply, params, rng, shape_x, shape_adj,
                    ld_step: int = 150, ld_noise: float = 0.005,
                    ld_step_size: float = 30.0, clamp: float = 0.01,
                    c: float = 0.0,
                    grad_energy_extra=None):
    """SGLD from uniform init, as one lax.scan (graphebm.py:83-130).

    ``grad_energy_extra(x, adj) -> (gx, gadj)`` optionally adds an extra
    objective gradient (goal-directed / compositional generation).
    """
    k0, k1, kloop = jax.random.split(rng, 3)
    neg_x = jax.random.uniform(k0, shape_x) * (1 + c)
    neg_adj = jax.random.uniform(k1, shape_adj)

    def energy_sum(x, adj):
        return jnp.sum(energy_apply(params, adj, x))

    grad_fn = jax.grad(energy_sum, argnums=(0, 1))

    def body(carry, key):
        x, adj = carry
        kx, ka = jax.random.split(key)
        x = x + ld_noise * jax.random.normal(kx, x.shape)
        adj = adj + ld_noise * jax.random.normal(ka, adj.shape)
        gx, gadj = grad_fn(x, adj)
        if grad_energy_extra is not None:
            ex, eadj = grad_energy_extra(x, adj)
            gx = gx + ex
            gadj = gadj + eadj
        gx = jnp.clip(gx, -clamp, clamp)
        gadj = jnp.clip(gadj, -clamp, clamp)
        x = jnp.clip(x - ld_step_size * gx, 0.0, 1 + c)
        adj = jnp.clip(adj - ld_step_size * gadj, 0.0, 1.0)
        return (x, adj), None

    keys = jax.random.split(kloop, ld_step)
    (neg_x, neg_adj), _ = jax.lax.scan(body, (neg_x, neg_adj), keys)
    return neg_x, neg_adj
