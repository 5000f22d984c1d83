"""Relational GCN on dense one-hot molecular tensors.

Parity with ``dig/ggraph/method/GraphDF/model/rgcn.py`` (identical in the
GraphAF copy): linear feature embedding, then ``num_layers`` per-edge-type
relational convolutions (ReLU on all but the last), sum-aggregated over
edge types. The whole thing is batched dense einsums — exactly the
MXU-friendly layout."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = jax.nn.initializers.glorot_uniform()


class RelGraphConv(nn.Module):
    out_features: int
    edge_dim: int = 3
    use_relu: bool = True
    bias: bool = False

    @nn.compact
    def __call__(self, x, adj):
        """x: [B, N, d_in], adj: [B, E, N, N] -> [B, N, out]."""
        w = self.param("weight", xavier,
                       (self.edge_dim, x.shape[-1], self.out_features))
        support = jnp.einsum("bid,edh->beih", x, w)
        out = jnp.einsum("beij,bejh->beih", adj, support)
        if self.bias:
            b = self.param("bias", jax.nn.initializers.zeros,
                           (self.edge_dim, 1, self.out_features))
            out = out + b
        if self.use_relu:
            out = jax.nn.relu(out)
        return jnp.sum(out, axis=1)  # sum over edge types


class RGCN(nn.Module):
    """emb -> gc1(relu) -> (num_layers-2) hidden(relu) -> gc_out(no relu)
    (reference rgcn.py:89-140)."""

    nhid: int = 128
    nout: int = 128
    edge_dim: int = 3
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, adj):
        """x: [B, N, node_dim] one-hot, adj: [B, edge_dim, N, N].
        Returns node embeddings [B, N, nout]."""
        h = nn.Dense(x.shape[-1], use_bias=False, kernel_init=xavier)(x)
        h = RelGraphConv(self.nhid, self.edge_dim, use_relu=True)(h, adj)
        for _ in range(self.num_layers - 2):
            h = RelGraphConv(self.nhid, self.edge_dim, use_relu=True)(h, adj)
        h = RelGraphConv(self.nout, self.edge_dim, use_relu=False)(h, adj)
        return h
