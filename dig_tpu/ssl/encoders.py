"""Graph encoders for SSL: GIN / GCN / ResGCN stacks on flat padded batches.

Parity with ``dig/sslgraph/utils/encoders.py``: GIN conv is
MLP((1+eps) x_i + sum_j x_j) with a 2-layer MLP (encoders.py:103-107); GCN is
sym-normalized D^-1/2 (A+I) D^-1/2 X W (PyG GCNConv semantics); the encoder
returns per-layer sum/mean-pooled graph embeddings concatenated
(encoders.py:128-134) and the final node embedding. ResGCN is the
residual GCN stack used for semi-supervised finetuning
(encoders.py:284-392).

TPU-native: masked segment ops on a GraphBatch; BatchNorm replaced by
masked batch statistics (padding rows excluded).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment_mean, segment_sum

xavier = jax.nn.initializers.glorot_uniform()
zeros = jax.nn.initializers.zeros


def _act(name: str):
    if name == "prelu":
        return PReLU()
    return jax.nn.relu


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k: jnp.full((1,), 0.25))
        return jnp.where(x >= 0, x, a * x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over real (masked) rows only; padding rows would otherwise
    poison the batch statistics. Stateless (uses batch stats, as the
    reference's train-mode BN does during pretraining)."""

    @nn.compact
    def __call__(self, x, mask):
        m = mask[:, None].astype(x.dtype)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, 0) / cnt
        var = jnp.sum(((x - mean) ** 2) * m, 0) / cnt
        scale = self.param("scale", jax.nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", zeros, (x.shape[-1],))
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jnp.where(mask[:, None], y, 0.0)


def gcn_norm(senders, receivers, edge_mask, num_nodes, edge_weight=None,
             add_self_loops: bool = True):
    """Symmetric GCN normalization coefficients per edge (+ self-loop term).

    Returns (edge_coef [E], self_coef [N]); with self loops the aggregation
    is sum_j coef_ij x_j + self_coef_i x_i, matching PyG GCNConv.
    """
    w = edge_weight if edge_weight is not None else jnp.ones(
        senders.shape[0], jnp.float32)
    w = jnp.where(edge_mask, w, 0.0)
    deg = segment_sum(w, receivers, num_nodes, mask=edge_mask)
    if add_self_loops:
        deg = deg + 1.0
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    coef = dinv[receivers] * w * dinv[senders]
    self_coef = dinv * dinv if add_self_loops else jnp.zeros_like(dinv)
    return coef, self_coef


class GCNConv(nn.Module):
    out_dim: int
    bias: bool = True
    add_self_loops: bool = True
    normalize: bool = True

    @nn.compact
    def __call__(self, x, g: GraphBatch, edge_weight=None):
        h = nn.Dense(self.out_dim, use_bias=False, kernel_init=xavier)(x)
        N = g.num_nodes
        if self.normalize:
            coef, self_coef = gcn_norm(g.senders, g.receivers, g.edge_mask, N,
                                       edge_weight, self.add_self_loops)
        else:
            coef = (edge_weight if edge_weight is not None
                    else jnp.ones(g.senders.shape[0]))
            coef = jnp.where(g.edge_mask, coef, 0.0)
            self_coef = jnp.zeros(N)
        agg = segment_sum(h[g.senders] * coef[:, None], g.receivers, N,
                          mask=g.edge_mask)
        agg = agg + self_coef[:, None] * h
        if self.bias:
            agg = agg + self.param("bias", zeros, (self.out_dim,))
        return agg


class GINConv(nn.Module):
    out_dim: int
    bias: bool = True
    train_eps: bool = False

    @nn.compact
    def __call__(self, x, g: GraphBatch):
        N = g.num_nodes
        agg = segment_sum(x[g.senders], g.receivers, N, mask=g.edge_mask)
        eps = (self.param("eps", zeros, ()) if self.train_eps else 0.0)
        h = (1.0 + eps) * x + agg
        h = nn.Dense(self.out_dim, use_bias=self.bias, kernel_init=xavier,
                     bias_init=zeros)(h)
        h = jax.nn.relu(h)
        h = nn.Dense(self.out_dim, use_bias=self.bias, kernel_init=xavier,
                     bias_init=zeros)(h)
        return h


class GIN(nn.Module):
    hidden_dim: int
    n_layers: int = 3
    pool: str = "sum"
    bn: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, g: GraphBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = g.nodes["x"]
        act = _act(self.act)
        xs = []
        for i in range(self.n_layers):
            x = GINConv(self.hidden_dim)(x, g)
            x = act(x)
            if self.bn:
                x = MaskedBatchNorm()(x, g.node_mask)
            x = jnp.where(g.node_mask[:, None], x, 0.0)
            xs.append(x)
        pool = segment_sum if self.pool == "sum" else segment_mean
        pooled = [pool(h, g.node_graph, g.num_graphs, mask=g.node_mask)
                  for h in xs]
        return jnp.concatenate(pooled, axis=1), x


class GCN(nn.Module):
    hidden_dim: int
    n_layers: int = 3
    pool: str = "sum"
    bn: bool = False
    act: str = "relu"
    edge_weight: bool = False

    @nn.compact
    def __call__(self, g: GraphBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = g.nodes["x"]
        ew = g.edges.get("w") if self.edge_weight else None
        act = _act(self.act)
        xs = []
        for i in range(self.n_layers):
            x = GCNConv(self.hidden_dim,
                        add_self_loops=not self.edge_weight,
                        normalize=not self.edge_weight)(x, g, ew)
            x = act(x) if not isinstance(act, PReLU) else act(x)
            if self.bn:
                x = MaskedBatchNorm()(x, g.node_mask)
            x = jnp.where(g.node_mask[:, None], x, 0.0)
            xs.append(x)
        pool = segment_sum if self.pool == "sum" else segment_mean
        pooled = [pool(h, g.node_graph, g.num_graphs, mask=g.node_mask)
                  for h in xs]
        return jnp.concatenate(pooled, axis=1), x


class ResGCN(nn.Module):
    """Residual GCN with feature/conv/fc stages (reference
    encoders.py:284-392, used by GraphSemisupervised)."""

    hidden_dim: int
    num_conv_layers: int = 3
    num_feat_layers: int = 1
    num_fc_layers: int = 2
    pool: str = "sum"

    @nn.compact
    def __call__(self, g: GraphBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = g.nodes["x"]
        for _ in range(self.num_feat_layers):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, kernel_init=xavier)(x))
        x = jnp.where(g.node_mask[:, None], x, 0.0)
        for _ in range(self.num_conv_layers):
            h = MaskedBatchNorm()(x, g.node_mask)
            h = jax.nn.relu(GCNConv(self.hidden_dim)(h, g))
            x = x + jnp.where(g.node_mask[:, None], h, 0.0)
        pool = segment_sum if self.pool == "sum" else segment_mean
        zg = pool(x, g.node_graph, g.num_graphs, mask=g.node_mask)
        for _ in range(self.num_fc_layers - 1):
            zg = jax.nn.relu(nn.Dense(self.hidden_dim, kernel_init=xavier)(zg))
        return zg, x


class Encoder(nn.Module):
    """Wrapper selecting GIN/GCN/ResGCN + output levels (reference
    encoders.py:14-83). Returns graph-level, node-level, or both."""

    feat_dim: int
    hidden_dim: int
    n_layers: int = 5
    pool: str = "sum"
    gnn: str = "gin"
    bn: bool = False
    act: str = "relu"
    node_level: bool = False
    graph_level: bool = True
    edge_weight: bool = False

    def setup(self):
        if self.gnn == "gin":
            self.encoder = GIN(self.hidden_dim, self.n_layers, self.pool,
                               self.bn, self.act)
        elif self.gnn == "gcn":
            self.encoder = GCN(self.hidden_dim, self.n_layers, self.pool,
                               self.bn, self.act, self.edge_weight)
        elif self.gnn == "resgcn":
            self.encoder = ResGCN(self.hidden_dim,
                                  num_conv_layers=self.n_layers,
                                  pool=self.pool)
        else:
            raise ValueError(f"unknown gnn {self.gnn}")

    def __call__(self, g: GraphBatch):
        z_g, z_n = self.encoder(g)
        if self.node_level and self.graph_level:
            return z_g, z_n
        if self.graph_level:
            return z_g
        return z_n

    @property
    def z_dim(self) -> int:
        if self.gnn == "resgcn":
            return self.hidden_dim
        return self.hidden_dim * self.n_layers
