"""Explain-friendly GNN model zoo.

Parity with ``dig/xgraph/models/models.py:22-947``: GCN_2l / GCN_3l /
GIN_2l / GIN_3l at graph or node level with the reference's structure
(convs -> ReLU -> readout -> 2-layer FFN for graph level; convs -> ReLU ->
linear for node level).

TPU-native explainability surface: instead of PyTorch forward hooks, the
forward is a pure function of ``(params, g, edge_weight, node_feat_mask)``
and can return all intermediate node activations — explainers differentiate
straight through it.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment_mean, segment_sum
from ..ssl.encoders import gcn_norm

xavier = jax.nn.initializers.glorot_uniform()
zeros = jax.nn.initializers.zeros


class XGCNConv(nn.Module):
    """GCN conv with a multiplicative per-edge mask applied to messages
    (the reference sets PyG ``__edge_mask__`` via __set_masks__,
    base_explainer.py:48-80)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, g: GraphBatch, edge_weight=None):
        h = nn.Dense(self.out_dim, use_bias=False, kernel_init=xavier)(x)
        N = g.num_nodes
        coef, self_coef = gcn_norm(g.senders, g.receivers, g.edge_mask, N)
        if edge_weight is not None:
            coef = coef * edge_weight
        msgs = h[g.senders] * coef[:, None]
        agg = segment_sum(msgs, g.receivers, N, mask=g.edge_mask)
        agg = agg + self_coef[:, None] * h
        return agg + self.param("bias", zeros, (self.out_dim,))


class XGINConv(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x, g: GraphBatch, edge_weight=None):
        N = g.num_nodes
        msgs = x[g.senders]
        if edge_weight is not None:
            msgs = msgs * edge_weight[:, None]
        agg = segment_sum(msgs, g.receivers, N, mask=g.edge_mask)
        h = x + agg
        h = nn.Dense(self.out_dim, kernel_init=xavier, bias_init=zeros)(h)
        h = jax.nn.relu(h)
        h = nn.Dense(self.out_dim, kernel_init=xavier, bias_init=zeros)(h)
        return h


class GNNModel(nn.Module):
    """Shared body: ``model_level`` 'graph' or 'node'; returns logits and
    (optionally) the per-layer node activations."""

    gnn: str = "gcn"             # 'gcn' | 'gin'
    num_layers: int = 2
    hidden_dim: int = 64
    num_classes: int = 2
    model_level: str = "graph"
    readout: str = "mean"        # 'mean' | 'sum' | 'max'

    @nn.compact
    def __call__(self, g: GraphBatch, edge_weight=None,
                 return_activations: bool = False):
        x = g.nodes["x"]
        Conv = XGCNConv if self.gnn == "gcn" else XGINConv
        # edge_weight: None, one [E] array shared by all layers, or a
        # list/tuple of per-layer [E] arrays (needed by walk-level
        # decompositions like GNN-LRP).
        if edge_weight is None or isinstance(edge_weight,
                                             (list, tuple)):
            ew_per_layer = edge_weight
        else:
            ew_per_layer = [edge_weight] * self.num_layers
        acts = [x]
        for li in range(self.num_layers):
            ew = None if ew_per_layer is None else ew_per_layer[li]
            x = Conv(self.hidden_dim)(x, g, ew)
            x = jax.nn.relu(x)
            x = jnp.where(g.node_mask[:, None], x, 0.0)
            acts.append(x)
        if self.model_level == "graph":
            if self.readout == "sum":
                pooled = segment_sum(x, g.node_graph, g.num_graphs,
                                     mask=g.node_mask)
            elif self.readout == "max":
                big = jnp.where(g.node_mask[:, None], x, -1e30)
                pooled = jax.ops.segment_max(big, g.node_graph,
                                             num_segments=g.num_graphs)
            else:
                pooled = segment_mean(x, g.node_graph, g.num_graphs,
                                      mask=g.node_mask)
            h = jax.nn.relu(nn.Dense(self.hidden_dim,
                                     kernel_init=xavier)(pooled))
            logits = nn.Dense(self.num_classes, kernel_init=xavier)(h)
        else:
            logits = nn.Dense(self.num_classes, kernel_init=xavier)(x)
        if return_activations:
            return logits, acts
        return logits


def GCN_2l(model_level="graph", dim_hidden=64, num_classes=2, **kw):
    return GNNModel(gnn="gcn", num_layers=2, hidden_dim=dim_hidden,
                    num_classes=num_classes, model_level=model_level, **kw)


def GCN_3l(model_level="graph", dim_hidden=64, num_classes=2, **kw):
    return GNNModel(gnn="gcn", num_layers=3, hidden_dim=dim_hidden,
                    num_classes=num_classes, model_level=model_level, **kw)


def GIN_2l(model_level="graph", dim_hidden=64, num_classes=2, **kw):
    return GNNModel(gnn="gin", num_layers=2, hidden_dim=dim_hidden,
                    num_classes=num_classes, model_level=model_level, **kw)


def GIN_3l(model_level="graph", dim_hidden=64, num_classes=2, **kw):
    return GNNModel(gnn="gin", num_layers=3, hidden_dim=dim_hidden,
                    num_classes=num_classes, model_level=model_level, **kw)
