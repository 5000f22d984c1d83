"""SchNet — continuous-filter convolution on radius graphs, TPU-native.

Capability parity with ``dig/threedgraph/method/schnet/schnet.py:9-168``:
Gaussian RBF distance embedding, cosine cutoff, edge message
``W(dist) * Lin(v_j)``, scatter-sum aggregation, residual node update, and a
sum-pooled graph readout. Re-designed for XLA: the model consumes a flat
padded :class:`~dig_tpu.graph.GraphBatch` whose edges were built by the
static-cap radius graph, all aggregation is masked segment-sum, and the
whole forward is one jit trace with static shapes.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..nn.blocks import MLP, shifted_softplus
from ..ops import segment_sum
from ..ops.segment import segment_sum_sorted
from ..ops.basis import cosine_cutoff, gaussian_rbf
from ..ops.radius import radius_graph_flat
from ..ops.triplets import edge_distances

xavier = jax.nn.initializers.glorot_uniform()


class SchNetInteraction(nn.Module):
    """One interaction block = update_e (edge messages) + update_v (node
    residual update), reference schnet.py:9-59."""

    hidden_channels: int
    num_filters: int
    cutoff: float
    segment_eb: int = 0  # >0: Pallas sorted-CSR aggregation, edge-window cap

    @nn.compact
    def __call__(self, v, dist, dist_emb, senders, receivers, edge_mask,
                 num_nodes):
        # update_e
        C = cosine_cutoff(dist, self.cutoff)
        W = MLP([self.num_filters, self.num_filters],
                act=shifted_softplus, kernel_init=xavier)(dist_emb)
        W = W * C[:, None]
        vj = nn.Dense(self.num_filters, use_bias=False,
                      kernel_init=xavier)(v)[senders]
        e = vj * W
        # update_v — receivers are row-major-sorted (ops/radius.py:
        # adjacency_to_edges), so the Pallas CSR kernel applies when opted in
        if self.segment_eb > 0:
            agg = segment_sum_sorted(e, receivers, num_nodes, mask=edge_mask,
                                     max_edges_per_block=self.segment_eb)
        else:
            agg = segment_sum(e, receivers, num_nodes, mask=edge_mask)
        out = nn.Dense(self.hidden_channels, kernel_init=xavier)(agg)
        out = shifted_softplus(out)
        out = nn.Dense(self.hidden_channels, kernel_init=xavier)(out)
        return v + out


class SchNet(nn.Module):
    """Returns per-graph predictions ``[G, out_channels]``.

    Defaults mirror the reference's documented defaults
    (schnet.py:120). ``__call__`` expects a GraphBatch with node fields
    ``z`` (int atomic numbers) and ``pos`` and radius-graph edges already
    attached (use :func:`dig_tpu.threed.featurize.attach_radius_edges`);
    energy-and-force training differentiates through ``pos`` outside the
    module (see ``dig_tpu.train.trainer``).
    """

    cutoff: float = 10.0
    num_layers: int = 6
    hidden_channels: int = 128
    out_channels: int = 1
    num_filters: int = 128
    num_gaussians: int = 50
    max_edges: int = 4096  # static radius-graph cap (size from data stats)
    segment_eb: int = 0  # >0: Pallas sorted-CSR edge->node aggregation

    @nn.compact
    def __call__(self, g: GraphBatch):
        z = g.nodes["z"]
        pos = g.nodes["pos"]
        N = g.num_nodes

        senders, receivers, edge_mask = radius_graph_flat(
            pos, g.node_graph, g.node_mask, self.cutoff, self.max_edges)
        g = g.with_edges(senders, receivers, edge_mask)

        dist = edge_distances(pos, g.senders, g.receivers, g.edge_mask)
        dist_emb = gaussian_rbf(dist, 0.0, self.cutoff, self.num_gaussians)

        v = nn.Embed(100, self.hidden_channels,
                     embedding_init=jax.nn.initializers.uniform(scale=jnp.sqrt(3.0)))(z)
        v = jnp.where(g.node_mask[:, None], v, 0.0)

        for _ in range(self.num_layers):
            v = SchNetInteraction(self.hidden_channels, self.num_filters,
                                  self.cutoff,
                                  segment_eb=self.segment_eb)(
                v, dist, dist_emb, g.senders, g.receivers, g.edge_mask, N)
            v = jnp.where(g.node_mask[:, None], v, 0.0)

        # update_u readout
        h = nn.Dense(self.hidden_channels // 2, kernel_init=xavier)(v)
        h = shifted_softplus(h)
        h = nn.Dense(self.out_channels, kernel_init=xavier)(h)
        u = segment_sum(h, g.node_graph, g.num_graphs, mask=g.node_mask)
        return u
