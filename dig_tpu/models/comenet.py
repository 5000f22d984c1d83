"""ComENet — complete & efficient message passing with rotation-invariant
local frames.

Parity with ``dig/threedgraph/method/comenet/comenet.py:218-484`` +
``features.py``: per-node nearest/second-nearest reference neighbors build
local frames; each edge gets 4-argument geometry (d, theta, phi, tau);
two EdgeGraphConv streams consume torsion-type (n_r * n_s^2) and angle-type
(n_r * n_s) basis features; residual MLP + GraphNorm per block; sum-pooled
atom-wise readout. All index selection is masked segment-argmin — no
dynamic shapes.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment_argmin, segment_sum
from ..ops.basis import bessel_table, sph_full_table, sph_m0_table
from ..ops.radius import radius_graph_flat
from ..ops.triplets import edge_distances

xavier = jax.nn.initializers.glorot_uniform()
zeros = jax.nn.initializers.zeros


def swish(x):
    return x * jax.nn.sigmoid(x)


class TwoLayerLinear(nn.Module):
    middle: int
    out: int
    act: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.middle, use_bias=False, kernel_init=xavier)(x)
        if self.act:
            x = swish(x)
        x = nn.Dense(self.out, use_bias=False, kernel_init=xavier)(x)
        if self.act:
            x = swish(x)
        return x


class EdgeGraphConv(nn.Module):
    """GraphConv with edge-feature-modulated messages
    (comenet.py:130-134): out = W_rel(sum_j w_e * x_j) + W_root(x)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, edge_weight,
                 num_nodes):
        msgs = x[senders] * edge_weight
        agg = segment_sum(msgs, receivers, num_nodes, mask=edge_mask)
        return (nn.Dense(self.out_dim, kernel_init=xavier)(agg)
                + nn.Dense(self.out_dim, use_bias=False,
                           kernel_init=xavier)(x))


class GraphNorm(nn.Module):
    """Per-graph normalization (torch_geometric.nn.norm.GraphNorm)."""

    dim: int

    @nn.compact
    def __call__(self, x, node_graph, node_mask, num_graphs):
        alpha = self.param("alpha", jax.nn.initializers.ones, (self.dim,))
        gamma = self.param("gamma", jax.nn.initializers.ones, (self.dim,))
        beta = self.param("beta", zeros, (self.dim,))
        ones = jnp.where(node_mask, 1.0, 0.0)
        cnt = jnp.maximum(
            jax.ops.segment_sum(ones, node_graph, num_segments=num_graphs),
            1.0)[:, None]
        mean = segment_sum(x, node_graph, num_graphs, mask=node_mask) / cnt
        sub = x - alpha * mean[node_graph]
        var = segment_sum(sub * sub, node_graph, num_graphs,
                          mask=node_mask) / cnt
        std = jnp.sqrt(var + 1e-5)[node_graph]
        out = gamma * sub / std + beta
        return jnp.where(node_mask[:, None], out, 0.0)


class SimpleInteractionBlock(nn.Module):
    """comenet.py:136-216."""

    hidden: int
    middle: int
    num_radial: int
    num_spherical: int
    num_layers: int
    out_dim: int

    @nn.compact
    def __call__(self, x, feature1, feature2, senders, receivers,
                 edge_mask, g: GraphBatch):
        N = g.num_nodes
        x = swish(nn.Dense(self.hidden, kernel_init=xavier)(x))
        f1 = TwoLayerLinear(self.middle, self.hidden)(feature1)
        h1 = EdgeGraphConv(self.hidden)(x, senders, receivers, edge_mask,
                                        f1, N)
        h1 = swish(nn.Dense(self.hidden, kernel_init=xavier)(h1))
        f2 = TwoLayerLinear(self.middle, self.hidden)(feature2)
        h2 = EdgeGraphConv(self.hidden)(x, senders, receivers, edge_mask,
                                        f2, N)
        h2 = swish(nn.Dense(self.hidden, kernel_init=xavier)(h2))
        h = nn.Dense(self.hidden, kernel_init=xavier)(
            jnp.concatenate([h1, h2], axis=-1))
        h = h + x
        for _ in range(self.num_layers):
            h = swish(nn.Dense(self.hidden, kernel_init=xavier)(h)) + h
        h = GraphNorm(self.hidden)(h, g.node_graph, g.node_mask,
                                   g.num_graphs)
        return nn.Dense(self.out_dim, kernel_init=xavier)(h)


class ComENet(nn.Module):
    """Defaults mirror comenet.py:232-242."""

    cutoff: float = 8.0
    num_layers: int = 4
    hidden_channels: int = 256
    middle_channels: int = 64
    out_channels: int = 1
    num_radial: int = 3
    num_spherical: int = 2
    num_output_layers: int = 3
    max_edges: int = 4096

    @nn.compact
    def __call__(self, g: GraphBatch):
        z = g.nodes["z"]
        pos = g.nodes["pos"]
        N = g.num_nodes

        senders, receivers, edge_mask = radius_graph_flat(
            pos, g.node_graph, g.node_mask, self.cutoff, self.max_edges)
        j, i = senders, receivers
        vecs = pos[j] - pos[i]
        dist = edge_distances(pos, senders, receivers, edge_mask)

        # nearest (n0) and second-nearest (n1) neighbor edge per node, on
        # both the receiver (i) and sender (j) sides (comenet.py:303-327)
        argmin0 = segment_argmin(dist, i, N, mask=edge_mask)
        E = senders.shape[0]
        second_mask = edge_mask & (jnp.arange(E) != argmin0[i])
        argmin1 = segment_argmin(dist, i, N, mask=second_mask)
        argmin0_j = segment_argmin(dist, j, N, mask=edge_mask)
        second_mask_j = edge_mask & (jnp.arange(E) != argmin0_j[j])
        argmin1_j = segment_argmin(dist, j, N, mask=second_mask_j)

        n0 = j[argmin0][i]
        n1 = j[argmin1][i]
        n0_j = i[argmin0_j][j]
        n1_j = i[argmin1_j][j]

        # reference neighbor must differ from the edge partner
        mask_iref = n0 == j
        idx_iref = jnp.where(mask_iref, argmin1[i], argmin0[i])
        mask_jref = n0_j == i
        idx_jref = jnp.where(mask_jref, argmin1_j[j], argmin0_j[j])

        pos_ji = vecs
        pos_in0 = vecs[argmin0][i]
        pos_in1 = vecs[argmin1][i]
        pos_iref = vecs[idx_iref]
        pos_jref_j = vecs[idx_jref]

        def _safe_atan2(b, a):
            deg = (a * a + b * b) < 1e-12
            a = jnp.where(deg, 1.0, a)
            b = jnp.where(deg, 0.0, b)
            # anti-parallel planes give b ~ +/-eps, a < 0: atan2 flips
            # between +pi and -pi on fp noise. Snap tiny |b| to exactly 0
            # so the branch (+pi) is deterministic.
            b = jnp.where(jnp.abs(b) < 1e-5 * jnp.abs(a), 0.0, b)
            return jnp.arctan2(b, a)

        # theta (comenet.py:365-369)
        a = jnp.sum((-pos_ji) * pos_in0, -1)
        cr = jnp.cross(-pos_ji, pos_in0)
        b = jnp.sqrt(jnp.maximum(jnp.sum(cr * cr, -1), 1e-12))
        theta = _safe_atan2(b, a)
        theta = jnp.where(theta < 0, theta + jnp.pi, theta)

        dist_ji = jnp.maximum(dist, 1e-9)
        # phi (comenet.py:371-378)
        plane1 = jnp.cross(-pos_ji, pos_in0)
        plane2 = jnp.cross(-pos_ji, pos_in1)
        a = jnp.sum(plane1 * plane2, -1)
        b = jnp.sum(jnp.cross(plane1, plane2) * pos_ji, -1) / dist_ji
        phi = _safe_atan2(b, a)
        phi = jnp.where(phi < 0, phi + jnp.pi, phi)

        # tau (comenet.py:380-386)
        plane1 = jnp.cross(pos_ji, pos_jref_j)
        plane2 = jnp.cross(pos_ji, pos_iref)
        a = jnp.sum(plane1 * plane2, -1)
        b = jnp.sum(jnp.cross(plane1, plane2) * pos_ji, -1) / dist_ji
        tau = _safe_atan2(b, a)
        tau = jnp.where(tau < 0, tau + jnp.pi, tau)

        # basis features (comenet features.py: same construction as
        # spherenet but per edge)
        n, k = self.num_spherical, self.num_radial
        rbf = bessel_table(n, k, dist / self.cutoff)     # [E, n, k]
        cbf_full = sph_full_table(n, theta, phi).reshape(-1, n, n)
        feature1 = (cbf_full[:, :, :, None]
                    * rbf[:, None, :, :]).reshape(E, n * n * k)
        cbf_m0 = sph_m0_table(n, tau)                    # [E, n]
        feature2 = (rbf * cbf_m0[:, :, None]).reshape(E, n * k)
        feature1 = jnp.where(edge_mask[:, None], feature1, 0.0)
        feature2 = jnp.where(edge_mask[:, None], feature2, 0.0)

        x = nn.Embed(95, self.hidden_channels,
                     embedding_init=jax.nn.initializers.uniform(
                         scale=jnp.sqrt(3.0)))(z)
        x = jnp.where(g.node_mask[:, None], x, 0.0)
        for _ in range(self.num_layers):
            x = SimpleInteractionBlock(
                self.hidden_channels, self.middle_channels,
                self.num_radial, self.num_spherical,
                self.num_output_layers, self.hidden_channels)(
                x, feature1, feature2, senders, receivers, edge_mask, g)
            x = jnp.where(g.node_mask[:, None], x, 0.0)
        for _ in range(self.num_output_layers):
            x = swish(nn.Dense(self.hidden_channels, kernel_init=xavier)(x))
        x = nn.Dense(self.out_channels, kernel_init=xavier)(x)
        return segment_sum(x, g.node_graph, g.num_graphs, mask=g.node_mask)
