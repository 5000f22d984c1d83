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

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment_argmin, segment_sum
from ..ops.basis import bessel_table, sph_full_table, sph_m0_table
from ..ops.radius import (radius_graph_flat, radius_graph_nk,
                          radius_graph_nk_blocked)
from ..ops.triplets import edge_distances, edges_to_nodes_nk, nk_gather

xavier = jax.nn.initializers.glorot_uniform()
zeros = jax.nn.initializers.zeros


def swish(x):
    return x * jax.nn.sigmoid(x)


class TwoLayerLinear(nn.Module):
    middle: int
    out: int
    act: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.middle, use_bias=False, kernel_init=xavier,
                     dtype=self.dtype)(x)
        if self.act:
            x = swish(x)
        x = nn.Dense(self.out, use_bias=False, kernel_init=xavier,
                     dtype=self.dtype)(x)
        if self.act:
            x = swish(x)
        return x


class EdgeGraphConv(nn.Module):
    """GraphConv with edge-feature-modulated messages
    (comenet.py:130-134): out = W_rel(sum_j w_e * x_j) + W_root(x)."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, edge_weight,
                 num_nodes, nkg=None):
        if nkg is not None:
            # NK layout: sender gather via the closed reverse-table gather
            # (scatter-free adjoint) and receiver aggregation as a dense
            # reshape-sum — no scatter/segment op anywhere
            N, K = nkg.nbr_idx.shape
            xs = nk_gather(x, nkg.nbr_idx, nkg.rev_edge, nkg.nbr_mask)
            msgs = xs * edge_weight
            agg = edges_to_nodes_nk(msgs, N, mask=edge_mask)
        else:
            msgs = x[senders] * edge_weight
            agg = segment_sum(msgs, receivers, num_nodes, mask=edge_mask)
        return (nn.Dense(self.out_dim, kernel_init=xavier,
                         dtype=self.dtype)(agg)
                + nn.Dense(self.out_dim, use_bias=False,
                           kernel_init=xavier, dtype=self.dtype)(x))


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

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, feature1, feature2, senders, receivers,
                 edge_mask, g: GraphBatch, nkg=None):
        N = g.num_nodes
        dt = self.dtype
        D = lambda f: nn.Dense(f, kernel_init=xavier, dtype=dt)
        x = swish(D(self.hidden)(x))
        f1 = TwoLayerLinear(self.middle, self.hidden, dtype=dt)(feature1)
        h1 = EdgeGraphConv(self.hidden, dtype=dt)(
            x, senders, receivers, edge_mask, f1, N, nkg=nkg)
        h1 = swish(D(self.hidden)(h1))
        f2 = TwoLayerLinear(self.middle, self.hidden, dtype=dt)(feature2)
        h2 = EdgeGraphConv(self.hidden, dtype=dt)(
            x, senders, receivers, edge_mask, f2, N, nkg=nkg)
        h2 = swish(D(self.hidden)(h2))
        h = D(self.hidden)(jnp.concatenate([h1, h2], axis=-1))
        h = h + x
        for _ in range(self.num_layers):
            h = swish(D(self.hidden)(h)) + h
        # GraphNorm stays f32: per-graph variance in bf16 loses signal
        h = GraphNorm(self.hidden)(h.astype(jnp.float32), g.node_graph,
                                   g.node_mask, g.num_graphs)
        if dt is not None:
            h = h.astype(dt)
        return nn.Dense(self.out_dim, kernel_init=xavier, dtype=dt)(h)


class ComENet(nn.Module):
    """Defaults mirror comenet.py:232-242.

    ``use_pbc=True`` is the OCP-framework variant (reference
    ``comenet/ocp/comenet-ocp.py:274-358``, optional-dep-gated there):
    crystals with ``g.globals['cell']`` [G, 3, 3] lattice vectors get a
    periodic radius graph (:mod:`dig_tpu.ops.pbc`), and all local-frame
    geometry runs on minimum-image displacement vectors. Energy+forces
    (S2EF) come from the generic trainer's dE/dpos, which differentiates
    through the periodic displacements.
    """

    cutoff: float = 8.0
    num_layers: int = 4
    hidden_channels: int = 256
    middle_channels: int = 64
    out_channels: int = 1
    num_radial: int = 3
    num_spherical: int = 2
    num_output_layers: int = 3
    max_edges: int = 4096
    use_pbc: bool = False
    pbc_images: int = 1
    nk_degree: int = 0   # >0: per-node nearest-K table layout — the TPU
    # fast path (same ladder as SphereNet): sort-free graph build (with
    # block_size: O(G*B^2) slot-aligned), per-row argmin frame selection
    # instead of segment_argmin over E, closed-adjoint gathers, and
    # reshape-sum aggregation. Not available with use_pbc.
    block_size: int = 0  # with nk_degree: slot-aligned blocked radius
    # build (loader must use MoleculeLoader(slot_size=block_size))
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16: MXU
    # matmuls in bf16 (params, geometry, GraphNorm, readout stay f32)

    @nn.compact
    def __call__(self, g: GraphBatch):
        z = g.nodes["z"]
        pos = g.nodes["pos"]
        N = g.num_nodes

        nkg = None
        if self.nk_degree > 0 and not self.use_pbc:
            if self.block_size > 0:
                nkg = radius_graph_nk_blocked(
                    pos, g.node_mask, self.cutoff, self.nk_degree,
                    self.block_size, node_graph=g.node_graph)
            else:
                nkg = radius_graph_nk(pos, g.node_graph, g.node_mask,
                                      self.cutoff, self.nk_degree)
            senders, receivers, edge_mask = (nkg.senders, nkg.receivers,
                                             nkg.edge_mask)
            j, i = senders, receivers
            K = self.nk_degree
            # all edge vectors from ONE closed [N, 3]-row gather
            pn = nk_gather(pos, nkg.nbr_idx, nkg.rev_edge,
                           nkg.nbr_mask).reshape(N, K, 3)
            ev = pn - pos[:, None, :]                       # [N, K, 3]
            vecs = ev.reshape(N * K, 3)
            d2d = jnp.sqrt(jnp.maximum(jnp.sum(ev * ev, -1), 1e-12))
            dist = jnp.where(edge_mask, d2d.reshape(-1), 1.0)
            # nearest / second-nearest slot per node: a per-row argmin
            # over K lanes (the flat path needs two segment_argmins on E)
            dsel = jnp.where(nkg.nbr_mask, d2d, jnp.inf)
            slot0 = jnp.argmin(dsel, axis=1)                # [N]
            oh0 = jax.nn.one_hot(slot0, K, dtype=pos.dtype)
            dsel1 = jnp.where(oh0 > 0, jnp.inf, dsel)
            slot1 = jnp.argmin(dsel1, axis=1)
            oh1 = jax.nn.one_hot(slot1, K, dtype=pos.dtype)
            # selected reference vectors per node (one-hot contraction:
            # scatter-free adjoint, exact gradients through selection)
            v0 = jnp.einsum("nk,nkc->nc", oh0, ev)          # [N, 3]
            v1 = jnp.einsum("nk,nkc->nc", oh1, ev)
            n0 = jnp.take_along_axis(nkg.nbr_idx, slot0[:, None],
                                     axis=1)[:, 0]          # [N] int
            # receiver-side refs broadcast; sender-side via ONE closed
            # gather of the packed per-node table [v0 | v1 | n0]
            tab = jnp.concatenate(
                [v0, v1, n0[:, None].astype(pos.dtype)], axis=1)
            gj = nk_gather(tab, nkg.nbr_idx, nkg.rev_edge, nkg.nbr_mask)
            v0j, v1j = gj[:, :3], gj[:, 3:6]
            n0j = gj[:, 6].astype(jnp.int32)
            mask_iref = (n0[:, None] == nkg.nbr_idx).reshape(-1)
            pos_in0 = jnp.broadcast_to(v0[:, None, :],
                                       (N, K, 3)).reshape(-1, 3)
            pos_in1 = jnp.broadcast_to(v1[:, None, :],
                                       (N, K, 3)).reshape(-1, 3)
            pos_iref = jnp.where(mask_iref[:, None], pos_in1, pos_in0)
            mask_jref = n0j == i
            # sender-grouped edges in the flat path orient their vector
            # pos[j] - pos[ref]; ev is pos[ref] - pos[j] — negate
            pos_jref_j = -jnp.where(mask_jref[:, None], v1j, v0j)
            pos_ji = vecs
            E = senders.shape[0]
            return self._interact(g, z, pos_ji, pos_in0, pos_in1,
                                  pos_iref, pos_jref_j, dist, senders,
                                  receivers, edge_mask, E, nkg)

        if self.use_pbc:
            from ..ops.pbc import radius_graph_pbc_flat
            pg = radius_graph_pbc_flat(
                pos, g.globals["cell"], g.node_graph, g.node_mask,
                self.cutoff, self.max_edges, images=self.pbc_images)
            senders, receivers, edge_mask = (pg.senders, pg.receivers,
                                             pg.edge_mask)
            j, i = senders, receivers
            vecs = pg.edge_vec
            dist = pg.edge_dist
        else:
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
        return self._interact(g, z, pos_ji, pos_in0, pos_in1, pos_iref,
                              pos_jref_j, dist, senders, receivers,
                              edge_mask, E, None)

    def _interact(self, g, z, pos_ji, pos_in0, pos_in1, pos_iref,
                  pos_jref_j, dist, senders, receivers, edge_mask, E,
                  nkg):
        def _safe_atan2(b, a):
            deg = (a * a + b * b) < 1e-12
            a = jnp.where(deg, 1.0, a)
            b = jnp.where(deg, 0.0, b)
            # anti-parallel planes give b ~ +/-eps, a < 0: atan2 flips
            # between +pi and -pi on fp noise. Snap tiny |b| to exactly 0
            # so the branch (+pi) is deterministic.
            b = jnp.where(jnp.abs(b) < 1e-5 * jnp.abs(a), 0.0, b)
            return jnp.arctan2(b, a)

        def _unit(v):
            n2 = jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-24)
            return v * jax.lax.rsqrt(n2)

        def _plane_dihedral(u, r1, r2):
            """Angle in [0, pi] between planes span(u, r1) / span(u, r2)
            around axis u (all unit vectors). When a reference vector is
            (anti)parallel to the edge — e.g. the reference neighbor IS
            the edge itself, common under PBC — the plane is degenerate
            and the angle undefined; the reference's torch code then hits
            atan2(0, 0) == 0, so we snap to 0 too. Degeneracy is detected
            on the plane NORM (sin^2 of the vector angle): XLA's FMA
            contraction leaves ~1e-6 rotation-dependent residuals in
            exactly-parallel cross products, so testing atan2's arguments
            against 0 is not deterministic."""
            p1 = jnp.cross(u, r1)
            p2 = jnp.cross(u, r2)
            deg = (jnp.sum(p1 * p1, -1) < 1e-6) | (
                jnp.sum(p2 * p2, -1) < 1e-6)
            a = jnp.where(deg, 1.0, jnp.sum(p1 * p2, -1))
            b = jnp.where(deg, 0.0, jnp.sum(jnp.cross(p1, p2) * u, -1))
            ang = _safe_atan2(b, a)
            return jnp.where(ang < 0, ang + jnp.pi, ang)

        # theta (comenet.py:365-369)
        a = jnp.sum((-pos_ji) * pos_in0, -1)
        cr = jnp.cross(-pos_ji, pos_in0)
        b = jnp.sqrt(jnp.maximum(jnp.sum(cr * cr, -1), 1e-12))
        theta = _safe_atan2(b, a)
        theta = jnp.where(theta < 0, theta + jnp.pi, theta)

        u_ji = _unit(pos_ji)
        # phi (comenet.py:371-378); planes use -pos_ji there, but negating
        # both plane normals changes neither p1.p2 nor p1 x p2
        phi = _plane_dihedral(u_ji, _unit(pos_in0), _unit(pos_in1))
        # tau (comenet.py:380-386)
        tau = _plane_dihedral(u_ji, _unit(pos_jref_j), _unit(pos_iref))

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
        dt = self.compute_dtype
        if dt is not None:
            feature1, feature2 = feature1.astype(dt), feature2.astype(dt)

        x = nn.Embed(95, self.hidden_channels,
                     embedding_init=jax.nn.initializers.uniform(
                         scale=jnp.sqrt(3.0)), dtype=dt)(z)
        x = jnp.where(g.node_mask[:, None], x, 0.0)
        for _ in range(self.num_layers):
            x = SimpleInteractionBlock(
                self.hidden_channels, self.middle_channels,
                self.num_radial, self.num_spherical,
                self.num_output_layers, self.hidden_channels,
                dtype=dt)(
                x, feature1, feature2, senders, receivers, edge_mask, g,
                nkg=nkg)
            x = jnp.where(g.node_mask[:, None], x, 0.0)
        x = x.astype(jnp.float32)
        for _ in range(self.num_output_layers):
            x = swish(nn.Dense(self.hidden_channels, kernel_init=xavier)(x))
        x = nn.Dense(self.out_channels, kernel_init=xavier)(x)
        return segment_sum(x, g.node_graph, g.num_graphs, mask=g.node_mask)


class ComENetOCP(ComENet):
    """OCP/S2EF configuration: periodic crystals (comenet-ocp.py:274)."""
    use_pbc: bool = True
