"""ProNet — complete 3D graph networks for protein representations.

Parity with ``dig/threedgraph/method/pronet/pronet.py:256-473``: amino-acid
/ backbone / all-atom levels; radius graph over C-alpha coordinates with a
per-node neighbor cap; geometry features (d, theta, phi) from sequential
reference residues, plus either the rotation-invariant tau (aminoacid) or
backbone-frame Euler angles (backbone/allatom); sequence-offset positional
embeddings; three EdgeGraphConv streams per interaction block.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch
from ..ops import segment_sum
from ..ops.basis import bessel_table, sph_full_table, sph_m0_table
from ..ops.radius import (radius_graph_flat, radius_graph_nk,
                          radius_graph_nk_blocked)
from ..ops.triplets import nk_gather
from .comenet import EdgeGraphConv, TwoLayerLinear, swish

xavier = jax.nn.initializers.glorot_uniform()

NUM_AA_TYPE = 26
NUM_BB_EMBS = 6
NUM_SIDE_CHAIN_EMBS = 8


def _safe_atan2(b, a):
    deg = (a * a + b * b) < 1e-12
    a = jnp.where(deg, 1.0, a)
    b = jnp.where(deg, 0.0, b)
    # snap tiny |b| to 0: anti-parallel planes otherwise flip between
    # +pi and -pi on fp noise (see comenet.py)
    b = jnp.where(jnp.abs(b) < 1e-5 * jnp.abs(a), 0.0, b)
    return jnp.arctan2(b, a)


def _cross_norm(v):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1), 1e-12))


# Componentwise 3-vector algebra (structure-of-arrays): a trailing dim of
# 3 lane-pads to 128 on TPU (~42x physical bytes) and jnp.cross defeats
# fusion — per-edge geometry on [E, 3] arrays was ~25% of the ProNet
# step. Vectors are (x, y, z) tuples of [E] arrays here; see the same
# convention in ops/triplets.py::_components.

def _col3(t, o):
    return t[:, o], t[:, o + 1], t[:, o + 2]


def _sub3(a, b):
    return a[0] - b[0], a[1] - b[1], a[2] - b[2]


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _norm3(a):
    return jnp.sqrt(jnp.maximum(_dot3(a, a), 1e-12))


def _where3(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


class ProNetInteraction(nn.Module):
    """pronet.py:150-254 (incl. per-stream dropout after each conv)."""

    hidden: int
    mid_emb: int
    num_layers: int = 3
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, feature0, feature1, pos_emb, senders, receivers,
                 edge_mask, g: GraphBatch, deterministic: bool = True,
                 nkg=None):
        N = g.num_nodes
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        f0 = TwoLayerLinear(self.mid_emb, self.hidden, act=True,
                            dtype=self.dtype)(feature0)
        f1 = TwoLayerLinear(self.mid_emb, self.hidden, act=True,
                            dtype=self.dtype)(feature1)
        f2 = TwoLayerLinear(self.mid_emb, self.hidden, act=True,
                            dtype=self.dtype)(pos_emb)
        h = swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(x))
        h0 = drop(swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(
            EdgeGraphConv(self.hidden, dtype=self.dtype)(h, senders, receivers, edge_mask,
                                       f0, N, nkg=nkg))))
        h1 = drop(swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(
            EdgeGraphConv(self.hidden, dtype=self.dtype)(h, senders, receivers, edge_mask,
                                       f1, N, nkg=nkg))))
        h2 = drop(swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(
            EdgeGraphConv(self.hidden, dtype=self.dtype)(h, senders, receivers, edge_mask,
                                       f2, N, nkg=nkg))))
        out = jnp.concatenate([h0, h1, h2], axis=-1)
        for li in range(self.num_layers):
            out = swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(out))
        out = out + swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(x))
        for _ in range(self.num_layers - 1):
            out = swish(nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(out))
        return nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype)(out)


class ProNet(nn.Module):
    """Defaults mirror pronet.py:278-296. Node fields in the GraphBatch:
    ``z`` (residue type), ``pos`` (C-alpha), and for backbone/allatom
    levels ``pos_n``/``pos_c`` (N, C coordinates), ``bb_embs`` and
    ``side_chain_embs``."""

    level: str = "aminoacid"
    num_blocks: int = 4
    hidden_channels: int = 128
    out_channels: int = 1
    mid_emb: int = 64
    num_radial: int = 6
    num_spherical: int = 2
    cutoff: float = 10.0
    max_num_neighbors: int = 32
    int_emb_layers: int = 3
    out_layers: int = 2
    num_pos_emb: int = 16
    max_edges: int = 8192
    dropout: float = 0.0
    nk_degree: int = 0   # >0: per-node nearest-K table layout (TPU fast
    # path: sort-free graph build, closed-adjoint gathers, reshape-sum
    # aggregation). Size >= max true degree or the graph is symmetrically
    # truncated (see ops.radius.radius_graph_nk).
    block_size: int = 0  # with nk_degree: slot-aligned O(G*B^2) radius
    # build (loader must pad one protein per block of this many rows)
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16: run
    # the conv/filter matmuls on the MXU in bf16 (params, geometry, basis,
    # readout stay f32 — same policy as SphereNet.compute_dtype)
    data_augment_eachlayer: bool = False  # pronet.py:455-458: clipped
    # N(0, 0.025) node-feature noise before each block (train only)
    euler_noise: bool = False             # pronet.py:425-429: clipped
    # N(0, 0.025) noise on the three backbone Euler angles (train only)

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True):
        def clipped_noise(shape):
            key = self.make_rng("noise")
            return jnp.clip(0.025 * jax.random.normal(key, shape),
                            -0.1, 0.1)
        z = g.nodes["z"]
        pos = g.nodes["pos"]
        N = g.num_nodes

        if self.level == "aminoacid":
            x = nn.Embed(NUM_AA_TYPE, self.hidden_channels)(z)
        else:
            feats = [jax.nn.one_hot(z, NUM_AA_TYPE),
                     g.nodes["bb_embs"]]
            if self.level == "allatom":
                feats.append(g.nodes["side_chain_embs"])
            x = nn.Dense(self.hidden_channels, kernel_init=xavier)(
                jnp.concatenate(feats, -1))
        x = jnp.where(g.node_mask[:, None], x, 0.0)

        if self.nk_degree > 0:
            # TPU fast path: per-node nearest-K table (sort-free build,
            # O(G*B^2) with block_size), closed-adjoint gathers, and
            # reshape-sum aggregation in EdgeGraphConv. All per-edge
            # geometry factors through two closures: receiver-side values
            # are broadcasts (receivers = repeat(arange(N), K)), sender-
            # side values are ONE closed [N, C]-row gather.
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

            def edge_of_node(t):   # t [N, C] -> [E, C] at the receiver
                return jnp.broadcast_to(
                    t[:, None, :], (N, K, t.shape[-1])).reshape(N * K, -1)

            def edge_of_nbr(t):    # t [N, C] -> [E, C] at the sender
                return nk_gather(t, nkg.nbr_idx, nkg.rev_edge,
                                 nkg.nbr_mask)
        else:
            nkg = None
            senders, receivers, edge_mask = radius_graph_flat(
                pos, g.node_graph, g.node_mask, self.cutoff,
                self.max_edges,
                max_num_neighbors=self.max_num_neighbors)
            j, i = senders, receivers

            def edge_of_node(t):
                return t[i]

            def edge_of_nbr(t):
                return t[j]

        E = senders.shape[0]

        # sequence-offset positional embedding (pronet.py pos_emb)
        offset = (i - j).astype(jnp.float32)
        freqs = jnp.exp(jnp.arange(0, self.num_pos_emb, 2)
                        * -(np.log(10000.0) / self.num_pos_emb))
        ang = offset[:, None] * freqs[None, :]
        pos_emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1)

        # theta/phi from sequential reference residues (pronet.py:395-409)
        # — per-node reference tables (rolls) packed into ONE [N, 9|15]
        # table so the sender side costs a single row gather; all edge-
        # level vector algebra is componentwise (see _col3/_cross3 note)
        rm1 = jnp.roll(pos, 1, axis=0) - pos    # pos[(n-1)%N] - pos[n]
        rp1 = jnp.roll(pos, -1, axis=0) - pos   # pos[(n+1)%N] - pos[n]
        cols = [pos, rm1, rp1]
        if self.level != "aminoacid":
            pos_n = g.nodes["pos_n"]
            pos_c = g.nodes["pos_c"]
            o1x_n = pos_n - pos
            o1z_n = jnp.cross(o1x_n, jnp.cross(o1x_n, pos_c - pos))
            cols += [o1x_n, o1z_n]
        tab = jnp.concatenate(cols, axis=1)
        gn = edge_of_node(tab)
        ge = edge_of_nbr(tab)
        v_ji = _sub3(_col3(ge, 0), _col3(gn, 0))
        dist = jnp.where(edge_mask, _norm3(v_ji), 1.0)
        v_ref0 = _col3(gn, 3)
        v_b1 = _col3(gn, 6)                     # pos[refi1] - pos[i]
        a = _dot3(v_ji, v_ref0)
        b = _norm3(_cross3(v_ji, v_ref0))
        theta = _safe_atan2(b, a)
        plane1 = _cross3(v_ref0, v_b1)
        plane2 = _cross3(v_ref0, v_ji)
        a = _dot3(plane1, plane2)
        b = (_dot3(_cross3(plane1, plane2), v_ref0)
             / jnp.maximum(_norm3(v_ref0), 1e-9))
        phi = _safe_atan2(b, a)

        n, k = self.num_spherical, self.num_radial
        rbf = bessel_table(n, k, dist / self.cutoff)
        cbf_full = sph_full_table(n, theta, phi).reshape(-1, n, n)
        feature0 = (cbf_full[:, :, :, None]
                    * rbf[:, None, :, :]).reshape(E, n * n * k)
        feature0 = jnp.where(edge_mask[:, None], feature0, 0.0)

        def d_angle(angle):
            cbf = sph_m0_table(n, angle)
            return (rbf * cbf[:, :, None]).reshape(E, n * k)

        if self.level == "aminoacid":
            # tau between sequential planes (pronet.py:435-448); the
            # reference-residue choice (i±1 / j±1, avoiding the edge
            # partner) selects between the two per-node roll vectors
            c_i = ((i - 1) % N) == j
            v_refi = _where3(c_i, v_b1, v_ref0)
            c_j = ((j - 1) % N) == i
            v_refj = _where3(c_j, _col3(ge, 6), _col3(ge, 3))
            p1 = _cross3(v_ji, v_refi)
            p2 = _cross3(v_ji, v_refj)
            a = _dot3(p1, p2)
            b = (_dot3(_cross3(p1, p2), v_ji)
                 / jnp.maximum(dist, 1e-9))
            tau = _safe_atan2(b, a)
            feature1 = d_angle(tau)
        else:
            # backbone-frame Euler angles (pronet.py:411-433); o1x/o1z
            # ride the packed node table (columns 9..14)
            o1x = _col3(gn, 9)
            o1z = _col3(gn, 12)
            o1zl = _norm3(o1z) + 1e-7
            o2x = _col3(ge, 9)
            o2z = _col3(ge, 12)
            o2zl = _norm3(o2z) + 1e-7
            nvec = _cross3(o1z, o2z)
            angle1 = _safe_atan2(
                _dot3(_cross3(o1x, nvec), o1z) / o1zl,
                _dot3(o1x, nvec))
            angle2 = _safe_atan2(_norm3(_cross3(o1z, o2z)),
                                 _dot3(o1z, o2z))
            angle3 = _safe_atan2(
                _dot3(_cross3(nvec, o2x), o2z) / o2zl,
                _dot3(nvec, o2x))
            if self.euler_noise and not deterministic:
                noise = clipped_noise((3,) + angle1.shape)
                angle1, angle2, angle3 = (angle1 + noise[0],
                                          angle2 + noise[1],
                                          angle3 + noise[2])
            feature1 = jnp.concatenate(
                [d_angle(angle1), d_angle(angle2), d_angle(angle3)], -1)
        feature1 = jnp.where(edge_mask[:, None], feature1, 0.0)

        for _ in range(self.num_blocks):
            if self.data_augment_eachlayer and not deterministic:
                x = x + clipped_noise(x.shape)
            x = ProNetInteraction(self.hidden_channels, self.mid_emb,
                                  self.int_emb_layers, self.dropout,
                                  dtype=self.compute_dtype)(
                x, feature0, feature1, pos_emb, senders, receivers,
                edge_mask, g, deterministic, nkg=nkg)
            x = x.astype(jnp.float32)
            x = jnp.where(g.node_mask[:, None], x, 0.0)

        y = segment_sum(x, g.node_graph, g.num_graphs, mask=g.node_mask)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        for _ in range(self.out_layers - 1):
            y = drop(jax.nn.relu(nn.Dense(self.hidden_channels,
                                          kernel_init=xavier)(y)))
        return nn.Dense(self.out_channels, kernel_init=xavier)(y)
