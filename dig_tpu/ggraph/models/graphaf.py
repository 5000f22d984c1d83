"""GraphAF — continuous masked autoregressive flow for molecule generation.

Parity with ``dig/ggraph/method/GraphAF/model/{graphaf.py,graphflow.py,
st_net.py}``: same BFS mask schedule and RGCN embeddings as GraphDF, but
affine coupling x' = x * s + t with sigmoid-parameterized scales
(ST_Net_Sigmoid, st_net.py:5-56), uniform dequantization of the one-hot
inputs, and a standard-normal base with exact log-det.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .flow_utils import FlowMasks, build_flow_masks
from .graphdf import BatchNormEmb
from .rgcn import RGCN

xavier = jax.nn.initializers.glorot_uniform()


class Rescale(nn.Module):
    @nn.compact
    def __call__(self, x):
        w = self.param("weight", jax.nn.initializers.zeros, (1,))
        return jnp.exp(w) * x


class STNetSigmoid(nn.Module):
    """Linear-tanh-Linear -> (sigmoid(s + shift), t) with learnable
    rescales (reference st_net.py:5-56)."""

    output_dim: int
    hid_dim: int = 128
    sigmoid_shift: float = 2.0

    @nn.compact
    def __call__(self, emb):
        h = jnp.tanh(nn.Dense(self.hid_dim, kernel_init=xavier)(emb))
        # second linear init ~0 so the flow starts near identity
        out = nn.Dense(self.output_dim * 2,
                       kernel_init=jax.nn.initializers.constant(1e-10))(h)
        out = Rescale()(out)
        s = out[..., :self.output_dim]
        t = out[..., self.output_dim:]
        s = jax.nn.sigmoid(s + self.sigmoid_shift)
        s = Rescale()(s)
        return s, t


class MaskedGraphAF(nn.Module):
    """Flow core (reference GraphAF/model/graphaf.py:9-318)."""

    masks: FlowMasks
    num_flow_layer: int = 12
    graph_size: int = 38
    num_node_type: int = 9
    num_edge_type: int = 4
    use_bn: bool = True
    num_rgcn_layer: int = 3
    nhid: int = 128
    nout: int = 128

    def setup(self):
        self.rgcn = RGCN(self.nhid, self.nout, self.num_edge_type - 1,
                         self.num_rgcn_layer)
        if self.use_bn:
            self.bn = BatchNormEmb()
        self.node_st = [STNetSigmoid(self.num_node_type, self.nhid)
                        for _ in range(self.num_flow_layer)]
        self.edge_st = [STNetSigmoid(self.num_edge_type, self.nhid)
                        for _ in range(self.num_flow_layer)]

    def _all_embs(self, x, adj):
        B = x.shape[0]
        R = self.masks.node_masks.shape[0]
        N = self.graph_size
        nm = jnp.asarray(self.masks.node_masks)
        am = jnp.asarray(self.masks.adj_masks)
        xm = jnp.where(nm[None, :, :, None], x[:, None], 0.0)
        xm = xm.reshape(B * R, N, self.num_node_type)
        adjm = jnp.where(am[None, :, None], adj[:, None, :3], 0.0)
        adjm = adjm.reshape(B * R, 3, N, N)
        h = self.rgcn(xm, adjm)
        if self.use_bn:
            h = self.bn(h)
        h = h.reshape(B, R, N, -1)
        graph_emb = jnp.sum(h, axis=2)
        emb_node = graph_emb[:, :N]
        li = jnp.asarray(self.masks.link_index)
        h_edge = h[:, N:]
        S = h_edge.shape[1]
        sel = h_edge[:, jnp.arange(S)[:, None], li]
        emb_edge = jnp.concatenate(
            [sel.reshape(B, S, -1), graph_emb[:, N:]], axis=-1)
        return emb_node, emb_edge

    def __call__(self, x, adj, x_deq, adj_deq):
        """Returns ((z_node, z_edge), (logdet_node, logdet_edge))."""
        emb_node, emb_edge = self._all_embs(x, adj)
        logdet_n = jnp.zeros(x.shape[0])
        logdet_e = jnp.zeros(x.shape[0])
        for i in range(self.num_flow_layer):
            s, t = self.node_st[i](emb_node)
            x_deq = x_deq * s + t
            logdet_n += jnp.sum(jnp.log(jnp.abs(s) + 1e-12), axis=(1, 2))
            s, t = self.edge_st[i](emb_edge)
            adj_deq = adj_deq * s + t
            logdet_e += jnp.sum(jnp.log(jnp.abs(s) + 1e-12), axis=(1, 2))
        return (x_deq, adj_deq), (logdet_n, logdet_e)

    def _node_embs_gen(self, x, adj):
        # generation-time canvas embeddings: eval-mode (running) statistics
        h = self.rgcn(x, adj[:, :3])
        if self.use_bn:
            h = self.bn(h, use_running_average=True)
        return h

    def forward_rl_node(self, x, adj, action):
        """(z, logdet) of a recorded node action on the current canvas
        (eval-mode BN; reference GraphAF graphflow_rl forward_rl_node)."""
        h = self._node_embs_gen(x, adj)
        emb = jnp.sum(h, axis=1)
        z = action
        logdet = jnp.zeros(action.shape[0])
        for i in range(self.num_flow_layer):
            s, t = self.node_st[i](emb)
            z = z * s + t
            logdet += jnp.sum(jnp.log(jnp.abs(s) + 1e-12), axis=-1)
        return z, logdet

    def forward_rl_edge(self, x, adj, action, edge_index):
        h = self._node_embs_gen(x, adj)
        g = jnp.sum(h, axis=1)
        B = x.shape[0]
        sel = h[jnp.arange(B)[:, None], edge_index]
        emb = jnp.concatenate([sel.reshape(B, -1), g], axis=-1)
        z = action
        logdet = jnp.zeros(action.shape[0])
        for i in range(self.num_flow_layer):
            s, t = self.edge_st[i](emb)
            z = z * s + t
            logdet += jnp.sum(jnp.log(jnp.abs(s) + 1e-12), axis=-1)
        return z, logdet

    def reverse_node(self, x, adj, latent):
        h = self._node_embs_gen(x, adj)
        emb = jnp.sum(h, axis=1)
        for i in reversed(range(self.num_flow_layer)):
            s, t = self.node_st[i](emb)
            latent = (latent - t) / s
        return latent

    def reverse_edge(self, x, adj, latent, edge_index):
        h = self._node_embs_gen(x, adj)
        g = jnp.sum(h, axis=1)
        B = x.shape[0]
        sel = h[jnp.arange(B)[:, None], edge_index]
        emb = jnp.concatenate([sel.reshape(B, -1), g], axis=-1)
        for i in reversed(range(self.num_flow_layer)):
            s, t = self.edge_st[i](emb)
            latent = (latent - t) / s
        return latent


class GraphFlowModelAF(nn.Module):
    """GraphAF top (reference GraphAF/model/graphflow.py): dequantized
    forward + Gaussian log-prob."""

    max_size: int
    edge_unroll: int
    node_dim: int
    bond_dim: int
    num_flow_layer: int = 12
    num_rgcn_layer: int = 3
    nhid: int = 128
    nout: int = 128
    deq_coeff: float = 0.9

    def setup(self):
        self.masks = build_flow_masks(self.max_size, self.edge_unroll)
        self.flow_core = MaskedGraphAF(
            self.masks, self.num_flow_layer, self.max_size, self.node_dim,
            self.bond_dim, True, self.num_rgcn_layer, self.nhid, self.nout)

    def __call__(self, x, adj, rng):
        li = self.masks.link_index
        adj_deq = jnp.transpose(adj[:, :, li[:, 1], li[:, 0]], (0, 2, 1))
        k1, k2 = jax.random.split(rng)
        x_deq = x + self.deq_coeff * jax.random.uniform(k1, x.shape)
        adj_deq = adj_deq + self.deq_coeff * jax.random.uniform(
            k2, adj_deq.shape)
        return self.flow_core(x, adj, x_deq, adj_deq)

    def log_prob(self, z, logdet):
        """Standard-normal base log-likelihood + logdet, averaged and
        normalized per latent dim (reference graphflow.py:285-299)."""
        (zn, ze), (ldn, lde) = z, logdet
        B = zn.shape[0]
        node_len = self.max_size * self.node_dim
        edge_len = self.masks.num_edge_steps * self.bond_dim
        ll_node = -0.5 * (jnp.log(2 * jnp.pi) + zn ** 2).sum(axis=(1, 2))
        ll_edge = -0.5 * (jnp.log(2 * jnp.pi) + ze ** 2).sum(axis=(1, 2))
        ll = ll_node + ll_edge + ldn + lde
        return -jnp.mean(ll) / (node_len + edge_len)

    def loss(self, x, adj, rng):
        z, logdet = self.__call__(x, adj, rng)
        return self.log_prob(z, logdet)

    def nll(self, x, adj):
        """Per-sample NLL with deterministic mid-bin dequantization (for
        the REINFORCE fine-tune, which needs rng-free reward weighting)."""
        li = self.masks.link_index
        adj_deq = jnp.transpose(adj[:, :, li[:, 1], li[:, 0]], (0, 2, 1))
        x_deq = x + 0.5 * self.deq_coeff
        adj_deq = adj_deq + 0.5 * self.deq_coeff
        (zn, ze), (ldn, lde) = self.flow_core(x, adj, x_deq, adj_deq)
        node_len = self.max_size * self.node_dim
        edge_len = self.masks.num_edge_steps * self.bond_dim
        ll = (-0.5 * (jnp.log(2 * jnp.pi) + zn ** 2).sum(axis=(1, 2))
              - 0.5 * (jnp.log(2 * jnp.pi) + ze ** 2).sum(axis=(1, 2))
              + ldn + lde)
        return -ll / (node_len + edge_len)

    def reverse_node(self, x, adj, latent):
        return self.flow_core.reverse_node(x, adj, latent)

    def reverse_edge(self, x, adj, latent, edge_index):
        return self.flow_core.reverse_edge(x, adj, latent, edge_index)

    def rl_node_ll(self, x, adj, action, node_step):
        """Gaussian-base log-likelihood of recorded node actions [B]
        (PPO fine-tune; reference GraphAF graphflow_rl)."""
        del node_step  # continuous flow: base is a standard normal
        act = action + 0.5 * self.deq_coeff
        z, logdet = self.flow_core.forward_rl_node(x, adj, act)
        return (-0.5 * (jnp.log(2 * jnp.pi) + z ** 2).sum(axis=-1)
                + logdet)

    def rl_edge_ll(self, x, adj, action, edge_index, edge_cnt):
        del edge_cnt
        act = action + 0.5 * self.deq_coeff
        z, logdet = self.flow_core.forward_rl_edge(x, adj, act, edge_index)
        return (-0.5 * (jnp.log(2 * jnp.pi) + z ** 2).sum(axis=-1)
                + logdet)
