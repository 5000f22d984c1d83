"""Graph-parallel flax models for :func:`dig_tpu.parallel.gp.make_gp_engine`.

Each module's contract is ``__call__(x, g: GPLocalGraph, halo_fn)`` where
``x`` is the local node slab ``[C, F]`` and ``halo_fn(h) -> [H, F]``
fetches the boundary rows of any per-node array from neighbor shards (one
ICI all_to_all per call). Aggregations index the concatenated
``[C + H, F]`` feature space — the exact analog of the reference's
in-batch + out-of-batch row layout (``relabel_one_hop``,
``dig/lsgraph/method/GraphFMOB/csrc/cpu/relabel_cpu.cpp:55-76``), except
boundary rows are fresh (exchanged per layer) rather than stale history.

Models: GPGCN (toy/backcompat), GPGCN2 (GCNII, mirrors
``dig/lsgraph/method/GraphFMOB/models/gcn2.py``), GPPNA (mirrors
``models/pna.py``), and GPSchNet — the flat molecular SchNet
(``dig/threedgraph/method/schnet/schnet.py``) over a partitioned atom
graph, for structures too large for one chip: positions are exchanged
once, per-layer node features every interaction.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import MLP, shifted_softplus
from ..ops.basis import cosine_cutoff, gaussian_rbf
from ..ops.segment import (segment_max, segment_mean, segment_min,
                           segment_sum)
from .gp import GPLocalGraph

xavier = jax.nn.initializers.glorot_uniform()


def _gcn_norm(g: GPLocalGraph, halo_fn):
    # in-degree is complete locally (edges live on the receiver's part);
    # out-degree is the precomputed global count, halo rows fetched once
    ones = jnp.where(g.edge_mask, 1.0, 0.0)
    deg_in = segment_sum(ones, g.receivers, g.num_local) + 1.0
    do_own = jax.lax.rsqrt(g.deg_out + 1.0)
    do_full = jnp.concatenate(
        [do_own, halo_fn(do_own[:, None])[:, 0]], axis=0)
    di = jax.lax.rsqrt(deg_in)
    coef = di[g.receivers] * do_full[g.senders]
    return jnp.where(g.edge_mask, coef, 0.0), di * di


class GPGCN(nn.Module):
    """Partitioned multi-layer GCN (mean-normalized aggregation)."""

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, g: GPLocalGraph, halo_fn):
        C = g.num_local
        deg = segment_sum(jnp.where(g.edge_mask, 1.0, 0.0), g.receivers,
                          C) + 1.0
        h = x
        for li, f in enumerate(self.features):
            feats = jnp.concatenate([h, halo_fn(h)], axis=0)
            msgs = jnp.where(g.edge_mask[:, None], feats[g.senders], 0.0)
            agg = segment_sum(msgs, g.receivers, C)
            h = (agg + h) / deg[:, None]
            h = nn.Dense(f, kernel_init=xavier)(h)
            if li < len(self.features) - 1:
                h = jax.nn.relu(h)
        return h


class GPGCN2(nn.Module):
    """Partitioned GCNII (initial residual + identity mapping)."""

    hidden: int
    out_dim: int
    num_layers: int
    alpha: float = 0.1
    beta: float = 0.5

    @nn.compact
    def __call__(self, x, g: GPLocalGraph, halo_fn):
        C = g.num_local
        h = jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(x))
        h0 = h
        for _ in range(self.num_layers):
            feats = jnp.concatenate([h, halo_fn(h)], axis=0)
            coef, self_coef = _gcn_norm(g, halo_fn)
            msgs = jnp.where(g.edge_mask[:, None],
                             feats[g.senders] * coef[:, None], 0.0)
            agg = segment_sum(msgs, g.receivers, C) + self_coef[:, None] * h
            z = (1 - self.alpha) * agg + self.alpha * h0
            w = nn.Dense(self.hidden, use_bias=False, kernel_init=xavier)(z)
            h = jax.nn.relu((1 - self.beta) * z + self.beta * w)
        return nn.Dense(self.out_dim, kernel_init=xavier)(h)


class GPPNA(nn.Module):
    """Partitioned Principal Neighborhood Aggregation."""

    hidden: int
    out_dim: int
    num_layers: int
    avg_deg_log: float = 1.0

    @nn.compact
    def __call__(self, x, g: GPLocalGraph, halo_fn):
        C = g.num_local
        h = x
        for li in range(self.num_layers):
            feats = jnp.concatenate([h, halo_fn(h)], axis=0)
            msgs = feats[g.senders]
            em = g.edge_mask
            mean = segment_mean(msgs, g.receivers, C, mask=em)
            mx = segment_max(msgs, g.receivers, C, mask=em)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            mn = segment_min(msgs, g.receivers, C, mask=em)
            mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
            sq = segment_mean(msgs * msgs, g.receivers, C, mask=em)
            std = jnp.sqrt(jnp.maximum(sq - mean * mean, 1e-10))
            deg = segment_sum(jnp.where(em, 1.0, 0.0), g.receivers, C)
            amp = (jnp.log(deg + 1.0) / self.avg_deg_log)[:, None]
            att = 1.0 / jnp.maximum(amp, 1e-2)
            parts = []
            for agg in (mean, mx, mn, std):
                parts += [agg, agg * amp, agg * att]
            h2 = jnp.concatenate(parts + [h], axis=-1)
            h = nn.Dense(self.hidden, kernel_init=xavier)(h2)
            if li < self.num_layers - 1:
                h = jax.nn.relu(h)
        return nn.Dense(self.out_dim, kernel_init=xavier)(h)


class GPSchNet(nn.Module):
    """Flat SchNet over a partitioned atom graph.

    The input slab is ``[C, 4]``: column 0 the atomic number (as float),
    columns 1:4 the positions. Edges must connect atoms within the cutoff
    (build them with the partitioner on a host-computed radius graph).
    Returns per-node energy contributions ``[C, 1]`` — psum over shards
    outside gives the total energy.
    """

    cutoff: float = 5.0
    num_layers: int = 3
    hidden_channels: int = 64
    num_filters: int = 64
    num_gaussians: int = 25

    @nn.compact
    def __call__(self, x, g: GPLocalGraph, halo_fn):
        C = g.num_local
        z = x[:, 0].astype(jnp.int32)
        pos = x[:, 1:4]
        pos_full = jnp.concatenate([pos, halo_fn(pos)], axis=0)
        d = jnp.linalg.norm(pos_full[g.senders] -
                            pos_full[jnp.clip(g.receivers, 0, C - 1)] + 1e-9,
                            axis=-1)
        rbf = gaussian_rbf(d, 0.0, self.cutoff, self.num_gaussians)
        gate = cosine_cutoff(d, self.cutoff) * \
            jnp.where(g.edge_mask, 1.0, 0.0) * \
            jnp.where(d < self.cutoff, 1.0, 0.0)

        # halo atoms' species embeddings: exchange the embedded features
        v = nn.Embed(100, self.hidden_channels,
                     embedding_init=jax.nn.initializers.uniform(
                         scale=jnp.sqrt(3.0)))(z)
        v = jnp.where(g.node_mask[:, None], v, 0.0)
        for _ in range(self.num_layers):
            vj = nn.Dense(self.num_filters, use_bias=False,
                          kernel_init=xavier)(v)
            vj_full = jnp.concatenate([vj, halo_fn(vj)], axis=0)
            W = MLP([self.num_filters, self.num_filters],
                    act=shifted_softplus, kernel_init=xavier)(rbf)
            e = vj_full[g.senders] * W * gate[:, None]
            agg = segment_sum(e, g.receivers, C,
                              mask=g.edge_mask)
            out = nn.Dense(self.hidden_channels, kernel_init=xavier)(agg)
            out = shifted_softplus(out)
            out = nn.Dense(self.hidden_channels, kernel_init=xavier)(out)
            v = v + jnp.where(g.node_mask[:, None], out, 0.0)

        h = nn.Dense(self.hidden_channels // 2, kernel_init=xavier)(v)
        h = shifted_softplus(h)
        h = nn.Dense(1, kernel_init=xavier)(h)
        return jnp.where(g.node_mask[:, None], h, 0.0)
