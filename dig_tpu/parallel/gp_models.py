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


def overlapped_gather(h, halo_fn, g: GPLocalGraph, scale=None):
    """Edge-message gather with compute/comm overlap structure.

    Splits edges into local (sender < C) and halo (sender >= C) sets so
    the local segment-sum has NO data dependency on the all_to_all —
    XLA's async collective scheduler can run the exchange underneath the
    local aggregation (the AsyncIOPool overlap of the reference,
    ``dig/lsgraph/method/GraphFMOB/models/base.py:147-187``, expressed as
    dependence structure instead of streams). Returns ``agg [C, F]``.

    ``scale``: optional per-edge scalar multiplier (e.g. GCN norm).
    """
    C = g.num_local
    halo = halo_fn(h)                       # a2a issued; nothing below
    H = halo.shape[0]                       # depends on it until msg_h
    is_local = g.senders < C
    lmask = g.edge_mask & is_local
    hmask = g.edge_mask & ~is_local
    s_local = jnp.clip(g.senders, 0, C - 1)
    s_halo = jnp.clip(g.senders - C, 0, max(H - 1, 0))
    msg_l = h[s_local]
    msg_h = halo[s_halo]
    if scale is not None:
        # (scale_local, scale_halo) keeps the local chain free of any
        # halo-derived values; a single tensor is applied to both
        sl, sh = scale if isinstance(scale, tuple) else (scale, scale)
        msg_l = msg_l * sl[:, None]
        msg_h = msg_h * sh[:, None]
    agg = segment_sum(msg_l, g.receivers, C, mask=lmask)
    return agg + segment_sum(msg_h, g.receivers, C, mask=hmask)


def _gcn_norm(g: GPLocalGraph, halo_fn):
    """GCN normalization split into (local, halo) per-edge tensors so the
    local coefficients carry no halo dependency (overlap structure).

    In-degree is complete locally (edges live on the receiver's part);
    out-degree is the precomputed global count, halo rows fetched once."""
    C = g.num_local
    ones = jnp.where(g.edge_mask, 1.0, 0.0)
    deg_in = segment_sum(ones, g.receivers, C) + 1.0
    do_own = jax.lax.rsqrt(g.deg_out + 1.0)
    do_halo = halo_fn(do_own[:, None])[:, 0]
    di = jax.lax.rsqrt(deg_in)
    s_local = jnp.clip(g.senders, 0, C - 1)
    s_halo = jnp.clip(g.senders - C, 0, max(do_halo.shape[0] - 1, 0))
    coef_l = di[g.receivers] * do_own[s_local]
    coef_h = di[g.receivers] * do_halo[s_halo]
    return (coef_l, coef_h), di * di


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
            agg = overlapped_gather(h, halo_fn, g)
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
        coef, self_coef = _gcn_norm(g, halo_fn)
        for _ in range(self.num_layers):
            agg = overlapped_gather(h, halo_fn, g, scale=coef) \
                + self_coef[:, None] * h
            z = (1 - self.alpha) * agg + self.alpha * h0
            w = nn.Dense(self.hidden, use_bias=False, kernel_init=xavier)(z)
            h = jax.nn.relu((1 - self.beta) * z + self.beta * w)
        return nn.Dense(self.out_dim, kernel_init=xavier)(h)


class GPPNA(nn.Module):
    """Partitioned Principal Neighborhood Aggregation.

    Uses the concat form (halo gathered before aggregating): PNA's
    min/max/std aggregators cannot split into independent local/halo
    partial reductions as cheaply as sums, so this model trades the
    overlap for simplicity."""

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
        # positions are exchanged once; local-edge geometry/filters are
        # computed from OWNED positions only, so every local-edge chain is
        # independent of the exchange (overlap structure; halo-edge
        # tensors are the only consumers of pos_halo)
        pos_halo = halo_fn(pos)
        is_local = g.senders < C
        s_local = jnp.clip(g.senders, 0, C - 1)
        s_halo = jnp.clip(g.senders - C, 0, max(pos_halo.shape[0] - 1, 0))
        p_recv = pos[g.receivers]
        d_l = jnp.linalg.norm(pos[s_local] - p_recv + 1e-9, axis=-1)
        d_h = jnp.linalg.norm(pos_halo[s_halo] - p_recv + 1e-9, axis=-1)

        def edge_filters(d, mask):
            rbf = gaussian_rbf(d, 0.0, self.cutoff, self.num_gaussians)
            gate = cosine_cutoff(d, self.cutoff) * \
                jnp.where(mask, 1.0, 0.0) * \
                jnp.where(d < self.cutoff, 1.0, 0.0)
            return rbf, gate

        lmask = g.edge_mask & is_local
        hmask = g.edge_mask & ~is_local
        rbf_l, gate_l = edge_filters(d_l, lmask)
        rbf_h, gate_h = edge_filters(d_h, hmask)

        v = nn.Embed(100, self.hidden_channels,
                     embedding_init=jax.nn.initializers.uniform(
                         scale=jnp.sqrt(3.0)))(z)
        v = jnp.where(g.node_mask[:, None], v, 0.0)
        for _ in range(self.num_layers):
            vj = nn.Dense(self.num_filters, use_bias=False,
                          kernel_init=xavier)(v)
            # a2a issued; the local filter+aggregate below does not use it
            vj_halo = halo_fn(vj)
            fmlp = MLP([self.num_filters, self.num_filters],
                       act=shifted_softplus, kernel_init=xavier)
            Wg_l = fmlp(rbf_l) * gate_l[:, None]
            Wg_h = fmlp(rbf_h) * gate_h[:, None]   # shared params
            agg = segment_sum(vj[s_local] * Wg_l, g.receivers, C,
                              mask=lmask)
            agg = agg + segment_sum(vj_halo[s_halo] * Wg_h, g.receivers,
                                    C, mask=hmask)
            out = nn.Dense(self.hidden_channels, kernel_init=xavier)(agg)
            out = shifted_softplus(out)
            out = nn.Dense(self.hidden_channels, kernel_init=xavier)(out)
            v = v + jnp.where(g.node_mask[:, None], out, 0.0)

        h = nn.Dense(self.hidden_channels // 2, kernel_init=xavier)(v)
        h = shifted_softplus(h)
        h = nn.Dense(1, kernel_init=xavier)(h)
        return jnp.where(g.node_mask[:, None], h, 0.0)
