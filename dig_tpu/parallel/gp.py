"""Graph-parallel training: partitioned GCN over a device mesh.

The north-star scaling path (SURVEY.md §5, BASELINE.json): a graph too big
for one chip is METIS-partitioned into per-device node slabs; each layer
aggregates local edges while boundary node features move over ICI via the
precomputed all-to-all halo plan (:mod:`dig_tpu.parallel.halo`), and the
only other collective is the gradient psum. This is the shard_map analog
of lsgraph's historical-embedding machinery with *exact* (non-stale)
boundary features.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .halo import ExchangePlan, build_exchange_plan, halo_exchange_a2a
from .partition import PartitionedGraph, build_partitions

xavier = jax.nn.initializers.glorot_uniform()


class GPGraph(NamedTuple):
    """Device-ready partitioned graph (all arrays lead with the part axis
    and shard over it)."""

    senders: jnp.ndarray        # [P, E]
    receivers: jnp.ndarray      # [P, E]
    edge_mask: jnp.ndarray      # [P, E]
    node_mask: jnp.ndarray      # [P, C]
    send_slot: jnp.ndarray      # [P, P, K]
    send_mask: jnp.ndarray      # [P, P, K]
    recv_pos: jnp.ndarray       # [P, P, K]


def prepare_gp_graph(senders, receivers, num_nodes: int,
                     num_parts: int) -> tuple:
    """Partition + build the exchange plan; returns (GPGraph, perm) where
    ``perm`` maps original node id -> (part * C + slot) layout."""
    pg = build_partitions(np.asarray(senders), np.asarray(receivers),
                          num_nodes, num_parts)
    plan = build_exchange_plan(pg)
    g = GPGraph(
        senders=jnp.asarray(pg.senders), receivers=jnp.asarray(pg.receivers),
        edge_mask=jnp.asarray(pg.edge_mask),
        node_mask=jnp.asarray(pg.node_mask),
        send_slot=jnp.asarray(plan.send_slot),
        send_mask=jnp.asarray(plan.send_mask),
        recv_pos=jnp.asarray(plan.recv_pos))
    return g, pg.perm, plan.halo_size, pg.nodes_per_part


def slab_layout(x: np.ndarray, perm: np.ndarray, num_parts: int,
                nodes_per_part: int) -> np.ndarray:
    """[N, ...] node array -> [P, C, ...] slab layout."""
    out = np.zeros((num_parts * nodes_per_part,) + x.shape[1:], x.dtype)
    out[perm] = np.asarray(x)
    return out.reshape((num_parts, nodes_per_part) + x.shape[1:])


def make_gp_train_step(mesh: Mesh, num_layers: int, hidden: int,
                       num_classes: int, in_dim: int, halo_size: int,
                       nodes_per_part: int,
                       lr: float = 1e-2, axis: str = "data"):
    """Returns (init_fn, step_fn, predict_fn) for a partitioned GCN.

    step_fn(params, opt_state, x [P,C,F], y [P,C], train_mask [P,C])
    runs fully under shard_map: per layer a local masked aggregation with
    concurrent halo all-to-all, then replicated dense transforms; grads are
    psum'd so updates are identical on all shards.
    """
    C = nodes_per_part
    H = halo_size
    opt = optax.adam(lr)

    def init_fn(key):
        keys = jax.random.split(key, num_layers + 1)
        params = {}
        d = in_dim
        for li in range(num_layers):
            out_d = num_classes if li == num_layers - 1 else hidden
            params[f"w{li}"] = xavier(keys[li], (d, out_d))
            params[f"b{li}"] = jnp.zeros((out_d,))
            d = out_d
        return params, opt.init(params)

    def layer(x, params, li, g: GPGraph):
        # local normalized aggregation + halo features via a2a
        deg = jax.ops.segment_sum(
            jnp.where(g.edge_mask[0], 1.0, 0.0), g.receivers[0],
            num_segments=C) + 1.0
        halo = halo_exchange_a2a(x, g.send_slot[0], g.send_mask[0],
                                 g.recv_pos[0], H, axis)
        feats = jnp.concatenate([x, halo], axis=0)
        msgs = feats[g.senders[0]]
        msgs = jnp.where(g.edge_mask[0][:, None], msgs, 0.0)
        agg = jax.ops.segment_sum(msgs, g.receivers[0], num_segments=C)
        h = (agg + x) / deg[:, None]
        h = h @ params[f"w{li}"] + params[f"b{li}"]
        return h

    def shard_fn(params, opt_state, g: GPGraph, x, y, train_mask):
        x = x[0]
        y = y[0]
        tm = train_mask[0]
        nm = g.node_mask[0]

        def loss_fn(p):
            h = x
            for li in range(num_layers):
                h = layer(h, p, li, g)
                if li < num_layers - 1:
                    h = jax.nn.relu(h)
            ls = optax.softmax_cross_entropy_with_integer_labels(h, y)
            m = tm & nm
            loc = jnp.sum(jnp.where(m, ls, 0.0))
            cnt = jnp.sum(m)
            return loc, (cnt, h)

        (loc, (cnt, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        tot = jax.lax.psum(loc, axis)
        n = jnp.maximum(jax.lax.psum(cnt, axis), 1)
        grads = jax.tree_util.tree_map(
            lambda gr: jax.lax.psum(gr, axis) / n, grads)
        loss = tot / n
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits[None]

    gp_spec = GPGraph(senders=P(axis), receivers=P(axis), edge_mask=P(axis),
                      node_mask=P(axis), send_slot=P(axis),
                      send_mask=P(axis), recv_pos=P(axis))

    smapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), gp_spec, P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(axis)),
        check_vma=False,
    )
    step = jax.jit(smapped, donate_argnums=(0, 1))

    def predict_fn(params, g, x):
        dummy_os = opt.init(params)
        _, _, _, logits = step(jax.tree_util.tree_map(lambda v: v, params),
                               dummy_os, g,
                               x, jnp.zeros(x.shape[:2], jnp.int32),
                               jnp.zeros(x.shape[:2], bool))
        return logits

    return init_fn, step, predict_fn
