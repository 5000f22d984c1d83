"""Radius / kNN graph construction on flat padded batches, jit-safe.

Replaces ``torch_cluster.radius_graph`` (used at
``dig/threedgraph/method/schnet/schnet.py:156``, ``spherenet.py:304``,
``pronet.py:386``). TPU-native design: no dynamic edge counts — the caller
supplies a static ``max_edges`` cap and gets a masked edge list. For small
molecules the O(N * n_max) candidate set is computed densely per node
against its own graph's node slots via a windowed trick; for the general
flat case we use the full O(N^2) masked distance matrix, which is fine up to
a few thousand padded nodes and is itself one big MXU-friendly matmul
(|a-b|^2 = |a|^2 + |b|^2 - 2ab).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pairwise_same_graph(pos: Array, node_graph: Array, node_mask: Array):
    sq = jnp.sum(pos * pos, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (pos @ pos.T)
    d2 = jnp.maximum(d2, 0.0)
    n = pos.shape[0]
    same = node_graph[:, None] == node_graph[None, :]
    valid = node_mask[:, None] & node_mask[None, :] & same
    valid = valid & ~jnp.eye(n, dtype=bool)
    return d2, valid


def radius_graph_flat(
    pos: Array, node_graph: Array, node_mask: Array,
    cutoff: float, max_edges: int,
    max_num_neighbors: Optional[int] = None,
) -> Tuple[Array, Array, Array]:
    """Build a bidirectional radius graph on a flat padded batch.

    Returns ``(senders, receivers, edge_mask)``, each ``[max_edges]``.
    Edge convention matches the reference's ``j -> i`` (senders=j source,
    receivers=i destination); every ordered pair within the cutoff is an
    edge, so the graph is symmetric like PyG's ``radius_graph``.

    ``max_num_neighbors``: per-node cap on in-neighbors, nearest kept first
    (PyG caps at 32 by default for radius_graph; ProNet passes an explicit
    cap, ``dig/threedgraph/method/pronet/pronet.py:386``).
    """
    d2, valid = _pairwise_same_graph(pos, node_graph, node_mask)
    adj = valid & (d2 < cutoff * cutoff)
    if max_num_neighbors is not None:
        # Keep the max_num_neighbors nearest j for each receiver i (rows).
        d2_masked = jnp.where(adj, d2, jnp.inf)
        rank = jnp.argsort(jnp.argsort(d2_masked, axis=1), axis=1)
        adj = adj & (rank < max_num_neighbors)
    return adjacency_to_edges(adj, max_edges)


def knn_graph_flat(
    pos: Array, node_graph: Array, node_mask: Array,
    k: int, max_edges: int,
) -> Tuple[Array, Array, Array]:
    """k nearest neighbors per node (receiver side), flat padded batch."""
    d2, valid = _pairwise_same_graph(pos, node_graph, node_mask)
    d2_masked = jnp.where(valid, d2, jnp.inf)
    rank = jnp.argsort(jnp.argsort(d2_masked, axis=1), axis=1)
    adj = valid & (rank < k)
    return adjacency_to_edges(adj, max_edges)


def adjacency_to_edges(adj: Array, max_edges: int):
    """Flatten a [N, N] (receiver, sender) adjacency into a capped edge list.

    Deterministic order: row-major by (receiver, sender). Overflow beyond
    ``max_edges`` is dropped (size caps from data stats; see SURVEY §7 hard
    part 1 — the eager reference never faces this).
    """
    n = adj.shape[0]
    flat = adj.reshape(-1)
    order = jnp.argsort(~flat, stable=True)
    take = order[:max_edges]
    edge_mask = flat[take]
    i_idx = (take // n).astype(jnp.int32)
    j_idx = (take % n).astype(jnp.int32)
    receivers = jnp.where(edge_mask, i_idx, 0)
    senders = jnp.where(edge_mask, j_idx, 0)
    return senders, receivers, edge_mask


def radius_overflow(pos: Array, node_graph: Array, node_mask: Array,
                    cutoff: float, max_edges: int) -> Array:
    """Number of real radius-graph edges DROPPED by the static cap
    (overflow accounting for the silent-drop hazard of static shapes —
    SURVEY §7 hard part 1). jit-safe scalar."""
    d2, valid = _pairwise_same_graph(pos, node_graph, node_mask)
    total = jnp.sum(valid & (d2 < cutoff * cutoff))
    return jnp.maximum(total - max_edges, 0)
