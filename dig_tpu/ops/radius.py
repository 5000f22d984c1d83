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

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pairwise_same_graph(pos: Array, node_graph: Array, node_mask: Array):
    sq = jnp.sum(pos * pos, axis=-1)
    # geometry must be exact f32: TPU f32 matmuls default to bf16 passes,
    # which misclassifies pairs near the cutoff (~0.2 A error at d~10 A)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        pos, pos.T, precision=jax.lax.Precision.HIGHEST)
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


class NKGraph(NamedTuple):
    """Radius graph in the [N, K] neighbor-table layout.

    Edge e = i*K + d is the d-th in-edge of receiver i (sender
    ``nbr_idx[i, d]``), so receivers are sorted by construction, the
    in-edge table is ``arange(N*K)``, and edge->node aggregation is a
    dense ``[N, K, F]`` reshape-sum. ``rev_edge[i, d]`` is the id of the
    reverse edge (graph symmetrized, see :func:`radius_graph_nk`).
    """
    nbr_idx: Array    # [N, K] sender node of each slot
    nbr_mask: Array   # [N, K]
    rev_edge: Array   # [N, K] edge id of the reverse edge
    senders: Array    # [N*K] flat edge list view
    receivers: Array  # [N*K]
    edge_mask: Array  # [N*K]


def radius_graph_nk(pos: Array, node_graph: Array, node_mask: Array,
                    cutoff: float, k: int) -> NKGraph:
    """Radius graph as a per-node nearest-K table — the TPU-native layout.

    The compacted-list builder (:func:`adjacency_to_edges`) costs a full
    N^2-element sort; here each receiver row is a ``top_k`` over its
    distance row and every table (in-edges, reverse edges, triplet
    reverse index) is pure index arithmetic. Size ``k`` like
    ``max_in_degree``: at or above the true max degree nothing is
    dropped. Under truncation the graph is *symmetrized* (an edge is
    kept only with its reverse) so pair interactions stay symmetric and
    gather/scatter-free VJPs stay exact.

    When to use (measured, TPU v5e-class chip, SphereNet train step on
    16x29-atom padded molecules): the compacted list wins 16 vs 78 ms at
    K=32 because E = N*K carries every downstream edge/triplet matmul and
    only ~28% of NK slots are real there. NK wins only when slot
    occupancy is high — near-regular degree (kNN graphs: exactly K real
    slots per node) or node padding tight against true degree. Prefer
    :func:`radius_graph_flat` unless edges/(N*K) is close to 1.
    """
    N = pos.shape[0]
    d2, valid = _pairwise_same_graph(pos, node_graph, node_mask)
    adj = valid & (d2 < cutoff * cutoff)
    score = jnp.where(adj, -d2, -jnp.inf)
    vals, idx = jax.lax.top_k(score, k)                    # [N, K]
    nbr_mask = vals > -jnp.inf
    nbr_idx = jnp.where(nbr_mask, idx, 0).astype(jnp.int32)

    # kept[i, j]: j survived i's top-k. Symmetrize: keep only mutual edges.
    kept = jnp.any((nbr_idx[:, :, None] == jnp.arange(N)[None, None, :])
                   & nbr_mask[:, :, None], axis=1)          # [N, N]
    mutual = kept[nbr_idx, jnp.arange(N)[:, None]]          # [N, K]
    nbr_mask = nbr_mask & mutual

    # rev_slot[i, d]: position of i in (nbr_idx[i,d])'s own row.
    nbr_of_m = nbr_idx[nbr_idx]                             # [N, K, K]
    hit = ((nbr_of_m == jnp.arange(N)[:, None, None])
           & nbr_mask[nbr_idx])  # padded slots hold node 0: exclude them
    rev_slot = jnp.argmax(hit, axis=2).astype(jnp.int32)
    rev_edge = jnp.where(nbr_mask, nbr_idx * k + rev_slot, 0)

    receivers = jnp.repeat(jnp.arange(N, dtype=jnp.int32), k)
    return NKGraph(nbr_idx=nbr_idx, nbr_mask=nbr_mask, rev_edge=rev_edge,
                   senders=nbr_idx.reshape(-1),
                   receivers=jnp.where(nbr_mask.reshape(-1), receivers, 0),
                   edge_mask=nbr_mask.reshape(-1))


def radius_overflow(pos: Array, node_graph: Array, node_mask: Array,
                    cutoff: float, max_edges: int) -> Array:
    """Number of real radius-graph edges DROPPED by the static cap
    (overflow accounting for the silent-drop hazard of static shapes —
    SURVEY §7 hard part 1). jit-safe scalar."""
    d2, valid = _pairwise_same_graph(pos, node_graph, node_mask)
    total = jnp.sum(valid & (d2 < cutoff * cutoff))
    return jnp.maximum(total - max_edges, 0)


def radius_blocked_dropped(pos: Array, node_graph: Array, node_mask: Array,
                           cutoff: float, block: int) -> Array:
    """Number of real radius-graph pairs :func:`radius_graph_nk_blocked`
    DROPS because they cross a block boundary (same graph, in cutoff,
    different ``block``-slots). Nonzero means the batch is not
    slot-aligned — a molecule straddles two blocks — and the blocked
    builder is silently losing edges (the node_graph guard only prevents
    *wrong* edges). jit-safe scalar, same contract as
    :func:`radius_overflow`."""
    N = pos.shape[0]
    d2, valid = _pairwise_same_graph(pos, node_graph, node_mask)
    blk = jnp.arange(N, dtype=jnp.int32) // block
    cross = blk[:, None] != blk[None, :]
    return jnp.sum(valid & cross & (d2 < cutoff * cutoff))


def radius_graph_nk_blocked(pos: Array, node_mask: Array, cutoff: float,
                            k: int, block: int,
                            node_graph: Optional[Array] = None) -> NKGraph:
    """:func:`radius_graph_nk` for *slot-aligned* batches — O(G * B^2)
    instead of O(N^2).

    When the loader places every molecule in its own fixed-size slot of
    ``block`` node rows (``MoleculeLoader(slot_size=...)``), all candidate
    pairs live inside a block: the distance matrix becomes ``[G, B, B]``
    block-diagonal and the top-k / symmetrization / reverse-slot tables are
    per-block index arithmetic. At the flagship bench shape (24 molecules x
    29-atom slots) that is 24x fewer pair candidates than the global
    ``[N, N]`` matrix, which is ~40% of the whole SphereNet forward there.

    Emits the exact :class:`NKGraph` contract (global node/edge indices),
    so :func:`~dig_tpu.ops.triplets.build_triplets_nk` and everything
    downstream run unchanged. Same replacement target as radius_graph_nk:
    ``torch_cluster.radius_graph`` at dig/threedgraph/method/spherenet/
    spherenet.py:304.
    """
    N = pos.shape[0]
    assert N % block == 0, (N, block)
    nb = N // block
    p = pos.reshape(nb, block, 3)
    m = node_mask.reshape(nb, block)
    sq = jnp.sum(p * p, axis=-1)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum(
        "bnd,bmd->bnm", p, p, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(d2, 0.0)
    valid = (m[:, :, None] & m[:, None, :]
             & ~jnp.eye(block, dtype=bool)[None])
    if node_graph is not None:
        # guard against NON-slot-aligned batches: without this, a block
        # straddling two molecules would create cross-molecule edges.
        # (Molecules split ACROSS blocks still lose their cross-block
        # pairs — slot alignment via MoleculeLoader(slot_size=block) is
        # the caller's contract; this mask only prevents wrong edges.)
        gb = node_graph.reshape(nb, block)
        valid = valid & (gb[:, :, None] == gb[:, None, :])
    adj = valid & (d2 < cutoff * cutoff)
    score = jnp.where(adj, -d2, -jnp.inf)
    kk = min(k, block)  # a block holds at most block-1 neighbors
    vals, lidx = jax.lax.top_k(score, kk)                 # [nb, B, kk] local
    if kk < k:          # pad the K axis so edge ids stay e = i*k + d
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, k - kk)),
                       constant_values=-jnp.inf)
        lidx = jnp.pad(lidx, ((0, 0), (0, 0), (0, k - kk)))
    nbr_mask = vals > -jnp.inf
    lidx = jnp.where(nbr_mask, lidx, 0).astype(jnp.int32)

    # symmetrize: keep an edge only with its reverse (matches flat builder)
    oh = (lidx[..., None]
          == jnp.arange(block)[None, None, None, :])     # [nb, B, K, B(m)]
    kept = jnp.any(oh & nbr_mask[:, :, :, None], axis=2)  # [nb, B(m'), B]
    # mutual[b, i, d] = kept[b, lidx[b, i, d], i], as a masked any over
    # the m axis — take_along_axis lowers to a scalar-granularity gather
    # (measured 2.4 GB/s; 9.5% of the ProNet train step)
    keptT = kept.transpose(0, 2, 1)                       # [nb, B(i), B(m)]
    mutual = jnp.any(oh & keptT[:, :, None, :], axis=3)
    nbr_mask = nbr_mask & mutual

    # rev_slot[b, i, d] = position of i in row lidx[b, i, d]; the row
    # gathers lidx[lidx] / mask[lidx] run as one-hot contractions on the
    # MXU instead (vmap'd row gathers measured 17 GB/s). Values < 2^24,
    # exact in f32.
    kd = lidx.shape[2]
    ohf = oh.reshape(nb, block * kd, block).astype(jnp.float32)
    nbr_of_m = jnp.einsum(
        "bem,bmk->bek", ohf, lidx.astype(jnp.float32)
    ).reshape(nb, block, kd, kd).astype(jnp.int32)        # [nb, B, K, K]
    nm_of = jnp.einsum(
        "bem,bmk->bek", ohf, nbr_mask.astype(jnp.float32)
    ).reshape(nb, block, kd, kd) > 0.5
    hit = ((nbr_of_m == jnp.arange(block)[None, :, None, None]) & nm_of)
    rev_slot = jnp.argmax(hit, axis=3).astype(jnp.int32)

    off = (jnp.arange(nb, dtype=jnp.int32) * block)[:, None, None]
    gidx = (lidx + off).reshape(N, k)
    nbr_mask = nbr_mask.reshape(N, k)
    rev_slot = rev_slot.reshape(N, k)
    nbr_idx = jnp.where(nbr_mask, gidx, 0)
    rev_edge = jnp.where(nbr_mask, nbr_idx * k + rev_slot, 0)
    receivers = jnp.repeat(jnp.arange(N, dtype=jnp.int32), k)
    return NKGraph(nbr_idx=nbr_idx, nbr_mask=nbr_mask, rev_edge=rev_edge,
                   senders=nbr_idx.reshape(-1),
                   receivers=jnp.where(nbr_mask.reshape(-1), receivers, 0),
                   edge_mask=nbr_mask.reshape(-1))
