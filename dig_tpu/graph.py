"""Static-shape padded graph batch — the core data structure of dig_tpu.

Replaces PyG ``Data``/``Batch`` (reference: used throughout divelab/DIG, e.g.
``dig/threedgraph/method/schnet/schnet.py:151``) with a TPU-first design:
every array has a *static* padded shape so the whole model can live under one
``jax.jit`` trace, and validity is tracked with boolean masks instead of
dynamic sizes.

Layout conventions
------------------
* Node arrays are flat ``[N_pad, ...]``; edge arrays are flat ``[E_pad, ...]``;
  per-graph (global) arrays are ``[G, ...]`` with ``G = num_graphs`` static.
* ``node_graph[n]`` gives the graph id of node ``n``. Padding nodes carry the
  id of the *last* graph slot by convention but are excluded by ``node_mask``.
* Padding edges have ``senders == receivers == 0`` and ``edge_mask == False``;
  all message-passing ops must zero padded contributions before scattering
  (scatter-to-node-0 of a zero message is harmless, and keeps indices in
  range so XLA never needs bounds checks).
* ``GraphBatch`` is a pytree (flax.struct dataclass) — it flows through
  ``jit``/``grad``/``shard_map`` and shards along the leading axis for data
  parallelism (see ``dig_tpu.parallel.mesh``).

The dense per-graph view (``[G, n_max, ...]``) used by the molecular models
lives in :mod:`dig_tpu.graph_dense`; conversion helpers are at the bottom.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class GraphBatch:
    """A padded batch of graphs with static shapes.

    Attributes:
      nodes: dict of per-node arrays, each ``[N_pad, ...]``.
      edges: dict of per-edge arrays, each ``[E_pad, ...]`` (may be empty).
      senders: ``[E_pad]`` int32 source node index (j in j->i convention).
      receivers: ``[E_pad]`` int32 destination node index (i).
      globals: dict of per-graph arrays, each ``[G, ...]`` (labels etc.).
      node_graph: ``[N_pad]`` int32 graph id per node.
      node_mask: ``[N_pad]`` bool, True for real nodes.
      edge_mask: ``[E_pad]`` bool, True for real edges.
      graph_mask: ``[G]`` bool, True for real graphs.
      n_node: ``[G]`` int32, number of real nodes per graph.
      n_edge: ``[G]`` int32, number of real edges per graph.
    """

    nodes: Dict[str, Array]
    edges: Dict[str, Array]
    senders: Array
    receivers: Array
    globals: Dict[str, Array]
    node_graph: Array
    node_mask: Array
    edge_mask: Array
    graph_mask: Array
    n_node: Array
    n_edge: Array

    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    def replace_nodes(self, **kv) -> "GraphBatch":
        return self.replace(nodes={**self.nodes, **kv})

    def replace_edges(self, **kv) -> "GraphBatch":
        return self.replace(edges={**self.edges, **kv})

    def replace_globals(self, **kv) -> "GraphBatch":
        return self.replace(globals={**self.globals, **kv})

    def with_edges(self, senders, receivers, edge_mask, edges=None) -> "GraphBatch":
        """Return a copy with a new edge structure (e.g. after radius_graph)."""
        g = self.node_graph[senders]
        n_edge = jax.ops.segment_sum(
            edge_mask.astype(jnp.int32),
            jnp.where(edge_mask, g, self.num_graphs - 1),
            num_segments=self.num_graphs,
        )
        return self.replace(
            senders=senders.astype(jnp.int32),
            receivers=receivers.astype(jnp.int32),
            edge_mask=edge_mask,
            edges=edges if edges is not None else {},
            n_edge=n_edge,
        )


def batch_np(
    graphs: Sequence[Dict[str, Any]],
    n_node_pad: int,
    n_edge_pad: int,
    num_graphs: Optional[int] = None,
    slot_size: Optional[int] = None,
) -> GraphBatch:
    """Host-side (numpy) batching of a list of graph dicts into one GraphBatch.

    Each graph dict may contain: per-node arrays under ``nodes`` (dict),
    per-edge arrays under ``edges`` (dict), ``senders``/``receivers`` int
    arrays, and per-graph values under ``globals`` (dict).

    Pads nodes to ``n_node_pad``, edges to ``n_edge_pad``, graphs to
    ``num_graphs`` (default ``len(graphs)``). Raises if real content exceeds
    the caps — sizing policy (bucketing) is the caller's job.

    ``slot_size``: slot-aligned layout — graph ``gi``'s nodes start at row
    ``gi * slot_size`` (each graph must fit its slot). Enables the blocked
    O(G * B^2) radius builder (:func:`dig_tpu.ops.radius.radius_graph_nk_blocked`).
    """
    G = num_graphs if num_graphs is not None else len(graphs)
    if len(graphs) > G:
        raise ValueError(f"{len(graphs)} graphs > num_graphs={G}")
    if slot_size is not None and G * slot_size > n_node_pad:
        raise ValueError(
            f"{G} slots x {slot_size} > n_node_pad={n_node_pad}")

    tot_n = sum(int(g.get("n_node", len(next(iter(g["nodes"].values()))))) for g in graphs)
    tot_e = sum(int(len(g.get("senders", ()))) for g in graphs)
    if tot_n > n_node_pad:
        raise ValueError(f"{tot_n} nodes > n_node_pad={n_node_pad}")
    if tot_e > n_edge_pad:
        raise ValueError(f"{tot_e} edges > n_edge_pad={n_edge_pad}")

    node_keys = set().union(*[g["nodes"].keys() for g in graphs]) if graphs else set()
    edge_keys = set().union(*[g.get("edges", {}).keys() for g in graphs]) if graphs else set()
    glob_keys = set().union(*[g.get("globals", {}).keys() for g in graphs]) if graphs else set()

    def alloc(example: np.ndarray, n: int) -> np.ndarray:
        return np.zeros((n,) + tuple(example.shape[1:]), dtype=example.dtype)

    nodes = {}
    for k in node_keys:
        ex = np.asarray(next(g["nodes"][k] for g in graphs if k in g["nodes"]))
        nodes[k] = alloc(ex, n_node_pad)
    edges = {}
    for k in edge_keys:
        ex = np.asarray(next(g["edges"][k] for g in graphs if k in g.get("edges", {})))
        edges[k] = alloc(ex, n_edge_pad)
    globals_ = {}
    for k in glob_keys:
        ex = np.asarray(next(g["globals"][k] for g in graphs if k in g.get("globals", {})))
        ex = np.atleast_1d(ex)
        globals_[k] = np.zeros((G,) + tuple(np.shape(ex)), dtype=np.asarray(ex).dtype)

    senders = np.zeros(n_edge_pad, np.int32)
    receivers = np.zeros(n_edge_pad, np.int32)
    node_graph = np.full(n_node_pad, max(G - 1, 0), np.int32)
    node_mask = np.zeros(n_node_pad, bool)
    edge_mask = np.zeros(n_edge_pad, bool)
    graph_mask = np.zeros(G, bool)
    n_node = np.zeros(G, np.int32)
    n_edge = np.zeros(G, np.int32)

    n_off = 0
    e_off = 0
    for gi, g in enumerate(graphs):
        nn = int(g.get("n_node", len(next(iter(g["nodes"].values())))))
        ne = int(len(g.get("senders", ())))
        if slot_size is not None:
            if nn > slot_size:
                raise ValueError(f"graph {gi}: {nn} nodes > slot_size={slot_size}")
            n_off = gi * slot_size
        for k in node_keys:
            if k in g["nodes"]:
                nodes[k][n_off:n_off + nn] = np.asarray(g["nodes"][k])
        for k in edge_keys:
            if k in g.get("edges", {}):
                edges[k][e_off:e_off + ne] = np.asarray(g["edges"][k])
        for k in glob_keys:
            if k in g.get("globals", {}):
                globals_[k][gi] = np.asarray(g["globals"][k])
        if ne:
            senders[e_off:e_off + ne] = np.asarray(g["senders"]) + n_off
            receivers[e_off:e_off + ne] = np.asarray(g["receivers"]) + n_off
        node_graph[n_off:n_off + nn] = gi
        node_mask[n_off:n_off + nn] = True
        edge_mask[e_off:e_off + ne] = True
        graph_mask[gi] = True
        n_node[gi] = nn
        n_edge[gi] = ne
        n_off += nn
        e_off += ne

    return GraphBatch(
        nodes={k: jnp.asarray(v) for k, v in nodes.items()},
        edges={k: jnp.asarray(v) for k, v in edges.items()},
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        globals={k: jnp.asarray(v) for k, v in globals_.items()},
        node_graph=jnp.asarray(node_graph),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        n_node=jnp.asarray(n_node),
        n_edge=jnp.asarray(n_edge),
    )


def pad_to_next_power(x: int, minimum: int = 8) -> int:
    """Bucketing helper: round up to the next power of two (limits jit cache)."""
    n = max(int(x), minimum)
    return 1 << (n - 1).bit_length()
