"""Device mesh + sharding helpers.

TPU-native data parallelism for graph batches: the flat padded GraphBatch
shards along its leading (node/edge/graph) axes across the ``data`` mesh
axis, parameters are replicated, and XLA inserts the gradient psum when the
jitted step runs under the mesh. The reference has no analog — its only DP
is single-host ``nn.DataParallel`` inside flow models
(``dig/ggraph/method/GraphDF/model/graphflow.py:68-105``).

Design note: each data shard must be a *self-contained* set of graphs —
the host loader builds per-device sub-batches (graph ids never cross a
shard boundary) so segment reductions stay local and no collective is
needed in the forward pass at all; only the gradient all-reduce rides ICI.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh over available devices. Default: 1-D 'data' mesh over
    all devices. Pass shape=(dp, mp) + axis_names=('data','model') for 2-D.
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),)
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def data_parallel_sharding(mesh: Mesh, axis: str = "data") -> Tuple[NamedSharding, NamedSharding]:
    """(batch_sharding, replicated_sharding) for a 1-D data mesh."""
    return (NamedSharding(mesh, P(axis)), NamedSharding(mesh, P()))


def shard_graph_batch(g, mesh: Mesh, axis: str = "data"):
    """Shard every leading axis of a GraphBatch across ``axis``.

    Requires all leading dims (N_pad, E_pad, G) divisible by the axis size;
    the loader guarantees this by building ``num_devices`` equal sub-batches
    back to back (see MoleculeLoader(n_shards=...)).
    """
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.shape[axis] == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, g)


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_graph_offsets(g, num_shards: int):
    """Rebase node indices per shard: when a GraphBatch built as
    ``num_shards`` contiguous sub-batches is split along axis 0, edge
    senders/receivers must index into the *local* node slab. Host-side
    loaders call this before device_put.
    """
    n_per = g.senders.shape[0] // num_shards  # edges per shard
    nodes_per = g.node_mask.shape[0] // num_shards
    graphs_per = g.graph_mask.shape[0] // num_shards
    e_shard = np.repeat(np.arange(num_shards), n_per)
    n_shard = np.repeat(np.arange(num_shards), nodes_per)
    senders = np.asarray(g.senders) - e_shard * nodes_per
    receivers = np.asarray(g.receivers) - e_shard * nodes_per
    node_graph = np.asarray(g.node_graph) - n_shard * graphs_per
    return senders, receivers, node_graph


def concat_local_shards(batches):
    """Concatenate per-shard GraphBatches along axis 0 WITHOUT rebasing
    indices: each slab keeps shard-local senders/receivers/node_graph, which
    is exactly what the shard_map DP step expects (each device sees one
    self-contained sub-batch). All shards must have identical shapes.
    """
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *batches)
