"""Gather/scatter message-passing helpers on flat padded edge lists."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .segment import segment_sum

Array = jax.Array


def gather(node_feats: Array, index: Array, mask: Optional[Array] = None) -> Array:
    """node -> edge gather; masked rows are zeroed (SDDMM-style read)."""
    out = node_feats[index]
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim))
        out = jnp.where(m, out, 0.0)
    return out


def scatter_sum_edges(edge_feats: Array, receivers: Array, num_nodes: int,
                      edge_mask: Optional[Array] = None,
                      indices_are_sorted: bool = False) -> Array:
    """edge -> node scatter-add (the SpMM-shaped aggregation hot loop)."""
    return segment_sum(edge_feats, receivers, num_nodes, edge_mask,
                       indices_are_sorted=indices_are_sorted)


def coalesce_mean(edge_vals: Array, senders: Array, receivers: Array,
                  num_nodes: int, edge_mask: Optional[Array] = None) -> Array:
    """Average duplicate edges (same (s, r) pair) — PyG ``coalesce`` analog."""
    key = senders.astype(jnp.int64) * num_nodes + receivers
    # Static-size dedup: sort by key, average runs. Rarely needed on device;
    # kept for API parity — host pipelines should pre-coalesce.
    order = jnp.argsort(key)
    raise NotImplementedError("coalesce on device is not supported; "
                              "pre-coalesce edges on host")
