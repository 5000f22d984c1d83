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
                  num_nodes: int, edge_mask: Optional[Array] = None):
    """Average duplicate edges (same ``(s, r)`` pair) — PyG ``coalesce``
    analog, re-shaped for XLA's static-shape contract.

    PyG returns a shrunken edge list (dynamic shape); on device we keep
    the ``[E]`` layout and return

    * ``mean_vals`` — ``edge_vals`` with every duplicate group replaced
      by the group mean (all duplicates carry the same value), masked
      rows zeroed;
    * ``rep_mask`` — bool ``[E]`` marking ONE representative edge per
      distinct ``(s, r)`` pair (False on masked rows), so downstream ops
      can treat ``mean_vals[rep_mask]`` as the coalesced edge set.

    Fully jit-safe: one argsort + two segment reductions.
    """
    E = senders.shape[0]
    # lexsort on (mask-last, senders, receivers): a fused int key s*N+r
    # would overflow int32 (JAX's default int) past ~46k nodes
    inval = (jnp.zeros((E,), jnp.int32) if edge_mask is None
             else (~edge_mask).astype(jnp.int32))
    order = jnp.lexsort((receivers, senders, inval))
    ss, sr, si = senders[order], receivers[order], inval[order]
    # run ids over the sorted keys (stable group numbering)
    new_run = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         ((ss[1:] != ss[:-1]) | (sr[1:] != sr[:-1])
          | (si[1:] != si[:-1])).astype(jnp.int32)])
    run_id = jnp.cumsum(new_run) - 1                      # [E] in [0, E)
    svals = edge_vals[order]
    if edge_mask is not None:
        smask = edge_mask[order]
        svals = jnp.where(
            smask.reshape(smask.shape + (1,) * (svals.ndim - 1)), svals, 0.0)
    sums = segment_sum(svals, run_id, E)
    cnts = segment_sum(jnp.ones((E,), edge_vals.dtype), run_id, E,
                       mask=None if edge_mask is None else smask)
    means = sums / jnp.maximum(
        cnts.reshape(cnts.shape + (1,) * (sums.ndim - 1)), 1.0)
    # scatter the group mean back to every member's original slot
    mean_vals = jnp.zeros_like(edge_vals).at[order].set(means[run_id])
    rep = new_run.astype(bool)
    if edge_mask is not None:
        rep = rep & smask
        mean_vals = jnp.where(
            edge_mask.reshape(edge_mask.shape + (1,) * (edge_vals.ndim - 1)),
            mean_vals, 0.0)
    rep_mask = jnp.zeros((E,), bool).at[order].set(rep)
    return mean_vals, rep_mask
