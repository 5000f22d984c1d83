"""Segment reductions — the TPU replacement for ``torch_scatter.scatter``.

The reference leans on torch_scatter everywhere (e.g.
``dig/threedgraph/method/schnet/schnet.py:55``,
``spherenet.py:171,211,224``). Here the same aggregation is expressed as
masked segment reductions with *static* output sizes so they live under one
jit trace. Deterministic by construction (XLA scatter-add has a fixed
combining order on TPU), unlike CUDA atomics.

All functions accept an optional ``mask`` over the data rows; masked-out
rows contribute the reduction identity. Indices must be in-range (padding
convention: index 0 with a False mask).

A Pallas row-blocked CSR kernel (``pallas_segment.py``) backs
``segment_sum_sorted`` for aggregations whose indices are sorted by
construction (flat radius graphs are row-major by receiver, lsgraph
subgraphs are CSR); the functions here are the general entry points.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30
_POS_INF = 1e30


def _apply_mask(data: Array, mask: Optional[Array], fill: float) -> Array:
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, fill)


def segment_sum(data: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None,
                indices_are_sorted: bool = False) -> Array:
    data = _apply_mask(data, mask, 0.0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_sum_sorted(data: Array, segment_ids: Array, num_segments: int,
                       mask: Optional[Array] = None,
                       max_edges_per_block: int = 1024,
                       block_rows: int = 32) -> Array:
    """Segment sum for *sorted* ids (trailing padding allowed) through the
    Pallas CSR kernel on TPU; identical to :func:`segment_sum` elsewhere.

    The CSR rowptr is recovered with a searchsorted over the (masked) ids.
    ``max_edges_per_block`` must cover the densest ``block_rows`` rows plus
    up to 127 alignment slack — size it from data statistics and audit with
    ``pallas_segment.csr_block_overflow``.
    """
    from .pallas_segment import _on_tpu, segment_sum_sorted_csr
    if not _on_tpu():
        return segment_sum(data, segment_ids, num_segments, mask,
                           indices_are_sorted=True)
    ids = segment_ids.astype(jnp.int32)
    if mask is not None:
        data = _apply_mask(data, mask, 0.0)
        ids_sort = jnp.where(mask, ids, num_segments)
        ids = jnp.where(mask, ids, -1)
    else:
        ids_sort = ids
    rowptr = jnp.searchsorted(ids_sort, jnp.arange(num_segments + 1),
                              side="left").astype(jnp.int32)
    return segment_sum_sorted_csr(data, ids, rowptr, num_segments,
                                  block_rows, max_edges_per_block
                                  ).astype(data.dtype)


def segment_mean(data: Array, segment_ids: Array, num_segments: int,
                 mask: Optional[Array] = None,
                 indices_are_sorted: bool = False) -> Array:
    s = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))


def segment_max(data: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None,
                indices_are_sorted: bool = False) -> Array:
    data = _apply_mask(data, mask, _NEG_INF)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_min(data: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None,
                indices_are_sorted: bool = False) -> Array:
    data = _apply_mask(data, mask, _POS_INF)
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(logits: Array, segment_ids: Array, num_segments: int,
                    mask: Optional[Array] = None) -> Array:
    """Numerically-stable softmax within segments (attention over neighbors)."""
    mx = segment_max(logits, segment_ids, num_segments, mask)
    mx = jnp.where(mx <= _NEG_INF / 2, 0.0, mx)  # empty segments
    shifted = logits - mx[segment_ids]
    ex = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (ex.ndim - mask.ndim))
        ex = jnp.where(m, ex, 0.0)
    denom = segment_sum(ex, segment_ids, num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return ex / denom[segment_ids]


def segment_normalize(data: Array, segment_ids: Array, num_segments: int,
                      mask: Optional[Array] = None, eps: float = 1e-16) -> Array:
    """Divide each row by its segment's sum (e.g. GCN-style normalization)."""
    s = segment_sum(data, segment_ids, num_segments, mask)
    return data / (s[segment_ids] + eps)


def segment_argmin(data: Array, segment_ids: Array, num_segments: int,
                   mask: Optional[Array] = None) -> Array:
    """First index attaining the per-segment minimum (torch
    scatter_min-style argmin; empty segments return 0)."""
    d = _apply_mask(data, mask, _POS_INF)
    m = jax.ops.segment_min(d, segment_ids, num_segments=num_segments)
    E = data.shape[0]
    idx = jnp.where(d <= m[segment_ids], jnp.arange(E), E)
    out = jax.ops.segment_min(idx, segment_ids, num_segments=num_segments)
    return jnp.where(out >= E, 0, out).astype(jnp.int32)
