"""Adaptive (centrality-weighted) augmentation utilities for GCA / pGRACE.

Parity with ``dig/sslgraph/utils/adaptive.py``: PageRank via power iteration
(:34), degree- and eigenvector-centrality drop weights (:123, :162), and the
GCA weighted edge/feature dropping rules. All masked + jit-able.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment_sum

Array = jax.Array


def degree_centrality(g: GraphBatch) -> Array:
    ones = jnp.ones(g.num_edges)
    return segment_sum(ones, g.receivers, g.num_nodes, mask=g.edge_mask)


def compute_pr(g: GraphBatch, damp: float = 0.85, k: int = 10) -> Array:
    """PageRank by k power iterations (reference adaptive.py:34-55)."""
    N = g.num_nodes
    deg_out = segment_sum(jnp.ones(g.num_edges), g.senders, N,
                          mask=g.edge_mask)
    x = jnp.where(g.node_mask, 1.0, 0.0)

    def body(x, _):
        contrib = x[g.senders] / jnp.maximum(deg_out[g.senders], 1.0)
        agg = segment_sum(contrib, g.receivers, N, mask=g.edge_mask)
        x = (1 - damp) * jnp.where(g.node_mask, 1.0, 0.0) + damp * agg
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=k)
    return x


def eigenvector_centrality(g: GraphBatch, k: int = 50) -> Array:
    """EVC by power iteration on the (masked) adjacency
    (reference adaptive.py:58-74 uses networkx; same fixed point)."""
    N = g.num_nodes
    x = jnp.where(g.node_mask, 1.0, 0.0)

    def body(x, _):
        y = segment_sum(x[g.senders], g.receivers, N, mask=g.edge_mask)
        y = y + x  # self-damping keeps disconnected nodes finite
        nrm = jnp.maximum(jnp.linalg.norm(y), 1e-12)
        return y / nrm, None

    x, _ = jax.lax.scan(body, x, None, length=k)
    return jnp.abs(x)


def _norm_weights(s: Array, mask: Array) -> Array:
    """(s_max - s) / (s_max - s_mean) over real entries
    (reference adaptive.py:123-135)."""
    big = jnp.where(mask, s, -jnp.inf)
    s_max = jnp.max(big)
    s_mean = jnp.sum(jnp.where(mask, s, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
    return (s_max - s) / jnp.maximum(s_max - s_mean, 1e-12)


def degree_drop_weights(g: GraphBatch) -> Array:
    deg = degree_centrality(g)
    s = jnp.log(jnp.maximum(deg, 1.0))
    s_edge = s[g.receivers]
    return _norm_weights(s_edge, g.edge_mask)


def pr_drop_weights(g: GraphBatch, aggr: str = "sink", k: int = 10) -> Array:
    pr = compute_pr(g, k=k)
    s = jnp.log(jnp.maximum(pr, 1e-12))
    if aggr == "sink":
        s_edge = s[g.receivers]
    elif aggr == "source":
        s_edge = s[g.senders]
    else:
        s_edge = 0.5 * (s[g.senders] + s[g.receivers])
    return _norm_weights(s_edge, g.edge_mask)


def evc_drop_weights(g: GraphBatch) -> Array:
    evc = eigenvector_centrality(g)
    s = jnp.log(jnp.maximum(evc, 1e-12))
    s_edge = s[g.receivers]
    return _norm_weights(s_edge, g.edge_mask)


def feature_drop_weights(g: GraphBatch, node_c: Array,
                         dense: bool = False) -> Array:
    """Per-feature-column drop weights from node centrality
    (reference adaptive.py:139-158)."""
    x = g.nodes["x"]
    x = jnp.abs(x) if dense else (x != 0).astype(jnp.float32)
    x = jnp.where(g.node_mask[:, None], x, 0.0)
    w = x.T @ jnp.log(jnp.maximum(node_c, 1e-12))
    mask = jnp.ones_like(w, bool)
    return _norm_weights(w, mask)


def drop_edge_weighted(key, g: GraphBatch, drop_weights: Array,
                       p: float, threshold: float = 0.7) -> GraphBatch:
    """Drop edge e w.p. min(p * w_e / mean(w), threshold) (GCA rule)."""
    w = drop_weights
    mean = jnp.sum(jnp.where(g.edge_mask, w, 0.0)) / jnp.maximum(
        jnp.sum(g.edge_mask), 1)
    prob = jnp.minimum(p * w / jnp.maximum(mean, 1e-12), threshold)
    keep = jax.random.uniform(key, prob.shape) >= prob
    return g.replace(edge_mask=g.edge_mask & keep)


def drop_feature_weighted(key, g: GraphBatch, feat_weights: Array,
                          p: float, threshold: float = 0.7) -> GraphBatch:
    w = feat_weights
    prob = jnp.minimum(p * w / jnp.maximum(jnp.mean(w), 1e-12), threshold)
    drop = jax.random.uniform(key, (g.num_nodes,) + w.shape) < prob[None, :]
    x = jnp.where(drop, 0.0, g.nodes["x"])
    return g.replace_nodes(x=x)


class AdaEdgePerturbation:
    """Adaptive edge dropping (reference structure.py:58-108)."""

    def __init__(self, centrality_measure: str = "degree", prob: float = 0.3,
                 threshold: float = 0.7):
        self.centrality_measure = centrality_measure
        self.prob = prob
        self.threshold = threshold

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        if self.centrality_measure == "degree":
            w = degree_drop_weights(g)
        elif self.centrality_measure == "pr":
            w = pr_drop_weights(g)
        elif self.centrality_measure == "evc":
            w = evc_drop_weights(g)
        else:
            raise ValueError(self.centrality_measure)
        return drop_edge_weighted(key, g, w, self.prob, self.threshold)


class AdaNodeAttrMask:
    """Adaptive feature masking (reference feature.py:98-164)."""

    def __init__(self, centrality_measure: str = "degree", prob: float = 0.3,
                 threshold: float = 0.7, dense: bool = False):
        self.centrality_measure = centrality_measure
        self.prob = prob
        self.threshold = threshold
        self.dense = dense

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        if self.centrality_measure == "degree":
            c = degree_centrality(g)
        elif self.centrality_measure == "pr":
            c = compute_pr(g)
        elif self.centrality_measure == "evc":
            c = eigenvector_centrality(g)
        else:
            raise ValueError(self.centrality_measure)
        c = jnp.maximum(c, 1e-12)
        w = feature_drop_weights(g, c, self.dense)
        return drop_feature_weighted(key, g, w, self.prob, self.threshold)
