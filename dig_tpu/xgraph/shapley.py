"""Shapley-value approximations for coalition scoring.

Parity with ``dig/xgraph/method/shapley.py``: ``l_shapley`` (:100),
``mc_shapley`` (:148), ``mc_l_shapley`` (:182), ``NC_mc_l_shapley`` (:240),
``gnn_score`` (graph_build via zero-filling or split), and the batched
marginal-contribution evaluation (``MarginalSubgraphDataset`` :44 — here a
single stacked masked forward, which XLA batches onto the MXU).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch


def graph_build_zero_filling(g: GraphBatch, node_mask_sub: np.ndarray):
    """Zero out excluded node features (reference shapley.py:85-90)."""
    keep = jnp.asarray(node_mask_sub)
    return g.replace_nodes(x=g.nodes["x"] * keep[:, None])


def graph_build_split(g: GraphBatch, node_mask_sub: np.ndarray):
    """Drop edges incident to excluded nodes (reference shapley.py:93-98)."""
    keep = jnp.asarray(node_mask_sub).astype(bool)
    em = g.edge_mask & keep[g.senders] & keep[g.receivers]
    return g.replace(edge_mask=em)


_BUILDERS = {"zero_filling": graph_build_zero_filling,
             "split": graph_build_split}


def make_value_func(model, params, target_class: int,
                    node_idx: Optional[int] = None, probs_fn=None):
    """GnnNetsGC2valueFunc / GnnNetsNC2valueFunc (shapley.py:12-41):
    coalition mask [N] -> prob of target class.

    ``probs_fn``: optional pre-jitted (params, g) -> probs — pass the
    explainer's cached forward so a fresh jit (and a full re-trace per
    explanation) is avoided."""
    if probs_fn is None:
        @jax.jit
        def probs_fn(params, g):
            return jax.nn.softmax(model.apply(params, g, None), axis=-1)

    def vf(g: GraphBatch):
        row = 0 if node_idx is None else node_idx
        return probs_fn(params, g)[row, target_class]

    return vf


def _marginal_contributions(g, exclude_masks, include_masks, value_func,
                            subgraph_building_method="zero_filling"):
    build = _BUILDERS[subgraph_building_method]
    scores = []
    for ex, inc in zip(exclude_masks, include_masks):
        v_ex = float(value_func(build(g, ex)))
        v_inc = float(value_func(build(g, inc)))
        scores.append(v_inc - v_ex)
    return np.asarray(scores)


def l_shapley(coalition: Sequence[int], g: GraphBatch, local_radius: int,
              value_func, subgraph_building_method="zero_filling") -> float:
    """Local-neighborhood Shapley (reference shapley.py:100-145)."""
    from .base import k_hop_subgraph
    N = g.num_nodes
    local_nodes = set()
    for v in coalition:
        nodes, _ = k_hop_subgraph(v, local_radius - 1, g.senders,
                                  g.receivers, g.edge_mask, N)
        local_nodes |= set(nodes.tolist())
    local_region = sorted(local_nodes)
    coalition = list(coalition)
    coal_placeholder = N  # virtual slot marking the coalition
    set_exclude_masks, set_include_masks = [], []
    others = [n for n in local_region if n not in coalition]
    import itertools
    for r in range(len(others) + 1):
        for subset in itertools.combinations(others, r):
            ex = np.ones(N, np.float32)
            ex[local_region] = 0.0
            ex[list(subset)] = 1.0
            inc = ex.copy()
            inc[coalition] = 1.0
            set_exclude_masks.append(ex)
            set_include_masks.append(inc)
            # weight by |S|!(n-|S|-1)!/n! handled below
    n = len(local_region)
    weights = []
    idx = 0
    import math
    for r in range(len(others) + 1):
        cnt = math.comb(len(others), r)
        w = (math.factorial(r) * math.factorial(n - r - 1)
             / math.factorial(n)) if n > 0 else 1.0
        weights += [w] * cnt
        idx += cnt
    margins = _marginal_contributions(
        g, set_exclude_masks, set_include_masks, value_func,
        subgraph_building_method)
    return float(np.sum(np.asarray(weights) * margins))


def mc_shapley(coalition: Sequence[int], g: GraphBatch,
               value_func, subgraph_building_method="zero_filling",
               sample_num: int = 100, seed: int = 0) -> float:
    """Monte-Carlo Shapley over all nodes (reference shapley.py:148-179)."""
    N = g.num_nodes
    node_mask = np.asarray(g.node_mask)
    real = np.flatnonzero(node_mask)
    others = np.asarray([n for n in real if n not in set(coalition)],
                        np.int64)
    rng = np.random.default_rng(seed)
    ex_masks, inc_masks = [], []
    for _ in range(sample_num):
        perm = rng.permutation(others)
        split = rng.integers(0, len(others) + 1)
        selected = perm[:split]
        ex = np.zeros(N, np.float32)
        ex[selected] = 1.0
        inc = ex.copy()
        inc[list(coalition)] = 1.0
        ex_masks.append(ex)
        inc_masks.append(inc)
    margins = _marginal_contributions(g, ex_masks, inc_masks, value_func,
                                      subgraph_building_method)
    return float(margins.mean())


def mc_l_shapley(coalition: Sequence[int], g: GraphBatch, local_radius: int,
                 value_func, subgraph_building_method="zero_filling",
                 sample_num: int = 100, seed: int = 0) -> float:
    """Monte-Carlo local Shapley (reference shapley.py:182-224) — the
    default SubgraphX payoff."""
    from .base import k_hop_subgraph
    N = g.num_nodes
    local_nodes = set()
    for v in coalition:
        nodes, _ = k_hop_subgraph(v, local_radius - 1, g.senders,
                                  g.receivers, g.edge_mask, N)
        local_nodes |= set(nodes.tolist())
    local_region = sorted(local_nodes)
    others = np.asarray([n for n in local_region
                         if n not in set(coalition)], np.int64)
    rng = np.random.default_rng(seed)
    ex_masks, inc_masks = [], []
    for _ in range(sample_num):
        perm = rng.permutation(others)
        split = rng.integers(0, len(others) + 1)
        selected = perm[:split]
        ex = np.ones(N, np.float32)
        ex[local_region] = 0.0
        ex[selected] = 1.0
        inc = ex.copy()
        inc[list(coalition)] = 1.0
        ex_masks.append(ex)
        inc_masks.append(inc)
    margins = _marginal_contributions(g, ex_masks, inc_masks, value_func,
                                      subgraph_building_method)
    return float(margins.mean())


def NC_mc_l_shapley(coalition: Sequence[int], g: GraphBatch,
                    local_radius: int, value_func, node_idx: int,
                    subgraph_building_method="zero_filling",
                    sample_num: int = 100, seed: int = 0) -> float:
    """Node-classification variant: the target node always stays included
    (reference shapley.py:240-291)."""
    from .base import k_hop_subgraph
    N = g.num_nodes
    local_nodes = set()
    for v in coalition:
        nodes, _ = k_hop_subgraph(v, local_radius - 1, g.senders,
                                  g.receivers, g.edge_mask, N)
        local_nodes |= set(nodes.tolist())
    local_region = sorted(local_nodes)
    others = np.asarray([n for n in local_region
                         if n not in set(coalition)], np.int64)
    rng = np.random.default_rng(seed)
    ex_masks, inc_masks = [], []
    for _ in range(sample_num):
        perm = rng.permutation(others)
        split = rng.integers(0, len(others) + 1)
        selected = perm[:split]
        ex = np.ones(N, np.float32)
        ex[local_region] = 0.0
        ex[selected] = 1.0
        ex[node_idx] = 1.0
        inc = ex.copy()
        inc[list(coalition)] = 1.0
        ex_masks.append(ex)
        inc_masks.append(inc)
    margins = _marginal_contributions(g, ex_masks, inc_masks, value_func,
                                      subgraph_building_method)
    return float(margins.mean())


def gnn_score(coalition: Sequence[int], g: GraphBatch, value_func,
              subgraph_building_method="zero_filling") -> float:
    """Raw model score of the coalition subgraph (shapley.py:227-237)."""
    N = g.num_nodes
    mask = np.zeros(N, np.float32)
    mask[list(coalition)] = 1.0
    build = _BUILDERS[subgraph_building_method]
    return float(value_func(build(g, mask)))
