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


def make_batched_value_func(model, params, target_class: int,
                            node_idx: Optional[int] = None,
                            subgraph_building_method="zero_filling",
                            batch_fn=None):
    """Batched coalition scoring: ONE jitted vmapped forward over a stack
    of node masks — the reference's ``MarginalSubgraphDataset`` batching
    (``dig/xgraph/method/shapley.py:44-98``), TPU-style: every masked copy
    rides one dispatch and XLA batches the convolutions onto the MXU.
    Round 4's sequential path paid one host->device round trip (10-30 ms
    through the tunnel) per mask — ~100 s/graph in the benchmark sweep.

    Returns ``vf_batch(g, masks: list[np [N]]) -> np [B]``. Masks are
    padded to power-of-two buckets (min 64) so distinct batch sizes don't
    recompile. ``batch_fn`` lets the explainer cache the jitted inner
    across labels/targets (row/class are runtime args, not trace consts).
    """
    zero = subgraph_building_method == "zero_filling"

    if batch_fn is None:
        batch_fn = make_batched_probs_fn(model, zero)

    def vf_batch(g, masks_np):
        B = len(masks_np)
        if B == 0:
            return np.zeros(0, np.float32)
        N = masks_np[0].shape[-1]
        Bp = max(64, 1 << (B - 1).bit_length())
        masks = np.zeros((Bp, N), np.float32)
        masks[:B] = np.stack(masks_np)
        row = 0 if node_idx is None else node_idx
        vals = batch_fn(params, g, jnp.asarray(masks),
                        jnp.int32(row), jnp.int32(target_class))
        return np.asarray(vals)[:B]

    return vf_batch


def make_batched_probs_fn(model, zero_filling: bool):
    """The cacheable jitted inner of :func:`make_batched_value_func`."""

    @jax.jit
    def batch_fn(params, g, masks, row, cls):
        def one(mask):
            if zero_filling:
                g2 = g.replace_nodes(x=g.nodes["x"] * mask[:, None])
            else:
                keep = mask.astype(bool)
                em = g.edge_mask & keep[g.senders] & keep[g.receivers]
                g2 = g.replace(edge_mask=em)
            probs = jax.nn.softmax(model.apply(params, g2, None), -1)
            return probs[row, cls]
        return jax.vmap(one)(masks)

    return batch_fn


def _local_region(coalition, g, local_radius):
    from .base import k_hop_subgraph
    local_nodes = set()
    for v in coalition:
        nodes, _ = k_hop_subgraph(v, local_radius - 1, g.senders,
                                  g.receivers, g.edge_mask, g.num_nodes)
        local_nodes |= set(nodes.tolist())
    return sorted(local_nodes)


def _masks_for(coalition, g, method, local_radius, sample_num, node_idx,
               seed):
    """(exclude, include, weights|None) mask stacks for one coalition —
    shared by the sequential scorers and :func:`score_coalitions`."""
    N = g.num_nodes
    coalition = list(coalition)
    rng = np.random.default_rng(seed)
    if method == "mc_shapley":
        node_mask = np.asarray(g.node_mask)
        real = np.flatnonzero(node_mask)
        others = np.asarray([n for n in real if n not in set(coalition)],
                            np.int64)
        ex_masks, inc_masks = [], []
        for _ in range(sample_num):
            perm = rng.permutation(others)
            split = rng.integers(0, len(others) + 1)
            ex = np.zeros(N, np.float32)
            ex[perm[:split]] = 1.0
            inc = ex.copy()
            inc[coalition] = 1.0
            ex_masks.append(ex)
            inc_masks.append(inc)
        return ex_masks, inc_masks, None
    local_region = _local_region(coalition, g, local_radius)
    others = np.asarray([n for n in local_region
                         if n not in set(coalition)], np.int64)
    if method == "l_shapley":
        import itertools
        import math
        ex_masks, inc_masks, weights = [], [], []
        n = len(local_region)
        for r in range(len(others) + 1):
            w = (math.factorial(r) * math.factorial(n - r - 1)
                 / math.factorial(n)) if n > 0 else 1.0
            for subset in itertools.combinations(others, r):
                ex = np.ones(N, np.float32)
                ex[local_region] = 0.0
                ex[list(subset)] = 1.0
                inc = ex.copy()
                inc[coalition] = 1.0
                ex_masks.append(ex)
                inc_masks.append(inc)
                weights.append(w)
        return ex_masks, inc_masks, np.asarray(weights, np.float32)
    # mc_l_shapley / nc_mc_l_shapley
    ex_masks, inc_masks = [], []
    for _ in range(sample_num):
        perm = rng.permutation(others)
        split = rng.integers(0, len(others) + 1)
        ex = np.ones(N, np.float32)
        ex[local_region] = 0.0
        ex[perm[:split]] = 1.0
        if method == "nc_mc_l_shapley":
            ex[node_idx] = 1.0
        inc = ex.copy()
        inc[coalition] = 1.0
        ex_masks.append(ex)
        inc_masks.append(inc)
    return ex_masks, inc_masks, None


def score_coalitions(coalitions, g, vf_batch, method="mc_l_shapley", *,
                     local_radius: int = 4, sample_num: int = 100,
                     node_idx: Optional[int] = None, seed: int = 0):
    """Score MANY coalitions with one batched forward. Numerically
    identical to calling the sequential scorers per coalition (each
    coalition draws from a fresh ``default_rng(seed)``, matching them)."""
    N = g.num_nodes
    masks: List[np.ndarray] = []
    combine = []
    for coalition in coalitions:
        if method == "gnn_score":
            m = np.zeros(N, np.float32)
            m[list(coalition)] = 1.0
            combine.append((len(masks), 1, None, True))
            masks.append(m)
            continue
        ex, inc, w = _masks_for(coalition, g, method, local_radius,
                                sample_num, node_idx, seed)
        combine.append((len(masks), len(ex), w, False))
        masks.extend(ex)
        masks.extend(inc)
    vals = vf_batch(g, masks)
    out = []
    for start, cnt, w, single in combine:
        if single:
            out.append(float(vals[start]))
        else:
            marg = vals[start + cnt:start + 2 * cnt] - vals[start:start + cnt]
            out.append(float((marg * w).sum() if w is not None
                             else marg.mean()))
    return np.asarray(out, np.float32)


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
    ex, inc, w = _masks_for(coalition, g, "l_shapley", local_radius,
                            0, None, 0)
    margins = _marginal_contributions(g, ex, inc, value_func,
                                      subgraph_building_method)
    return float(np.sum(w * margins))


def mc_shapley(coalition: Sequence[int], g: GraphBatch,
               value_func, subgraph_building_method="zero_filling",
               sample_num: int = 100, seed: int = 0) -> float:
    """Monte-Carlo Shapley over all nodes (reference shapley.py:148-179)."""
    ex, inc, _ = _masks_for(coalition, g, "mc_shapley", 0, sample_num,
                            None, seed)
    margins = _marginal_contributions(g, ex, inc, value_func,
                                      subgraph_building_method)
    return float(margins.mean())


def mc_l_shapley(coalition: Sequence[int], g: GraphBatch, local_radius: int,
                 value_func, subgraph_building_method="zero_filling",
                 sample_num: int = 100, seed: int = 0) -> float:
    """Monte-Carlo local Shapley (reference shapley.py:182-224) — the
    default SubgraphX payoff."""
    ex, inc, _ = _masks_for(coalition, g, "mc_l_shapley", local_radius,
                            sample_num, None, seed)
    margins = _marginal_contributions(g, ex, inc, value_func,
                                      subgraph_building_method)
    return float(margins.mean())


def NC_mc_l_shapley(coalition: Sequence[int], g: GraphBatch,
                    local_radius: int, value_func, node_idx: int,
                    subgraph_building_method="zero_filling",
                    sample_num: int = 100, seed: int = 0) -> float:
    """Node-classification variant: the target node always stays included
    (reference shapley.py:240-291)."""
    ex, inc, _ = _masks_for(coalition, g, "nc_mc_l_shapley", local_radius,
                            sample_num, node_idx, seed)
    margins = _marginal_contributions(g, ex, inc, value_func,
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
