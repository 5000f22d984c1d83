"""Graph augmentation views as pure jit-able transforms on GraphBatch.

Reference: ``dig/sslgraph/method/contrastive/views_fn/{sample.py, structure.py,
feature.py, combination.py}``. The reference mutates PyG ``Data`` objects on
the host per batch (SURVEY.md §3.2 note); here every view is a pure function
``(key, GraphBatch) -> GraphBatch`` over *masks* with static shapes, so views
run on device inside the jitted contrastive step:

* node dropping flips ``node_mask`` (and incident ``edge_mask``) instead of
  relabeling;
* edge adding writes into free (padding) edge slots;
* per-graph "choose k of n" selections use an O(N^2) same-graph rank trick
  (one masked matmul) instead of per-graph randperm.

Semantics parity notes are on each class.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..graph import GraphBatch

Array = jax.Array


def identity_view(key, g: GraphBatch) -> GraphBatch:
    return g


def _rank_in_graph(scores: Array, node_graph: Array, mask: Array) -> Array:
    """rank[i] = #{j real, same graph, scores[j] < scores[i]} (O(N^2))."""
    same = node_graph[:, None] == node_graph[None, :]
    valid = mask[:, None] & mask[None, :] & same
    less = scores[None, :] < scores[:, None]
    return jnp.sum(valid & less, axis=1)


def _drop_edges_for_nodes(g: GraphBatch, keep_nodes: Array) -> GraphBatch:
    em = g.edge_mask & keep_nodes[g.senders] & keep_nodes[g.receivers]
    return g.replace(node_mask=g.node_mask & keep_nodes, edge_mask=em)


class UniformSample:
    """Uniform node dropping (reference sample.py:7-45): keeps
    floor(n*(1-ratio)) nodes per graph, drops incident edges."""

    def __init__(self, ratio: float = 0.1):
        self.ratio = ratio

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        scores = jax.random.uniform(key, (g.num_nodes,))
        rank = _rank_in_graph(scores, g.node_graph, g.node_mask)
        keep_num = jnp.floor(
            g.n_node.astype(jnp.float32) * (1.0 - self.ratio)).astype(jnp.int32)
        keep = g.node_mask & (rank < keep_num[g.node_graph])
        return _drop_edges_for_nodes(g, keep)


class RWSample:
    """Random-walk subgraph sampling (reference sample.py:49-109): grow a
    connected node set from a random seed until ~ratio*n nodes, keep only
    those nodes. Fixed-step frontier growth with masking (static shapes)."""

    def __init__(self, ratio: float = 0.1, max_steps: Optional[int] = None):
        self.ratio = ratio
        self.max_steps = max_steps

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        N = g.num_nodes
        G = g.num_graphs
        target = jnp.maximum(
            jnp.floor(g.n_node.astype(jnp.float32) * self.ratio), 1.0
        ).astype(jnp.int32)
        steps = self.max_steps or max(int(N / max(G, 1)), 4)

        k_seed, k_walk = jax.random.split(key)
        # seed: random real node per graph (gumbel-max per segment)
        s0 = jax.random.uniform(k_seed, (N,))
        s0 = jnp.where(g.node_mask, s0, -1.0)
        mx = jax.ops.segment_max(s0, g.node_graph, num_segments=G)
        selected = g.node_mask & (s0 == mx[g.node_graph])

        keys = jax.random.split(k_walk, steps)

        def body(selected, kk):
            # frontier: unselected real neighbors of the selected set
            nbr = jnp.zeros(N, bool).at[g.receivers].max(
                selected[g.senders] & g.edge_mask)
            cand = nbr & g.node_mask & ~selected
            cnt = jax.ops.segment_sum(selected.astype(jnp.int32),
                                      g.node_graph, num_segments=G)
            want = cnt < target
            sc = jnp.where(cand & want[g.node_graph],
                           jax.random.uniform(kk, (N,)), -1.0)
            m = jax.ops.segment_max(sc, g.node_graph, num_segments=G)
            pick = cand & (sc == m[g.node_graph]) & (sc > 0)
            return selected | pick, None

        selected, _ = jax.lax.scan(body, selected, keys)
        return _drop_edges_for_nodes(g, selected)


class EdgePerturbation:
    """Edge dropping/adding (reference structure.py:7-56): drop each real
    edge w.p. ratio; add floor(ratio*E_real) random intra-graph edges into
    free (padding) slots."""

    def __init__(self, add: bool = True, drop: bool = False,
                 ratio: float = 0.1):
        self.add = add
        self.drop = drop
        self.ratio = ratio

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        k_drop, k_a, k_b = jax.random.split(key, 3)
        E = g.num_edges
        em = g.edge_mask
        senders, receivers = g.senders, g.receivers
        if self.drop:
            keep = jax.random.uniform(k_drop, (E,)) >= self.ratio
            em = em & keep
        if self.add:
            total_real = jnp.sum(g.edge_mask)
            n_add = jnp.floor(total_real * self.ratio).astype(jnp.int32)
            free = ~em
            # enumerate free slots; activate the first n_add of them
            free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
            activate = free & (free_rank < n_add)
            # random endpoint a: uniform over real nodes
            logits = jnp.where(g.node_mask, 0.0, -jnp.inf)
            a = jax.random.categorical(k_a, logits, shape=(E,))
            # endpoint b: uniform within a's graph (contiguous layout)
            start = jnp.cumsum(g.n_node) - g.n_node
            ga = g.node_graph[a]
            off = jax.random.randint(k_b, (E,), 0, 1 << 30)
            b = start[ga] + off % jnp.maximum(g.n_node[ga], 1)
            senders = jnp.where(activate, a.astype(jnp.int32), senders)
            receivers = jnp.where(activate, b.astype(jnp.int32), receivers)
            em = em | activate
            senders = jnp.where(em, senders, 0)
            receivers = jnp.where(em, receivers, 0)
        return g.replace(senders=senders, receivers=receivers, edge_mask=em)


class NodeAttrMask:
    """Node attribute masking (reference feature.py:9-70). mode='whole':
    floor(n*ratio) nodes per graph get features ~ N(mean, std) (or the
    constant mean when std == 0); mode='partial': independent elementwise
    Bernoulli(ratio) replacement."""

    def __init__(self, mode: str = "whole", mask_ratio: float = 0.1,
                 mask_mean: float = 0.5, mask_std: float = 0.5):
        self.mode = mode
        self.mask_ratio = mask_ratio
        self.mask_mean = mask_mean
        self.mask_std = mask_std

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        x = g.nodes["x"]
        k_sel, k_val = jax.random.split(key)
        if self.mode == "whole":
            scores = jax.random.uniform(k_sel, (g.num_nodes,))
            rank = _rank_in_graph(scores, g.node_graph, g.node_mask)
            mask_num = jnp.floor(
                g.n_node.astype(jnp.float32) * self.mask_ratio
            ).astype(jnp.int32)
            sel = g.node_mask & (rank < mask_num[g.node_graph])
            if self.mask_std > 0:
                repl = self.mask_mean + self.mask_std * jax.random.normal(
                    k_val, x.shape)
            else:
                repl = jnp.full_like(x, self.mask_mean)
            x = jnp.where(sel[:, None], repl, x)
        elif self.mode == "partial":
            sel = jax.random.uniform(k_sel, x.shape) < self.mask_ratio
            repl = self.mask_mean + self.mask_std * jax.random.normal(
                k_val, x.shape)
            x = jnp.where(sel & g.node_mask[:, None], repl, x)
        else:
            raise ValueError(f"unknown mode {self.mode}")
        return g.replace_nodes(x=x)


class Diffusion:
    """Graph diffusion (PPR / heat kernel) used by MVGRL (reference
    structure.py:110-174). Deterministic; returns the dense [N, N]
    block-diagonal diffusion matrix alongside the (unchanged) batch — the
    dense layout is the TPU-native form: message passing with the diffusion
    view is then one masked matmul instead of a huge weighted edge list."""

    def __init__(self, mode: str = "ppr", alpha: float = 0.2, t: float = 5.0,
                 add_self_loop: bool = True):
        self.mode = mode
        self.alpha = alpha
        self.t = t
        self.add_self_loop = add_self_loop

    def dense_adj(self, g: GraphBatch) -> Array:
        N = g.num_nodes
        A = jnp.zeros((N, N))
        w = g.edge_mask.astype(jnp.float32)
        A = A.at[g.receivers, g.senders].max(w)
        if self.add_self_loop:
            A = jnp.where(jnp.eye(N, dtype=bool) & g.node_mask[:, None],
                          1.0, A)
        return A

    def __call__(self, key, g: GraphBatch) -> Tuple[GraphBatch, Array]:
        A = self.dense_adj(g)
        N = A.shape[0]
        deg = jnp.sum(A, axis=1)
        eye = jnp.eye(N)
        if self.mode == "ppr":
            dinv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
            # zero-degree (padding) rows: keep identity so inverse exists
            at = A * dinv_sqrt[:, None] * dinv_sqrt[None, :]
            diff = self.alpha * jnp.linalg.inv(eye - (1 - self.alpha) * at)
        elif self.mode == "heat":
            dinv = 1.0 / jnp.maximum(deg, 1e-12)
            # reference: elementwise exp(t*(A D^-1 - 1)) (structure.py:150)
            diff = jnp.exp(self.t * (A * dinv[None, :] - 1.0))
        else:
            raise ValueError(self.mode)
        valid = g.node_mask[:, None] & g.node_mask[None, :]
        valid &= g.node_graph[:, None] == g.node_graph[None, :]
        return g, jnp.where(valid, diff, 0.0)


class RandomView:
    """Pick one candidate view at random per call (reference
    combination.py:5-28). The choice is host-side (one int) so each jitted
    step still traces a single static view composition per candidate."""

    def __init__(self, candidates: Sequence[Callable]):
        self.candidates = list(candidates)

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        k_pick, k_view = jax.random.split(key)
        idx = jax.random.randint(k_pick, (), 0, len(self.candidates))
        return jax.lax.switch(
            idx, [lambda kg, f=f: f(kg[0], kg[1]) for f in self.candidates],
            (k_view, g))


class SequentialView:
    """Apply views in sequence (reference combination.py:31-62)."""

    def __init__(self, views: Sequence[Callable]):
        self.views = list(views)

    def __call__(self, key, g: GraphBatch) -> GraphBatch:
        keys = jax.random.split(key, len(self.views))
        for k, v in zip(keys, self.views):
            g = v(k, g)
        return g


class DiffusionWithSample:
    """Subgraph sampling + diffusion for node-level MVGRL on large graphs
    (reference structure.py:178-270): sample ``sample_size`` nodes, keep
    the induced subgraph, return it with its dense diffusion matrix."""

    def __init__(self, sample_size: int = 2000, mode: str = "ppr",
                 alpha: float = 0.2, t: float = 5.0,
                 add_self_loop: bool = True):
        self.sample_size = sample_size
        self.diffusion = Diffusion(mode, alpha, t, add_self_loop)

    def __call__(self, key, g: GraphBatch):
        scores = jax.random.uniform(key, (g.num_nodes,))
        rank = _rank_in_graph(scores, g.node_graph, g.node_mask)
        keep = g.node_mask & (rank < self.sample_size)
        g2 = _drop_edges_for_nodes(g, keep)
        return self.diffusion(None, g2)
