"""Gradient / decomposition explainers: GradCAM, GNN-GI, DeepLIFT, FlowX,
GNN-LRP.

Parity with ``dig/xgraph/method/{gradcam.py,gnn_gi.py,deeplift.py,flowx.py,
gnn_lrp.py}``. The reference routes these through a vendored captum fork
with forward/backward hooks (``dig/xgraph/models/ext/deeplift``); in JAX
each is a few lines of jax.grad / jax.jacrev against the pure forward:

* GradCAM  — class-gradient-weighted last-conv activations -> node scores,
  edge score = mean of endpoints.
* GNN_GI   — gradient x input on per-edge weights (walk-free GI).
* DeepLIFT — rescale-rule approximation: (x - baseline) * grad at the
  input, against a zero baseline.
* FlowX    — marginal-contribution flow attribution: Monte-Carlo edge
  Shapley over edge subsets.
* GNN_LRP  — walk-level decomposition: with per-layer edge-weight
  variables, the relevance of walk (e_1 .. e_L) is the mixed partial
  derivative of the target logit — computed exactly with nested Jacobians
  for the 2/3-layer zoo models, then projected to edges.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch
from .base import ExplainerBase


class GradCAM(ExplainerBase):
    """reference gradcam.py (Grad-CAM on the last conv layer)."""

    def explain(self, g: GraphBatch, target_label: int,
                node_idx: Optional[int] = None) -> np.ndarray:
        model, params = self.model, self.params
        row = 0 if node_idx is None else node_idx

        def build():
            def fn(g, row, target_label):
                _, acts = model.apply(params, g, None,
                                      return_activations=True)
                last = acts[-1]
                grads = jax.grad(lambda a: _replay(
                    model, params, a, g, row, target_label))(last)
                alpha = jnp.mean(grads, axis=0)         # [C] channel wts
                return jax.nn.relu(jnp.sum(last * alpha[None, :], axis=-1))
            return fn

        node_scores = self._cached_jit("gradcam", build)(g, row,
                                                         target_label)
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        ns = np.asarray(node_scores)
        edge_scores = 0.5 * (ns[s] + ns[r])
        return np.where(np.asarray(g.edge_mask), edge_scores, -np.inf)


def _replay(model, params, last_act, g, row, target_label):
    """Apply the readout head to substituted last-layer activations by
    linearizing through the model's head params (graph-level)."""
    # We reuse model.apply on a batch whose conv output is replaced by
    # running the model but swapping the last activations via custom jvp is
    # overkill; instead exploit that the head is (pool -> dense -> dense)
    # or (dense) — extract head params and apply directly.
    import flax
    from ..ops import segment_mean, segment_sum
    p = flax.core.unfreeze(params)["params"] if "params" in params else params
    keys = sorted([k for k in p if k.startswith("Dense_")])
    x = last_act
    if model.model_level == "graph":
        if model.readout == "sum":
            pooled = segment_sum(x, g.node_graph, g.num_graphs,
                                 mask=g.node_mask)
        elif model.readout == "max":
            big = jnp.where(g.node_mask[:, None], x, -1e30)
            pooled = jax.ops.segment_max(big, g.node_graph,
                                         num_segments=g.num_graphs)
        else:
            pooled = segment_mean(x, g.node_graph, g.num_graphs,
                                  mask=g.node_mask)
        h = pooled
        d0 = p[keys[0]]
        h = jax.nn.relu(h @ d0["kernel"] + d0["bias"])
        d1 = p[keys[1]]
        logits = h @ d1["kernel"] + d1["bias"]
    else:
        d0 = p[keys[0]]
        logits = x @ d0["kernel"] + d0["bias"]
    return logits[row, target_label]


class GNN_GI(ExplainerBase):
    """Gradient x input on edge weights (reference gnn_gi.py: walk GI
    collapsed to edges)."""

    def explain(self, g: GraphBatch, target_label: int,
                node_idx: Optional[int] = None) -> np.ndarray:
        model, params = self.model, self.params
        row = 0 if node_idx is None else node_idx
        E = g.num_edges

        def build():
            def fn(g, row, target_label):
                def f(ew):
                    return model.apply(params, g, ew)[row, target_label]
                return jax.grad(f)(jnp.ones(E))
            return fn

        grads = self._cached_jit("gnn_gi", build)(g, row, target_label)
        scores = np.asarray(grads)
        return np.where(np.asarray(g.edge_mask), scores, -np.inf)


class DeepLIFT(ExplainerBase):
    """Rescale-rule DeepLIFT approximation against a zero-feature baseline
    (reference deeplift.py wraps the captum fork; for ReLU networks the
    rescale rule equals (x - x0) * avg-grad along the straight path —
    approximated at the input point)."""

    def explain(self, g: GraphBatch, target_label: int,
                node_idx: Optional[int] = None,
                steps: int = 8) -> np.ndarray:
        model, params = self.model, self.params
        row = 0 if node_idx is None else node_idx

        def build():
            def fn(g, row, target_label):
                x0 = jnp.zeros_like(g.nodes["x"])
                x1 = g.nodes["x"]

                def f(x):
                    logits = model.apply(params, g.replace_nodes(x=x),
                                         None)
                    return logits[row, target_label]

                # integrated-gradients-style average along the path
                # (equals DeepLIFT-Rescale in piecewise-linear nets)
                total = jnp.zeros_like(x1)
                for a in np.linspace(1.0 / steps, 1.0, steps):
                    total = total + jax.grad(f)(x0 + a * (x1 - x0))
                return jnp.sum((x1 - x0) * total / steps, axis=-1)
            return fn

        node_attr = self._cached_jit(f"deeplift{steps}", build)(
            g, row, target_label)
        s, r = np.asarray(g.senders), np.asarray(g.receivers)
        na = np.asarray(node_attr)
        edge_scores = 0.5 * (na[s] + na[r])
        return np.where(np.asarray(g.edge_mask), edge_scores, -np.inf)


class FlowX(ExplainerBase):
    """Flow-based attribution via Monte-Carlo edge Shapley (reference
    flowx.py trains flow scores from marginal message-flow contributions;
    this implementation scores each edge by its expected marginal effect on
    the target prob over random edge subsets)."""

    def explain(self, g: GraphBatch, target_label: int,
                node_idx: Optional[int] = None, sample_num: int = 32,
                seed: int = 0) -> np.ndarray:
        model, params = self.model, self.params
        row = 0 if node_idx is None else node_idx
        E = g.num_edges
        em = np.asarray(g.edge_mask)
        rng = np.random.default_rng(seed)

        def _prob_fn(g, ew, row, target_label):
            logits = model.apply(params, g, ew)
            return jax.nn.softmax(logits, -1)[row, target_label]

        _prob = self._cached_jit("flowx_prob", lambda: _prob_fn)
        _prob_many = self._cached_jit(
            "flowx_prob_many",
            lambda: jax.vmap(_prob_fn, in_axes=(None, 0, None, None)))

        scores = np.zeros(E)
        counts = np.zeros(E) + 1e-9
        for _ in range(sample_num):
            keep = (rng.random(E) < 0.5) & em
            base = float(_prob(g, jnp.asarray(keep, jnp.float32), row,
                               target_label))
            flip = keep.copy()
            # flip a random subset of edges one at a time in expectation:
            # evaluate with each edge toggled via batched vmap
            toggled = np.repeat(keep[None, :], em.sum(), axis=0)
            idxs = np.flatnonzero(em)
            for k, e in enumerate(idxs):
                toggled[k, e] = ~toggled[k, e]
            probs = _prob_many(g, jnp.asarray(toggled, jnp.float32), row,
                               target_label)
            probs = np.asarray(probs)
            for k, e in enumerate(idxs):
                sign = 1.0 if not keep[e] else -1.0
                scores[e] += sign * (probs[k] - base)
                counts[e] += 1
        out = scores / counts
        return np.where(em, out, -np.inf)


class GNN_LRP(ExplainerBase):
    """Walk-level LRP-style decomposition (reference gnn_lrp.py): with
    per-layer edge weights w^(l), relevance of walk (e_1..e_L) is the mixed
    partial d^L f / dw^(1)_{e_1} ... dw^(L)_{e_L} evaluated at w == 1,
    computed with nested Jacobians (exact for the 2/3-layer zoo); edge
    score = sum of relevances of walks through the edge."""

    def explain(self, g: GraphBatch, target_label: int,
                node_idx: Optional[int] = None) -> np.ndarray:
        model, params = self.model, self.params
        L = model.num_layers
        assert L in (2, 3), "walk enumeration supported for 2/3 layers"
        row = 0 if node_idx is None else node_idx
        E = g.num_edges

        def f(ews):
            logits = model.apply(params, g, list(ews))
            return logits[row, target_label]

        ones = tuple(jnp.ones(E) for _ in range(L))
        if L == 2:
            # walk relevance matrix [E, E]
            W = jax.jacfwd(jax.grad(lambda a, b: f((a, b)), argnums=0),
                           argnums=1)(ones[0], ones[1])
            W = np.asarray(W)
            edge_scores = np.abs(W).sum(axis=1) + np.abs(W).sum(axis=0)
        else:
            H = jax.jacfwd(jax.jacfwd(jax.grad(
                lambda a, b, c: f((a, b, c)), argnums=0), argnums=1),
                argnums=2)(ones[0], ones[1], ones[2])
            H = np.asarray(H)
            edge_scores = (np.abs(H).sum(axis=(1, 2))
                           + np.abs(H).sum(axis=(0, 2))
                           + np.abs(H).sum(axis=(0, 1)))
        return np.where(np.asarray(g.edge_mask), edge_scores, -np.inf)
