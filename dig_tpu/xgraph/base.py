"""ExplainerBase — shared mask/eval machinery for all explainers.

Parity with ``dig/xgraph/method/base_explainer.py:25-498``: apply soft/hard
edge masks to the model (as multiplicative edge weights — the functional
equivalent of PyG's ``__set_masks__``), k-hop subgraph extraction for
node-level tasks, sparsity control, and ``eval_related_pred`` producing the
origin/masked/maskout/zero probabilities XCollector consumes.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch


def k_hop_subgraph(node_idx: int, num_hops: int, senders, receivers,
                   edge_mask, num_nodes: int):
    """Nodes/edges within num_hops of node_idx (host-side numpy; reference
    base_explainer.py:82-106 wraps PyG's k_hop_subgraph)."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    em = np.asarray(edge_mask)
    node_set = {int(node_idx)}
    for _ in range(num_hops):
        sel = em & np.isin(receivers, list(node_set))
        node_set |= set(senders[sel].tolist())
    nodes = np.array(sorted(node_set))
    sub_edge = em & np.isin(senders, nodes) & np.isin(receivers, nodes)
    return nodes, sub_edge


class ExplainerBase:
    """Explainers hold a flax model + trained params and explain single
    (batched-as-one) graphs."""

    def __init__(self, model, params, epochs: int = 0, lr: float = 0.0,
                 explain_graph: bool = True):
        self.model = model
        self.params = params
        self.epochs = epochs
        self.lr = lr
        self.explain_graph = explain_graph
        self.num_hops = getattr(model, "num_layers", 2)

        @jax.jit
        def _forward(params, g, edge_weight):
            return model.apply(params, g, edge_weight)

        self._forward = _forward

        @jax.jit
        def _forward_many(params, g, edge_weights):
            # one dispatch for a stack of edge weightings (vmapped over
            # the weight axis) — eval_related_pred otherwise pays a
            # host->device round trip per masked variant
            return jax.vmap(lambda w: model.apply(params, g, w))(
                edge_weights)

        self._forward_many = _forward_many
        # lazily-built jitted closures (one compile per explainer + batch
        # shape; a fresh jax.jit per explain() call re-traces every time)
        self._jit_cache = {}

    def _cached_jit(self, name, build, **jit_kw):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(build(), **jit_kw)
        return self._jit_cache[name]

    def predict_proba(self, g: GraphBatch, edge_weight=None):
        logits = self._forward(self.params, g, edge_weight)
        return jax.nn.softmax(logits, axis=-1)

    # -- mask utilities ---------------------------------------------------
    @staticmethod
    def control_sparsity(mask, sparsity: float = 0.7):
        """Top (1 - sparsity) edges -> +inf, rest -> -inf (reference
        metrics.py:19-57); sigmoid then yields a hard 0/1 weight."""
        mask = np.asarray(mask, np.float32)
        order = np.argsort(-mask)
        split = int((1 - sparsity) * len(mask))
        out = np.full_like(mask, -np.inf)
        out[order[:split]] = np.inf
        return out

    def eval_related_pred(self, g: GraphBatch, edge_masks: List[np.ndarray],
                          node_idx: Optional[int] = None,
                          domain: Optional[np.ndarray] = None) -> List[Dict]:
        """For each class's hard edge mask produce origin / masked /
        maskout / zero probabilities (base_explainer.py:259-302).

        ``domain`` (bool [E], optional) restricts the evaluation to a
        subgraph — edges outside it are absent from origin, masked AND
        maskout alike. This is the reference's node-task protocol: it
        extracts the k-hop subgraph around the explained node first
        (base_explainer.py:82-106), so only neighborhood edges are ever
        explanation candidates."""
        results = []
        E = g.num_edges
        row = 0 if node_idx is None else node_idx
        # one stacked dispatch: [n_masks * 4, E] edge weightings
        ms = [jax.nn.sigmoid(jnp.asarray(m, jnp.float32))
              for m in edge_masks]
        weights = jnp.stack(
            [jnp.ones(E)] + [w for m in ms for w in (m, 1.0 - m)]
            + [jnp.zeros(E)])
        if domain is not None:
            weights = weights * jnp.asarray(domain, jnp.float32)[None, :]
        probs = np.asarray(jax.nn.softmax(
            self._forward_many(self.params, g, weights), axis=-1))
        ori, zero = probs[0], probs[-1]
        for ex_label, mask in enumerate(edge_masks):
            masked = probs[1 + 2 * ex_label]
            maskout = probs[2 + 2 * ex_label]
            mask_np = np.asarray(mask)
            if domain is not None:
                dom = np.asarray(domain, bool)
                finite_frac = (float(np.mean(mask_np[dom] > 0))
                               if dom.any() else 0.0)
            else:
                finite_frac = (float(np.mean(mask_np > 0))
                               if len(mask_np) else 0.0)
            results.append({
                "origin": float(ori[row, ex_label]),
                "masked": float(masked[row, ex_label]),
                "maskout": float(maskout[row, ex_label]),
                "zero": float(zero[row, ex_label]),
                "sparsity": 1.0 - finite_frac,
            })
        return results
