"""PGExplainer — parameterized edge-mask predictor.

Parity with ``dig/xgraph/method/pgexplainer.py``: an MLP scores each edge
from concatenated endpoint embeddings (+ target-node embedding for node
tasks), trained over a dataset with the concrete-distribution
reparameterization and temperature annealing to match the model's own
predictions under masking (train phase :300-420, explain :548).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph import GraphBatch
from .base import ExplainerBase

xavier = jax.nn.initializers.glorot_uniform()


class _EdgeMLP(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, feats):
        h = jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(feats))
        return nn.Dense(1, kernel_init=xavier)(h)[..., 0]


class PGExplainer(ExplainerBase):

    def __init__(self, model, params, epochs: int = 20, lr: float = 3e-3,
                 coff_size: float = 0.01, coff_ent: float = 5e-4,
                 t0: float = 5.0, t1: float = 1.0,
                 explain_graph: bool = True, hidden: int = 64):
        super().__init__(model, params, epochs, lr, explain_graph)
        self.coff_size = coff_size
        self.coff_ent = coff_ent
        self.t0, self.t1 = t0, t1
        self.mlp = _EdgeMLP(hidden)
        self.mlp_params = None

    def _edge_feats(self, g: GraphBatch, node_idx: Optional[int] = None):
        _, acts = self.model.apply(self.params, g, None,
                                   return_activations=True)
        z = acts[-1]
        feats = jnp.concatenate([z[g.senders], z[g.receivers]], axis=-1)
        if node_idx is not None:
            t = jnp.broadcast_to(z[node_idx][None, :],
                                 (g.num_edges, z.shape[-1]))
            feats = jnp.concatenate([feats, t], axis=-1)
        return feats

    def train_explanation_network(self, graphs: Sequence[GraphBatch],
                                  seed: int = 0, verbose: bool = False):
        """Train the edge scorer over a list of (single-graph) batches."""
        g0 = graphs[0]
        feats0 = self._edge_feats(g0)
        key = jax.random.PRNGKey(seed)
        self.mlp_params = self.mlp.init(key, feats0)
        opt = optax.adam(self.lr)
        opt_state = opt.init(self.mlp_params)
        model, params, mlp = self.model, self.params, self.mlp
        coff_size, coff_ent = self.coff_size, self.coff_ent

        @jax.jit
        def step(mlp_params, opt_state, g, feats, temp, key):
            probs_ori = jax.nn.softmax(model.apply(params, g, None), -1)
            target = jnp.argmax(probs_ori, -1)

            def loss_fn(mp):
                logits = mlp.apply(mp, feats)
                u = jax.random.uniform(key, logits.shape, minval=1e-6,
                                       maxval=1 - 1e-6)
                gumbel = jnp.log(u) - jnp.log(1 - u)
                ew = jax.nn.sigmoid((logits + gumbel) / temp)
                ew = jnp.where(g.edge_mask, ew, 0.0)
                out = model.apply(params, g, ew)
                logp = jax.nn.log_softmax(out, -1)
                ce = -jnp.take_along_axis(logp, target[:, None], 1)[:, 0]
                ce = jnp.sum(jnp.where(g.graph_mask, ce, 0.0)) / jnp.maximum(
                    jnp.sum(g.graph_mask), 1)
                size = jnp.sum(jnp.where(g.edge_mask, ew, 0.0))
                m = jnp.clip(ew, 1e-6, 1 - 1e-6)
                ent = -m * jnp.log(m) - (1 - m) * jnp.log(1 - m)
                ent = jnp.sum(jnp.where(g.edge_mask, ent, 0.0))
                return ce + coff_size * size + coff_ent * ent

            loss, grads = jax.value_and_grad(loss_fn)(mlp_params)
            updates, opt_state = opt.update(grads, opt_state, mlp_params)
            return optax.apply_updates(mlp_params, updates), opt_state, loss

        feats_all = [self._edge_feats(g) for g in graphs]
        for epoch in range(self.epochs):
            temp = self.t0 * (self.t1 / self.t0) ** (epoch / self.epochs)
            losses = []
            for g, feats in zip(graphs, feats_all):
                key, sk = jax.random.split(key)
                self.mlp_params, opt_state, loss = step(
                    self.mlp_params, opt_state, g, feats,
                    jnp.asarray(temp), sk)
                losses.append(float(loss))
            if verbose:
                print(f"PGExplainer epoch {epoch}: {np.mean(losses):.4f}")

    def explain(self, g: GraphBatch, node_idx: Optional[int] = None
                ) -> np.ndarray:
        assert self.mlp_params is not None, "train_explanation_network first"
        feats = self._edge_feats(g, node_idx if not self.explain_graph
                                 else None)
        logits = self.mlp.apply(self.mlp_params, feats)
        return np.where(np.asarray(g.edge_mask), np.asarray(logits),
                        -np.inf)

    def __call__(self, g: GraphBatch, num_classes: int = 2,
                 sparsity: float = 0.7, node_idx: Optional[int] = None):
        em = self.explain(g, node_idx)
        masks = [self.control_sparsity(em, sparsity)] * num_classes
        related = self.eval_related_pred(g, masks, node_idx=node_idx)
        return masks, related
