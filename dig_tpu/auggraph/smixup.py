"""SMixup: structure-aware graph mixup via soft matching.

Parity with ``dig/auggraph/method/SMixup/{smixup.py:25-303,GMNET.py,
utils/sinkhorn.py}``: a graph-matching network produces node-alignment
scores between pairs of graphs, Sinkhorn normalization turns them into a
soft transport plan, and mixed graphs interpolate aligned node features
(and adjacency) with a Beta-distributed lambda; a GIN classifier trains on
mixed labels.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets.graphs import GraphClsLoader
from ..graph import GraphBatch
from ..ops import segment_sum
from .graphaug import _GIN, xavier


def sinkhorn(scores, n_iters: int = 10, mask=None):
    """Sinkhorn normalization to a doubly-stochastic plan
    (reference utils/sinkhorn.py:1-212, log-domain)."""
    log_p = scores
    if mask is not None:
        log_p = jnp.where(mask, log_p, -1e30)
    for _ in range(n_iters):
        log_p = log_p - jax.nn.logsumexp(log_p, axis=1, keepdims=True)
        if mask is not None:
            log_p = jnp.where(mask, log_p, -1e30)
        log_p = log_p - jax.nn.logsumexp(log_p, axis=0, keepdims=True)
        if mask is not None:
            log_p = jnp.where(mask, log_p, -1e30)
    p = jnp.exp(log_p)
    return jnp.where(mask, p, 0.0) if mask is not None else p


class MatchNet(nn.Module):
    """GMNET (reference GMNET.py): produces node-pair alignment scores."""

    hidden: int = 64

    @nn.compact
    def __call__(self, g1: GraphBatch, g2: GraphBatch):
        enc = _GIN(self.hidden)
        _, zn1 = enc(g1)
        _, zn2 = enc(g2)
        return zn1 @ zn2.T  # [N1, N2]


class SMixup:
    """Method driver (smixup.py:25-303)."""

    def __init__(self, num_classes: int, hidden: int = 64,
                 alpha: float = 1.0, sinkhorn_iters: int = 8):
        self.num_classes = num_classes
        self.hidden = hidden
        self.alpha = alpha
        self.sinkhorn_iters = sinkhorn_iters
        self.matcher = MatchNet(hidden)

        class Cls(nn.Module):
            hidden: int
            num_classes: int

            @nn.compact
            def __call__(self, g, x=None):
                zg, _ = _GIN(self.hidden)(g, x)
                return nn.Dense(self.num_classes, kernel_init=xavier)(zg)

        self.cls = Cls(hidden, num_classes)
        self.params = None

    def train(self, dataset: Sequence[Dict], batch_size: int = 16,
              epochs: int = 10, lr: float = 1e-3, seed: int = 0,
              verbose: bool = False):
        loader = GraphClsLoader(dataset, batch_size, shuffle=True,
                                seed=seed)
        loader2 = GraphClsLoader(dataset, batch_size, shuffle=True,
                                 seed=seed + 99)
        key = jax.random.PRNGKey(seed)
        g0 = next(iter(loader))
        k1, k2, key = jax.random.split(key, 3)
        p_match = self.matcher.init(k1, g0, g0)
        p_cls = self.cls.init(k2, g0)
        params = {"match": p_match, "cls": p_cls}
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        matcher, cls_model = self.matcher, self.cls
        n_cls = self.num_classes
        sk_iters = self.sinkhorn_iters

        @jax.jit
        def step(params, opt_state, g1, g2, lam):
            def loss_fn(p):
                scores = matcher.apply(p["match"], g1, g2)
                pair = (g1.node_graph[:, None] == g2.node_graph[None, :])
                pair &= g1.node_mask[:, None] & g2.node_mask[None, :]
                plan = sinkhorn(scores, sk_iters, pair)
                # align g2's features onto g1's node set
                x2_aligned = plan @ g2.nodes["x"]
                x_mix = lam * g1.nodes["x"] + (1 - lam) * x2_aligned
                logits = cls_model.apply(p["cls"], g1, x_mix)
                y1 = jax.nn.one_hot(
                    g1.globals["y"].astype(jnp.int32).ravel(), n_cls)
                y2 = jax.nn.one_hot(
                    g2.globals["y"].astype(jnp.int32).ravel(), n_cls)
                y_mix = lam * y1 + (1 - lam) * y2
                logp = jax.nn.log_softmax(logits, -1)
                ls = -jnp.sum(y_mix * logp, -1)
                m = g1.graph_mask
                return jnp.sum(jnp.where(m, ls, 0.0)) / jnp.maximum(
                    jnp.sum(m), 1)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(seed)
        for ep in range(epochs):
            losses = []
            for g1, g2 in zip(loader, loader2):
                lam = float(rng.beta(self.alpha, self.alpha))
                params, opt_state, loss = step(params, opt_state, g1, g2,
                                               lam)
                losses.append(float(loss))
            if verbose:
                print(f"smixup epoch {ep}: {np.mean(losses):.4f}")
        self.params = params
        return params

    def evaluate(self, dataset: Sequence[Dict],
                 batch_size: int = 16) -> float:
        assert self.params is not None

        @jax.jit
        def predict(p, g):
            return jnp.argmax(self.cls.apply(p["cls"], g), -1), g.graph_mask

        correct = total = 0
        for g in GraphClsLoader(dataset, batch_size):
            pred, gm = predict(self.params, g)
            gm = np.asarray(gm)
            y = np.asarray(g.globals["y"]).astype(int).ravel()
            correct += int(np.sum((np.asarray(pred) == y) & gm))
            total += int(np.sum(gm))
        return correct / max(total, 1)
