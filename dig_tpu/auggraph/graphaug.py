"""GraphAug: learned label-invariant augmentation.

Parity with ``dig/auggraph/method/GraphAug/{aug/augmenter.py:15-97,
model/gmnet.py,runner_reward_gen.py,runner_generator.py:15-171,
runner_aug_cls.py}``:

* ``Augmenter`` — per step, an encoder summarizes the graph and a policy
  head picks an augmentation category (NodeDrop / NodeFM / EdgePer) and a
  per-element keep/drop Bernoulli (straight-through), applied as mask
  transforms on the GraphBatch.
* ``RewardGMNet`` — graph matching network scoring whether an augmented
  graph preserved the original's label (trained on same/different-label
  pairs).
* Runners — compact drivers for the three training phases.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets.graphs import GraphClsLoader
from ..graph import GraphBatch
from ..ops import segment_mean, segment_sum
from ..ssl.encoders import GINConv

xavier = jax.nn.initializers.glorot_uniform()

AUG_TYPES = ("node_drop", "node_fm", "edge_per")


def _bernoulli_st(key, probs):
    u = jax.random.uniform(key, probs.shape)
    hard = (u < probs).astype(jnp.float32)
    return probs + jax.lax.stop_gradient(hard - probs)


class _GIN(nn.Module):
    hidden: int = 64
    layers: int = 2

    @nn.compact
    def __call__(self, g: GraphBatch, x=None):
        x = g.nodes["x"] if x is None else x
        for _ in range(self.layers):
            x = jax.nn.relu(GINConv(self.hidden)(x, g))
            x = jnp.where(g.node_mask[:, None], x, 0.0)
        zg = segment_sum(x, g.node_graph, g.num_graphs, mask=g.node_mask)
        return zg, x


class Augmenter(nn.Module):
    """Sequential augmentation policy (augmenter.py:15-97)."""

    hidden: int = 64
    max_steps: int = 2
    magnitude: float = 0.15

    @nn.compact
    def __call__(self, key, g: GraphBatch):
        """Returns (augmented batch, log-prob of the taken actions)."""
        logp_total = 0.0
        for step in range(self.max_steps):
            key, k_cat, k_node, k_edge, k_feat = jax.random.split(key, 5)
            zg, zn = _GIN(self.hidden)(g)
            cat_logits = nn.Dense(len(AUG_TYPES), kernel_init=xavier)(zg)
            cat_probs = jax.nn.softmax(cat_logits, -1)    # [G, 3]
            # per-node / per-edge keep probabilities from the policy
            node_keep_p = jax.nn.sigmoid(
                nn.Dense(1, kernel_init=xavier)(zn))[:, 0]
            node_keep_p = 1.0 - self.magnitude * (1 - node_keep_p)
            edge_feat = zn[g.senders] + zn[g.receivers]
            edge_keep_p = jax.nn.sigmoid(
                nn.Dense(1, kernel_init=xavier)(edge_feat))[:, 0]
            edge_keep_p = 1.0 - self.magnitude * (1 - edge_keep_p)

            # straight-through choice of category per graph
            u = jax.random.uniform(k_cat, cat_logits.shape, minval=1e-6,
                                   maxval=1 - 1e-6)
            gumbel = -jnp.log(-jnp.log(u))
            cat = jnp.argmax(cat_logits + gumbel, axis=-1)   # [G]
            cat_n = cat[g.node_graph]
            cat_e = cat[g.node_graph[g.senders]]

            keep_n = _bernoulli_st(k_node, node_keep_p)
            keep_e = _bernoulli_st(k_edge, edge_keep_p)

            # apply selected transform per graph
            node_mask = g.node_mask & ((cat_n != 0) | (keep_n > 0.5))
            edge_ok = (keep_e > 0.5) | (cat_e != 2)
            edge_mask = (g.edge_mask & edge_ok
                         & node_mask[g.senders] & node_mask[g.receivers])
            fm_sel = (cat_n == 1) & (keep_n < 0.5) & g.node_mask
            noise = jax.random.normal(k_feat, g.nodes["x"].shape) * 0.5
            x = jnp.where(fm_sel[:, None], noise, g.nodes["x"])
            g = g.replace(nodes={**g.nodes, "x": x},
                          node_mask=node_mask, edge_mask=edge_mask)
            logp_total = logp_total + jnp.mean(
                jnp.log(jnp.take_along_axis(cat_probs, cat[:, None],
                                            1)[:, 0] + 1e-12))
        return g, logp_total


class RewardGMNet(nn.Module):
    """Graph matching reward model (gmnet/genet): siamese GIN + cross-graph
    attention -> match probability."""

    hidden: int = 64

    @nn.compact
    def __call__(self, g1: GraphBatch, g2: GraphBatch):
        enc = _GIN(self.hidden)
        zg1, zn1 = enc(g1)
        zg2, zn2 = enc(g2)
        # cross attention between node sets of paired graphs
        sim = zn1 @ zn2.T                                   # [N1, N2]
        pair = (g1.node_graph[:, None] == g2.node_graph[None, :])
        pair &= g1.node_mask[:, None] & g2.node_mask[None, :]
        att12 = jax.nn.softmax(jnp.where(pair, sim, -1e30), axis=1)
        att12 = jnp.where(pair, att12, 0.0)
        match1 = att12 @ zn2                                # [N1, h]
        cross1 = segment_sum(zn1 * match1, g1.node_graph, g1.num_graphs,
                             mask=g1.node_mask)
        feats = jnp.concatenate([zg1, zg2, jnp.abs(zg1 - zg2), cross1], -1)
        h = jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(feats))
        return nn.Dense(1, kernel_init=xavier)(h)[:, 0]


class RunnerRewardGen:
    """Train the reward model on same-label vs different-label pairs
    (runner_reward_gen.py)."""

    def __init__(self, hidden: int = 64):
        self.model = RewardGMNet(hidden)
        self.params = None

    def train(self, dataset: Sequence[Dict], batch_size: int = 16,
              epochs: int = 5, lr: float = 1e-3, seed: int = 0,
              verbose: bool = False):
        rng = np.random.default_rng(seed)
        by_label: Dict[int, List[int]] = {}
        for i, g in enumerate(dataset):
            by_label.setdefault(int(g["y"]), []).append(i)
        labels = list(by_label)

        def sample_pairs(n):
            g1s, g2s, ys = [], [], []
            for _ in range(n):
                same = rng.random() < 0.5
                la = labels[rng.integers(len(labels))]
                i = rng.choice(by_label[la])
                if same or len(labels) == 1:
                    j = rng.choice(by_label[la])
                    ys.append(1.0)
                else:
                    lb = labels[rng.integers(len(labels))]
                    while lb == la and len(labels) > 1:
                        lb = labels[rng.integers(len(labels))]
                    j = rng.choice(by_label[lb])
                    ys.append(float(lb == la))
                g1s.append(dataset[i])
                g2s.append(dataset[j])
            l1 = GraphClsLoader(g1s, n)
            l2 = GraphClsLoader(g2s, n)
            return next(iter(l1)), next(iter(l2)), np.asarray(ys, np.float32)

        g1, g2, y = sample_pairs(batch_size)
        params = self.model.init(jax.random.PRNGKey(seed), g1, g2)
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        model = self.model

        @jax.jit
        def step(params, opt_state, g1, g2, y):
            def loss_fn(p):
                logits = model.apply(p, g1, g2)
                ls = optax.sigmoid_binary_cross_entropy(logits, y)
                m = g1.graph_mask
                return jnp.sum(jnp.where(m, ls, 0.0)) / jnp.maximum(
                    jnp.sum(m), 1)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for ep in range(epochs):
            losses = []
            for _ in range(max(len(dataset) // batch_size, 1)):
                g1, g2, y = sample_pairs(batch_size)
                params, opt_state, loss = step(params, opt_state, g1, g2,
                                               jnp.asarray(y))
                losses.append(float(loss))
            if verbose:
                print(f"reward-gen epoch {ep}: {np.mean(losses):.4f}")
        self.params = params
        return params


class RunnerGenerator:
    """Train the augmenter to maximize reward-model label-invariance
    (runner_generator.py:15-171)."""

    def __init__(self, hidden: int = 64, max_steps: int = 2,
                 magnitude: float = 0.15):
        self.augmenter = Augmenter(hidden, max_steps, magnitude)
        self.params = None

    def train(self, dataset: Sequence[Dict], reward_model: RewardGMNet,
              reward_params, batch_size: int = 16, epochs: int = 5,
              lr: float = 1e-3, seed: int = 0, verbose: bool = False):
        loader = GraphClsLoader(dataset, batch_size, shuffle=True,
                                seed=seed)
        key = jax.random.PRNGKey(seed)
        g0 = next(iter(loader))
        key, k0 = jax.random.split(key)
        params = self.augmenter.init(k0, k0, g0)
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        aug = self.augmenter

        @jax.jit
        def step(params, opt_state, g, k):
            def loss_fn(p):
                g_aug, logp = aug.apply(p, k, g)
                score = reward_model.apply(reward_params, g, g_aug)
                reward = jax.nn.sigmoid(score)
                m = g.graph_mask
                r = jnp.sum(jnp.where(m, reward, 0.0)) / jnp.maximum(
                    jnp.sum(m), 1)
                # maximize reward; ST paths carry gradients, plus a
                # REINFORCE term on the category log-prob
                return -(r + jax.lax.stop_gradient(r) * logp)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for ep in range(epochs):
            losses = []
            for g in loader:
                key, k = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, g, k)
                losses.append(float(loss))
            if verbose:
                print(f"generator epoch {ep}: {np.mean(losses):.4f}")
        self.params = params
        return params


class RunnerAugCls:
    """Train a classifier with learned augmentations
    (runner_aug_cls.py)."""

    def __init__(self, num_classes: int, hidden: int = 64):
        from ..ssl.encoders import Encoder
        self.encoder = None
        self.hidden = hidden
        self.num_classes = num_classes
        self.params = None

    def train(self, dataset: Sequence[Dict], augmenter: Augmenter,
              aug_params, batch_size: int = 16, epochs: int = 10,
              lr: float = 1e-3, seed: int = 0, verbose: bool = False):
        import flax.linen as nn2
        feat_dim = dataset[0]["x"].shape[1]

        class Cls(nn2.Module):
            hidden: int
            num_classes: int

            @nn2.compact
            def __call__(self, g):
                zg, _ = _GIN(self.hidden)(g)
                return nn2.Dense(self.num_classes, kernel_init=xavier)(zg)

        model = Cls(self.hidden, self.num_classes)
        loader = GraphClsLoader(dataset, batch_size, shuffle=True,
                                seed=seed)
        key = jax.random.PRNGKey(seed)
        g0 = next(iter(loader))
        params = model.init(key, g0)
        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, g, k):
            g_aug, _ = augmenter.apply(aug_params, k, g)

            def loss_fn(p):
                logits = model.apply(p, g_aug)
                y = g.globals["y"].astype(jnp.int32).ravel()
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                m = g.graph_mask
                return jnp.sum(jnp.where(m, ls, 0.0)) / jnp.maximum(
                    jnp.sum(m), 1)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def predict(params, g):
            return jnp.argmax(model.apply(params, g), -1), g.graph_mask

        for ep in range(epochs):
            for g in loader:
                key, k = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, g, k)
        self.params = params
        self.model = model

        correct = total = 0
        for g in GraphClsLoader(dataset, batch_size):
            pred, gm = predict(params, g)
            gm = np.asarray(gm)
            y = np.asarray(g.globals["y"]).astype(int).ravel()
            correct += int(np.sum((np.asarray(pred) == y) & gm))
            total += int(np.sum(gm))
        return correct / max(total, 1)
