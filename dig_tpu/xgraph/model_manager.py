"""Model loading/config helpers for the xgraph benchmark pipeline.

Parity with ``dig/xgraph/models/model_manager.py:48`` (``load_model`` /
``config_model``): build a zoo model from a config dict, optionally restore
a trained checkpoint, and a trainer to produce checkpoints for the
benchmark (role of ``benchmarks/xgraph/train_gnns.py``)."""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets.graphs import GraphClsLoader
from .models import GCN_2l, GCN_3l, GIN_2l, GIN_3l

_ZOO = {"GCN_2l": GCN_2l, "GCN_3l": GCN_3l, "GIN_2l": GIN_2l,
        "GIN_3l": GIN_3l}


def load_model(name: str, model_level: str = "graph", dim_hidden: int = 64,
               num_classes: int = 2, **kw):
    if name not in _ZOO:
        raise ValueError(f"unknown model {name}; choose from {list(_ZOO)}")
    return _ZOO[name](model_level=model_level, dim_hidden=dim_hidden,
                      num_classes=num_classes, **kw)


def config_model(cfg: Dict):
    """Build from a config dict (keys: name, model_level, dim_hidden,
    num_classes), mirroring the hydra model YAMLs."""
    return load_model(cfg.get("name", "GCN_2l"),
                      cfg.get("model_level", "graph"),
                      cfg.get("dim_hidden", 64),
                      cfg.get("num_classes", 2))


def train_gnn(model, dataset: Sequence[Dict], epochs: int = 30,
              batch_size: int = 32, lr: float = 5e-3, seed: int = 0,
              save_dir: Optional[str] = None, restarts: int = 3,
              target_acc: float = 0.95):
    """Train a zoo model for explanation benchmarks
    (benchmarks/xgraph/train_gnns.py). Returns (params, train_acc).

    ``restarts``: constant-feature motif tasks are init-sensitive (the
    same seed lands in different basins under different matmul precision
    settings); retry with fresh seeds until ``target_acc``, keep best."""
    best = None
    for r in range(max(restarts, 1)):
        out = _train_gnn_once(model, dataset, epochs, batch_size, lr,
                              seed + 1000 * r, save_dir)
        if best is None or out[1] > best[1]:
            best = out
        if best[1] >= target_acc:
            break
    return best


def _train_gnn_once(model, dataset, epochs, batch_size, lr, seed,
                    save_dir):
    loader = GraphClsLoader(dataset, batch_size, shuffle=True, seed=seed)
    g0 = next(iter(loader))
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), g0)
    # cosine decay to 0: constant-feature motif tasks (ba_2motifs/ba_lrp)
    # plateau around 0.8 under flat lr but reach 1.0 train acc with a
    # schedule (measured: loss 0.36 @ 800 steps -> 0.004 @ 1600)
    opt = optax.adam(optax.cosine_decay_schedule(
        lr, max(epochs * max(len(loader), 1), 1)))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, g):
        def loss_fn(p):
            logits = model.apply(p, g, None)
            y = g.globals["y"].astype(jnp.int32).ravel()
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            m = g.graph_mask
            return jnp.sum(jnp.where(m, ls, 0.0)) / jnp.maximum(
                jnp.sum(m), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        for g in loader:
            params, opt_state, _ = step(params, opt_state, g)

    @jax.jit
    def predict(params, g):
        return jnp.argmax(model.apply(params, g, None), -1), g.graph_mask

    correct = total = 0
    for g in GraphClsLoader(dataset, batch_size):
        pred, gm = predict(params, g)
        gm = np.asarray(gm)
        y = np.asarray(g.globals["y"]).astype(int).ravel()
        correct += int(np.sum((np.asarray(pred) == y) & gm))
        total += int(np.sum(gm))
    acc = correct / max(total, 1)

    if save_dir:
        import pickle
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "gnn_params.pkl"), "wb") as f:
            pickle.dump(jax.device_get(params), f)
    return params, acc


def train_gnn_node(model, data: Dict, epochs: int = 300, lr: float = 1e-2,
                   seed: int = 0, weight_decay: float = 0.0,
                   restarts: int = 3, target_acc: float = 0.95):
    best = None
    for r in range(max(restarts, 1)):
        out = _train_gnn_node_once(model, data, epochs, lr,
                                   seed + 1000 * r, weight_decay)
        if best is None or out[1] > best[1]:
            best = out
        if best[1] >= target_acc:
            break
    return best


def _train_gnn_node_once(model, data: Dict, epochs: int, lr: float,
                         seed: int, weight_decay: float):
    """Train a node-level zoo model on one planted-motif graph
    (ba_shapes / tree_cycle / tree_grid — reference
    benchmarks/xgraph/train_gnns.py node configs). Full-batch Adam with
    class-balanced cross-entropy (the base class dominates ~4:1; without
    balancing the model collapses to it). Returns (params, train_acc)."""
    from .datasets import node_task_batch

    g = node_task_batch(data)
    y = jnp.asarray(np.asarray(data["y"]), jnp.int32)
    n_cls = int(y.max()) + 1
    counts = np.bincount(np.asarray(data["y"]), minlength=n_cls)
    w = jnp.asarray((len(y) / np.maximum(counts, 1))[np.asarray(data["y"])],
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), g)
    sched = optax.cosine_decay_schedule(lr, max(epochs, 1))
    opt = (optax.adamw(sched, weight_decay=weight_decay) if weight_decay
           else optax.adam(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, g, None)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * w) / jnp.sum(w)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        params, opt_state, _ = step(params, opt_state)

    logits = jax.jit(lambda p: model.apply(p, g, None))(params)
    acc = float(np.mean(np.asarray(jnp.argmax(logits, -1)) ==
                        np.asarray(y)))
    return params, acc
