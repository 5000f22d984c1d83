"""SSL evaluation harnesses.

Parity with ``dig/sslgraph/evaluation/eval_graph.py:33-533`` and
``eval_node.py:29-312``:

* :class:`GraphUnsupervised` — pretrain, embed the whole dataset, then
  StratifiedKFold SVC (grid-searched C) / logistic regression on the frozen
  embeddings (eval_graph.py:105-152).
* :class:`GraphSemisupervised` — pretrain, then finetune encoder+classifier
  on a labeled fraction with k-fold (eval_graph.py:154-533).
* :class:`NodeUnsupervised` — node-level embeddings + logistic regression
  over provided masks (eval_node.py:29-145).

sklearn runs on host exactly as in the reference; embedding passes are
jitted.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets.graphs import GraphClsLoader
from ..graph import GraphBatch


@functools.lru_cache(maxsize=32)
def _embed_fwd(encoder):
    # one compile per encoder module (flax modules are hashable frozen
    # dataclasses) — a fresh jit per call re-traced every eval epoch
    @jax.jit
    def fwd(p, g):
        out = encoder.apply(p, g)
        zg = out[0] if isinstance(out, tuple) else out
        return zg, g.graph_mask

    return fwd


def _embed_dataset(encoder, params, loader) -> tuple:
    """Frozen-encoder embeddings for every real graph."""
    fwd = _embed_fwd(encoder)

    zs, ys = [], []
    for g in loader:
        zg, gm = fwd(params, g)
        gm = np.asarray(gm)
        zs.append(np.asarray(zg)[gm])
        ys.append(np.asarray(g.globals["y"])[gm])
    return np.concatenate(zs), np.concatenate(ys).astype(int).ravel()


class GraphUnsupervised:
    """Pretrain -> frozen embeddings -> k-fold SVC, as eval_graph.py:33-152.

    Args:
      dataset: list of graph dicts (see GraphClsLoader).
      classifier: 'SVC' or 'LogReg'.
      epoch_select: 'test_max' (best epoch by test acc, reference default)
        or 'val_max'.
    """

    def __init__(self, dataset: Sequence[Dict], classifier: str = "SVC",
                 log_interval: int = 1, epoch_select: str = "test_max",
                 n_folds: int = 10, batch_size: int = 128, seed: int = 42):
        self.dataset = list(dataset)
        self.classifier = classifier
        self.log_interval = log_interval
        self.epoch_select = epoch_select
        self.n_folds = n_folds
        self.batch_size = batch_size
        self.seed = seed
        self.search = True

    def setup_train_config(self, batch_size: int = 128,
                           p_lr: float = 0.01, p_epoch: int = 20, **kw):
        self.batch_size = batch_size
        self.p_lr = p_lr
        self.p_epoch = p_epoch

    def evaluate(self, learning_model, encoder, fold_seed: Optional[int] = None):
        """Returns (mean_acc, std_acc) over folds at the best epoch."""
        loader = GraphClsLoader(self.dataset, self.batch_size, shuffle=True,
                                seed=self.seed)
        eval_loader = GraphClsLoader(self.dataset, self.batch_size)
        p_epoch = getattr(self, "p_epoch", 20)
        p_lr = getattr(self, "p_lr", 0.01)
        accs = []
        for res in learning_model.train(encoder, loader,
                                        optax.adam(p_lr), p_epoch,
                                        per_epoch_out=True):
            z, y = _embed_dataset(encoder, res["encoder_params"][0],
                                  eval_loader)
            acc_m, acc_std = self._kfold_probe(z, y, fold_seed or self.seed)
            accs.append((acc_m, acc_std))
        best = max(range(len(accs)), key=lambda i: accs[i][0])
        return accs[best]

    def _kfold_probe(self, z, y, fold_seed):
        from sklearn.model_selection import StratifiedKFold, GridSearchCV
        from sklearn.svm import SVC
        from sklearn.linear_model import LogisticRegression
        from sklearn.preprocessing import StandardScaler

        skf = StratifiedKFold(n_splits=self.n_folds, shuffle=True,
                              random_state=fold_seed)
        accs = []
        for tr, te in skf.split(z, y):
            sc = StandardScaler().fit(z[tr])
            ztr, zte = sc.transform(z[tr]), sc.transform(z[te])
            if self.classifier == "SVC":
                params = {"C": [1e-3, 1e-2, 1e-1, 1, 10, 100, 1000]}
                clf = GridSearchCV(SVC(), params, cv=5, scoring="accuracy",
                                   n_jobs=-1) if self.search else SVC(C=10)
            else:
                clf = LogisticRegression(max_iter=1000)
            clf.fit(ztr, y[tr])
            accs.append(clf.score(zte, y[te]))
        return float(np.mean(accs)), float(np.std(accs))


class GraphSemisupervised:
    """Pretrain then finetune on a labeled fraction with k-fold
    (eval_graph.py:154-533)."""

    def __init__(self, dataset: Sequence[Dict],
                 dataset_pretrain: Optional[Sequence[Dict]] = None,
                 label_rate: float = 1.0, n_folds: int = 10,
                 batch_size: int = 128, seed: int = 42):
        self.dataset = list(dataset)
        self.dataset_pretrain = (list(dataset_pretrain)
                                 if dataset_pretrain is not None
                                 else self.dataset)
        self.label_rate = label_rate
        self.n_folds = n_folds
        self.batch_size = batch_size
        self.seed = seed
        self.p_epoch = 20
        self.f_epoch = 20
        self.p_lr = 0.01
        self.f_lr = 0.001

    def setup_train_config(self, batch_size: int = 128, p_lr: float = 0.01,
                           p_epoch: int = 20, f_lr: float = 0.001,
                           f_epoch: int = 20, **kw):
        self.batch_size = batch_size
        self.p_lr, self.p_epoch = p_lr, p_epoch
        self.f_lr, self.f_epoch = f_lr, f_epoch

    def evaluate(self, learning_model, encoder,
                 fold_seed: Optional[int] = None):
        import flax.linen as nn
        from sklearn.model_selection import StratifiedKFold

        pre_loader = GraphClsLoader(self.dataset_pretrain, self.batch_size,
                                    shuffle=True, seed=self.seed)
        res = list(learning_model.train(encoder, pre_loader,
                                        optax.adam(self.p_lr), self.p_epoch,
                                        per_epoch_out=False))[-1]
        pre_params = res["encoder_params"][0]

        y_all = np.array([g["y"] for g in self.dataset])
        num_classes = int(y_all.max()) + 1
        z_dim = encoder.hidden_dim * encoder.n_layers \
            if encoder.gnn != "resgcn" else encoder.hidden_dim
        head = nn.Dense(num_classes)

        skf = StratifiedKFold(n_splits=self.n_folds, shuffle=True,
                              random_state=fold_seed or self.seed)
        rng = np.random.default_rng(self.seed)
        accs = []
        for tr, te in skf.split(np.zeros(len(y_all)), y_all):
            if self.label_rate < 1.0:
                keep = rng.permutation(len(tr))[:int(len(tr) * self.label_rate)]
                tr = tr[keep]
            acc = self._finetune(encoder, head, pre_params,
                                 [self.dataset[i] for i in tr],
                                 [self.dataset[i] for i in te], num_classes)
            accs.append(acc)
        return float(np.mean(accs)), float(np.std(accs))

    def _finetune(self, encoder, head, pre_params, train_set, test_set,
                  num_classes):
        tr_loader = GraphClsLoader(train_set, min(self.batch_size,
                                                  max(len(train_set), 1)),
                                   shuffle=True, seed=self.seed,
                                   drop_last=False)
        te_loader = GraphClsLoader(test_set, min(self.batch_size,
                                                 max(len(test_set), 1)))
        g0 = next(iter(tr_loader))
        zg0 = encoder.apply(pre_params, g0)
        zg0 = zg0[0] if isinstance(zg0, tuple) else zg0
        head_params = head.init(jax.random.PRNGKey(0), zg0)
        params = {"enc": pre_params, "head": head_params}
        opt = optax.adam(self.f_lr)
        opt_state = opt.init(params)

        def loss_fn(p, g):
            zg = encoder.apply(p["enc"], g)
            zg = zg[0] if isinstance(zg, tuple) else zg
            logits = head.apply(p["head"], zg)
            y = g.globals["y"].astype(jnp.int32).ravel()
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            m = g.graph_mask
            return jnp.sum(jnp.where(m, ls, 0.0)) / jnp.maximum(jnp.sum(m), 1)

        @jax.jit
        def step(p, os_, g):
            l, grads = jax.value_and_grad(loss_fn)(p, g)
            up, os_ = opt.update(grads, os_, p)
            return optax.apply_updates(p, up), os_, l

        @jax.jit
        def predict(p, g):
            zg = encoder.apply(p["enc"], g)
            zg = zg[0] if isinstance(zg, tuple) else zg
            return jnp.argmax(head.apply(p["head"], zg), -1), g.graph_mask

        for _ in range(self.f_epoch):
            for g in tr_loader:
                params, opt_state, _ = step(params, opt_state, g)
        correct = total = 0
        for g in te_loader:
            pred, gm = predict(params, g)
            gm = np.asarray(gm)
            y = np.asarray(g.globals["y"]).astype(int).ravel()
            correct += int(np.sum((np.asarray(pred) == y) & gm))
            total += int(np.sum(gm))
        return correct / max(total, 1)


class NodeUnsupervised:
    """Node-level probe: pretrain on the full graph, logistic-regress node
    labels over provided split masks (eval_node.py:29-145)."""

    def __init__(self, full_batch: GraphBatch, y: np.ndarray,
                 train_mask: np.ndarray, test_mask: np.ndarray,
                 val_mask: Optional[np.ndarray] = None, seed: int = 42):
        self.g = full_batch
        self.y = np.asarray(y).astype(int)
        self.train_mask = np.asarray(train_mask)
        self.test_mask = np.asarray(test_mask)
        self.val_mask = val_mask
        self.seed = seed
        self.p_epoch = 50
        self.p_lr = 0.001

    def setup_train_config(self, p_lr: float = 0.001, p_epoch: int = 50,
                           **kw):
        self.p_lr, self.p_epoch = p_lr, p_epoch

    def evaluate(self, learning_model, encoder):
        from sklearn.linear_model import LogisticRegression
        from sklearn.preprocessing import StandardScaler

        loader = [self.g]
        res = list(learning_model.train(encoder, loader,
                                        optax.adam(self.p_lr), self.p_epoch,
                                        per_epoch_out=False))[-1]

        out = encoder.apply(res["encoder_params"][0], self.g)
        z_n = out[1] if isinstance(out, tuple) else out
        z_n = np.asarray(z_n)
        sc = StandardScaler().fit(z_n[self.train_mask])
        clf = LogisticRegression(max_iter=2000)
        clf.fit(sc.transform(z_n[self.train_mask]), self.y[self.train_mask])
        return float(clf.score(sc.transform(z_n[self.test_mask]),
                               self.y[self.test_mask]))
