"""Graphair: automated fair augmentation + contrastive encoder + adversary.

Parity with ``dig/fairgraph/method/Graphair/{graphair.py:12-405,
aug_module.py,GCN.py,classifier.py}``:

* ``AugModule`` g — GCN body -> (edge-probability logits Z Z^T with
  straight-through relaxed-Bernoulli sampling; feature-mask logits).
* ``GCNBody`` f — dense-adjacency GCN encoder.
* ``SensAdv`` k — adversary predicting the sensitive attribute from the
  representation of the *augmented* graph.
* ``Graphair.fit_whole`` — warmup on reconstruction, alternating adversary
  maximization and (contrastive + reconstruction - alpha * adversary)
  minimization; ``test`` trains a logistic classifier on frozen embeddings
  and reports accuracy / DP / EO.

Dense [N, N] adjacency throughout — fair-graph benchmarks are a few
thousand nodes, so every conv is one MXU matmul.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

xavier = jax.nn.initializers.glorot_uniform()


def normalize_adj(adj):
    """A <- D^-1/2 (A + I) D^-1/2 (aug_module.py:46-51)."""
    n = adj.shape[0]
    adj = jnp.where(jnp.eye(n, dtype=bool), 1.0, adj)
    d = jnp.sum(adj, axis=1)
    dinv = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    return adj * dinv[:, None] * dinv[None, :]


class GCNBody(nn.Module):
    hidden: int = 64
    out: int = 64
    nlayer: int = 2

    @nn.compact
    def __call__(self, adj, x):
        h = x
        for i in range(self.nlayer - 1):
            h = jax.nn.relu(adj @ nn.Dense(self.hidden,
                                           kernel_init=xavier)(h))
        h = adj @ nn.Dense(self.out, kernel_init=xavier)(h)
        return h


def _relaxed_bernoulli_st(key, probs, temperature=1.0):
    """RelaxedBernoulliStraightThrough (aug_module.py:32): concrete sample
    forward-rounded to {0,1}, gradient through the relaxation."""
    u = jax.random.uniform(key, probs.shape, minval=1e-6, maxval=1 - 1e-6)
    logistic = jnp.log(u) - jnp.log(1 - u)
    logits = jnp.log(probs + 1e-12) - jnp.log1p(-probs + 1e-12)
    soft = jax.nn.sigmoid((logits + logistic) / temperature)
    hard = (soft > 0.5).astype(soft.dtype)
    return soft + jax.lax.stop_gradient(hard - soft)


class AugModule(nn.Module):
    feat_dim: int
    hidden: int = 64
    temperature: float = 1.0

    @nn.compact
    def __call__(self, adj, x, key, alpha: float = 0.5, adj_orig=None):
        h = GCNBody(self.hidden, self.hidden, nlayer=1)(adj, x)
        # edge logits via inner products of projected embeddings (GAE-style)
        z = nn.Dense(self.hidden, kernel_init=xavier)(
            jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(h)))
        adj_logits = z @ z.T
        edge_probs = jax.nn.sigmoid(adj_logits)
        if adj_orig is not None:
            edge_probs = alpha * edge_probs + (1 - alpha) * adj_orig
        k1, k2 = jax.random.split(key)
        a = _relaxed_bernoulli_st(k1, edge_probs, self.temperature)
        a = jnp.triu(a, 1)
        a = a + a.T
        a = normalize_adj(a)
        # feature masking
        mask_logits = nn.Dense(self.feat_dim, kernel_init=xavier)(
            jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(h)))
        mask = _relaxed_bernoulli_st(k2, jax.nn.sigmoid(mask_logits),
                                     self.temperature)
        x_new = x * mask
        return a, x_new, adj_logits


class SensAdv(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, h):
        z = jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(h))
        return nn.Dense(1, kernel_init=xavier)(z)[:, 0]


class Classifier(nn.Module):
    @nn.compact
    def __call__(self, h):
        return nn.Dense(1, kernel_init=xavier)(h)[:, 0]


class Projection(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, z):
        return nn.Dense(self.out, kernel_init=xavier)(
            jax.nn.elu(nn.Dense(self.hidden, kernel_init=xavier)(z)))


def _simclr_loss(feats, temperature: float = 0.07):
    """SimCLR InfoNCE over 2N stacked views (graphair.py:90-130)."""
    n2 = feats.shape[0]
    n = n2 // 2
    f = feats / jnp.maximum(
        jnp.sqrt(jnp.sum(feats * feats, -1, keepdims=True) + 1e-12), 1e-12)
    sim = f @ f.T / temperature
    eye = jnp.eye(n2, dtype=bool)
    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    pos = sim[jnp.arange(n2), pos_idx]
    denom = jnp.sum(jnp.where(eye, 0.0, jnp.exp(sim)), axis=1)
    return -jnp.mean(pos - jnp.log(jnp.maximum(denom, 1e-12)))


class Graphair:
    """Training driver (graphair.py:132-405)."""

    def __init__(self, feat_dim: int, num_hidden: int = 64,
                 num_proj_hidden: int = 64, alpha: float = 20.0,
                 beta: float = 0.9, gamma: float = 0.7, lam: float = 1.0,
                 lr: float = 1e-4, weight_decay: float = 1e-5,
                 temperature: float = 1.0):
        self.alpha, self.beta, self.gamma, self.lam = alpha, beta, gamma, lam
        self.aug = AugModule(feat_dim, num_hidden, temperature)
        self.enc = GCNBody(num_hidden, num_hidden, nlayer=2)
        self.adv = SensAdv(num_hidden)
        self.proj = Projection(num_proj_hidden, num_hidden)
        self.lr = lr
        self.wd = weight_decay
        self.params = None

    def fit_whole(self, epochs: int, adj: np.ndarray, x: np.ndarray,
                  sens: np.ndarray, idx_sens: np.ndarray,
                  warmup: int = 0, adv_epoches: int = 1, seed: int = 0,
                  verbose: bool = False):
        adj = jnp.asarray(adj, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
        sens = jnp.asarray(sens, jnp.float32)
        sens_mask = jnp.zeros(x.shape[0], bool).at[
            jnp.asarray(idx_sens)].set(True)
        adj_norm = normalize_adj(adj)
        key = jax.random.PRNGKey(seed)

        k1, k2, k3, k4, key = jax.random.split(key, 5)
        p_aug = self.aug.init(k1, adj_norm, x, k1)
        p_enc = self.enc.init(k2, adj_norm, x)
        h0 = self.enc.apply(p_enc, adj_norm, x)
        p_adv = self.adv.init(k3, h0)
        p_proj = self.proj.init(k4, h0)
        params = {"aug": p_aug, "enc": p_enc, "adv": p_adv, "proj": p_proj}

        opt_main = optax.adamw(self.lr, weight_decay=self.wd)
        opt_adv = optax.adamw(1e-4, weight_decay=1e-5)
        st_main = opt_main.init({"aug": p_aug, "enc": p_enc,
                                 "proj": p_proj})
        st_adv = opt_adv.init(p_adv)

        n = x.shape[0]
        pos_weight = (n * n - jnp.sum(adj)) / jnp.maximum(jnp.sum(adj), 1)
        norm_w = n * n / (2 * jnp.maximum((n * n - jnp.sum(adj)), 1))
        aug, enc, adv, proj = self.aug, self.enc, self.adv, self.proj
        alpha, beta, gamma, lam = (self.alpha, self.beta, self.gamma,
                                   self.lam)

        def recons_loss(p_aug, k):
            a_new, x_new, adj_logits = aug.apply(p_aug, adj_norm, x, k,
                                                 adj_orig=adj)
            w = jnp.where(adj > 0, pos_weight, 1.0)
            edge_loss = norm_w * jnp.mean(
                w * optax.sigmoid_binary_cross_entropy(adj_logits, adj))
            feat_loss = jnp.mean((x_new - x) ** 2)
            return edge_loss + lam * feat_loss, (a_new, x_new)

        @jax.jit
        def warm_step(p_aug, st, k):
            (loss, _), grads = jax.value_and_grad(
                lambda p: recons_loss(p, k), has_aux=True)(p_aug)
            updates, st = opt_main.update(
                {"aug": grads, "enc": jax.tree_util.tree_map(
                    jnp.zeros_like, params["enc"]),
                 "proj": jax.tree_util.tree_map(
                     jnp.zeros_like, params["proj"])},
                st, {"aug": p_aug, "enc": params["enc"],
                     "proj": params["proj"]})
            p_aug = optax.apply_updates(p_aug, updates["aug"])
            return p_aug, st, loss

        @jax.jit
        def adv_step(p_adv, st_adv, p_aug, p_enc, k):
            def loss_fn(pa):
                a_new, x_new, _ = aug.apply(p_aug, adj_norm, x, k,
                                            adj_orig=adj)
                h_prime = enc.apply(p_enc, a_new, x_new)
                s_pred = adv.apply(pa, h_prime)
                ls = optax.sigmoid_binary_cross_entropy(s_pred, sens)
                return jnp.sum(jnp.where(sens_mask, ls, 0.0)) / jnp.maximum(
                    jnp.sum(sens_mask), 1)
            loss, grads = jax.value_and_grad(loss_fn)(p_adv)
            updates, st_adv = opt_adv.update(grads, st_adv, p_adv)
            return optax.apply_updates(p_adv, updates), st_adv, loss

        @jax.jit
        def main_step(params, st_main, k):
            def loss_fn(pm):
                p_aug, p_enc, p_proj = pm["aug"], pm["enc"], pm["proj"]
                rl, (a_new, x_new) = recons_loss(p_aug, k)
                h = enc.apply(p_enc, adj_norm, x)
                h_prime = enc.apply(p_enc, a_new, x_new)
                zs = jnp.concatenate([proj.apply(p_proj, h),
                                      proj.apply(p_proj, h_prime)], 0)
                closs = _simclr_loss(zs)
                s_pred = adv.apply(params["adv"], h_prime)
                ls = optax.sigmoid_binary_cross_entropy(s_pred, sens)
                sloss = jnp.sum(jnp.where(sens_mask, ls, 0.0)) / jnp.maximum(
                    jnp.sum(sens_mask), 1)
                total = beta * closs + gamma * rl - alpha * sloss
                return total, (closs, rl, sloss)

            pm = {"aug": params["aug"], "enc": params["enc"],
                  "proj": params["proj"]}
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(pm)
            updates, st_main = opt_main.update(grads, st_main, pm)
            pm = optax.apply_updates(pm, updates)
            return pm, st_main, loss, aux

        for ep in range(warmup):
            key, k = jax.random.split(key)
            params["aug"], st_main, wl = warm_step(params["aug"], st_main, k)

        for ep in range(epochs):
            n_adv = adv_epoches * (10 if ep == 0 else 1)
            for _ in range(n_adv):
                key, k = jax.random.split(key)
                params["adv"], st_adv, sl = adv_step(
                    params["adv"], st_adv, params["aug"], params["enc"], k)
            key, k = jax.random.split(key)
            pm, st_main, loss, aux = main_step(params, st_main, k)
            params.update(pm)
            if verbose and ep % max(epochs // 5, 1) == 0:
                closs, rl, sloss = (float(a) for a in aux)
                print(f"epoch {ep}: total {float(loss):.4f} "
                      f"cont {closs:.4f} recons {rl:.4f} sens {sloss:.4f}")
        self.params = params
        self._adj_norm = adj_norm
        self._x = x
        return params

    def embed(self):
        return np.asarray(self.enc.apply(self.params["enc"],
                                         self._adj_norm, self._x))

    def test(self, y: np.ndarray, sens: np.ndarray, idx_train, idx_test,
             epochs: int = 500, lr: float = 1e-2) -> Dict[str, float]:
        """Linear classifier on frozen embeddings; accuracy / DP / EO
        (graphair.py test + run.py:13-75)."""
        h = self.embed()
        clf = Classifier()
        p = clf.init(jax.random.PRNGKey(0), jnp.asarray(h))
        opt = optax.adam(lr)
        st = opt.init(p)
        y = np.asarray(y).astype(np.float32)
        htr = jnp.asarray(h[idx_train])
        ytr = jnp.asarray(y[idx_train])

        @jax.jit
        def step(p, st):
            def loss_fn(p_):
                logits = clf.apply(p_, htr)
                return jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logits, ytr))
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, st = opt.update(grads, st, p)
            return optax.apply_updates(p, updates), st, loss

        for _ in range(epochs):
            p, st, _ = step(p, st)
        pred = np.asarray(clf.apply(p, jnp.asarray(h[idx_test]))) > 0
        yt = y[idx_test] > 0.5
        st_ = np.asarray(sens)[idx_test] > 0.5
        acc = float(np.mean(pred == yt))
        dp = abs(pred[~st_].mean() - pred[st_].mean()) \
            if st_.any() and (~st_).any() else 0.0
        eo = 0.0
        if (yt & st_).any() and (yt & ~st_).any():
            eo = abs(pred[yt & ~st_].mean() - pred[yt & st_].mean())
        return {"accuracy": acc, "dp": float(dp * 100),
                "eo": float(eo * 100)}
