"""Generic contrastive pretraining engine.

Parity with ``dig/sslgraph/method/contrastive/model/contrastive.py:86-220``:
views_fn list -> shared (or per-view) encoders -> projection heads ->
objective; yields the trained encoder per epoch (``per_epoch_out``) or after
the last epoch; graph-level / node-level / joint modes; JSE
corruption-negatives.

TPU-native: the whole (views -> encode -> project -> loss -> grads -> adam)
step is ONE jitted function taking a PRNG key — the reference runs views on
host per batch (contrastive.py:166-173), which serializes augmentation and
GPU compute.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..graph import GraphBatch
from .objectives import jse_loss, nce_loss

xavier = jax.nn.initializers.glorot_uniform()


class ProjHead(nn.Module):
    out_dim: int
    kind: str = "MLP"  # 'MLP' | 'linear'

    @nn.compact
    def __call__(self, z):
        if self.kind == "linear":
            return nn.Dense(self.out_dim, kernel_init=xavier)(z)
        h = jax.nn.relu(nn.Dense(self.out_dim, kernel_init=xavier)(z))
        return nn.Dense(self.out_dim, kernel_init=xavier)(h)


def corrupt_graph(key, g: GraphBatch) -> GraphBatch:
    """Shuffle node features across the batch (JSE negative sampling,
    reference contrastive.py:378-389)."""
    perm = jax.random.permutation(key, g.num_nodes)
    return g.replace_nodes(x=g.nodes["x"][perm])


class Contrastive:
    """Pretrain engine. ``objective``: 'NCE' | 'JSE' | callable."""

    def __init__(self, objective, views_fn: Sequence[Callable],
                 graph_level: bool = True, node_level: bool = False,
                 z_dim: Optional[int] = None, z_n_dim: Optional[int] = None,
                 proj: Optional[str] = None, proj_n: Optional[str] = None,
                 neg_by_crpt: bool = False, tau: float = 0.5,
                 choice_model: str = "last", model_path: str = "models",
                 seed: int = 12345):
        assert graph_level or node_level
        assert not (objective == "NCE" and neg_by_crpt)
        self.objective = objective
        self.views_fn = list(views_fn)
        self.graph_level = graph_level
        self.node_level = node_level
        self.z_dim = z_dim
        self.z_n_dim = z_n_dim
        self.proj = proj
        self.proj_n = proj_n
        self.neg_by_crpt = neg_by_crpt
        self.tau = tau
        self.choice_model = choice_model
        self.model_path = model_path
        self.seed = seed

    # -- loss dispatch ---------------------------------------------------
    def _loss(self, zs, zs_n, batch, graph_mask, node_mask):
        if callable(self.objective):
            return self.objective(zs=zs, zs_n=zs_n, batch=batch)
        if self.objective == "NCE":
            return nce_loss(zs, zs_n, batch, tau=self.tau,
                            graph_mask=graph_mask, node_mask=node_mask)
        if self.objective == "JSE":
            if self.neg_by_crpt and zs is not None and zs_n is not None:
                from .objectives import jse_local_global_neg_paired
                loss = 0.0
                for zg, zn in zip(zs, zs_n):
                    loss += jse_local_global_neg_paired(
                        zg, zn, batch, graph_mask, node_mask)
                return loss
            return jse_loss(zs, zs_n, batch, graph_mask=graph_mask,
                            node_mask=node_mask)
        raise ValueError(self.objective)

    # -- training --------------------------------------------------------
    def train(self, encoder, data_loader, optimizer=None, epochs: int = 20,
              per_epoch_out: bool = False, lr: float = 1e-3):
        """Generator yielding dict(encoder_params, proj_params, apply,
        loss) per epoch (``per_epoch_out``) or once at the end.

        ``encoder``: a flax module (shared across views) or a list of
        modules, one per view (reference supports both,
        contrastive.py:143-157). ``apply(params, g)`` embeds a batch with
        the first encoder at graph level.
        """
        encoders = (list(encoder) if isinstance(encoder, (list, tuple))
                    else [encoder] * len(self.views_fn))
        assert len(encoders) == len(self.views_fn)
        shared = not isinstance(encoder, (list, tuple))
        proj_out = self.z_n_dim if self.z_n_dim is not None else self.z_dim

        # graph head projects z_dim -> proj_out (== z_n_dim for joint modes
        # so local-global contrast is dimension-consistent; reference
        # contrastive.py:105-125)
        proj_g = (ProjHead(proj_out, self.proj)
                  if self.graph_level and self.proj else None)
        proj_n = (ProjHead(proj_out, self.proj_n)
                  if self.node_level and self.proj_n else None)

        optimizer = optimizer or optax.adam(lr)
        key = jax.random.PRNGKey(self.seed)
        g0 = next(iter(data_loader))

        # init params: unique encoders only
        key, *iks = jax.random.split(key, 4)
        if shared:
            enc_params = [jax.jit(encoders[0].init)(iks[0], g0)]
        else:
            enc_params = [jax.jit(e.init)(jax.random.fold_in(iks[0], i), g0)
                          for i, e in enumerate(encoders)]
        pg_params = (proj_g.init(iks[1], jnp.zeros((1, self.z_dim)))
                     if proj_g else None)
        pn_params = (proj_n.init(iks[2], jnp.zeros((1, proj_out)))
                     if proj_n else None)
        params = {"enc": enc_params, "pg": pg_params, "pn": pn_params}
        opt_state = optimizer.init(params)

        n_views = len(self.views_fn)
        views_fn = self.views_fn
        neg_by_crpt = self.neg_by_crpt

        def encode(p, enc_idx, g):
            enc = encoders[enc_idx]
            ep = p["enc"][0 if shared else enc_idx]
            if self.graph_level and self.node_level:
                zg, zn = enc.apply(ep, g)
            elif self.graph_level:
                zg, zn = enc.apply(ep, g), None
            else:
                zg, zn = None, enc.apply(ep, g)
            if zg is not None and proj_g is not None:
                zg = proj_g.apply(p["pg"], zg)
            if zn is not None and proj_n is not None:
                zn = proj_n.apply(p["pn"], zn)
            return zg, zn

        def loss_fn(p, g: GraphBatch, key):
            keys = jax.random.split(key, n_views + 1)
            zs, zs_n = [], []
            for vi, vfn in enumerate(views_fn):
                out = vfn(keys[vi], g)
                gv = out[0] if isinstance(out, tuple) else out
                if neg_by_crpt:
                    gc = corrupt_graph(keys[-1], gv)
                    zg, zn = encode(p, vi, gv)
                    zg_c, zn_c = encode(p, vi, gc)
                    zg = (jnp.concatenate([zg, zg_c])
                          if zg is not None else None)
                    zn = (jnp.concatenate([zn, zn_c])
                          if zn is not None else None)
                else:
                    zg, zn = encode(p, vi, gv)
                if zg is not None:
                    zs.append(zg)
                if zn is not None:
                    zs_n.append(zn)
            return self._loss(zs or None, zs_n or None, g.node_graph,
                              g.graph_mask, g.node_mask)

        @jax.jit
        def step(p, opt_state, g, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, g, key)
            updates, opt_state = optimizer.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return p, opt_state, loss

        @jax.jit
        def epoch_fn(p, opt_state, stacked, key):
            # whole epoch in ONE dispatch (round 5): the per-batch loop
            # below syncs float(loss) every step — through a high-latency
            # link (10-30 ms/round trip on the bench tunnel) that costs
            # more than the compute. Same key schedule as the loop.
            def body(carry, g):
                p, opt_state, key = carry
                key, sk = jax.random.split(key)
                p, opt_state, loss = step(p, opt_state, g, sk)
                return (p, opt_state, key), loss
            (p, opt_state, key), losses = jax.lax.scan(
                body, (p, opt_state, key), stacked)
            return p, opt_state, key, jnp.mean(losses)

        def _uniform(batches):
            shapes = [jax.tree.map(jnp.shape, b) for b in batches]
            return all(sh == shapes[0] for sh in shapes[1:])

        best_loss = float("inf")
        best_params = params
        epoch_loss = float("nan")
        for epoch in range(epochs):
            batches = list(data_loader)
            if len(batches) > 1 and _uniform(batches):
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
                params, opt_state, key, el = epoch_fn(params, opt_state,
                                                      stacked, key)
                epoch_loss = float(el)
                nb = len(batches)
            else:
                epoch_loss = 0.0
                nb = 0
                for g in batches:
                    key, sk = jax.random.split(key)
                    params, opt_state, loss = step(params, opt_state, g,
                                                   sk)
                    epoch_loss += float(loss)
                    nb += 1
                epoch_loss /= max(nb, 1)
            if epoch_loss < best_loss:
                best_loss = epoch_loss
                if self.choice_model == "best":
                    best_params = params
            if per_epoch_out:
                yield self._result(encoders, params, epoch_loss, shared)
        if self.choice_model == "best":
            yield self._result(encoders, best_params, best_loss, shared)
        elif not per_epoch_out:
            yield self._result(encoders, params, epoch_loss, shared)

    def _result(self, encoders, params, loss, shared):
        enc = encoders[0]

        def apply(g: GraphBatch):
            return enc.apply(params["enc"][0], g)

        return {"encoder_params": params["enc"],
                "proj_params": {"pg": params["pg"], "pn": params["pn"]},
                "apply": apply, "loss": loss}
