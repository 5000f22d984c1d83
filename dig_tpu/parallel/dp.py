"""Data-parallel training step via shard_map over a 1-D 'data' mesh.

Each device gets a self-contained slab of the batch (the loader emits
``num_shards`` equal sub-batches concatenated along the leading axes, with
node indices *local to the slab*), computes loss + grads locally, and the
only collective is the gradient/loss ``psum`` over ICI — the canonical
TPU DP recipe. The reference has no equivalent (SURVEY.md §2.10).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..graph import GraphBatch
from ..train.trainer import TrainState


def make_dp_train_step(model, optimizer, mesh: Mesh, *,
                       axis: str = "data",
                       loss_fn: Callable = None,
                       energy_and_force: bool = False,
                       p: float = 100.0,
                       target_key: str = "y"):
    """Returns a jitted DP train step: (state, sharded_batch) -> (state, aux).

    ``state`` is replicated; the batch is sharded along ``axis``. Grads are
    psum-averaged across shards inside shard_map, so optimizer updates are
    identical on every device (no divergence).
    """
    err = loss_fn or (lambda d: jnp.abs(d))

    def local_loss(params, g: GraphBatch):
        y = g.globals[target_key]
        if y.ndim == 1:
            y = y[:, None]
        if energy_and_force:
            pos = g.nodes["pos"]

            def energy_sum(pos_):
                e = model.apply(params, g.replace(nodes={**g.nodes, "pos": pos_}))
                return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0)), e

            (_, e), grad_pos = jax.value_and_grad(energy_sum, has_aux=True)(pos)
            force = -grad_pos
            fm = g.node_mask[:, None]
            d = err(e - y)  # broadcasts to [G, num_targets]
            e_sum = jnp.sum(jnp.where(g.graph_mask[:, None], d, 0.0))
            f_sum = jnp.sum(jnp.where(fm, err(force - g.nodes["force"]), 0.0))
            e_cnt = jnp.sum(g.graph_mask) * d.shape[-1]
            f_cnt = jnp.sum(g.node_mask) * 3
            return e_sum, f_sum, e_cnt, f_cnt
        e = model.apply(params, g)
        d = err(e - y)
        e_sum = jnp.sum(jnp.where(g.graph_mask[:, None], d, 0.0))
        e_cnt = jnp.sum(g.graph_mask) * d.shape[-1]
        return e_sum, jnp.zeros(()), e_cnt, jnp.zeros(())

    def shard_fn(state: TrainState, g: GraphBatch):
        # Global masked-mean denominators: params-independent, so psum them
        # OUTSIDE the differentiated function (keeps the grad path purely
        # local; the single explicit psum(grads) below is then the exact
        # cross-shard sum — no reliance on psum-transpose semantics).
        _, _, e_cnt, f_cnt = local_loss(state.params, g)
        e_cnt_g = jnp.maximum(jax.lax.psum(e_cnt, axis), 1.0)
        f_cnt_g = jnp.maximum(jax.lax.psum(f_cnt, axis), 1.0)

        def scalar_loss(params):
            e_sum, f_sum, _, _ = local_loss(params, g)
            local = e_sum / e_cnt_g + (p * f_sum / f_cnt_g
                                       if energy_and_force else 0.0)
            return local, (e_sum, f_sum)

        (_, (e_sum, f_sum)), grads = jax.value_and_grad(
            scalar_loss, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, axis)
        e_loss = jax.lax.psum(e_sum, axis) / e_cnt_g
        f_loss = jax.lax.psum(f_sum, axis) / f_cnt_g
        total = e_loss + (p * f_loss if energy_and_force else 0.0)
        aux = {"loss": total, "e_loss": e_loss, "f_loss": f_loss}
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), aux

    # state replicated, batch sharded along leading axes.
    state_spec = P()
    batch_spec = P(axis)

    smapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


def make_dp_eval_step(model, mesh: Mesh, *, axis: str = "data"):
    def shard_fn(params, g: GraphBatch):
        return model.apply(params, g), g.graph_mask

    smapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(smapped)
