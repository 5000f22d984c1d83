"""Tensor parallelism over a 2-D ``(data, model)`` mesh.

The reference has no model parallelism of any kind (SURVEY.md §2.10 — its
only DP is ``nn.DataParallel`` inside flow models). On TPU, wide GNNs
(hidden ≥ 512, e.g. production-scale SchNet/SphereNet variants whose
feature dim no longer fits comfortably per chip next to the activation
working set) shard the *feature* axis across the ``model`` mesh axis while
the batch shards across ``data``:

* parameters: every kernel/embedding whose last axis is divisible by the
  model-axis size is sharded on that axis (column-parallel); everything
  else is replicated. XLA GSPMD propagates these shardings through the
  whole train step and inserts the all-gathers / reduce-scatters over ICI —
  the "How to Scale Your Model" recipe, not hand-written collectives.
* the step itself runs under :func:`jax.shard_map` that is *manual only
  over the data axis* (``axis_names={'data'}``): each data shard is a
  self-contained graph slab (segment reductions stay local, exactly like
  :mod:`dig_tpu.parallel.dp`), while the model axis stays automatic so the
  sharded-parameter matmuls compile to tensor-parallel form inside it.

The single explicit collective is the gradient ``psum`` over ``data``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import GraphBatch
from ..train.trainer import TrainState


def tp_param_specs(params, mesh: Mesh, model_axis: str = "model",
                   min_shard: int = 4):
    """PartitionSpec tree: shard the last axis of any leaf divisible by the
    model-axis size (with at least ``min_shard`` columns per device);
    replicate the rest. Biases/LayerNorm scales of sharded layers shard
    too (their dim matches the kernel's output dim)."""
    size = mesh.shape[model_axis]

    def spec(x):
        nd = getattr(x, "ndim", 0)
        if (nd >= 1 and x.shape[-1] % size == 0
                and x.shape[-1] // size >= min_shard):
            return P(*([None] * (nd - 1)), model_axis)
        return P()

    return jax.tree_util.tree_map(spec, params)


def tp_shard(tree, mesh: Mesh, model_axis: str = "model",
             min_shard: int = 4):
    """device_put a params/opt-state pytree with column-parallel shardings
    (replicated over every other mesh axis)."""
    specs = tp_param_specs(tree, mesh, model_axis, min_shard)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def make_tp_train_step(model, optimizer, mesh: Mesh, *,
                       data_axis: str = "data",
                       model_axis: str = "model",
                       loss_fn: Optional[Callable] = None,
                       energy_and_force: bool = False,
                       p: float = 100.0,
                       target_key: str = "y"):
    """Jitted 2-D (DP x TP) train step: ``(state, batch) -> (state, aux)``.

    ``state`` must be placed with :func:`tp_shard`; the batch with
    :func:`dig_tpu.parallel.shard_graph_batch` along ``data_axis`` (each
    data shard a self-contained slab, node indices slab-local). Loss math
    is identical to :func:`dig_tpu.parallel.make_dp_train_step` — a TP run
    must reproduce the DP run bit-for-bit up to reduction order.
    """
    err = loss_fn or (lambda d: jnp.abs(d))

    def local_loss(params, g: GraphBatch):
        y = g.globals[target_key]
        if y.ndim == 1:
            y = y[:, None]
        if energy_and_force:
            pos = g.nodes["pos"]

            def energy_sum(pos_):
                e = model.apply(params, g.replace(
                    nodes={**g.nodes, "pos": pos_}))
                return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0)), e

            (_, e), grad_pos = jax.value_and_grad(
                energy_sum, has_aux=True)(pos)
            force = -grad_pos
            fm = g.node_mask[:, None]
            d = err(e - y)
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
        # counts are pure mask reductions — computing them via local_loss
        # would cost a full extra model forward per step
        y = g.globals[target_key]
        y_dim = 1 if y.ndim == 1 else y.shape[-1]
        e_cnt = jnp.sum(g.graph_mask) * y_dim
        f_cnt = (jnp.sum(g.node_mask) * 3 if energy_and_force
                 else jnp.zeros(()))
        e_cnt_g = jnp.maximum(jax.lax.psum(e_cnt, data_axis), 1.0)
        f_cnt_g = jnp.maximum(jax.lax.psum(f_cnt, data_axis), 1.0)

        def scalar_loss(params):
            e_sum, f_sum, _, _ = local_loss(params, g)
            local = e_sum / e_cnt_g + (p * f_sum / f_cnt_g
                                       if energy_and_force else 0.0)
            return local, (e_sum, f_sum)

        (_, (e_sum, f_sum)), grads = jax.value_and_grad(
            scalar_loss, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, data_axis)
        e_loss = jax.lax.psum(e_sum, data_axis) / e_cnt_g
        f_loss = jax.lax.psum(f_sum, data_axis) / f_cnt_g
        total = e_loss + (p * f_loss if energy_and_force else 0.0)
        aux = {"loss": total, "e_loss": e_loss, "f_loss": f_loss}
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), aux

    # Manual over the data axis only; the model axis stays automatic so the
    # column-parallel parameter shardings flow through GSPMD inside.
    smapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=(P(), P()),
        axis_names=frozenset({data_axis}),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0,))


def make_tp_eval_step(model, mesh: Mesh, *, data_axis: str = "data"):
    def shard_fn(params, g: GraphBatch):
        return model.apply(params, g), g.graph_mask

    smapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        axis_names=frozenset({data_axis}),
        check_vma=False,
    )
    return jax.jit(smapped)
