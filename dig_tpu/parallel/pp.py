"""Pipeline parallelism (GPipe microbatch schedule) over a ``pipe`` mesh axis.

For *deep* GNN stacks (lsgraph-style 8–64-layer residual GCNs, deep
interaction towers) whose parameters no longer fit replicated next to the
optimizer state, the layer stack is cut into ``P`` contiguous stages, one
per device along the ``pipe`` axis; microbatches stream through the stages
with activations handed to the next stage via ``ppermute`` over ICI. The
schedule is the classic GPipe fill/drain: ``M + P - 1`` ticks for ``M``
microbatches, bubble fraction ``(P-1)/(M+P-1)``.

The reference has nothing like this (SURVEY.md §2.10: no distributed
machinery at all); this is a new TPU-native capability. Everything is
compiler-friendly: the tick loop is a single ``lax.scan``, the stage
hand-off one ``ppermute``, and the whole schedule differentiates — the
backward pass is the mirrored drain schedule XLA derives from the scan
transpose, so training works with plain ``jax.grad``.

Contract: all stages share one activation shape (put input/output heads
outside the pipelined stack), and the stacked layer-parameter pytree has a
leading layer axis divisible by the stage count.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pp_shard_params(stacked_params, mesh: Mesh, axis: str = "pipe"):
    """Place a stacked per-layer param pytree (leaves ``[L, ...]``) with the
    layer axis sharded across the ``pipe`` mesh axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                  stacked_params)


def pipeline_apply(layer_fn: Callable, mesh: Mesh, *, axis: str = "pipe"):
    """Returns ``apply(stacked_params, x_micro) -> outs``.

    ``layer_fn(layer_params, h) -> h`` is one layer (shape-preserving);
    ``stacked_params`` leaves are ``[L, ...]`` (L divisible by the stage
    count); ``x_micro`` is ``[M, mb, ...]`` microbatches. Returns
    ``[M, mb, ...]`` outputs, replicated across the axis.
    """

    def shard_fn(stacked_local, x_micro):
        # stacked_local leaves: [L/P, ...] — this stage's contiguous slice.
        stage = jax.lax.axis_index(axis)
        nstages = jax.lax.psum(1, axis)
        M = x_micro.shape[0]

        def local_apply(h):
            def body(h, pl):
                return layer_fn(pl, h), None
            h, _ = jax.lax.scan(body, h, stacked_local)
            return h

        perm = None  # built lazily below once nstages is concrete via shape

        def tick(carry, t):
            act, buf = carry
            # stage 0 injects microbatch t (clamped during drain ticks —
            # those outputs never reach the write window below)
            inp = jnp.where(stage == 0,
                            x_micro[jnp.clip(t, 0, M - 1)], act)
            y = local_apply(inp)
            idx = t - (nstages - 1)
            w = jnp.clip(idx, 0, M - 1)
            write = (stage == nstages - 1) & (idx >= 0) & (idx < M)
            buf = buf.at[w].set(jnp.where(write, y, buf[w]))
            act_next = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % mesh.shape[axis])
                          for i in range(mesh.shape[axis])])
            return (act_next, buf), None

        buf0 = jnp.zeros_like(x_micro)
        act0 = jnp.zeros_like(x_micro[0])
        ticks = jnp.arange(M + mesh.shape[axis] - 1)
        (act, buf), _ = jax.lax.scan(tick, (act0, buf0), ticks)
        del act, perm
        # only the last stage ever writes buf -> psum broadcasts it
        return jax.lax.psum(buf, axis)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        axis_names=frozenset({axis}),
        check_vma=False,
    )


def make_pp_train_step(layer_fn: Callable, optimizer, mesh: Mesh,
                       loss_fn: Callable, *, axis: str = "pipe"):
    """Jitted pipeline train step:
    ``(params, opt_state, x_micro, y_micro) -> (params, opt_state, loss)``.

    ``params`` placed via :func:`pp_shard_params` (grads + optimizer state
    inherit the stage-local sharding — each stage updates only its own
    layers; no parameter collective at all, only the activation ppermutes).
    ``loss_fn(outs, y_micro) -> scalar``.
    """
    papply = pipeline_apply(layer_fn, mesh, axis=axis)

    def step(params, opt_state, x_micro, y_micro):
        def lf(p):
            return loss_fn(papply(p, x_micro), y_micro)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
