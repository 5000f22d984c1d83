"""3D-GNN training harness — TPU-native equivalent of
``dig/threedgraph/method/run.py:13-180``.

Capabilities mirrored: Adam + StepLR schedule, L1/L2 losses, optional
energy-and-force training where force = -dE/dpos (reference computes a
second autograd pass at ``run.py:126``; here it is one ``jax.grad`` through
the energy head, fused into the same jitted step), best-validation
checkpointing, and per-epoch metrics.

TPU-first design: the whole optimization step (radius graph -> model ->
loss -> grads -> optimizer) is a single jitted function with donated state;
batches stream from a host loader with static shapes. With a
``jax.sharding.Mesh`` the same step runs data-parallel — see
``dig_tpu.parallel.mesh.shard_batch``.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..graph import GraphBatch
from .metrics import MetricLogger, Throughput


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_state(model, optimizer, example_batch: GraphBatch,
                     seed: int = 42) -> TrainState:
    # jit the init: un-jitted flax init dispatches every op eagerly, which
    # is pathological over a remote-TPU tunnel (one round-trip per op).
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), example_batch)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.reshape(mask.shape + (1,) * (err.ndim - mask.ndim))
    s = jnp.sum(jnp.where(m, err, 0.0))
    cnt = jnp.maximum(jnp.sum(mask) * (err.size // mask.size), 1)
    return s / cnt


def make_step_fns(model, optimizer, *, energy_and_force: bool = False,
                  p: float = 100.0, loss: str = "l1",
                  target_key: str = "y", donate: bool = True):
    """Build jitted (train_step, eval_step).

    ``loss``: 'l1' or 'l2' applied to energies (and forces when
    ``energy_and_force``), matching the reference's pluggable loss_func.
    """
    err_fn = (lambda d: jnp.abs(d)) if loss == "l1" else (lambda d: d * d)

    if energy_and_force and not getattr(model, "pallas_basis_grads", True):
        # with basis cotangents elided, jax.grad wrt positions SILENTLY
        # returns wrong forces (the basis->position path is dropped) —
        # reject rather than train on garbage (ops/pallas_triplet.py)
        raise ValueError(
            "energy_and_force requires pallas_basis_grads=True: "
            "pallas_basis_grads=False elides the basis cotangents, so "
            "dE/dpos would silently drop the basis->position path")

    def compute_loss(params, g: GraphBatch):
        y = g.globals[target_key]
        if y.ndim == 1:
            y = y[:, None]

        if energy_and_force:
            pos = g.nodes["pos"]

            def energy_sum(pos_):
                g_ = g.replace(nodes={**g.nodes, "pos": pos_})
                e = model.apply(params, g_)
                return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0)), e

            (_, e), grad_pos = jax.value_and_grad(
                energy_sum, has_aux=True)(pos)
            force = -grad_pos
            e_loss = _masked_mean(err_fn(e - y), g.graph_mask)
            f_loss = _masked_mean(err_fn(force - g.nodes["force"]),
                                  g.node_mask)
            total = e_loss + p * f_loss
            aux = {"loss": total, "e_loss": e_loss, "f_loss": f_loss}
        else:
            e = model.apply(params, g)
            total = _masked_mean(err_fn(e - y), g.graph_mask)
            aux = {"loss": total}
        return total, aux

    def train_step(state: TrainState, g: GraphBatch):
        (_, aux), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params, g)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), aux

    def eval_step(state: TrainState, g: GraphBatch):
        out = {"y_pred": model.apply(state.params, g),
               "graph_mask": g.graph_mask}
        if energy_and_force:
            pos = g.nodes["pos"]

            def energy_sum(pos_):
                g_ = g.replace(nodes={**g.nodes, "pos": pos_})
                e = model.apply(state.params, g_)
                return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0))

            out["force_pred"] = -jax.grad(energy_sum)(pos)
            out["node_mask"] = g.node_mask
        return out

    donate_argnums = (0,) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_argnums),
            jax.jit(eval_step))


def step_lr(lr: float, decay_factor: float, decay_epochs: int,
            steps_per_epoch: int):
    """StepLR-equivalent schedule (reference uses torch StepLR at run.py)."""
    return optax.exponential_decay(
        init_value=lr, transition_steps=max(decay_epochs * steps_per_epoch, 1),
        decay_rate=decay_factor, staircase=True)


class Run3D:
    """Epoch-loop driver mirroring the reference trainer's public surface
    (``run.run(device, train, valid, test, model, loss, evaluator, ...)``)
    minus the torch-isms: no device argument (jit placement), loaders are
    dig_tpu MoleculeLoaders, checkpoints via orbax.
    """

    def run(self, train_data, valid_data, test_data, model, evaluator,
            *, epochs: int = 20, batch_size: int = 32,
            vt_batch_size: int = 32, lr: float = 5e-4,
            lr_decay_factor: float = 0.5, lr_decay_step_size: int = 15,
            weight_decay: float = 0.0, energy_and_force: bool = False,
            p: float = 100.0, loss: str = "l1", seed: int = 42,
            save_dir: str = "", log_dir: str = "",
            n_node_pad: Optional[int] = None,
            slot_size: Optional[int] = None,
            quiet: bool = False, profile_dir: str = "",
            debug: bool = False) -> Dict[str, float]:
        """``profile_dir``: write a jax.profiler trace of steps 10-14 of the
        first epoch there (XPlane, TensorBoard-profile readable).
        ``debug``: run under NaN checks (jax_debug_nans) and assert donation
        discipline on the first step — see :mod:`dig_tpu.train.debug`."""
        import contextlib

        from ..datasets.loader import MoleculeLoader
        from .debug import assert_donation_discipline, debug_mode
        from .profiling import StepProfiler

        # slot_size: slot-aligned batches (one molecule per fixed slot) —
        # required by the models' block_size fast path, harmless otherwise
        train_loader = MoleculeLoader(train_data, batch_size,
                                      n_node_pad=n_node_pad, shuffle=True,
                                      seed=seed, slot_size=slot_size)
        valid_loader = MoleculeLoader(valid_data, vt_batch_size,
                                      n_node_pad=n_node_pad,
                                      slot_size=slot_size)
        test_loader = MoleculeLoader(test_data, vt_batch_size,
                                     n_node_pad=n_node_pad,
                                     slot_size=slot_size)

        schedule = step_lr(lr, lr_decay_factor, lr_decay_step_size,
                           len(train_loader))
        if weight_decay:
            optimizer = optax.adamw(schedule, weight_decay=weight_decay)
        else:
            optimizer = optax.adam(schedule)

        example = next(iter(valid_loader))
        state = make_train_state(model, optimizer, example, seed)
        train_step, eval_step = make_step_fns(
            model, optimizer, energy_and_force=energy_and_force, p=p,
            loss=loss)

        logger = MetricLogger(log_dir or None, quiet=quiet)
        tp = Throughput()

        # Edge counter for edges/s accounting (edges are built on device
        # inside the model, so the host loader can't know the count).
        cutoff = getattr(model, "cutoff", None)

        max_edges = getattr(model, "max_edges", None)
        block_size = getattr(model, "block_size", None)

        @jax.jit
        def count_edges(g: GraphBatch):
            from ..ops.radius import _pairwise_same_graph
            d2, valid = _pairwise_same_graph(
                g.nodes["pos"], g.node_graph, g.node_mask)
            return jnp.sum(valid & (d2 < cutoff * cutoff))

        @jax.jit
        def count_blocked_dropped(g: GraphBatch):
            from ..ops.radius import radius_blocked_dropped
            return radius_blocked_dropped(
                g.nodes["pos"], g.node_graph, g.node_mask, cutoff,
                block_size)

        overflow_warned = False
        blocked_warned = False
        best_valid = float("inf")
        best_test = float("inf")

        ckpt_mgr = None
        if save_dir:
            from .checkpoint import Checkpointer
            ckpt_mgr = Checkpointer(save_dir)

        total_steps = epochs * len(train_loader)
        prof = StepProfiler(profile_dir or None,
                            start_step=min(10, max(total_steps - 5, 0)))
        if debug:
            # Donation check needs a throwaway state (it invalidates it).
            assert_donation_discipline(
                train_step, make_train_state(model, optimizer, example,
                                             seed + 1), example)
        dbg_ctx = debug_mode() if debug else contextlib.nullcontext()

        with dbg_ctx:
            for epoch in range(1, epochs + 1):
                tp.reset()
                losses = []
                for g in train_loader:
                    with prof.step():
                        state, aux = train_step(state, g)
                    losses.append(aux["loss"])
                    if cutoff:
                        n_edges = int(count_edges(g))
                        tp.update(n_edges)
                        # overflow accounting: static caps silently drop
                        # edges (SURVEY §7 hard part 1) — surface it once
                        if (max_edges and n_edges > max_edges
                                and not overflow_warned):
                            print(f"WARNING: batch has {n_edges} radius "
                                  f"edges > model.max_edges={max_edges}; "
                                  "overflow is dropped — raise max_edges",
                                  flush=True)
                            overflow_warned = True
                        # blocked-builder drop accounting: cross-block
                        # same-graph pairs vanish silently when the batch
                        # is not slot-aligned (ops/radius.py)
                        if block_size and not blocked_warned:
                            n_drop = int(count_blocked_dropped(g))
                            if n_drop:
                                print(f"WARNING: {n_drop} radius pairs "
                                      "cross block boundaries and are "
                                      "DROPPED by the blocked builder — "
                                      "feed slot-aligned batches "
                                      f"(MoleculeLoader(slot_size="
                                      f"{block_size}))", flush=True)
                                blocked_warned = True
                train_loss = float(np.mean(jax.device_get(losses)))

                valid_mae = evaluate(state, eval_step, valid_loader,
                                     evaluator, energy_and_force)
                test_mae = evaluate(state, eval_step, test_loader, evaluator,
                                    energy_and_force)
                logger.log(epoch, {"train_loss": train_loss,
                                   "valid_mae": valid_mae,
                                   "test_mae": test_mae,
                                   **tp.rates()}, prefix="")
                if valid_mae < best_valid:
                    best_valid = valid_mae
                    best_test = test_mae
                    if ckpt_mgr is not None:
                        ckpt_mgr.save(state, step=epoch, metrics={
                            "valid_mae": valid_mae, "test_mae": test_mae})
        prof.stop()
        logger.close()
        return {"best_valid": best_valid, "best_test": best_test,
                "state": state}


def evaluate(state, eval_step, loader, evaluator,
             energy_and_force: bool = False) -> float:
    preds, trues = [], []
    for g in loader:
        out = eval_step(state, g)
        m = np.asarray(out["graph_mask"])
        preds.append(np.asarray(out["y_pred"])[m])
        y = np.asarray(g.globals["y"])
        if y.ndim == 1:
            y = y[:, None]
        trues.append(y[m])
    res = evaluator.eval({"y_pred": np.concatenate(preds),
                          "y_true": np.concatenate(trues)})
    return float(res["mae"])
