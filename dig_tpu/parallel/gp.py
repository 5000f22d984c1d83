"""Graph-parallel training: partitioned flax models over a device mesh.

The north-star scaling path (SURVEY.md §5, BASELINE.json): a graph too big
for one chip is METIS-partitioned into per-device node slabs; each layer
aggregates local edges while boundary node features move over ICI via the
precomputed all-to-all halo plan (:mod:`dig_tpu.parallel.halo`), and the
only other collective is the gradient psum. This is the shard_map analog
of lsgraph's historical-embedding machinery
(``dig/lsgraph/method/GraphFMOB/models/base.py:91-187``) with *exact*
(non-stale) boundary features.

Design: a **generic engine** (:func:`make_gp_engine`) wraps any flax
module with the signature ``module(x_local, g: GPLocalGraph, halo_fn)``
— the module calls ``halo_fn(h) -> [H, F]`` whenever it needs boundary
rows for the next aggregation, so models of any depth/architecture train
partitioned (see :mod:`dig_tpu.parallel.gp_models`: GCN, GCNII, PNA and
flat SchNet). Inside jit the exchange is an ``all_to_all`` with no data
dependency on the local segment-sum, so XLA can overlap them.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .halo import ExchangePlan, build_exchange_plan, halo_exchange_a2a
from .partition import PartitionedGraph, build_partitions

xavier = jax.nn.initializers.glorot_uniform()


class GPGraph(NamedTuple):
    """Device-ready partitioned graph (all arrays lead with the part axis
    and shard over it)."""

    senders: jnp.ndarray        # [P, E]  (index into [C + H) local space)
    receivers: jnp.ndarray      # [P, E]  (< C)
    edge_mask: jnp.ndarray      # [P, E]
    node_mask: jnp.ndarray      # [P, C]
    deg_out: jnp.ndarray        # [P, C]  global out-degree of owned nodes
    send_slot: jnp.ndarray      # [P, P, K]
    send_mask: jnp.ndarray      # [P, P, K]
    recv_pos: jnp.ndarray       # [P, P, K]


class GPLocalGraph(NamedTuple):
    """One shard's view (no leading part axis) handed to GP modules."""

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    node_mask: jnp.ndarray
    deg_out: jnp.ndarray        # [C] global out-degree (sender side spans
    # parts, so it cannot be recovered from local edges alone)
    num_local: int              # C (static)


def prepare_gp_graph(senders, receivers, num_nodes: int,
                     num_parts: int) -> tuple:
    """Partition + build the exchange plan; returns (GPGraph, perm) where
    ``perm`` maps original node id -> (part * C + slot) layout."""
    pg = build_partitions(np.asarray(senders), np.asarray(receivers),
                          num_nodes, num_parts)
    plan = build_exchange_plan(pg)
    deg_out = np.bincount(np.asarray(senders),
                          minlength=num_nodes).astype(np.float32)
    deg_out_slab = slab_layout(deg_out, pg.perm, num_parts,
                               pg.nodes_per_part)
    g = GPGraph(
        senders=jnp.asarray(pg.senders), receivers=jnp.asarray(pg.receivers),
        edge_mask=jnp.asarray(pg.edge_mask),
        node_mask=jnp.asarray(pg.node_mask),
        deg_out=jnp.asarray(deg_out_slab),
        send_slot=jnp.asarray(plan.send_slot),
        send_mask=jnp.asarray(plan.send_mask),
        recv_pos=jnp.asarray(plan.recv_pos))
    return g, pg.perm, plan.halo_size, pg.nodes_per_part


def slab_layout(x: np.ndarray, perm: np.ndarray, num_parts: int,
                nodes_per_part: int) -> np.ndarray:
    """[N, ...] node array -> [P, C, ...] slab layout."""
    out = np.zeros((num_parts * nodes_per_part,) + x.shape[1:], x.dtype)
    out[perm] = np.asarray(x)
    return out.reshape((num_parts, nodes_per_part) + x.shape[1:])


def unslab_layout(xs: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """[P, C, ...] slab array -> [N, ...] original node order."""
    flat = np.asarray(xs).reshape((-1,) + xs.shape[2:])
    return flat[perm]


# ---------------------------------------------------------------------------
# Generic engine
# ---------------------------------------------------------------------------

def _local(g: GPGraph, C: int) -> GPLocalGraph:
    return GPLocalGraph(senders=g.senders[0], receivers=g.receivers[0],
                        edge_mask=g.edge_mask[0], node_mask=g.node_mask[0],
                        deg_out=g.deg_out[0], num_local=C)


def _stub_halo(halo_size: int):
    """Shape-faithful halo stand-in for host-side flax init."""
    def fn(h):
        return jnp.zeros((halo_size,) + h.shape[1:], h.dtype)
    return fn


def node_class_loss(out, y, mask):
    ls = optax.softmax_cross_entropy_with_integer_labels(out, y)
    return jnp.sum(jnp.where(mask, ls, 0.0)), jnp.sum(mask)


def node_reg_loss(out, y, mask):
    ls = jnp.abs(out[..., 0] - y)
    return jnp.sum(jnp.where(mask, ls, 0.0)), jnp.sum(mask)


def make_gp_engine(mesh: Mesh, module, opt, halo_size: int,
                   nodes_per_part: int,
                   loss_fn: Callable = node_class_loss,
                   axis: str = "data", extra_halo_inputs: int = 0,
                   data_axis: Optional[str] = None):
    """Graph-parallel trainer for any ``module(x, g, halo_fn)`` flax model.

    Returns ``(init_fn, step_fn, predict_fn)``:
      init_fn(key, x0 [P,C,F], g)                -> (params, opt_state)
      step_fn(params, opt_state, g, x, y, mask)  -> (params, opt_state,
                                                     loss, out [P,C,...])
      predict_fn(params, g, x)                   -> out [P,C,...]
        (a forward-only shard_map — no optimizer involvement)

    The module may call ``halo_fn`` any number of times (once per layer);
    each call is one all_to_all over ICI.

    **DP x GP (2-D mesh, SURVEY §7's ``Mesh(('data','graph'))``)**: pass
    ``data_axis`` and a mesh with both axes. Every graph/feature input
    grows a LEADING replica-batch axis sharded over ``data_axis``
    (``[D, P, ...]``); each data row trains the shared params on its own
    partitioned graph (or mask-disjoint node minibatch of the same
    graph), the halo all_to_all stays inside the graph axis (shard_map
    runs it independently per data row), and the gradient/loss psum spans
    BOTH axes with global count normalization — so D rows with disjoint
    masks compute exactly the single-row full-batch update (parity test:
    ``tests/test_parallel.py::test_gp_dp_2d_mesh``).
    """
    C = nodes_per_part
    H = halo_size
    axes = (axis,) if data_axis is None else (axis, data_axis)

    def _squeeze(a):
        return a[0] if data_axis is None else a[0, 0]

    def init_fn(key, x0, g: GPGraph):
        gl = _local2(g)
        return module.init(key, jnp.asarray(_squeeze(jnp.asarray(x0))),
                           gl, _stub_halo(H))

    def _local2(g: GPGraph) -> GPLocalGraph:
        return GPLocalGraph(senders=_squeeze(g.senders),
                            receivers=_squeeze(g.receivers),
                            edge_mask=_squeeze(g.edge_mask),
                            node_mask=_squeeze(g.node_mask),
                            deg_out=_squeeze(g.deg_out), num_local=C)

    def _make_halo_fn(g: GPGraph):
        def halo_fn(h):
            return halo_exchange_a2a(h, _squeeze(g.send_slot),
                                     _squeeze(g.send_mask),
                                     _squeeze(g.recv_pos), H, axis)
        return halo_fn

    def _expand(a):
        return a[None] if data_axis is None else a[None, None]

    def shard_train(params, opt_state, g: GPGraph, x, y, mask):
        gl = _local2(g)
        halo_fn = _make_halo_fn(g)

        def loss(p):
            out = module.apply(p, _squeeze(x), gl, halo_fn)
            loc, cnt = loss_fn(out, _squeeze(y),
                               _squeeze(mask) & gl.node_mask)
            return loc, (cnt, out)

        (loc, (cnt, out)), grads = jax.value_and_grad(
            loss, has_aux=True)(params)
        tot = jax.lax.psum(loc, axes)
        n = jnp.maximum(jax.lax.psum(cnt, axes), 1)
        grads = jax.tree_util.tree_map(
            lambda gr: jax.lax.psum(gr, axes) / n, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, tot / n, _expand(out)

    def shard_fwd(params, g: GPGraph, x):
        gl = _local2(g)
        out = module.apply(params, _squeeze(x), gl, _make_halo_fn(g))
        return _expand(out)

    sharded = (P(axis) if data_axis is None
               else P(data_axis, axis))
    gp_spec = GPGraph(senders=sharded, receivers=sharded, edge_mask=sharded,
                      node_mask=sharded, deg_out=sharded,
                      send_slot=sharded, send_mask=sharded,
                      recv_pos=sharded)

    step = jax.jit(shard_map(
        shard_train, mesh=mesh,
        in_specs=(P(), P(), gp_spec, sharded, sharded, sharded),
        out_specs=(P(), P(), P(), sharded),
        check_vma=False,
    ), donate_argnums=(0, 1))

    predict = jax.jit(shard_map(
        shard_fwd, mesh=mesh,
        in_specs=(P(), gp_spec, sharded),
        out_specs=sharded,
        check_vma=False,
    ))

    return init_fn, step, predict


# ---------------------------------------------------------------------------
# Back-compat toy wrapper (partitioned GCN; tests/test_parallel.py)
# ---------------------------------------------------------------------------

def make_gp_train_step(mesh: Mesh, num_layers: int, hidden: int,
                       num_classes: int, in_dim: int, halo_size: int,
                       nodes_per_part: int,
                       lr: float = 1e-2, axis: str = "data"):
    """(init_fn, step_fn, predict_fn) for a partitioned GCN — now a thin
    wrapper over :func:`make_gp_engine` + :class:`gp_models.GPGCN`."""
    from .gp_models import GPGCN

    module = GPGCN(features=tuple([hidden] * (num_layers - 1)
                                  + [num_classes]))
    opt = optax.adam(lr)
    init_fn, step, predict = make_gp_engine(
        mesh, module, opt, halo_size, nodes_per_part,
        loss_fn=node_class_loss, axis=axis)

    def init_with_opt(key, x0, g):
        params = init_fn(key, x0, g)
        return params, opt.init(params)

    return init_with_opt, step, predict
