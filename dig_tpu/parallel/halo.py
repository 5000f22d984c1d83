"""Halo exchange + partitioned aggregation over a device mesh.

The TPU replacement for lsgraph's pinned-memory AsyncIOPool
(``dig/lsgraph/method/GraphFMOB/pool.py:14-128``,
``csrc/cuda/sync_cuda.cu:14-130``): instead of staging out-of-batch
historical embeddings over PCIe, each mesh shard owns a contiguous node
slab in HBM and boundary features move over ICI with XLA collectives.

Two exchange strategies (both static-shape, both inside shard_map):

* ``halo_exchange_allgather`` — all_gather all slabs then gather the halo
  rows; bandwidth O(N*F) per device but one fused collective. Wins for
  small parts / high cut fraction.
* ``halo_exchange_a2a`` — precomputed per-pair send tables + one
  ``all_to_all``; moves only boundary rows, the scalable path. The send
  schedule is computed once on host (``build_exchange_plan``), playing the
  role of ``relabel_one_hop``'s n_id bookkeeping
  (``csrc/cpu/relabel_cpu.cpp:55-76``).

XLA overlaps the collective with the local segment-sum automatically when
the local aggregation is split into local-edges / halo-edges parts —
``partitioned_spmm`` is written so local work has no data dependency on the
exchange.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .partition import PartitionedGraph


@dataclass
class ExchangePlan:
    """Host-precomputed all-to-all schedule.

    K = max rows any part sends to any other part.
    send_slot[p, q, k]: local slot on p of the k-th row p sends to q.
    send_mask[p, q, k]: validity.
    recv_pos[p, q, k]: halo-buffer position on p for the k-th row received
      from q (same k-order as q's send to p).
    """

    send_slot: np.ndarray
    send_mask: np.ndarray
    recv_pos: np.ndarray
    halo_size: int


def build_exchange_plan(pg: PartitionedGraph) -> ExchangePlan:
    P, H = pg.halo_src_part.shape
    per_pair = [[None] * P for _ in range(P)]
    K = 1
    for q in range(P):
        for p in range(P):
            pos = np.flatnonzero(pg.halo_mask[q] & (pg.halo_src_part[q] == p))
            per_pair[p][q] = pos  # halo positions on q fed by p
            K = max(K, len(pos))
    send_slot = np.zeros((P, P, K), np.int32)
    send_mask = np.zeros((P, P, K), bool)
    recv_pos = np.zeros((P, P, K), np.int32)
    for p in range(P):
        for q in range(P):
            pos = per_pair[p][q]
            n = len(pos)
            send_slot[p, q, :n] = pg.halo_src_slot[q][pos]
            send_mask[p, q, :n] = True
            # p receives from q rows for p's halo entries sourced at q
            pos_r = per_pair[q][p]
            recv_pos[p, q, :len(pos_r)] = pos_r
    return ExchangePlan(send_slot=send_slot, send_mask=send_mask,
                        recv_pos=recv_pos, halo_size=H)


def halo_exchange_allgather(x_local, halo_src_part, halo_src_slot, halo_mask,
                            axis_name: str):
    """x_local: [C, F] this shard's slab. Returns halo rows [H, F]."""
    all_x = jax.lax.all_gather(x_local, axis_name)          # [P, C, F]
    h = all_x[halo_src_part, halo_src_slot]                  # [H, F]
    return jnp.where(halo_mask[:, None], h, 0.0)


def halo_exchange_a2a(x_local, send_slot, send_mask, recv_pos, halo_size: int,
                      axis_name: str):
    """A2A halo exchange inside shard_map.

    Args (all *local* shards, leading part axis removed by shard_map):
      x_local: [C, F]
      send_slot/send_mask: [P, K] what this shard sends to each peer.
      recv_pos: [P, K] halo positions for rows received from each peer.
    Returns: [H, F] halo feature rows.
    """
    sends = x_local[send_slot]                               # [P, K, F]
    sends = jnp.where(send_mask[:, :, None], sends, 0.0)
    recv = jax.lax.all_to_all(sends, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)                   # [P, K, F]
    # all_to_all with split/concat axis 0 on a [P, K, F] buffer: chunk q of
    # our send goes to peer q; we receive chunk p from peer p.
    H = halo_size
    F = x_local.shape[-1]
    halo = jnp.zeros((H, F), x_local.dtype)
    P, K = recv_pos.shape
    flat_pos = recv_pos.reshape(P * K)
    flat_rows = recv.reshape(P * K, F)
    # rows beyond each pair's real count are zero (masked at send); their
    # recv_pos defaults to 0 — scatter-add of zeros is harmless only if we
    # drop them, so use the sender's mask mirrored: zero rows add nothing.
    halo = halo.at[flat_pos].add(flat_rows)
    return halo


def partitioned_spmm(x_local, halo_x, senders, receivers, edge_mask,
                     nodes_per_part: int, edge_weight=None):
    """Local masked SpMM/segment-sum on one shard's slab.

    senders index [0, C+H): <C local slab, >=C halo buffer. XLA schedules
    the (independent) halo exchange concurrently with the local gather.
    """
    feats = jnp.concatenate([x_local, halo_x], axis=0)       # [C+H, F]
    msgs = feats[senders]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    msgs = jnp.where(edge_mask[:, None], msgs, 0.0)
    return jax.ops.segment_sum(msgs, receivers,
                               num_segments=nodes_per_part)


def halo_exchange_sum(x_parts, pg: PartitionedGraph, mesh, axis: str = "graph",
                      plan: Optional[ExchangePlan] = None,
                      edge_weight=None):
    """One full partitioned aggregation step under shard_map.

    x_parts: [P, C, F] node features, sharded over ``axis``.
    Returns [P, C, F] aggregated neighbor sums (local + halo edges).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_

    if plan is None:
        plan = build_exchange_plan(pg)
    C = pg.nodes_per_part

    sd = {k: jnp.asarray(v) for k, v in dict(
        senders=pg.senders, receivers=pg.receivers, edge_mask=pg.edge_mask,
        send_slot=plan.send_slot, send_mask=plan.send_mask,
        recv_pos=plan.recv_pos).items()}

    def f(x, senders, receivers, edge_mask, send_slot, send_mask, recv_pos):
        x = x[0]
        halo = halo_exchange_a2a(x, send_slot[0], send_mask[0], recv_pos[0],
                                 plan.halo_size, axis)
        out = partitioned_spmm(x, halo, senders[0], receivers[0],
                               edge_mask[0], C)
        return out[None]

    fn = shard_map(
        f, mesh=mesh,
        in_specs=(P_(axis), P_(axis), P_(axis), P_(axis), P_(axis), P_(axis),
                  P_(axis)),
        out_specs=P_(axis),
        check_vma=False,
    )
    return fn(x_parts, sd["senders"], sd["receivers"], sd["edge_mask"],
              sd["send_slot"], sd["send_mask"], sd["recv_pos"])


@dataclass
class RingPlan:
    """Host-precomputed ring schedule: for every (dest part p, source part
    q) the edges whose sender lives on q, as (sender slot on q, receiver
    slot on p) pairs padded to the max pair size K.

    e_slot[p, q, k]: sender's slot within q's slab.
    e_recv[p, q, k]: receiver's local slot on p.
    e_mask[p, q, k]: validity.
    """

    e_slot: np.ndarray
    e_recv: np.ndarray
    e_mask: np.ndarray


def build_ring_plan(pg: PartitionedGraph) -> RingPlan:
    P, E = pg.senders.shape
    C = pg.nodes_per_part
    pairs = [[[] for _ in range(P)] for _ in range(P)]
    for p in range(P):
        for e in range(E):
            if not pg.edge_mask[p, e]:
                continue
            s = int(pg.senders[p, e])
            r = int(pg.receivers[p, e])
            if s < C:
                q, slot = p, s
            else:
                h = s - C
                q, slot = int(pg.halo_src_part[p, h]), int(
                    pg.halo_src_slot[p, h])
            pairs[p][q].append((slot, r))
    K = max(1, max(len(pairs[p][q]) for p in range(P) for q in range(P)))
    e_slot = np.zeros((P, P, K), np.int32)
    e_recv = np.zeros((P, P, K), np.int32)
    e_mask = np.zeros((P, P, K), bool)
    for p in range(P):
        for q in range(P):
            for k, (slot, r) in enumerate(pairs[p][q]):
                e_slot[p, q, k] = slot
                e_recv[p, q, k] = r
                e_mask[p, q, k] = True
    return RingPlan(e_slot=e_slot, e_recv=e_recv, e_mask=e_mask)


def halo_exchange_sum_ring(x_parts, pg: PartitionedGraph, mesh,
                           axis: str = "graph",
                           plan: Optional[RingPlan] = None,
                           edge_weight=None):
    """Ring-pipelined partitioned aggregation (SURVEY §5's
    "ring-attention-style halo pipelining"): whole slabs travel the ring
    one ``ppermute`` hop per step while each device accumulates the
    partial aggregation from the slab it currently holds — compute at
    step s overlaps the hop for step s+1 (no data dependence between
    them), and every transfer is a single-neighbor ICI hop instead of
    the a2a's bisection traffic.

    Trade (mirror of ring attention): total bytes moved per device are
    O(P * C * F) regardless of cut size, vs the a2a's O(boundary rows).
    Prefer the ring when the cut is dense (halo ~ whole slabs) or when
    neighbor-hop bandwidth dominates; prefer a2a
    (:func:`halo_exchange_sum`) for sparse, well-partitioned cuts.

    Exactly equals :func:`halo_exchange_sum` (tests/test_parallel_ring.py).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_

    if plan is None:
        plan = build_ring_plan(pg)
    C = pg.nodes_per_part
    Pn = mesh.shape[axis]

    es = jnp.asarray(plan.e_slot)
    er = jnp.asarray(plan.e_recv)
    em = jnp.asarray(plan.e_mask)

    def f(x, e_slot, e_recv, e_mask):
        x = x[0]                                         # [C, F]
        e_slot, e_recv, e_mask = e_slot[0], e_recv[0], e_mask[0]  # [P, K]
        me = jax.lax.axis_index(axis)

        def body(carry, s):
            travel, out = carry
            q = jnp.mod(me - s, Pn)                       # part we hold
            rows = travel[e_slot[q]]                      # [K, F]
            rows = jnp.where(e_mask[q][:, None], rows, 0.0)
            out = out + jax.ops.segment_sum(rows, e_recv[q],
                                            num_segments=C)
            # hand the slab to the next device; independent of `out`, so
            # XLA overlaps the hop with the accumulation above
            travel = jax.lax.ppermute(
                travel, axis,
                [(i, (i + 1) % Pn) for i in range(Pn)])
            return (travel, out), None

        out0 = jnp.zeros_like(x)
        (travel, out), _ = jax.lax.scan(
            body, (x, out0), jnp.arange(Pn))
        return out[None]

    fn = shard_map(
        f, mesh=mesh,
        in_specs=(P_(axis), P_(axis), P_(axis), P_(axis)),
        out_specs=P_(axis),
        check_vma=False,
    )
    return fn(x_parts, es, er, em)
