"""Static-shape triplet (k->j->i) construction + angle/torsion geometry.

TPU-native re-design of ``dig/threedgraph/utils/geometric_computing.py:12-80``
(``xyz_to_dat``). The reference builds a dynamically-sized triplet list via
``torch_sparse`` CSR expansion; here every shape is static:

* Per-node *incoming-edge table* ``in_edges[n, d]`` (d < max_in_degree) built
  with one sort + rank-in-segment — a capped CSR.
* Triplets are the dense product ``[E, D]``: for edge e = (j -> i) and slot d,
  the triplet is (k -> j -> i) with k-edge ``in_edges[j, d]``; masked where
  the slot is empty or k == i.
* Torsion per triplet is a masked min over the D candidate reference
  neighbors of j (matching the reference's scatter-min at
  ``geometric_computing.py:75``), a ``[T, D]`` dihedral table.

Triplet order is grouped by ji-edge, so ``idx_ji`` is sorted — downstream
segment-sums over triplets pass ``indices_are_sorted=True``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class Triplets(NamedTuple):
    idx_kj: Array   # [T] edge id of k->j
    idx_ji: Array   # [T] edge id of j->i (sorted ascending over valid rows)
    idx_k: Array    # [T] node k
    idx_j: Array    # [T] node j
    idx_i: Array    # [T] node i
    mask: Array     # [T] bool
    in_edges: Array  # [N, D] incoming-edge table (for torsion reference set)
    in_mask: Array   # [N, D]
    kj_bwd_idx: Array   # [E, D] flat triplet ids t with idx_kj[t] == e
    kj_bwd_mask: Array  # [E, D] valid slots of kj_bwd_idx
    senders: Array      # [E] the edge list the triplets were built from
    receivers: Array    # [E]
    edge_mask: Array    # [E]
    # NK-layout extras (None on the sorted-flat path): enable [K, C]
    # BLOCK gathers in expand_kj instead of [T] row gathers — contiguous
    # 128-lane-aligned blocks instead of C-element rows, which is the
    # difference between a vector load and a serialized gather on TPU.
    nk_nbr: Optional[Array] = None  # [N, K] sender table (nbr_idx)
    nk_rev: Optional[Array] = None  # [N, K] reverse-edge ids (rev_edge)


def build_in_edge_table(receivers: Array, edge_mask: Array, num_nodes: int,
                        max_in_degree: int):
    """Capped per-node incoming edge table: ``in_edges[n, d]`` = id of the
    d-th edge with receiver n (order = ascending edge id), ``in_mask`` marks
    real slots. Overflow beyond ``max_in_degree`` is dropped.

    Also returns ``edge_rank [E]``: each edge's slot index within its
    receiver's row (``max_in_degree`` for padding/overflow edges).
    """
    E = receivers.shape[0]
    D = max_in_degree
    recv = jnp.where(edge_mask, receivers, num_nodes)  # park padding
    order = jnp.argsort(recv, stable=True)
    recv_sorted = recv[order]
    ones = (recv_sorted < num_nodes).astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, recv_sorted, num_segments=num_nodes + 1)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(E, dtype=jnp.int32)
    rank = pos - starts[recv_sorted]
    valid = (recv_sorted < num_nodes) & (rank < D)
    flat_idx = jnp.where(valid, recv_sorted * D + rank, num_nodes * D)
    in_edges = jnp.zeros(num_nodes * D, jnp.int32).at[flat_idx].set(
        order.astype(jnp.int32), mode="drop")
    in_mask = jnp.zeros(num_nodes * D, bool).at[flat_idx].set(
        True, mode="drop")
    edge_rank = jnp.full(E, D, jnp.int32).at[order].set(
        jnp.where(valid, rank, D).astype(jnp.int32))
    return in_edges.reshape(num_nodes, D), in_mask.reshape(num_nodes, D), \
        edge_rank


def build_triplets(senders: Array, receivers: Array, edge_mask: Array,
                   num_nodes: int, max_in_degree: int) -> Triplets:
    """All (k->j->i) triplets with k != i, shapes [E * D].

    Also builds the *reverse* index table ``kj_bwd_idx[f, d2]`` enumerating
    the flat triplet rows whose ``idx_kj`` is edge f — the gather indices
    for :func:`expand_kj`'s scatter-free VJP. Triplet t = (e, d) references
    f exactly when ``senders[e] == receivers[f]`` and d is f's slot in its
    receiver's in-table, so the consumers of f are
    ``out_edges[receivers[f], :] * D + edge_rank[f]``. Exact whenever every
    node's degree fits ``max_in_degree`` (radius graphs are symmetric, so
    the out-table overflows only when the in-table — and hence the forward
    — already dropped triplets at that node).
    """
    E = senders.shape[0]
    D = max_in_degree
    in_edges, in_mask, edge_rank = build_in_edge_table(
        receivers, edge_mask, num_nodes, D)
    out_edges, out_mask, _ = build_in_edge_table(
        senders, edge_mask, num_nodes, D)

    j = senders          # edge e: j -> i
    i = receivers
    kj = in_edges[j]                     # [E, D] edge ids k -> j
    kj_valid = in_mask[j] & edge_mask[:, None]
    k = jnp.where(kj_valid, senders[kj], 0)
    mask = kj_valid & (k != i[:, None])

    idx_ji = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32)[:, None], (E, D))
    idx_i = jnp.broadcast_to(i[:, None], (E, D))
    idx_j = jnp.broadcast_to(j[:, None], (E, D))

    oe = out_edges[receivers]            # [E, D] edges e with sender recv(f)
    om = out_mask[receivers]
    f_ok = edge_mask & (edge_rank < D)
    kj_bwd_mask = om & f_ok[:, None]
    kj_bwd_idx = jnp.where(kj_bwd_mask, oe * D + edge_rank[:, None], 0)

    def flat(x):
        return x.reshape(E * D)

    z = jnp.zeros((), jnp.int32)
    m = flat(mask)
    return Triplets(
        idx_kj=jnp.where(m, flat(kj), z),
        idx_ji=jnp.where(m, flat(idx_ji), z),
        idx_k=jnp.where(m, flat(k), z),
        idx_j=jnp.where(m, flat(idx_j), z),
        idx_i=jnp.where(m, flat(idx_i), z),
        mask=m,
        in_edges=in_edges,
        in_mask=in_mask,
        kj_bwd_idx=kj_bwd_idx,
        kj_bwd_mask=kj_bwd_mask,
        senders=senders,
        receivers=receivers,
        edge_mask=edge_mask,
    )


def build_triplets_nk(g) -> Triplets:
    """Triplets for an :class:`~dig_tpu.ops.radius.NKGraph` — zero sorts.

    In the [N, K] layout edge e = i*K + d, so every table the general
    :func:`build_triplets` constructs with a sort + rank-in-segment is
    closed-form index arithmetic:

    * in-edge table of node n  = ``arange(n*K, n*K + K)`` masked by
      ``nbr_mask[n]``;
    * out-edge table of node n = ``rev_edge[n]`` (graph symmetrized);
    * ``edge_rank[e] = e % K``.

    The result is bit-compatible with :class:`Triplets` (D = K), so the
    whole downstream pipeline (expand_kj, triplets_to_edges, geometry)
    runs unchanged.
    """
    N, K = g.nbr_idx.shape
    E = N * K
    in_edges = jnp.arange(E, dtype=jnp.int32).reshape(N, K)
    in_mask = g.nbr_mask

    j = g.senders                          # [E] = nbr_idx.reshape(-1)
    i = g.receivers
    kj = j[:, None] * K + jnp.arange(K, dtype=jnp.int32)[None, :]  # [E, K]
    kj_valid = g.nbr_mask[j] & g.edge_mask[:, None]
    k = jnp.where(kj_valid, g.nbr_idx[j], 0)
    mask = kj_valid & (k != i[:, None])

    idx_ji = jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32)[:, None],
                              (E, K))
    # Consumers of edge f (as a kj edge): triplets (e, d) with
    # senders[e] == receivers[f] and d == f % K — i.e. e ranges over the
    # out-edges of node receivers[f], which are exactly rev_edge[recv(f)].
    oe = g.rev_edge[i]                     # [E, K]
    om = g.nbr_mask[i]
    kj_bwd_mask = om & g.edge_mask[:, None]
    rank = jnp.arange(E, dtype=jnp.int32) % K
    kj_bwd_idx = jnp.where(kj_bwd_mask, oe * K + rank[:, None], 0)

    def flat(x):
        return x.reshape(E * K)

    z = jnp.zeros((), jnp.int32)
    m = flat(mask)
    return Triplets(
        idx_kj=jnp.where(m, flat(kj), z),
        idx_ji=jnp.where(m, flat(idx_ji), z),
        idx_k=jnp.where(m, flat(k), z),
        idx_j=jnp.where(m, flat(jnp.broadcast_to(j[:, None], (E, K))), z),
        idx_i=jnp.where(m, flat(jnp.broadcast_to(i[:, None], (E, K))), z),
        mask=m,
        in_edges=in_edges,
        in_mask=in_mask,
        kj_bwd_idx=kj_bwd_idx,
        kj_bwd_mask=kj_bwd_mask,
        senders=g.senders,
        receivers=g.receivers,
        edge_mask=g.edge_mask,
        nk_nbr=g.nbr_idx,
        nk_rev=g.rev_edge,
    )


def edges_to_nodes_nk(data: Array, num_nodes: int,
                      mask: Optional[Array] = None) -> Array:
    """Edge->node aggregation in the [N, K] layout: receivers[e] == e // K,
    so ``segment_sum(data, receivers, N)`` is a dense reshape-sum — the
    NK-layout replacement for the scatter at
    ``dig/threedgraph/method/schnet/schnet.py:55`` / ``spherenet.py:211``.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m, data, 0)
    K = data.shape[0] // num_nodes
    return data.reshape(num_nodes, K, *data.shape[1:]).sum(axis=1)


# Every expand op and its adjoint form a mutually-adjoint pair of LINEAR
# gathers, each wrapped in custom_vjp with the OTHER as its bwd rule. This
# closes the set under differentiation: force training (grad-of-grad,
# reference run.py:126) re-differentiates the staged-out adjoints, and
# without the closure XLA transposes the adjoint's gather into a
# serialized scatter-add (measured 20+ ms/step at the bench shape).

@jax.custom_vjp
def _nk_nbr_gather(x, nbr, rev, in_mask):
    """Closed node-table gather for the NK layout: ``x [N, C] ->
    out [N, K, C]`` with ``out[n, d] = x[nbr[n, d]]`` (raw — garbage at
    invalid slots, consumers mask).

    The plain gather's transpose is an [N*K -> N] scatter-add; here the
    adjoint is a gather over the reverse-edge table: the valid slots
    pointing at node m are exactly ``unravel(rev[m, t])`` for valid t
    (graph symmetrized), so ``dx[m] = sum_t in_mask[m,t] *
    ct.reshape(E, C)[rev[m, t]]``. EXACT only when the consumer's
    cotangent is zero at invalid slots — every geometry/basis consumer
    masks (same contract as :func:`expand_kj_raw`). Closed under
    differentiation (force training re-differentiates the adjoint)."""
    return x[nbr]


def _nk_nbr_gather_fwd(x, nbr, rev, in_mask):
    return x[nbr], (nbr, rev, in_mask)


def _nk_nbr_gather_bwd(res, ct):
    nbr, rev, in_mask = res
    return _nk_nbr_gather_adj(ct, nbr, rev, in_mask), None, None, None


@jax.custom_vjp
def _nk_nbr_gather_adj(ct, nbr, rev, in_mask):
    N, K = nbr.shape
    g = ct.reshape(N * K, -1)[rev]                     # [N, K, C]
    g = jnp.where(in_mask[:, :, None], g, 0)
    return g.sum(axis=1)                               # [N, C]


def _nk_nbr_gather_adj_fwd(ct, nbr, rev, in_mask):
    return _nk_nbr_gather_adj(ct, nbr, rev, in_mask), (nbr, rev, in_mask)


def _nk_nbr_gather_adj_bwd(res, u):
    # adjoint-of-adjoint = the raw forward gather (mask-free; licensed by
    # the consumer contract above)
    nbr, rev, in_mask = res
    return _nk_nbr_gather(u, nbr, rev, in_mask), None, None, None


_nk_nbr_gather.defvjp(_nk_nbr_gather_fwd, _nk_nbr_gather_bwd)
_nk_nbr_gather_adj.defvjp(_nk_nbr_gather_adj_fwd, _nk_nbr_gather_adj_bwd)


def nk_gather_nodes(x: Array, trip: Triplets) -> Array:
    """Public closed gather: per-node rows ``x [N, C]`` to the edge table
    ``[E, C]`` (E = N*K, row e = (i, d) holds ``x[nbr[i, d]]``) — the NK
    replacement for ``x[senders]`` with a scatter-free, re-differentiable
    adjoint (see :func:`_nk_nbr_gather`)."""
    assert trip.nk_nbr is not None
    N, K = trip.nk_nbr.shape
    return _nk_nbr_gather(x, trip.nk_nbr, trip.nk_rev,
                          trip.in_mask).reshape(N * K, -1)


def nk_gather(x: Array, nbr: Array, rev: Array, in_mask: Array) -> Array:
    """Table-based form of :func:`nk_gather_nodes` for callers holding an
    :class:`~dig_tpu.ops.radius.NKGraph` (nbr=nbr_idx, rev=rev_edge,
    in_mask=nbr_mask) rather than a Triplets: ``x [N, C] -> [N*K, C]``."""
    N, K = nbr.shape
    return _nk_nbr_gather(x, nbr, rev, in_mask).reshape(N * K, -1)


@jax.custom_vjp
def _expand_kj(x, mask, idx_kj, kj_bwd_idx, kj_bwd_mask):
    return jnp.where(mask[:, None], x[idx_kj], 0)


def _expand_kj_fwd(x, mask, idx_kj, kj_bwd_idx, kj_bwd_mask):
    return _expand_kj(x, mask, idx_kj, kj_bwd_idx, kj_bwd_mask), (
        mask, idx_kj, kj_bwd_idx, kj_bwd_mask)


def _expand_kj_bwd(res, ct):
    mask, idx_kj, kj_bwd_idx, kj_bwd_mask = res
    return (_expand_kj_adj(ct, mask, idx_kj, kj_bwd_idx, kj_bwd_mask),
            None, None, None, None)


@jax.custom_vjp
def _expand_kj_adj(ct, mask, idx_kj, kj_bwd_idx, kj_bwd_mask):
    ct = jnp.where(mask[:, None], ct, 0)
    g = ct[kj_bwd_idx]                                # [E, D, F]
    g = jnp.where(kj_bwd_mask[:, :, None], g, 0)
    return g.sum(axis=1)


def _expand_kj_adj_fwd(ct, mask, idx_kj, kj_bwd_idx, kj_bwd_mask):
    return _expand_kj_adj(ct, mask, idx_kj, kj_bwd_idx, kj_bwd_mask), (
        mask, idx_kj, kj_bwd_idx, kj_bwd_mask)


def _expand_kj_adj_bwd(res, u):
    mask, idx_kj, kj_bwd_idx, kj_bwd_mask = res
    return (_expand_kj(u, mask, idx_kj, kj_bwd_idx, kj_bwd_mask),
            None, None, None, None)


_expand_kj.defvjp(_expand_kj_fwd, _expand_kj_bwd)
_expand_kj_adj.defvjp(_expand_kj_adj_fwd, _expand_kj_adj_bwd)


@jax.custom_vjp
def _expand_kj_nk(x, mask, nk_nbr, nk_rev, in_mask):
    N, K = nk_nbr.shape
    x3 = x.reshape(N, K, x.shape[-1])
    out = x3[nk_nbr]                                  # [N, K, K, C] blocks
    return jnp.where(mask[:, None], out.reshape(mask.shape[0], -1), 0)


def _expand_kj_nk_fwd(x, mask, nk_nbr, nk_rev, in_mask):
    return _expand_kj_nk(x, mask, nk_nbr, nk_rev, in_mask), (
        mask, nk_nbr, nk_rev, in_mask)


def _expand_kj_nk_bwd(res, ct):
    mask, nk_nbr, nk_rev, in_mask = res
    return (_expand_kj_nk_adj(ct, mask, nk_nbr, nk_rev, in_mask),
            None, None, None, None)


@jax.custom_vjp
def _expand_kj_nk_adj(ct, mask, nk_nbr, nk_rev, in_mask):
    # dL/dx[j*K+dd] = sum over j's out-edges (i, d) of ct[(i*K+d)*K + dd]:
    # the out-edges of j are exactly rev_edge[j, :], so the adjoint is one
    # [K, C]-block gather by nk_rev plus a sum over the neighbor axis.
    N, K = nk_rev.shape
    C = ct.shape[-1]
    ct = jnp.where(mask[:, None], ct, 0)
    ctE = ct.reshape(N * K, K, C)
    g4 = ctE[nk_rev]                                  # [N, K(m), K(dd), C]
    g4 = jnp.where(in_mask[:, :, None, None], g4, 0)
    return g4.sum(axis=1).reshape(N * K, C)


def _expand_kj_nk_adj_fwd(ct, mask, nk_nbr, nk_rev, in_mask):
    return _expand_kj_nk_adj(ct, mask, nk_nbr, nk_rev, in_mask), (
        mask, nk_nbr, nk_rev, in_mask)


def _expand_kj_nk_adj_bwd(res, u):
    mask, nk_nbr, nk_rev, in_mask = res
    return (_expand_kj_nk(u, mask, nk_nbr, nk_rev, in_mask),
            None, None, None, None)


_expand_kj_nk.defvjp(_expand_kj_nk_fwd, _expand_kj_nk_bwd)
_expand_kj_nk_adj.defvjp(_expand_kj_nk_adj_fwd, _expand_kj_nk_adj_bwd)


@jax.custom_vjp
def _expand_kj_nk_raw(x, nk_nbr, nk_rev, in_mask):
    N, K = nk_nbr.shape
    return x.reshape(N, K, x.shape[-1])[nk_nbr].reshape(N * K * K, -1)


def _expand_kj_nk_raw_fwd(x, nk_nbr, nk_rev, in_mask):
    return _expand_kj_nk_raw(x, nk_nbr, nk_rev, in_mask), (
        nk_nbr, nk_rev, in_mask)


def _expand_kj_nk_raw_bwd(res, ct):
    nk_nbr, nk_rev, in_mask = res
    return (_expand_kj_nk_raw_adj(ct, nk_nbr, nk_rev, in_mask),
            None, None, None)


@jax.custom_vjp
def _expand_kj_nk_raw_adj(ct, nk_nbr, nk_rev, in_mask):
    N, K = nk_rev.shape
    C = ct.shape[-1]
    ctE = ct.reshape(N * K, K, C)
    g4 = ctE[nk_rev]
    g4 = jnp.where(in_mask[:, :, None, None], g4, 0)
    return g4.sum(axis=1).reshape(N * K, C)


def _expand_kj_nk_raw_adj_fwd(ct, nk_nbr, nk_rev, in_mask):
    return _expand_kj_nk_raw_adj(ct, nk_nbr, nk_rev, in_mask), (
        nk_nbr, nk_rev, in_mask)


def _expand_kj_nk_raw_adj_bwd(res, u):
    # adjoint-of-adjoint = the raw forward gather. Mask-free like the
    # forward: rows at invalid triplet slots are garbage, licensed by the
    # same consumer contract as expand_kj_raw (the fused kernel masks
    # every use of this cotangent with the triplet mask).
    nk_nbr, nk_rev, in_mask = res
    return (_expand_kj_nk_raw(u, nk_nbr, nk_rev, in_mask),
            None, None, None)


_expand_kj_nk_raw.defvjp(_expand_kj_nk_raw_fwd, _expand_kj_nk_raw_bwd)
_expand_kj_nk_raw_adj.defvjp(_expand_kj_nk_raw_adj_fwd,
                             _expand_kj_nk_raw_adj_bwd)


def expand_kj_raw(x: Array, trip: Triplets) -> Array:
    """Mask-FREE NK block-gather expand: returns raw gathered rows with
    garbage at invalid triplet slots, and an adjoint that covers only the
    mutual-edge slots.

    ONLY safe when the consumer both (a) multiplies the output by the
    triplet mask before any reduction and (b) zeroes its cotangent at
    masked rows — :func:`dig_tpu.ops.pallas_triplet.fused_triplet_product`
    does exactly this, which lets the pipeline skip two [T, C] where
    passes per layer."""
    assert trip.nk_nbr is not None
    return _expand_kj_nk_raw(x, trip.nk_nbr, trip.nk_rev, trip.in_mask)


def expand_kj(x: Array, trip: Triplets) -> Array:
    """Gather per-edge rows ``x [E, F]`` to triplet rows ``[T, F]`` via
    ``idx_kj``, zeroing masked triplets — with a scatter-free custom VJP.

    The plain gather's adjoint is a T-row scatter-add into ``[E, F]``,
    which XLA lowers to a serialized loop on TPU (the reference hits the
    same aggregation via ``torch_scatter`` on GPU atomics,
    ``dig/threedgraph/method/spherenet/spherenet.py:171``). Here the
    adjoint is itself a dense gather over the precomputed reverse table
    ``trip.kj_bwd_idx`` plus a sum over the degree axis — MXU/VPU-friendly
    and deterministic.

    The index tables are explicit custom_vjp arguments (not closure
    captures): a custom_vjp closing over traced arrays leaks tracers under
    ``jax.checkpoint`` (the SphereNet ``remat=True`` path).

    NK layout (``trip.nk_nbr`` set): both the gather and its adjoint run as
    [K, C]-block gathers (see the Triplets field comment) — same math,
    contiguous memory.
    """
    if trip.nk_nbr is not None:
        return _expand_kj_nk(x, trip.mask, trip.nk_nbr, trip.nk_rev,
                             trip.in_mask)
    return _expand_kj(x, trip.mask, trip.idx_kj, trip.kj_bwd_idx,
                      trip.kj_bwd_mask)


def triplets_to_edges(data: Array, num_edges: int,
                      mask: Optional[Array] = None) -> Array:
    """Sum triplet rows onto their ji edge: the exact replacement for
    ``segment_sum(data, trip.idx_ji, E)``. :func:`build_triplets` lays
    triplets out ``[E, D]`` row-major (``idx_ji[e*D+d] == e``), so the
    reduction is a dense reshape-sum — no scatter reaches XLA at all.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m, data, 0)
    D = data.shape[0] // num_edges
    return data.reshape(num_edges, D, *data.shape[1:]).sum(axis=1)


def edge_distances(pos: Array, senders: Array, receivers: Array,
                   edge_mask: Array, eps: float = 1e-12) -> Array:
    diff = pos[receivers] - pos[senders]
    d2 = jnp.sum(diff * diff, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    return jnp.where(edge_mask, d, 1.0)  # pad with 1.0: safe for log/div


def _components(pos: Array):
    """Split [N, 3] positions into three [N] arrays. All downstream geometry
    is componentwise (structure-of-arrays): a trailing dim of 3 pads to the
    TPU's 128-lane minor dimension (~42x physical blowup) and jnp.cross on
    it defeats fusion, so 3-vectors never appear as arrays here."""
    return pos[:, 0], pos[:, 1], pos[:, 2]


def _edge_frames(pos: Array, trip: Triplets):
    """Per-edge geometry in the [E, D] block layout.

    Every triplet (e, d) shares edge e's ji vector and draws its k/n
    neighbors from the SAME in-neighbor table row of j = senders[e], so all
    geometry is computed on per-node tables gathered per edge — E row
    fetches instead of T = E*D (or T*D) scalar gathers, the difference
    between ~4k and ~4M gather rows on TPU.

    NK layout (``trip.nk_nbr`` set): receivers are ``repeat(arange(N), K)``
    and the in-neighbor table IS ``nk_nbr``, so the i-indexed scalar
    gathers become broadcasts, ``kn_tab`` is free, and the per-edge tables
    are [K]-row block gathers — this path halves the gather count of the
    general one (which was ~12% of the SphereNet train step).

    Returns componentwise arrays: ji [E] (x,y,z), jk [E, D] (x,y,z),
    kn_tab [N, D] neighbor node ids, and nbr_mask [E, D].
    """
    px, py, pz = _components(pos)
    if trip.nk_nbr is not None:
        nbr = trip.nk_nbr                                  # [N, K]
        N, K = nbr.shape
        # one closed [N, 3]-row gather (scatter-free adjoint, closed under
        # differentiation — force training re-differentiates this chain
        # and a plain gather's transposed scatter-add was 8% of the step)
        pn = _nk_nbr_gather(pos, nbr, trip.nk_rev, trip.in_mask)
        pxn, pyn, pzn = pn[..., 0], pn[..., 1], pn[..., 2]  # [N, K]
        # ev[n, s] = pos[nbr[n, s]] - pos[n]  (vector n -> s-th neighbor)
        evx, evy, evz = (pxn - px[:, None], pyn - py[:, None],
                         pzn - pz[:, None])
        # edge e = (i, d): ji = pos[i] - pos[j] = -ev[i, d]
        jix, jiy, jiz = (-evx.reshape(-1), -evy.reshape(-1),
                         -evz.reshape(-1))                 # [E]
        # jk[e=(i,d), s] = ev[j, s] — one closed [K, 3K]-row block gather
        evcat = jnp.concatenate([evx, evy, evz], axis=1)   # [N, 3K]
        g = _nk_nbr_gather(evcat, nbr, trip.nk_rev,
                           trip.in_mask).reshape(N * K, 3 * K)
        jkx, jky, jkz = g[:, :K], g[:, K:2 * K], g[:, 2 * K:]
        kn_tab = nbr
        nbr_mask = (trip.in_mask[nbr].reshape(N * K, K)
                    & trip.edge_mask[:, None])
        return (jix, jiy, jiz), (jkx, jky, jkz), kn_tab, nbr_mask
    j, i = trip.senders, trip.receivers
    jix, jiy, jiz = px[i] - px[j], py[i] - py[j], pz[i] - pz[j]   # [E]
    kn_tab = jnp.where(trip.in_mask, trip.senders[trip.in_edges], 0)  # [N, D]
    kx_t, ky_t, kz_t = px[kn_tab], py[kn_tab], pz[kn_tab]         # [N, D]
    jkx = kx_t[j] - px[j][:, None]                                 # [E, D]
    jky = ky_t[j] - py[j][:, None]
    jkz = kz_t[j] - pz[j][:, None]
    nbr_mask = trip.in_mask[j] & trip.edge_mask[:, None]           # [E, D]
    return (jix, jiy, jiz), (jkx, jky, jkz), kn_tab, nbr_mask


def nk_edge_distances(pos: Array, trip: Triplets, eps: float = 1e-12) -> Array:
    """Edge lengths [E] in the NK layout, from the same closed frame table
    as :func:`triplet_geometry` (XLA CSEs the shared gather) — the NK
    replacement for :func:`edge_distances`, whose ``pos[senders]`` gather
    transposes to a scatter-add under dE/dpos. Masked rows hold 1.0."""
    (jix, jiy, jiz), _, _, _ = _edge_frames(pos, trip)
    d = jnp.sqrt(jnp.maximum(jix * jix + jiy * jiy + jiz * jiz, eps))
    return jnp.where(trip.edge_mask, d, 1.0)


def triplet_kj_distances(pos: Array, trip: Triplets,
                         eps: float = 1e-12) -> Array:
    """Per-triplet k->j edge length [T] — computed from the same [E, D]
    frame table as :func:`triplet_geometry` (XLA CSEs the shared
    subexpressions), NOT as ``dist[idx_kj]``: a [T]-element scalar gather
    runs at ~9 GB/s row-granularity on TPU and was 26% of the SphereNet
    train step. Masked rows hold 1.0 (log/div-safe for the bessel basis,
    matching edge_distances' padding)."""
    _, (jkx, jky, jkz), _, nbr_mask = _edge_frames(pos, trip)
    d = jnp.sqrt(jnp.maximum(jkx * jkx + jky * jky + jkz * jkz, eps))
    return jnp.where(nbr_mask.reshape(-1) & trip.mask, d.reshape(-1), 1.0)


def triplet_geometry(pos: Array, trip: Triplets, eps: float = 1e-12) -> Array:
    """Angle at j between j->i and j->k for each triplet, in [0, pi].

    Same atan2(|cross|, dot) formulation as the reference
    (``geometric_computing.py:44-48``) — stable near 0 and pi — evaluated
    on the [E, D] block layout (see :func:`_edge_frames`).
    """
    (jix, jiy, jiz), (jkx, jky, jkz), _, _ = _edge_frames(pos, trip)
    a = jix[:, None] * jkx + jiy[:, None] * jky + jiz[:, None] * jkz
    cx = jiy[:, None] * jkz - jiz[:, None] * jky
    cy = jiz[:, None] * jkx - jix[:, None] * jkz
    cz = jix[:, None] * jky - jiy[:, None] * jkx
    b = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, eps))
    angle = jnp.arctan2(b, a).reshape(-1)
    return jnp.where(trip.mask, angle, 0.0)


def torsion_angles(pos: Array, trip: Triplets, eps: float = 1e-12) -> Array:
    """Per-triplet torsion: min over reference neighbors k_n of j (k_n != i)
    of the dihedral angle between planes (ji, jk) and (ji, j k_n), mapped to
    (0, 2*pi] (reference: ``geometric_computing.py:51-76``).

    Both k and the candidates n index the SAME per-edge plane table
    P[e, s] = ji x (s-th in-neighbor of j), so the [E, D, D] dihedral grid
    is three outer products of [E, D] arrays — it fuses into the min-reduce
    with no T- or T*D-sized gathers anywhere.

    AD structure: the [E, D, D] grid only SELECTS the reference neighbor —
    the min's subgradient flows through exactly one candidate — so the
    grid is evaluated under ``stop_gradient`` (argmin only) and the
    dihedral is recomputed on the selected [E, D] candidates, gathered by
    a one-hot einsum (no scatter in the adjoint, exact gradients a.e.; the
    argmin index is piecewise-constant in pos). In force training the
    grid's trig would otherwise be re-differentiated at every AD level —
    it was the largest elementwise block of the double-backward step.
    """
    (jix, jiy, jiz), (jkx, jky, jkz), kn_tab, nbr_mask = _edge_frames(
        pos, trip)
    j, i = trip.senders, trip.receivers
    dist_ji = jnp.sqrt(jnp.maximum(jix * jix + jiy * jiy + jiz * jiz, eps))

    # Plane table P[e, s] = ji[e] x jk[e, s]  ([E, D] per component).
    p_x = jiy[:, None] * jkz - jiz[:, None] * jky
    p_y = jiz[:, None] * jkx - jix[:, None] * jkz
    p_z = jix[:, None] * jky - jiy[:, None] * jkx

    cand_valid = nbr_mask & (kn_tab[j] != i[:, None])   # [E, D] over n

    def dihedral(px_d, py_d, pz_d, px_n, py_n, pz_n, jx, jy, jz, dji):
        # a = P_d . P_n; b = (P_d x P_n) . ji / |ji|
        a = px_d * px_n + py_d * py_n + pz_d * pz_n
        b = ((py_d * pz_n - pz_d * py_n) * jx
             + (pz_d * px_n - px_d * pz_n) * jy
             + (px_d * py_n - py_d * px_n) * jz) / dji
        # Double-where: arctan2(0, 0) has a NaN gradient which leaks
        # through a single jnp.where; sanitize BEFORE arctan2.
        degenerate = (a * a + b * b) < eps
        a = jnp.where(degenerate, 1.0, a)
        b = jnp.where(degenerate, 0.0, b)
        tors = jnp.arctan2(b, a)
        # Reference remaps tors <= 0 to (0, 2*pi] (geometric_computing.py
        # :74). Small epsilon: the k_n == k self-candidate has b == 0
        # exactly in eager arithmetic (-> 2*pi in the reference) but XLA
        # fusion can leave b ~ 1e-9, which would otherwise land on the
        # wrong branch.
        return jnp.where(tors <= 1e-6, tors + 2.0 * jnp.pi, tors)

    def outer(u, v):
        return u[:, :, None] * v[:, None, :]

    def dihedral_key(px_d, py_d, pz_d, px_n, py_n, pz_n, jx, jy, jz, dji):
        """Monotone surrogate of the remapped dihedral for the argmin
        ONLY: the 'diamond angle' t(a, b) = quadrant + frac in [0, 4) is
        a strictly increasing function of atan2(b, a) mod 2*pi, so
        argmin(key) == argmin(remapped dihedral) while costing one
        divide instead of an arctan2 over the [E, D, D] grid (the grid's
        trig was the largest elementwise block of the force step; the
        true dihedral is still computed on the selected candidates)."""
        a = px_d * px_n + py_d * py_n + pz_d * pz_n
        b = ((py_d * pz_n - pz_d * py_n) * jx
             + (pz_d * px_n - px_d * pz_n) * jy
             + (px_d * py_n - py_d * px_n) * jz) / dji
        degenerate = (a * a + b * b) < eps
        a = jnp.where(degenerate, 1.0, a)
        b = jnp.where(degenerate, 0.0, b)
        ab = jnp.abs(a) + jnp.abs(b)
        num = jnp.where(b >= 0, jnp.where(a >= 0, b, -a),
                        jnp.where(a < 0, -b, a))
        off = jnp.where(b >= 0, jnp.where(a >= 0, 0.0, 1.0),
                        jnp.where(a < 0, 2.0, 3.0))
        t = off + num / ab
        # same branch threshold as dihedral()'s tors <= 1e-6 remap:
        # t ~ theta to first order near 0
        return jnp.where(t <= 1e-6, t + 4.0, t)

    # selection pass (no gradients): full [E, D, D] grid -> argmin index
    sg = jax.lax.stop_gradient
    gx, gy, gz = sg(p_x), sg(p_y), sg(p_z)
    tors_grid = dihedral_key(
        gx[:, :, None], gy[:, :, None], gz[:, :, None],
        gx[:, None, :], gy[:, None, :], gz[:, None, :],
        sg(jix)[:, None, None], sg(jiy)[:, None, None],
        sg(jiz)[:, None, None], sg(dist_ji)[:, None, None])
    tors_grid = jnp.where(cand_valid[:, None, :], tors_grid, 1e30)
    n_star = jnp.argmin(tors_grid, axis=2)              # [E, D]
    any_valid = jnp.min(tors_grid, axis=2) < 1e29

    # differentiable pass on the selected candidates only: one-hot einsum
    # (contraction, not gather — its adjoint is the transposed einsum)
    onehot = (jnp.arange(p_x.shape[1])[None, None, :]
              == n_star[:, :, None]).astype(p_x.dtype)
    sel = lambda t: jnp.einsum("eds,es->ed", onehot, t)
    out = dihedral(p_x, p_y, p_z, sel(p_x), sel(p_y), sel(p_z),
                   jix[:, None], jiy[:, None], jiz[:, None],
                   dist_ji[:, None]).reshape(-1)        # [E, D] -> [T]
    # Empty candidate sets cannot occur for valid triplets (k itself is
    # always a candidate), but guard padding rows:
    return jnp.where(trip.mask & any_valid.reshape(-1), out, 0.0)
