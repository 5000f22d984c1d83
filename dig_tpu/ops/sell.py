"""SELL-style (sliced-ELLPACK) segment sum / SpMM for TPU.

The round-5 redesign of the CSR segment-sum hot path (the
``torch_scatter.scatter`` / ``torch_sparse`` replacement —
``dig/threedgraph/method/schnet/schnet.py:55``,
``dig/lsgraph/method/GraphFMOB/models/base.py``).

Why not a scatter kernel: a segment sum is HBM-bound, so the only thing
that matters is keeping every byte moved useful and letting the memory
system stream. The round-4/5 Pallas one-hot-matmul CSR kernels top out at
~85-89 GB/s useful on the bench graph because the ``[block_rows, EB]``
one-hot contraction (3 bf16 passes for f32 exactness) plus its VPU
mask-build outruns the DMA once row blocks are large enough to amortize
window slack (measured ladder in ``docs/performance.md``). XLA's own
``segment_sum`` scatter lowering reaches ~104 GB/s.

SELL instead removes ALL reduction arithmetic beyond the unavoidable
adds: rows are sorted by degree (the σ-sort of SELL-C-σ), padded up to a
small ladder of slice widths, and each width-``d`` bucket becomes a dense
``[rows, d]`` gather table into the edge array. The segment sum is then
``data[idx].sum(axis=1)`` per bucket — an XLA fused gather+reduce that
streams at full read bandwidth with ~6-9% padding overhead on
lsgraph-shaped degree distributions (measured: 169 GB/s useful vs the
155-160 GB/s read+write stream calibration on the bench chip — gathers
ride the higher read-mostly DRAM rate).

The plan (permutation + tables) is static per graph and built host-side,
exactly like the METIS partition the reference computes once per graph
(``dig/lsgraph/method/GraphFMOB/metis.py:14``). Output rows come out in
degree-sorted order; ``plan.unpermute`` restores original row order (an
extra N*F*4-byte gather, ~6% of edge traffic — skip it when the consumer
can work in permuted space, as the lsgraph models do across layers).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SellPlan:
    """Static per-graph gather plan. Fields are device arrays; the object
    is a pytree leaf-holder safe to close over in jit."""
    tables: tuple          # tuple of int32 [rows_b, d_b] gather tables
    row_order: jnp.ndarray  # int32 [N] original row id per output row
    out_inv: jnp.ndarray    # int32 [N] output row per original row id
    edge_row_out: jnp.ndarray  # int32 [E] output row of each edge (-1 pad)
    num_rows: int
    num_edges: int
    pad_overhead: float     # padded/real edge ratio - 1 (diagnostic)
    num_zero_rows: int = 0  # degree-0 rows: no gather table at all — the
    # kernel appends a zeros block (they sort last in row_order)

    def unpermute(self, out):
        return out[self.out_inv]


jax.tree_util.register_pytree_node(
    SellPlan,
    lambda p: ((p.tables, p.row_order, p.out_inv, p.edge_row_out),
               (p.num_rows, p.num_edges, p.pad_overhead, p.num_zero_rows)),
    lambda aux, ch: SellPlan(tables=ch[0], row_order=ch[1], out_inv=ch[2],
                             edge_row_out=ch[3], num_rows=aux[0],
                             num_edges=aux[1], pad_overhead=aux[2],
                             num_zero_rows=aux[3]))


def build_sell_plan(rowptr, *, width_multiple: int = 4,
                    min_width: int = 4) -> SellPlan:
    """Host-side SELL-C-σ plan from a CSR rowptr (numpy).

    Rows are sorted by degree (descending), each row's slice width is its
    degree rounded up to ``width_multiple`` (the bucket ladder), and every
    bucket gets a dense gather table whose padding entries point at a
    zero row appended to the edge data.
    """
    rp = np.asarray(rowptr, np.int64)
    N = rp.shape[0] - 1
    E = int(rp[-1])
    deg = np.diff(rp)
    perm = np.argsort(-deg, kind="stable")
    # degree-0 rows get NO table: the kernel appends a zeros block for
    # them (they sort last). Partitioned subgraphs routinely carry ~50%
    # zero-degree halo/padding rows; gathering 4-wide pad lanes for each
    # was pure overhead.
    nz = perm[deg[perm] > 0]
    zero_rows = perm[deg[perm] == 0]
    dpad = np.maximum(min_width, -(-deg // width_multiple) * width_multiple)
    tables = []
    order_parts = []
    for d in np.unique(dpad[nz]):
        rows = nz[dpad[nz] == d]
        starts = rp[rows]
        lens = deg[rows]
        idx = starts[:, None] + np.arange(d)[None, :]
        idx = np.where(np.arange(d)[None, :] < lens[:, None], idx, E)
        tables.append(jnp.asarray(idx.astype(np.int32)))
        order_parts.append(rows)
    order_parts.append(zero_rows)
    row_order = np.concatenate(order_parts) if order_parts else \
        np.zeros(0, np.int64)
    out_inv = np.empty(N, np.int64)
    out_inv[row_order] = np.arange(N)
    edge_row_out = np.repeat(out_inv, deg)
    pad = float(sum(int(t.size) for t in tables)) / max(E, 1) - 1.0
    return SellPlan(tables=tuple(tables),
                    row_order=jnp.asarray(row_order.astype(np.int32)),
                    out_inv=jnp.asarray(out_inv.astype(np.int32)),
                    edge_row_out=jnp.asarray(edge_row_out.astype(np.int32)),
                    num_rows=N, num_edges=E, pad_overhead=pad,
                    num_zero_rows=int(len(zero_rows)))


def segment_sum_sell(data, plan: SellPlan, *, original_order: bool = False):
    """Segment sum of ``data [E, F]`` under ``plan`` -> ``[N, F]`` f32.

    Output rows are in the plan's degree-sorted order unless
    ``original_order`` (one extra N-row gather). Differentiable: the VJP
    is the per-edge row gather ``d_data[e] = d_out[row(e)]`` — identical
    to the CSR kernels' VJP, still one HBM-optimal gather.
    """
    out = _sell_core(data, plan)
    return plan.unpermute(out) if original_order else out


@jax.custom_vjp
def _sell_core(data, plan):
    E, F = data.shape
    d32 = data.astype(jnp.float32)
    outs = []
    for t in plan.tables:
        # padding entries hold index E: clamp the gather and zero the lane
        # via where — XLA fuses compare+select into the gather+reduce, so
        # no padded copy of `data` is ever materialized
        g = d32[jnp.minimum(t, E - 1)]
        outs.append(jnp.where((t < E)[:, :, None], g, 0.0).sum(axis=1))
    if plan.num_zero_rows:
        outs.append(jnp.zeros((plan.num_zero_rows, F), jnp.float32))
    return jnp.concatenate(outs) if outs else jnp.zeros((0, F), jnp.float32)


def _sell_fwd(data, plan):
    return _sell_core(data, plan), (plan, jnp.zeros((0,), data.dtype))


def _sell_bwd(res, g):
    plan, dtype_token = res
    d_data = g[plan.edge_row_out]
    return (d_data.astype(dtype_token.dtype), None)


_sell_core.defvjp(_sell_fwd, _sell_bwd)


def spmm_sell(col, val, x, plan: SellPlan, *, original_order: bool = True):
    """CSR sparse @ dense via the SELL plan: ``out[i] = sum_e val*x[col]``.

    ``col``/``val`` follow the same sorted-CSR layout the plan was built
    from. The edge gather ``x[col]`` fuses with the bucket gathers.
    """
    data = x[col]
    if val is not None:
        data = data * val[:, None]
    return segment_sum_sell(data, plan, original_order=original_order)
