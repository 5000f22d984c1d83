"""Row-blocked CSR segment-sum / SpMM — Pallas TPU kernel.

TPU replacement for the reference's sorted ``torch_scatter.scatter`` hot
loops (``dig/threedgraph/method/schnet/schnet.py:55``,
``spherenet.py:171,211,224``) and for ``torch_sparse`` SpMM in the
large-graph path (``dig/lsgraph/method/GraphFMOB/models/base.py``).

Design (see SURVEY.md §7 "SpMM/segment-sum performance"):

* Edges arrive sorted by destination row with a CSR ``rowptr`` — the
  layout ``dense_to_flat`` and the lsgraph partitioner already produce.
* The grid runs over blocks of ``block_rows`` output rows. Each step DMAs
  a fixed-size window of ``max_edges_per_block`` edge rows from HBM at a
  *dynamic* offset (``rowptr[k*block_rows]``, scalar-prefetched) into
  VMEM — the one part XLA's static-shape model cannot express.
* The per-block reduction is a one-hot matmul on the MXU:
  ``out[r, f] = sum_e 1[seg[e] == r] * data[e, f]``. A segment sum is
  HBM-bound (it must read every edge row once), so spending
  ``block_rows`` extra MACs per element is free and avoids both scalar
  scatter loops and the full ``[N, E]`` one-hot fallback.
* Edge-window membership needs no explicit masking: edges past the
  block's true extent belong to later rows, so their one-hot column is
  all zero (padding edges carry segment id -1).

Overflow: a window holds at most ``max_edges_per_block`` edges; blocks
whose true edge count exceeds the cap contribute only the first
``max_edges_per_block`` edges and the excess is returned as an overflow
count (never silently wrong — callers size caps from data statistics,
the repo-wide static-cap convention).

The custom VJP is the row gather ``d_data[e] = d_out[seg[e]]`` — a plain
XLA gather (already HBM-optimal, and free of dynamic-offset writes).
Off TPU everything runs in interpret mode (tests/test_pallas_segment.py);
``jax.ops.segment_sum`` remains the oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(starts_ref, seg_hbm, data_hbm, out_ref, seg_v, data_v, sems,
                *, BN: int, EB: int, F: int, NB: int):
    """Double-buffered across grid steps: while block k's one-hot matmul
    runs, block k+1's window is already in flight (scratch and DMA
    semaphores persist across the sequential TPU grid)."""
    k = pl.program_id(0)

    def dmas(idx, slot):
        # DMA offsets must be tile-aligned (sublane 8 / lane 128); align
        # the window start DOWN to 128. Over-fetched leading edges belong
        # to earlier rows, so their one-hot column is zero — correctness
        # needs no masking, only ~128 slack in the window cap (see
        # csr_block_overflow).
        start_al = pl.multiple_of((starts_ref[idx] // 128) * 128, 128)
        return (pltpu.make_async_copy(seg_hbm.at[:, pl.ds(start_al, EB)],
                                      seg_v.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(data_hbm.at[pl.ds(start_al, EB), :],
                                      data_v.at[slot], sems.at[slot, 1]))

    @pl.when(k == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(k + 1 < NB)
    def _():
        for d in dmas(k + 1, (k + 1) % 2):
            d.start()

    slot = k % 2
    for d in dmas(k, slot):
        d.wait()
    rel = seg_v[slot] - k * BN                               # [1, EB]
    row = jax.lax.broadcasted_iota(jnp.int32, (BN, EB), 0)
    onehot = (rel == row).astype(data_v.dtype)               # [BN, EB]
    # HIGHEST: the sum must be f32-exact; the DMA, not this matmul, is the
    # throughput bound, so full-precision passes are free.
    out_ref[...] = jnp.dot(onehot, data_v[slot],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def segment_sum_sorted_csr(data, seg_ids, rowptr, num_rows, block_rows=32,
                           max_edges_per_block=1024):
    """Sorted-CSR segment sum: data [E, F], seg_ids [E] (ascending; -1 for
    padding rows), rowptr [num_rows+1] -> out [num_rows, F] float32.

    ``num_rows``, ``block_rows`` and ``max_edges_per_block`` are static;
    ``num_rows`` is padded to a multiple of ``block_rows`` internally and
    F to a lane multiple. Edges beyond a block's window cap are dropped —
    use :func:`csr_block_overflow` to check/account.
    """
    return _ss_fwd(data, seg_ids, rowptr, num_rows, block_rows,
                   max_edges_per_block)[0]


def csr_block_overflow(rowptr, num_rows: int, block_rows: int,
                       max_edges_per_block: int):
    """Total edges that ``segment_sum_sorted_csr`` would drop (0 == safe).

    Accounts for the kernel's 128-aligned window start: a block's window
    effectively holds ``max_edges_per_block - (start % 128)`` of its own
    edges.
    """
    NB = _round_up(num_rows, block_rows) // block_rows
    rp = jnp.pad(rowptr, (0, NB * block_rows + 1 - rowptr.shape[0]),
                 mode="edge")
    starts = rp[:: block_rows][:NB]
    ends = rp[:: block_rows][1:NB + 1]
    start_al = (starts // 128) * 128
    kept = jnp.clip(start_al + max_edges_per_block - starts, 0,
                    ends - starts)
    return jnp.sum((ends - starts) - kept)


def _prep(data, seg_ids, rowptr, num_rows, BN, EB):
    E, F = data.shape
    F_pad = _round_up(F, 128) if _on_tpu() else F
    N_pad = _round_up(num_rows, BN)
    NB = N_pad // BN
    if F_pad != F:
        data = jnp.pad(data, ((0, 0), (0, F_pad - F)))
    # pad edges so a window DMA starting at rowptr[-1] stays in bounds
    data = jnp.pad(data, ((0, EB), (0, 0)))
    seg = jnp.pad(seg_ids.astype(jnp.int32), (0, EB), constant_values=-1)
    seg2 = seg.reshape(1, -1)                    # [1, E+EB]: lane layout
    rp = jnp.pad(rowptr.astype(jnp.int32),
                 (0, N_pad + 1 - rowptr.shape[0]), mode="edge")
    starts = rp[::BN][:NB]
    return data, seg2, starts, F_pad, N_pad, NB


def _ss_fwd(data, seg_ids, rowptr, num_rows, BN, EB):
    orig_dtype = data.dtype
    E, F = data.shape
    data_p, seg2, starts, F_pad, N_pad, NB = _prep(
        data, seg_ids, rowptr, num_rows, BN, EB)
    kern = functools.partial(_fwd_kernel, BN=BN, EB=EB, F=F_pad, NB=NB)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # seg [1, E+EB]
                pl.BlockSpec(memory_space=pl.ANY),      # data [E+EB, F]
            ],
            out_specs=pl.BlockSpec((BN, F_pad), lambda k, s: (k, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 1, EB), jnp.int32),
                pltpu.VMEM((2, EB, F_pad), data_p.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, F_pad), jnp.float32),
        interpret=not _on_tpu(),
    )(starts, seg2, data_p)
    dtype_token = jnp.zeros((0,), orig_dtype)
    return out[:num_rows, :F], (seg_ids, rowptr, dtype_token)


def _ss_bwd(num_rows, BN, EB, res, g):
    # The VJP of a segment sum is the row gather d_data[e] = d_out[seg[e]]
    # — a plain HBM-bound XLA gather, which needs none of the forward's
    # dynamic-window machinery (and cannot express its own overflow drop,
    # matching the forward's semantics only when overflow == 0).
    seg_ids, rowptr, dtype_token = res
    del rowptr
    safe = jnp.clip(seg_ids, 0, num_rows - 1)
    d_data = g[safe]
    d_data = jnp.where((seg_ids >= 0)[:, None], d_data, 0.0)
    return (d_data.astype(dtype_token.dtype), None, None)


segment_sum_sorted_csr.defvjp(_ss_fwd, _ss_bwd)


def _chunk_kernel(meta_ref, seg_hbm, data_hbm, out_ref, seg_v, data_v, sems,
                  *, BN: int, EB: int, F: int, C: int, split3: bool):
    """One grid step == one EB-edge chunk (round 5).

    The round-4 kernel sized every row block's DMA window to the MAX
    block's edge count, so degree skew became real HBM traffic (useful/
    DMA'd 0.67 at br=32 on the bench graph). Here the window size is
    decoupled from the row-block size: a host-side planner
    (:func:`plan_chunks`) splits each ``BN``-row block into
    ``ceil(need/EB)`` chunks of exactly ``EB`` edges, and the grid runs
    over chunks — equal DMA work per step, slack only in each block's
    last chunk. Consecutive chunks of one block map to the same output
    tile, so Pallas keeps it VMEM-resident and the kernel accumulates
    into it (write on the block's first chunk, += after).

    ``split3``: f32 data is split into three bf16 terms in VMEM and
    reduced with three 1-pass MXU matmuls (the one-hot factor is exact in
    bf16) — f32-accurate at half the passes of ``Precision.HIGHEST``,
    which matters once BN grows past ~128 and the one-hot matmul would
    otherwise outrun the DMA.
    """
    c = pl.program_id(0)

    def dmas(idx, slot):
        start = pl.multiple_of(meta_ref[0, idx], 128)
        return (pltpu.make_async_copy(seg_hbm.at[:, pl.ds(start, EB)],
                                      seg_v.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(data_hbm.at[pl.ds(start, EB), :],
                                      data_v.at[slot], sems.at[slot, 1]))

    @pl.when(c == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(c + 1 < C)
    def _():
        for d in dmas(c + 1, (c + 1) % 2):
            d.start()

    slot = c % 2
    for d in dmas(c, slot):
        d.wait()
    rel = seg_v[slot] - meta_ref[1, c] * BN                  # [1, EB]
    row = jax.lax.broadcasted_iota(jnp.int32, (BN, EB), 0)
    d = data_v[slot]
    if split3:
        onehot = (rel == row).astype(jnp.bfloat16)
        hi = d.astype(jnp.bfloat16)
        r1 = d - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
               + jnp.dot(onehot, mid, preferred_element_type=jnp.float32)
               + jnp.dot(onehot, lo, preferred_element_type=jnp.float32))
    else:
        onehot = (rel == row).astype(d.dtype)
        acc = jnp.dot(onehot, d, preferred_element_type=jnp.float32)

    @pl.when(meta_ref[2, c] == 1)
    def _():
        out_ref[...] = acc

    @pl.when(meta_ref[2, c] == 0)
    def _():
        out_ref[...] += acc


def plan_chunks(rowptr, num_rows: int, block_rows: int, chunk_edges: int):
    """Host-side chunk table for :func:`segment_sum_sorted_csr_chunked`.

    Returns int32 ``meta [3, C]``: row 0 = 128-aligned edge window starts,
    row 1 = output row-block index, row 2 = 1 on a block's first chunk.
    Every row block gets >= 1 chunk (so every output tile is written).
    No edges are ever dropped: chunks tile each block's full extent.
    """
    import numpy as _np
    rp = _np.asarray(rowptr, _np.int64)
    BN, EB = block_rows, chunk_edges
    assert EB % 128 == 0
    N_pad = _round_up(num_rows, BN)
    rp = _np.pad(rp, (0, N_pad + 1 - rp.shape[0]), mode="edge")
    starts = rp[::BN][:-1]
    ends = rp[::BN][1:]
    start_al = (starts // 128) * 128
    need = ends - start_al
    n_chunks = _np.maximum(1, -(-need // EB))
    blocks = _np.repeat(_np.arange(len(starts)), n_chunks)
    within = _np.arange(len(blocks)) - _np.repeat(
        _np.cumsum(n_chunks) - n_chunks, n_chunks)
    meta = _np.stack([
        (start_al[blocks] + within * EB),
        blocks,
        (within == 0).astype(_np.int64),
    ]).astype(_np.int32)
    return meta


def segment_sum_sorted_csr_chunked(data, seg_ids, meta, num_rows,
                                   block_rows=256, chunk_edges=512):
    """Chunked-grid sorted-CSR segment sum (see :func:`_chunk_kernel`).

    ``meta`` comes from :func:`plan_chunks` (static per graph). Unlike
    :func:`segment_sum_sorted_csr` there is NO overflow: chunks tile every
    block's full edge extent.
    """
    return _ssc_fwd(data, seg_ids, meta, num_rows, block_rows,
                    chunk_edges)[0]


segment_sum_sorted_csr_chunked = functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5))(segment_sum_sorted_csr_chunked)


def _ssc_fwd(data, seg_ids, meta, num_rows, BN, EB):
    orig_dtype = data.dtype
    E, F = data.shape
    F_pad = _round_up(F, 128) if _on_tpu() else F
    N_pad = _round_up(num_rows, BN)
    if F_pad != F:
        data = jnp.pad(data, ((0, 0), (0, F_pad - F)))
    # any window [start, start+EB) must stay in bounds; worst case start
    # = start_al + (n_chunks-1)*EB <= rowptr[-1] + EB, so 2*EB of padding
    data_p = jnp.pad(data, ((0, 2 * EB), (0, 0)))
    seg2 = jnp.pad(seg_ids.astype(jnp.int32), (0, 2 * EB),
                   constant_values=-1).reshape(1, -1)
    C = meta.shape[1]
    split3 = data_p.dtype == jnp.float32
    kern = functools.partial(_chunk_kernel, BN=BN, EB=EB, F=F_pad, C=C,
                             split3=split3)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # seg [1, E+2EB]
                pl.BlockSpec(memory_space=pl.ANY),      # data [E+2EB, F]
            ],
            out_specs=pl.BlockSpec((BN, F_pad), lambda c, m: (m[1, c], 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 1, EB), jnp.int32),
                pltpu.VMEM((2, EB, F_pad), data_p.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, F_pad), jnp.float32),
        interpret=not _on_tpu(),
    )(meta, seg2, data_p)
    dtype_token = jnp.zeros((0,), orig_dtype)
    return out[:num_rows, :F], (seg_ids, dtype_token)


def _ssc_bwd(num_rows, BN, EB, res, g):
    seg_ids, dtype_token = res
    safe = jnp.clip(seg_ids, 0, num_rows - 1)
    d_data = jnp.where((seg_ids >= 0)[:, None], g[safe], 0.0)
    return (d_data.astype(dtype_token.dtype), None, None)


segment_sum_sorted_csr_chunked.defvjp(_ssc_fwd, _ssc_bwd)


def choose_chunk_plan(rowptr, num_rows: int, feat_dim: int,
                      dtype=jnp.float32):
    """Deterministic (block_rows, chunk_edges, meta) choice from rowptr
    statistics — NO timing race (round-4's 3-trial sweep through the
    tunnel let measurement noise pick the block size; VERDICT r4 item 1).

    Models each candidate as max(DMA time, one-hot matmul time) at
    nominal rates; the constants only set the crossover, so the choice is
    stable across runs and machines.
    """
    import numpy as _np
    DMA_BPS, MM_FLOPS = 130e9, 60e12
    passes = 3 if dtype == jnp.float32 else 1
    esize = 4 if dtype == jnp.float32 else 2
    best = None
    for BN in (64, 128, 256, 512):
        for EB in (512, 768, 1024):
            meta = plan_chunks(rowptr, num_rows, BN, EB)
            C = meta.shape[1]
            dma = C * EB * (feat_dim * esize + 4) \
                + _round_up(num_rows, BN) * feat_dim * 4
            mm = C * 2 * BN * EB * feat_dim * passes
            t = max(dma / DMA_BPS, mm / MM_FLOPS)
            if best is None or t < best[0]:
                best = (t, BN, EB, meta, dma)
    return best[1], best[2], best[3], best[4]


def spmm_csr(rowptr, col, val, x, num_rows: int, *, block_rows: int = 32,
             max_edges_per_block: int = 1024):
    """CSR sparse @ dense: out[i] = sum_{e in row i} val[e] * x[col[e]].

    The gather ``x[col]`` runs in XLA (a plain HBM-bound gather); the
    segment reduction runs in the Pallas kernel. Replaces the
    torch_sparse matmuls of the reference's ScalableGNN models.
    """
    E = col.shape[0]
    seg = jnp.repeat(jnp.arange(rowptr.shape[0] - 1, dtype=jnp.int32),
                     jnp.diff(rowptr), total_repeat_length=E)
    # jnp.repeat pads the tail with the LAST row id, not -1 — trailing
    # padded edges (static-shape convention: len(col) > rowptr[-1]) would
    # otherwise add x[col_pad] into out[num_rows - 1]
    seg = jnp.where(jnp.arange(E) < rowptr[-1], seg, -1)
    data = x[col]
    if val is not None:
        data = data * val[:, None]
    return segment_sum_sorted_csr(data, seg, rowptr, num_rows, block_rows,
                                  max_edges_per_block)
