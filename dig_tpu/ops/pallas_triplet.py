"""Fused triplet interaction — Pallas TPU kernel for the SphereNet /
DimeNet++ hot loop.

Replaces the XLA chain inside ``UpdateE`` (reference hot loop:
``dig/threedgraph/method/spherenet/spherenet.py:150-182``, the
``x_kj[idx_kj] * sbf_proj * tbf_proj`` + scatter at :171; DimeNet++'s
no-torsion variant at ``dimenetpp.py:81-160``):

    s    = sbf_raw @ Ws            # [T, C] basis projection (composed)
    t    = tbf_raw @ Wt            # [T, C] (SphereNet only)
    prod = x_gathered * s (* t)    # [T, C]
    out  = reshape(E, K, C).sum(1) # [E, C] triplet -> edge reduction

materialized one [T, C] tensor at a time in HBM. With T = E*K triplet rows
(NK layout) these round trips dominate the whole SphereNet train step (the
step is HBM-bound; see bench.py spherenet notes). The fused kernel reads
``x_gathered`` once, reads the *raw* bases (S1=18 / S2=54 columns — note
TPU HBM layout lane-pads every 2-D minor axis to 128, so even these reads
cost [T, 128]; they are still 1 read instead of ~5 round trips), keeps
s / t / prod entirely in VMEM, and writes only the [E, C] reduction.

Backward is one kernel producing all cotangents (d_xg, d_sbf[, d_tbf] and
the weight grads accumulated in f32 across the sequential TPU grid) — the
same recompute-instead-of-store trade, so training steps never park a
[T, C] intermediate in HBM either. FIRST-ORDER only: energy+force
training (grad-of-grad) must use the XLA chain.

Tail handling: T is padded to the tile size with zero rows host-side —
zero xg rows contribute zero to the reduction AND to the weight-grad
accumulation (garbage tail rows would corrupt d_Ws).

Off-TPU the kernels run in interpret mode (tests compare against the XLA
chain as oracle).
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


def _fwd_kernel(*refs, K, has_t):
    f32 = jnp.float32
    if has_t:
        xg_ref, sbf_ref, tbf_ref, ws_ref, wt_ref, m_ref, out_ref = refs
    else:
        xg_ref, sbf_ref, ws_ref, m_ref, out_ref = refs
    prod = xg_ref[...].astype(f32) * jnp.dot(
        sbf_ref[...], ws_ref[...], preferred_element_type=f32)
    if has_t:
        prod = prod * jnp.dot(tbf_ref[...], wt_ref[...],
                              preferred_element_type=f32)
    TT, C = prod.shape
    # 32-bit cast BEFORE the reshape: Mosaic only supports minor-dim
    # insertion as a no-op for 32-bit types
    m = m_ref[...].astype(f32).reshape(TT // K, K, 1)        # [TE, K, 1]
    out_ref[...] = jnp.sum(prod.reshape(TT // K, K, C) * m,
                           axis=1).astype(out_ref.dtype)


def _bwd_kernel(*refs, K, has_t, basis_grads):
    f32 = jnp.float32
    if has_t:
        xg_ref, sbf_ref, tbf_ref, ws_ref, wt_ref, m_ref, ct_ref = refs[:7]
        outs = refs[7:]
    else:
        xg_ref, sbf_ref, ws_ref, m_ref, ct_ref = refs[:5]
        outs = refs[5:]
    i = 0
    dxg_ref = outs[i]; i += 1
    if basis_grads:
        dsbf_ref = outs[i]; i += 1
        if has_t:
            dtbf_ref = outs[i]; i += 1
    dws_ref = outs[i]; i += 1
    if has_t:
        dwt_ref = outs[i]

    k = pl.program_id(0)
    sbf = sbf_ref[...].astype(f32)
    ws = ws_ref[...].astype(f32)
    s = jnp.dot(sbf, ws, preferred_element_type=f32)
    x = xg_ref[...].astype(f32)                              # [TT, C]
    TT, C = x.shape
    ct = ct_ref[...].astype(f32)                             # [TT//K, C]
    m = m_ref[...].astype(f32)                               # [TE, K]
    ctb = (jnp.broadcast_to(ct[:, None, :], (TT // K, K, C))
           * m[:, :, None]).reshape(TT, C)
    if has_t:
        tbf = tbf_ref[...].astype(f32)
        wt = wt_ref[...].astype(f32)
        t = jnp.dot(tbf, wt, preferred_element_type=f32)
        dxg_ref[...] = (ctb * s * t).astype(dxg_ref.dtype)
        gs = ctb * x * t                                     # dL/ds
        gt = ctb * x * s                                     # dL/dt
    else:
        dxg_ref[...] = (ctb * s).astype(dxg_ref.dtype)
        gs = ctb * x
    if basis_grads:
        # [T, S] outputs are lane-padded to 128 in HBM — only pay for them
        # when d(basis) actually reaches a differentiated input (forces)
        dsbf_ref[...] = jnp.dot(gs, ws.T,
                                preferred_element_type=f32).astype(
            dsbf_ref.dtype)
        if has_t:
            dtbf_ref[...] = jnp.dot(gt, wt.T,
                                    preferred_element_type=f32).astype(
                dtbf_ref.dtype)

    @pl.when(k == 0)
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        if has_t:
            dwt_ref[...] = jnp.zeros_like(dwt_ref)

    dws_ref[...] += jnp.dot(sbf.T, gs, preferred_element_type=f32)
    if has_t:
        dwt_ref[...] += jnp.dot(tbf.T, gt, preferred_element_type=f32)


def _pad_rows(x, rows):
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _row_spec(rows, cols):
    return pl.BlockSpec((rows, cols), lambda k: (k, 0),
                        memory_space=pltpu.VMEM)


def _full_spec(r, c):
    return pl.BlockSpec((r, c), lambda k: (0, 0), memory_space=pltpu.VMEM)


def _run_fwd(xg, sbf, tbf, ws, wt, mask2d, K, tile_e):
    has_t = tbf is not None
    E = xg.shape[0] // K
    C = xg.shape[1]
    TT = tile_e * K
    n_tiles = -(-E // tile_e)
    Tp = n_tiles * TT
    ins = [_pad_rows(xg, Tp), _pad_rows(sbf, Tp)]
    specs = [_row_spec(TT, C), _row_spec(TT, sbf.shape[1])]
    if has_t:
        ins.append(_pad_rows(tbf, Tp))
        specs.append(_row_spec(TT, tbf.shape[1]))
    ins.append(ws)
    specs.append(_full_spec(ws.shape[0], C))
    if has_t:
        ins.append(wt)
        specs.append(_full_spec(wt.shape[0], C))
    ins.append(_pad_rows(mask2d, n_tiles * tile_e))
    specs.append(_row_spec(tile_e, K))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, has_t=has_t),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=_row_spec(tile_e, C),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_e, C), xg.dtype),
        interpret=not _on_tpu(),
    )(*ins)
    return out[:E]


def _run_bwd(xg, sbf, tbf, ws, wt, mask2d, ct, K, tile_e, basis_grads):
    has_t = tbf is not None
    E = xg.shape[0] // K
    C = xg.shape[1]
    TT = tile_e * K
    n_tiles = -(-E // tile_e)
    Tp = n_tiles * TT
    S1 = sbf.shape[1]
    ins = [_pad_rows(xg, Tp), _pad_rows(sbf, Tp)]
    specs = [_row_spec(TT, C), _row_spec(TT, S1)]
    if has_t:
        ins.append(_pad_rows(tbf, Tp))
        specs.append(_row_spec(TT, tbf.shape[1]))
    ins.append(ws)
    specs.append(_full_spec(S1, C))
    if has_t:
        ins.append(wt)
        specs.append(_full_spec(wt.shape[0], C))
    ins.append(_pad_rows(mask2d, n_tiles * tile_e))
    specs.append(_row_spec(tile_e, K))
    ins.append(_pad_rows(ct, n_tiles * tile_e))
    specs.append(_row_spec(tile_e, C))

    out_specs = [_row_spec(TT, C)]
    out_shape = [jax.ShapeDtypeStruct((Tp, C), xg.dtype)]
    if basis_grads:
        out_specs.append(_row_spec(TT, S1))
        out_shape.append(jax.ShapeDtypeStruct((Tp, S1), sbf.dtype))
        if has_t:
            out_specs.append(_row_spec(TT, tbf.shape[1]))
            out_shape.append(
                jax.ShapeDtypeStruct((Tp, tbf.shape[1]), tbf.dtype))
    out_specs.append(_full_spec(S1, C))
    out_shape.append(jax.ShapeDtypeStruct((S1, C), jnp.float32))
    if has_t:
        out_specs.append(_full_spec(wt.shape[0], C))
        out_shape.append(jax.ShapeDtypeStruct((wt.shape[0], C),
                                              jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, has_t=has_t,
                          basis_grads=basis_grads),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=not _on_tpu(),
    )(*ins)
    T = E * K
    i = 0
    dxg = outs[i][:T]; i += 1
    dsbf = dtbf = None
    if basis_grads:
        dsbf = outs[i][:T]; i += 1
        if has_t:
            dtbf = outs[i][:T]; i += 1
    else:
        dsbf = jnp.zeros_like(sbf)
        dtbf = jnp.zeros_like(tbf) if has_t else None
    dws = outs[i].astype(ws.dtype); i += 1
    dwt = outs[i].astype(wt.dtype) if has_t else None
    return dxg, dsbf, dtbf, dws, dwt


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_triplet_product(xg, sbf, tbf, ws, wt, mask2d, K: int,
                          tile_e: int = 128, basis_grads: bool = True):
    """out[e] = sum_dd mask[e,dd] * xg[e*K+dd] * (sbf[e*K+dd] @ ws)
    * (tbf[e*K+dd] @ wt).

    xg [T, C], sbf [T, S1], tbf [T, S2], ws [S1, C], wt [S2, C],
    mask2d [E, K] (the triplet mask reshaped — the kernel applies it, so
    callers may feed RAW unmasked gathers and skip their [T, C] where
    passes; the backward zeroes all cotangent rows at masked triplets,
    which also licenses expand_kj's mask-free adjoint). T = E * K.
    Returns [E, C] in xg's dtype. First-order VJP (one backward kernel).

    ``basis_grads=False`` returns SYMBOLIC ZEROS for d_sbf/d_tbf — only
    valid when the basis inputs never reach a differentiated variable
    (energy-only training: the basis depends on positions, not params).
    """
    return _run_fwd(xg, sbf, tbf, ws, wt, mask2d, K, tile_e)


def _ftp_fwd(xg, sbf, tbf, ws, wt, mask2d, K, tile_e, basis_grads):
    return (_run_fwd(xg, sbf, tbf, ws, wt, mask2d, K, tile_e),
            (xg, sbf, tbf, ws, wt, mask2d))


def _ftp_bwd(K, tile_e, basis_grads, res, ct):
    xg, sbf, tbf, ws, wt, mask2d = res
    dxg, dsbf, dtbf, dws, dwt = _run_bwd(xg, sbf, tbf, ws, wt, mask2d, ct,
                                         K, tile_e, basis_grads)
    return dxg, dsbf, dtbf, dws, dwt, None


fused_triplet_product.defvjp(_ftp_fwd, _ftp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_angle_product(xg, sbf, ws, mask2d, K: int, tile_e: int = 128,
                        basis_grads: bool = True):
    """DimeNet++ (no-torsion) variant:
    out[e] = sum_dd mask[e,dd] * xg[e*K+dd] * (sbf[e*K+dd] @ ws)."""
    return _run_fwd(xg, sbf, None, ws, None, mask2d, K, tile_e)


def _fap_fwd(xg, sbf, ws, mask2d, K, tile_e, basis_grads):
    return (_run_fwd(xg, sbf, None, ws, None, mask2d, K, tile_e),
            (xg, sbf, ws, mask2d))


def _fap_bwd(K, tile_e, basis_grads, res, ct):
    xg, sbf, ws, mask2d = res
    dxg, dsbf, _, dws, _ = _run_bwd(xg, sbf, None, ws, None, mask2d, ct,
                                    K, tile_e, basis_grads)
    return dxg, dsbf, dws, None


fused_angle_product.defvjp(_fap_fwd, _fap_bwd)


def fused_triplet_product_ref(xg, sbf, tbf, ws, wt, K: int, mask2d=None):
    """XLA oracle (materializes the [T, C] chain). ``tbf``/``wt`` may be
    None (DimeNet++); ``mask2d`` defaults to all-true."""
    prod = xg.astype(jnp.float32) * jnp.dot(sbf, ws).astype(jnp.float32)
    if tbf is not None:
        prod = prod * jnp.dot(tbf, wt).astype(jnp.float32)
    E = xg.shape[0] // K
    prod = prod.reshape(E, K, xg.shape[1])
    if mask2d is not None:
        prod = prod * mask2d.astype(jnp.float32)[:, :, None]
    return prod.sum(axis=1).astype(xg.dtype)
