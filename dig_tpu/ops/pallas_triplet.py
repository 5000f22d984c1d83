"""Fused triplet interaction — Pallas TPU kernel for the SphereNet /
DimeNet++ hot loop.

Replaces the XLA chain inside ``UpdateE`` (reference hot loop:
``dig/threedgraph/method/spherenet/spherenet.py:150-182``, the
``x_kj[idx_kj] * sbf_proj * tbf_proj`` + scatter at :171):

    s    = sbf_raw @ Ws            # [T, C] basis projection (composed)
    t    = tbf_raw @ Wt            # [T, C]
    prod = x_gathered * s * t      # [T, C]
    out  = reshape(E, K, C).sum(1) # [E, C] triplet -> edge reduction

materialized one [T, C] tensor at a time in HBM. With T = E*K triplet rows
(NK layout) these round trips dominate the whole SphereNet train step (the
step is HBM-bound; see bench.py spherenet notes). The fused kernel reads
``x_gathered`` once, reads the *raw* bases (S1=18 / S2=54 columns — 3.5x /
1.2x narrower than C=64), keeps s / t / prod entirely in VMEM, and writes
only the [E, C] reduction.

Backward is one kernel producing all five cotangents (d_xg, d_sbf, d_tbf
and the weight grads accumulated in f32 across the sequential TPU grid) —
the same recompute-instead-of-store trade, so training steps never park a
[T, C] intermediate in HBM either.

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


def _fwd_kernel(xg_ref, sbf_ref, tbf_ref, ws_ref, wt_ref, out_ref, *, K):
    f32 = jnp.float32
    s = jnp.dot(sbf_ref[...], ws_ref[...], preferred_element_type=f32)
    t = jnp.dot(tbf_ref[...], wt_ref[...], preferred_element_type=f32)
    prod = xg_ref[...].astype(f32) * s * t                   # [TT, C]
    TT, C = prod.shape
    out_ref[...] = prod.reshape(TT // K, K, C).sum(axis=1).astype(
        out_ref.dtype)


def _bwd_kernel(xg_ref, sbf_ref, tbf_ref, ws_ref, wt_ref, ct_ref,
                *refs, K, basis_grads):
    if basis_grads:
        dxg_ref, dsbf_ref, dtbf_ref, dws_ref, dwt_ref = refs
    else:
        dxg_ref, dws_ref, dwt_ref = refs
    f32 = jnp.float32
    k = pl.program_id(0)
    sbf = sbf_ref[...].astype(f32)
    tbf = tbf_ref[...].astype(f32)
    ws = ws_ref[...].astype(f32)
    wt = wt_ref[...].astype(f32)
    s = jnp.dot(sbf, ws, preferred_element_type=f32)
    t = jnp.dot(tbf, wt, preferred_element_type=f32)
    x = xg_ref[...].astype(f32)                              # [TT, C]
    TT, C = x.shape
    ct = ct_ref[...].astype(f32)                             # [TT//K, C]
    ctb = jnp.broadcast_to(ct[:, None, :], (TT // K, K, C)).reshape(TT, C)
    dxg_ref[...] = (ctb * s * t).astype(dxg_ref.dtype)
    gs = ctb * x * t                                         # dL/ds
    gt = ctb * x * s                                         # dL/dt
    if basis_grads:
        # [T, S] outputs are lane-padded to 128 in HBM — only pay for them
        # when d(basis) actually reaches a differentiated input (forces)
        dsbf_ref[...] = jnp.dot(gs, ws.T,
                                preferred_element_type=f32).astype(
            dsbf_ref.dtype)
        dtbf_ref[...] = jnp.dot(gt, wt.T,
                                preferred_element_type=f32).astype(
            dtbf_ref.dtype)

    @pl.when(k == 0)
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    dws_ref[...] += jnp.dot(sbf.T, gs, preferred_element_type=f32)
    dwt_ref[...] += jnp.dot(tbf.T, gt, preferred_element_type=f32)


def _pad_rows(x, rows):
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_triplet_product(xg, sbf, tbf, ws, wt, K: int, tile_e: int = 128,
                          basis_grads: bool = True):
    """out[e] = sum_dd xg[e*K+dd] * (sbf[e*K+dd] @ ws) * (tbf[e*K+dd] @ wt).

    xg [T, C] (masked rows must be zero — expand_kj guarantees this),
    sbf [T, S1], tbf [T, S2], ws [S1, C], wt [S2, C]; T = E * K.
    Returns [E, C] in xg's dtype. First-class VJP (one backward kernel).

    ``basis_grads=False`` returns SYMBOLIC ZEROS for d_sbf/d_tbf — only
    valid when the basis inputs never reach a differentiated variable
    (energy-only training: the basis depends on positions, not params).
    Force training (dE/dpos in the loss) must pass True.
    """
    return _fwd(xg, sbf, tbf, ws, wt, K, tile_e)


def _fwd(xg, sbf, tbf, ws, wt, K, tile_e):
    E = xg.shape[0] // K
    C = xg.shape[1]
    TT = tile_e * K
    n_tiles = -(-E // tile_e)
    Tp = n_tiles * TT
    xg_p, sbf_p, tbf_p = (_pad_rows(a, Tp) for a in (xg, sbf, tbf))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TT, C), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, sbf.shape[1]), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, tbf.shape[1]), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws.shape[0], C), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wt.shape[0], C), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_e, C), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_e, C), xg.dtype),
        interpret=not _on_tpu(),
    )(xg_p, sbf_p, tbf_p, ws, wt)
    return out[:E]


def _fused_fwd(xg, sbf, tbf, ws, wt, K, tile_e, basis_grads):
    return _fwd(xg, sbf, tbf, ws, wt, K, tile_e), (xg, sbf, tbf, ws, wt)


def _fused_bwd(K, tile_e, basis_grads, res, ct):
    xg, sbf, tbf, ws, wt = res
    E = xg.shape[0] // K
    C = xg.shape[1]
    TT = tile_e * K
    n_tiles = -(-E // tile_e)
    Tp = n_tiles * TT
    xg_p, sbf_p, tbf_p = (_pad_rows(a, Tp) for a in (xg, sbf, tbf))
    ct_p = _pad_rows(ct, n_tiles * tile_e)
    S1, S2 = sbf.shape[1], tbf.shape[1]
    big = pl.BlockSpec((TT, C), lambda k: (k, 0), memory_space=pltpu.VMEM)
    sb = pl.BlockSpec((TT, S1), lambda k: (k, 0), memory_space=pltpu.VMEM)
    tb = pl.BlockSpec((TT, S2), lambda k: (k, 0), memory_space=pltpu.VMEM)
    wsb = pl.BlockSpec((S1, C), lambda k: (0, 0), memory_space=pltpu.VMEM)
    wtb = pl.BlockSpec((S2, C), lambda k: (0, 0), memory_space=pltpu.VMEM)
    ctb = pl.BlockSpec((tile_e, C), lambda k: (k, 0),
                       memory_space=pltpu.VMEM)
    out_specs = [big] + ([sb, tb] if basis_grads else []) + [wsb, wtb]
    out_shape = ([jax.ShapeDtypeStruct((Tp, C), xg.dtype)]
                 + ([jax.ShapeDtypeStruct((Tp, S1), sbf.dtype),
                     jax.ShapeDtypeStruct((Tp, S2), tbf.dtype)]
                    if basis_grads else [])
                 + [jax.ShapeDtypeStruct((S1, C), jnp.float32),
                    jax.ShapeDtypeStruct((S2, C), jnp.float32)])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, basis_grads=basis_grads),
        grid=(n_tiles,),
        in_specs=[big, sb, tb, wsb, wtb, ctb],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=not _on_tpu(),
    )(xg_p, sbf_p, tbf_p, ws, wt, ct_p)
    T = E * K
    if basis_grads:
        dxg, dsbf, dtbf, dws, dwt = outs
        dsbf, dtbf = dsbf[:T], dtbf[:T]
    else:
        dxg, dws, dwt = outs
        dsbf = jnp.zeros_like(sbf)
        dtbf = jnp.zeros_like(tbf)
    return (dxg[:T], dsbf, dtbf,
            dws.astype(ws.dtype), dwt.astype(wt.dtype))


fused_triplet_product.defvjp(_fused_fwd, _fused_bwd)


def fused_triplet_product_ref(xg, sbf, tbf, ws, wt, K: int):
    """XLA oracle (materializes the [T, C] chain)."""
    s = jnp.dot(sbf, ws).astype(jnp.float32)
    t = jnp.dot(tbf, wt).astype(jnp.float32)
    prod = xg.astype(jnp.float32) * s * t
    E = xg.shape[0] // K
    return prod.reshape(E, K, xg.shape[1]).sum(axis=1).astype(xg.dtype)
