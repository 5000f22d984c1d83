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
[T, C] intermediate in HBM either.

SECOND ORDER (energy+force training, reference ``run.py:126``): with
``basis_grads=True`` the backward itself is a custom_vjp op whose VJP is
a third Pallas kernel (``_bwd2_kernel``). The op is multilinear —
``out = reduce_K(m * x * (sbf@ws) * (tbf@wt))`` — so every second-order
cotangent is again a sum of fused triplet products; reverse-over-reverse
(``jax.grad`` of a loss containing ``-dE/dpos``) therefore runs fully
fused. ``basis_grads=False`` stays first-order-only by construction
(its d_sbf/d_tbf are symbolic zeros, wrong for any pos-grad use).

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


def _bwd2_kernel(*refs, K, has_t):
    """VJP of the backward kernel (second order, force training).

    With ctb[e*K+k] = ct[e]*m[e,k], s = sbf@ws, t = tbf@wt the backward's
    outputs are O1 = ctb*s*t (d_xg), O2 = (ctb*x*t)@ws^T (d_sbf),
    O3 = (ctb*x*s)@wt^T (d_tbf), O4 = sbf^T@(ctb*x*t) (d_ws),
    O5 = tbf^T@(ctb*x*s) (d_wt). Given their cotangents u1..u5, with
    P := u2@ws + sbf@u4 and Q := u3@wt + tbf@u5:

        x_bar   = ctb * (t*P + s*Q)
        sbf_bar = A@ws^T + (ctb*x*t)@u4^T,  A := ctb*(t*u1 + x*Q)
        tbf_bar = B@wt^T + (ctb*x*s)@u5^T,  B := ctb*(s*u1 + x*P)
        ws_bar  = sbf^T@A + u2^T@(ctb*x*t)      (accumulated over tiles)
        wt_bar  = tbf^T@B + u3^T@(ctb*x*s)
        ct_bar  = reduce_K(m * (u1*s*t + x*(t*P + s*Q)))

    The no-torsion case is the same algebra with t = 1, Q = 0.
    Zero-padded tail rows (x, u1, u2, u3 and m all zero there) contribute
    nothing to any output, including the accumulated weight cotangents.
    """
    f32 = jnp.float32
    if has_t:
        (xg_ref, sbf_ref, tbf_ref, ws_ref, wt_ref, m_ref, ct_ref,
         u1_ref, u2_ref, u3_ref, u4_ref, u5_ref) = refs[:12]
        xb_ref, sb_ref, tb_ref, wsb_ref, wtb_ref, ctb_ref = refs[12:]
    else:
        (xg_ref, sbf_ref, ws_ref, m_ref, ct_ref,
         u1_ref, u2_ref, u4_ref) = refs[:8]
        xb_ref, sb_ref, wsb_ref, ctb_ref = refs[8:]
    x = xg_ref[...].astype(f32)                              # [TT, C]
    TT, C = x.shape
    sbf = sbf_ref[...].astype(f32)
    ws = ws_ref[...].astype(f32)
    u1 = u1_ref[...].astype(f32)
    u2 = u2_ref[...].astype(f32)
    u4 = u4_ref[...].astype(f32)
    ct = ct_ref[...].astype(f32)                             # [TE, C]
    m = m_ref[...].astype(f32)                               # [TE, K]
    TE = TT // K
    ctb = (jnp.broadcast_to(ct[:, None, :], (TE, K, C))
           * m[:, :, None]).reshape(TT, C)
    s = jnp.dot(sbf, ws, preferred_element_type=f32)
    P = (jnp.dot(u2, ws, preferred_element_type=f32)
         + jnp.dot(sbf, u4, preferred_element_type=f32))
    if has_t:
        tbf = tbf_ref[...].astype(f32)
        wt = wt_ref[...].astype(f32)
        u3 = u3_ref[...].astype(f32)
        u5 = u5_ref[...].astype(f32)
        t = jnp.dot(tbf, wt, preferred_element_type=f32)
        Q = (jnp.dot(u3, wt, preferred_element_type=f32)
             + jnp.dot(tbf, u5, preferred_element_type=f32))
        g_s = ctb * x * s
        g_t = ctb * x * t
        core = t * P + s * Q
        A = ctb * (t * u1 + x * Q)
        B = ctb * (s * u1 + x * P)
        tb_ref[...] = (jnp.dot(B, wt.T, preferred_element_type=f32)
                       + jnp.dot(g_s, u5.T, preferred_element_type=f32)
                       ).astype(tb_ref.dtype)
        integ = u1 * s * t + x * core
    else:
        g_t = ctb * x
        core = P
        A = ctb * u1
        integ = u1 * s + x * core
    xb_ref[...] = (ctb * core).astype(xb_ref.dtype)
    sb_ref[...] = (jnp.dot(A, ws.T, preferred_element_type=f32)
                   + jnp.dot(g_t, u4.T, preferred_element_type=f32)
                   ).astype(sb_ref.dtype)
    ctb_ref[...] = jnp.sum(integ.reshape(TE, K, C) * m[:, :, None],
                           axis=1).astype(ctb_ref.dtype)

    p_ws = (jnp.dot(sbf.T, A, preferred_element_type=f32)
            + jnp.dot(u2.T, g_t, preferred_element_type=f32))
    if has_t:
        p_wt = (jnp.dot(tbf.T, B, preferred_element_type=f32)
                + jnp.dot(u3.T, g_s, preferred_element_type=f32))

    @pl.when(pl.program_id(0) == 0)
    def _():
        wsb_ref[...] = jnp.zeros_like(wsb_ref)
        if has_t:
            wtb_ref[...] = jnp.zeros_like(wtb_ref)

    wsb_ref[...] += p_ws
    if has_t:
        wtb_ref[...] += p_wt


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


def _run_bwd2(xg, sbf, tbf, ws, wt, mask2d, ct, u1, u2, u3, u4, u5,
              K, tile_e):
    """Second-order pass: cotangents of the backward's inputs given
    cotangents (u1..u5) of its outputs. One Pallas kernel (_bwd2_kernel)."""
    has_t = tbf is not None
    E = xg.shape[0] // K
    C = xg.shape[1]
    TT = tile_e * K
    n_tiles = -(-E // tile_e)
    Tp = n_tiles * TT
    Ep = n_tiles * tile_e
    S1 = sbf.shape[1]
    ins = [_pad_rows(xg, Tp), _pad_rows(sbf, Tp)]
    specs = [_row_spec(TT, C), _row_spec(TT, S1)]
    if has_t:
        S2 = tbf.shape[1]
        ins.append(_pad_rows(tbf, Tp))
        specs.append(_row_spec(TT, S2))
    ins += [ws]
    specs += [_full_spec(S1, C)]
    if has_t:
        ins.append(wt)
        specs.append(_full_spec(S2, C))
    ins += [_pad_rows(mask2d, Ep), _pad_rows(ct, Ep),
            _pad_rows(u1, Tp), _pad_rows(u2, Tp)]
    specs += [_row_spec(tile_e, K), _row_spec(tile_e, C),
              _row_spec(TT, C), _row_spec(TT, S1)]
    if has_t:
        ins.append(_pad_rows(u3, Tp))
        specs.append(_row_spec(TT, S2))
    ins.append(u4)
    specs.append(_full_spec(S1, C))
    if has_t:
        ins.append(u5)
        specs.append(_full_spec(S2, C))

    out_specs = [_row_spec(TT, C), _row_spec(TT, S1)]
    out_shape = [jax.ShapeDtypeStruct((Tp, C), xg.dtype),
                 jax.ShapeDtypeStruct((Tp, S1), sbf.dtype)]
    if has_t:
        out_specs.append(_row_spec(TT, S2))
        out_shape.append(jax.ShapeDtypeStruct((Tp, S2), tbf.dtype))
    out_specs.append(_full_spec(S1, C))
    out_shape.append(jax.ShapeDtypeStruct((S1, C), jnp.float32))
    if has_t:
        out_specs.append(_full_spec(S2, C))
        out_shape.append(jax.ShapeDtypeStruct((S2, C), jnp.float32))
    out_specs.append(_row_spec(tile_e, C))
    out_shape.append(jax.ShapeDtypeStruct((Ep, C), ct.dtype))
    outs = pl.pallas_call(
        functools.partial(_bwd2_kernel, K=K, has_t=has_t),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=not _on_tpu(),
    )(*ins)
    T = E * K
    i = 0
    xb = outs[i][:T]; i += 1
    sb = outs[i][:T]; i += 1
    tb = None
    if has_t:
        tb = outs[i][:T]; i += 1
    wsb = outs[i].astype(ws.dtype); i += 1
    wtb = None
    if has_t:
        wtb = outs[i].astype(wt.dtype); i += 1
    ctb = outs[i][:E]
    return xb, sb, tb, wsb, wtb, ctb


# The first-order backward wrapped as its own custom_vjp op: force
# training (grad wrt params of a loss containing -dE/dpos) reverse-
# differentiates the staged-out backward, which then hits _bwd2_kernel
# instead of an opaque pallas_call. basis_grads=False keeps the plain
# (non-differentiable) path — it is only licensed for energy-only runs.
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _bwd_t_op(xg, sbf, tbf, ws, wt, mask2d, ct, K, tile_e):
    return _run_bwd(xg, sbf, tbf, ws, wt, mask2d, ct, K, tile_e, True)


def _bwd_t_op_fwd(xg, sbf, tbf, ws, wt, mask2d, ct, K, tile_e):
    return (_bwd_t_op(xg, sbf, tbf, ws, wt, mask2d, ct, K, tile_e),
            (xg, sbf, tbf, ws, wt, mask2d, ct))


def _bwd_t_op_bwd(K, tile_e, res, cts):
    xg, sbf, tbf, ws, wt, mask2d, ct = res
    u1, u2, u3, u4, u5 = cts
    # half tile: the second-order kernel holds ~2.5x the live VMEM of the
    # first-order one (12 tiled operands + temps)
    xb, sb, tb, wsb, wtb, ctb = _run_bwd2(
        xg, sbf, tbf, ws, wt, mask2d, ct,
        u1, u2, u3, u4.astype(jnp.float32), u5.astype(jnp.float32),
        K, max(8, tile_e // 2))
    return xb, sb, tb, wsb, wtb, None, ctb


_bwd_t_op.defvjp(_bwd_t_op_fwd, _bwd_t_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _bwd_a_op(xg, sbf, ws, mask2d, ct, K, tile_e):
    dxg, dsbf, _, dws, _ = _run_bwd(xg, sbf, None, ws, None, mask2d, ct,
                                    K, tile_e, True)
    return dxg, dsbf, dws


def _bwd_a_op_fwd(xg, sbf, ws, mask2d, ct, K, tile_e):
    return (_bwd_a_op(xg, sbf, ws, mask2d, ct, K, tile_e),
            (xg, sbf, ws, mask2d, ct))


def _bwd_a_op_bwd(K, tile_e, res, cts):
    xg, sbf, ws, mask2d, ct = res
    u1, u2, u4 = cts
    xb, sb, _, wsb, _, ctb = _run_bwd2(
        xg, sbf, None, ws, None, mask2d, ct,
        u1, u2, None, u4.astype(jnp.float32), None, K,
        max(8, tile_e // 2))
    return xb, sb, wsb, None, ctb


_bwd_a_op.defvjp(_bwd_a_op_fwd, _bwd_a_op_bwd)


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
    Returns [E, C] in xg's dtype. With ``basis_grads=True`` the VJP is
    itself differentiable (one second-order kernel), so energy+force
    training — grad wrt params of a loss containing -dE/dpos — runs fused
    end to end.

    ``basis_grads=False`` returns SYMBOLIC ZEROS for d_sbf/d_tbf — only
    valid when the basis inputs never reach a differentiated variable
    (energy-only training: the basis depends on positions, not params).
    It is also first-order only.
    """
    return _run_fwd(xg, sbf, tbf, ws, wt, mask2d, K, tile_e)


def _ftp_fwd(xg, sbf, tbf, ws, wt, mask2d, K, tile_e, basis_grads):
    # recursive call (not _run_fwd): reverse-over-reverse linearizes this
    # fwd rule, which must re-enter the custom_vjp rather than expose the
    # raw pallas_call
    return (fused_triplet_product(xg, sbf, tbf, ws, wt, mask2d, K, tile_e,
                                  basis_grads),
            (xg, sbf, tbf, ws, wt, mask2d))


def _ftp_bwd(K, tile_e, basis_grads, res, ct):
    xg, sbf, tbf, ws, wt, mask2d = res
    if basis_grads:
        dxg, dsbf, dtbf, dws, dwt = _bwd_t_op(xg, sbf, tbf, ws, wt,
                                              mask2d, ct, K, tile_e)
    else:
        dxg, dsbf, dtbf, dws, dwt = _run_bwd(xg, sbf, tbf, ws, wt, mask2d,
                                             ct, K, tile_e, basis_grads)
    return dxg, dsbf, dtbf, dws, dwt, None


fused_triplet_product.defvjp(_ftp_fwd, _ftp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_angle_product(xg, sbf, ws, mask2d, K: int, tile_e: int = 128,
                        basis_grads: bool = True):
    """DimeNet++ (no-torsion) variant:
    out[e] = sum_dd mask[e,dd] * xg[e*K+dd] * (sbf[e*K+dd] @ ws)."""
    return _run_fwd(xg, sbf, None, ws, None, mask2d, K, tile_e)


def _fap_fwd(xg, sbf, ws, mask2d, K, tile_e, basis_grads):
    return (fused_angle_product(xg, sbf, ws, mask2d, K, tile_e,
                                basis_grads),
            (xg, sbf, ws, mask2d))


def _fap_bwd(K, tile_e, basis_grads, res, ct):
    xg, sbf, ws, mask2d = res
    if basis_grads:
        dxg, dsbf, dws = _bwd_a_op(xg, sbf, ws, mask2d, ct, K, tile_e)
    else:
        dxg, dsbf, _, dws, _ = _run_bwd(xg, sbf, None, ws, None, mask2d,
                                        ct, K, tile_e, basis_grads)
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
