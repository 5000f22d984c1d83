"""Slot-resident fused triplet interaction — the zero-[T,C] layout.

v4 of the fused triplet family (supersedes :mod:`pallas_triplet_pt` for
slot-aligned batches). Profiling the energy+force train step (round 4,
xprof framework_op_stats on the real chip) showed the remaining cost is
STRUCTURAL: the v3 kernels consume a gathered ``xg [T, C]`` operand
(T = E*K triplets), so every AD level of the double backward
(reference ``dig/threedgraph/method/run.py:126``) reads and/or writes
~90-180 MB of [T, C] HBM tensors produced by the XLA-level
``expand_kj`` gathers — ~9 such passes per layer were the majority of
the whole step.

Here the expand never reaches HBM, and the triplet reference-neighbor
axis s is a GRID dimension:

* grid = (slot-groups, K). Each program handles the (tile, s) pair, so
  every operand arrives pre-sliced by BlockSpec — no in-kernel slicing
  (Mosaic-hostile under AD) and no masked-reduction "select" passes
  (an earlier per-s in-body loop made each s re-touch the whole
  [R, K, Et] tile, turning the kernels VPU-bound);
* s-leading layouts: x arrives ``[K, N, C]``, the packed basis
  ``[K, R, E]`` (built at that layout for free — :func:`basis_pt_k`
  stacks the closed forms on axis 1), the triplet mask ``[K, 1, E]``;
* the expand gather is a masked one-hot ``dot_general`` against the
  slot group's VMEM-resident x slice: MXU work whose adjoint is the
  transposed einsum — no scatter at any AD order;
* blocks whose index does not change across the (minor) s steps — the
  edge-level cotangent, sender ids, the output tile — are DMA'd once
  per tile and accumulated in VMEM across s (``@pl.when(s == 0)``
  init), so per-pass HBM is x + pt + masks + out and their cotangents,
  all E-sized. Nothing T-sized exists at any AD level, and each
  program's live set is one (tile, s) block (the in-body K-loop's
  vjp-of-loop spilled 218 MB; jax.checkpoint cannot lower in Mosaic).

Differentiation strategy is v3's, unchanged: bodies are pure jnp, the
backward body is trace-time ``jax.vjp`` of the forward body, the
second-order body is ``jax.vjp`` of the backward body, and the
custom_vjp tower (F -> B -> bwd2) keeps reverse-over-reverse fused.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .basis import make_bessel_funcs, make_sph_funcs_full, make_sph_funcs_m0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def basis_pt_k(num_spherical: int, num_radial: int, theta, phi, dk,
               has_t: bool):
    """Packed basis table [K, R, E] from [K, E] per-triplet scalars —
    the s-LEADING layout the slot kernels consume. Same rows, same
    closed forms as :func:`pallas_triplet_pt.basis_pt` (bessel l-major,
    Y_l^0, then Y_l^m); stacking on axis 1 produces the transposed
    layout with no extra data movement."""
    n, k = num_spherical, num_radial
    rows = [f(dk) for row in make_bessel_funcs(n, k) for f in row]
    rows += [f(theta) for f in make_sph_funcs_m0(n)]
    if has_t:
        rows += [f(theta, phi) for f in make_sph_funcs_full(n)]
    return jnp.stack(rows, axis=1)                        # [K, R, E]


# ---------------------------------------------------------------------------
# bodies (pure jnp -> derivative bodies by trace-time jax.vjp)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_bodies(num_spherical: int, num_radial: int, has_t: bool):
    n, k = num_spherical, num_radial
    dn = (((0,), (0,)), ((), ()))

    def fwd_body(xs, bt, y0, yt, ws, wt, ohm):
        """One (tile, s) contribution. xs [A, C] (the slot group's x rows
        for this s); bt [n*k, Et]; y0 [n, Et]; yt [n*n|1, Et];
        ws [n*k, C]; wt [n*n*k|1, C]; ohm [A, Et] = one-hot(sender) *
        this s's triplet mask (constant under differentiation).
        Returns [Et, C] f32."""
        f32 = jnp.float32
        md = xs.dtype
        b = bt.astype(f32)
        sbfT = b * jnp.repeat(y0.astype(f32), k, axis=0)      # [n*k, Et]
        sv = jax.lax.dot_general(sbfT.astype(md), ws, dn,
                                 preferred_element_type=f32)  # [Et, C]
        xg = jax.lax.dot_general(ohm.astype(md), xs.astype(md), dn,
                                 preferred_element_type=f32)  # [Et, C]
        prod = xg * sv
        if has_t:
            tbfT = (jnp.repeat(yt.astype(f32), k, axis=0)
                    * jnp.concatenate([b] * n, axis=0))       # [n*n*k, Et]
            tv = jax.lax.dot_general(tbfT.astype(md), wt, dn,
                                     preferred_element_type=f32)
            prod = prod * tv
        return prod

    def bwd_body(xs, bt, y0, yt, ws, wt, ohm, ct):
        _, vjp = jax.vjp(lambda *a: fwd_body(*a, ohm),
                         xs, bt, y0, yt, ws, wt)
        return vjp(ct.astype(jnp.float32))

    def bwd2_body(xs, bt, y0, yt, ws, wt, ohm, ct, us):
        def bwd_flat(xs, bt, y0, yt, ws, wt, ct):
            return bwd_body(xs, bt, y0, yt, ws, wt, ohm, ct)

        outs, vjp2 = jax.vjp(bwd_flat, xs, bt, y0, yt, ws, wt,
                             ct.astype(jnp.float32))
        us = tuple(u.astype(o.dtype) for u, o in zip(us, outs))
        return vjp2(us)

    return fwd_body, bwd_body, bwd2_body


@functools.lru_cache(maxsize=None)
def _make_bodies_geom(num_spherical: int, num_radial: int, has_t: bool):
    """Scalar-geometry bodies (round 5): the basis rows are evaluated
    IN-BODY from (theta[, phi], dk/cutoff) instead of arriving as a
    packed [K, R, E] table. The r4 pt interface moved ~43 MB (bf16,
    flagship shape) per layer per AD pass of basis values/cotangents
    through HBM and dragged a [K, R, E]-wide XLA backprop chain behind
    it; the scalar interface is R/3 ~ 10x smaller and its closed-form
    derivatives stay inside the kernel (VPU work, differentiated by the
    same trace-time vjp tower)."""
    n, k = num_spherical, num_radial

    fwd_pt, _, _ = _make_bodies(num_spherical, num_radial, has_t)

    def _rows(th, ph, dk, m2row):
        # th/ph/dk arrive as SEPARATE [1, Et] operands (split host-side):
        # in-body row slicing of a packed [NG, Et] block lowers to
        # dynamic_slice (unimplemented in Mosaic) and its second-order
        # transpose produces negative-size pads.
        f32 = jnp.float32
        # f32 compare: Mosaic rejects bf16 cmpf ("Target does not support
        # this comparison"), and m2row arrives in the compute dtype
        live = m2row.astype(f32) > 0                      # [1, Et]
        th = th.astype(f32)
        # the bessel closed forms carry 1/x^l poles: masked/padded lanes
        # (zero-filled) would evaluate to NaN and contaminate the lane
        # CONTRACTIONS even though ohm zeroes them — evaluate dead lanes
        # at a safe abscissa instead (their cotangent is zeroed by the
        # same where, matching the pt path where ohm=0 => dpt=0)
        dk = jnp.where(live, dk.astype(f32), 1.0)
        bt = jnp.concatenate([f(dk) for row in make_bessel_funcs(n, k)
                              for f in row], axis=0)      # [n*k, Et]
        y0 = jnp.concatenate([f(th) for f in make_sph_funcs_m0(n)],
                             axis=0)                      # [n, Et]
        if has_t:
            yt = jnp.concatenate([f(th, ph.astype(f32))
                                  for f in make_sph_funcs_full(n)], axis=0)
        else:
            yt = jnp.zeros((1,) + th.shape[1:], f32)
        return bt, y0, yt

    def fwd_body(xs, th, ph, dk, ws, wt, ohm, m2row):
        bt, y0, yt = _rows(th, ph, dk, m2row)
        return fwd_pt(xs, bt, y0, yt, ws, wt, ohm)

    def bwd_body(xs, th, ph, dk, ws, wt, ohm, m2row, ct):
        _, vjp = jax.vjp(lambda *a: fwd_body(*a, ohm, m2row),
                         xs, th, ph, dk, ws, wt)
        return vjp(ct.astype(jnp.float32))

    def bwd2_body(xs, th, ph, dk, ws, wt, ohm, m2row, ct, us):
        def bwd_flat(xs, th, ph, dk, ws, wt, ct):
            return bwd_body(xs, th, ph, dk, ws, wt, ohm, m2row, ct)

        outs, vjp2 = jax.vjp(bwd_flat, xs, th, ph, dk, ws, wt,
                             ct.astype(jnp.float32))
        us = tuple(u.astype(o.dtype) for u, o in zip(us, outs))
        return vjp2(us)

    return fwd_body, bwd_body, bwd2_body


def _ohm(lj_ref, m2T_ref, A: int):
    """[A, Et] masked one-hot from group-local sender ids [1, Et] and
    this s's mask row [1, 1, Et] (kernel-resident, nondiff)."""
    Et = lj_ref.shape[-1]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (A, Et), 0)
          == lj_ref[...]).astype(jnp.float32)
    return oh * m2T_ref[0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# kernels — grid (Gt, K), s minor; s-sliced blocks arrive [1, ...]
# ---------------------------------------------------------------------------

def _sq(ref):
    return ref[0]                                  # drop the s block dim


def _fwd_kernel(x_ref, bt_ref, y0_ref, yt_ref, ws_ref, wt_ref, m2T_ref,
                lj_ref, out_ref, *, body, A):
    s = pl.program_id(1)
    ohm = _ohm(lj_ref, m2T_ref, A)
    prod = body(_sq(x_ref), _sq(bt_ref), _sq(y0_ref), _sq(yt_ref),
                ws_ref[...], wt_ref[...], ohm)

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += prod.astype(out_ref.dtype)


def _bwd_kernel(x_ref, bt_ref, y0_ref, yt_ref, ws_ref, wt_ref, m2T_ref,
                lj_ref, ct_ref, dx_ref, dbt_ref, dy0_ref, dyt_ref, dws_ref,
                dwt_ref, *, body, A):
    g, s = pl.program_id(0), pl.program_id(1)
    ohm = _ohm(lj_ref, m2T_ref, A)
    dx, dbt, dy0, dyt, dws, dwt = body(
        _sq(x_ref), _sq(bt_ref), _sq(y0_ref), _sq(yt_ref),
        ws_ref[...], wt_ref[...], ohm, ct_ref[...])
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dbt_ref[0] = dbt.astype(dbt_ref.dtype)
    dy0_ref[0] = dy0.astype(dy0_ref.dtype)
    dyt_ref[0] = dyt.astype(dyt_ref.dtype)

    @pl.when((g == 0) & (s == 0))
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    dws_ref[...] += dws
    dwt_ref[...] += dwt


def _bwd2_kernel(x_ref, bt_ref, y0_ref, yt_ref, ws_ref, wt_ref, m2T_ref,
                 lj_ref, ct_ref, u1_ref, ub_ref, uy0_ref, uyt_ref, u4_ref,
                 u5_ref, xb_ref, btb_ref, y0b_ref, ytb_ref, wsb_ref,
                 wtb_ref, ctb_ref, *, body, A):
    g, s = pl.program_id(0), pl.program_id(1)
    ohm = _ohm(lj_ref, m2T_ref, A)
    us = (_sq(u1_ref), _sq(ub_ref), _sq(uy0_ref), _sq(uyt_ref),
          u4_ref[...], u5_ref[...])
    xb, btb, y0b, ytb, wsb, wtb, ctb = body(
        _sq(x_ref), _sq(bt_ref), _sq(y0_ref), _sq(yt_ref),
        ws_ref[...], wt_ref[...], ohm, ct_ref[...], us)
    xb_ref[0] = xb.astype(xb_ref.dtype)
    btb_ref[0] = btb.astype(btb_ref.dtype)
    y0b_ref[0] = y0b.astype(y0b_ref.dtype)
    ytb_ref[0] = ytb.astype(ytb_ref.dtype)

    @pl.when((g == 0) & (s == 0))
    def _():
        wsb_ref[...] = jnp.zeros_like(wsb_ref)
        wtb_ref[...] = jnp.zeros_like(wtb_ref)

    wsb_ref[...] += wsb
    wtb_ref[...] += wtb

    @pl.when(s == 0)
    def _():
        ctb_ref[...] = jnp.zeros_like(ctb_ref)

    ctb_ref[...] += ctb.astype(ctb_ref.dtype)


def _fwd_kernel_g(x_ref, th_ref, ph_ref, dk_ref, ws_ref, wt_ref, m2T_ref,
                  lj_ref, out_ref, *, body, A):
    s = pl.program_id(1)
    ohm = _ohm(lj_ref, m2T_ref, A)
    prod = body(_sq(x_ref), _sq(th_ref), _sq(ph_ref), _sq(dk_ref),
                ws_ref[...], wt_ref[...], ohm, m2T_ref[0])

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += prod.astype(out_ref.dtype)


def _bwd_kernel_g(x_ref, th_ref, ph_ref, dk_ref, ws_ref, wt_ref, m2T_ref,
                  lj_ref, ct_ref, dx_ref, dth_ref, dph_ref, ddk_ref,
                  dws_ref, dwt_ref, *, body, A):
    g, s = pl.program_id(0), pl.program_id(1)
    ohm = _ohm(lj_ref, m2T_ref, A)
    dx, dth, dph, ddk, dws, dwt = body(
        _sq(x_ref), _sq(th_ref), _sq(ph_ref), _sq(dk_ref), ws_ref[...],
        wt_ref[...], ohm, m2T_ref[0], ct_ref[...])
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dth_ref[0] = dth.astype(dth_ref.dtype)
    dph_ref[0] = dph.astype(dph_ref.dtype)
    ddk_ref[0] = ddk.astype(ddk_ref.dtype)

    @pl.when((g == 0) & (s == 0))
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    dws_ref[...] += dws
    dwt_ref[...] += dwt


def _bwd2_kernel_g(x_ref, th_ref, ph_ref, dk_ref, ws_ref, wt_ref, m2T_ref,
                   lj_ref, ct_ref, u1_ref, uth_ref, uph_ref, udk_ref,
                   u4_ref, u5_ref, xb_ref, thb_ref, phb_ref, dkb_ref,
                   wsb_ref, wtb_ref, ctb_ref, *, body, A):
    g, s = pl.program_id(0), pl.program_id(1)
    ohm = _ohm(lj_ref, m2T_ref, A)
    us = (_sq(u1_ref), _sq(uth_ref), _sq(uph_ref), _sq(udk_ref),
          u4_ref[...], u5_ref[...])
    xb, thb, phb, dkb, wsb, wtb, ctb = body(
        _sq(x_ref), _sq(th_ref), _sq(ph_ref), _sq(dk_ref), ws_ref[...],
        wt_ref[...], ohm, m2T_ref[0], ct_ref[...], us)
    xb_ref[0] = xb.astype(xb_ref.dtype)
    thb_ref[0] = thb.astype(thb_ref.dtype)
    phb_ref[0] = phb.astype(phb_ref.dtype)
    dkb_ref[0] = dkb.astype(dkb_ref.dtype)

    @pl.when((g == 0) & (s == 0))
    def _():
        wsb_ref[...] = jnp.zeros_like(wsb_ref)
        wtb_ref[...] = jnp.zeros_like(wtb_ref)

    wsb_ref[...] += wsb
    wtb_ref[...] += wtb

    @pl.when(s == 0)
    def _():
        ctb_ref[...] = jnp.zeros_like(ctb_ref)

    ctb_ref[...] += ctb.astype(ctb_ref.dtype)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------

def _vmem(mb):
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a


def _layout(E, A, K):
    """Mosaic requires 128-divisible lane blocks, so a tile covers S
    slots with S = 128/gcd(A*K, 128) (S=8 at the flagship A=29, K=16:
    8*464 = 29*128). Slots are zero-padded up to a multiple of S.
    Returns (S, Et, Gt, E_pad)."""
    Et1 = A * K
    S = 128 // _gcd(Et1, 128)
    G = -(-E // Et1)
    assert E == G * Et1, (E, A, K)
    G_pad = -(-G // S) * S
    return S, S * Et1, G_pad // S, G_pad * Et1


def _pad_e(x, E_pad, axis):
    if x.shape[axis] == E_pad:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, E_pad - x.shape[axis])
    return jnp.pad(x, pads)


def _prep(x, pt, m2T, lj, A, K, cfg):
    """Pad slots to the group multiple, rebase lj to group-local ids,
    and lay x/pt/m2T out s-leading."""
    E, C = x.shape
    S, Et, Gt, E_pad = _layout(E, A, K)
    ns, nr, has_t = cfg
    slot = jnp.arange(E, dtype=jnp.int32) // (A * K)
    ljg = _pad_e(lj + ((slot % S) * A)[None, :], E_pad, 1)
    m2T3 = _pad_e(m2T, E_pad, 1)[:, None, :]              # [K, 1, E_pad]
    nk = ns * nr
    ptp = _pad_e(pt, E_pad, 2)                             # [K, R, E_pad]
    bt = ptp[:, :nk]
    y0 = ptp[:, nk:nk + ns]
    yt = (ptp[:, nk + ns:] if has_t
          else jnp.zeros((K, 1, E_pad), pt.dtype))
    # [E, C] (rows e = j*K + s) -> [K, N_pad, C] s-leading
    xk = jnp.transpose(_pad_e(x, E_pad, 0).reshape(E_pad // K, K, C),
                       (1, 0, 2))
    return S, Et, Gt, E_pad, C, bt, y0, yt, xk, m2T3, ljg


def _x_spec(SA, C):
    return pl.BlockSpec((1, SA, C), lambda g, s: (s, g, 0),
                        memory_space=pltpu.VMEM)


def _pt_spec(r, Et):
    return pl.BlockSpec((1, r, Et), lambda g, s: (s, 0, g),
                        memory_space=pltpu.VMEM)


def _e_spec(Et, C):
    return pl.BlockSpec((Et, C), lambda g, s: (g, 0),
                        memory_space=pltpu.VMEM)


def _m_spec(Et):
    return pl.BlockSpec((1, 1, Et), lambda g, s: (s, 0, g),
                        memory_space=pltpu.VMEM)


def _lj_spec(Et):
    return pl.BlockSpec((1, Et), lambda g, s: (0, g),
                        memory_space=pltpu.VMEM)


def _fs(r, c):
    return pl.BlockSpec((r, c), lambda g, s: (0, 0),
                        memory_space=pltpu.VMEM)


def _run_fwd(x, pt, ws, wt, m2T, lj, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    fwd_body, _, _ = _make_bodies(ns, nr, has_t)
    S, Et, Gt, E_pad, C, bt, y0, yt, xk, m2T3, ljg = _prep(
        x, pt, m2T, lj, A, K, cfg)
    SA = S * A
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, body=fwd_body, A=SA),
        grid=(Gt, K),
        in_specs=[_x_spec(SA, C), _pt_spec(bt.shape[1], Et),
                  _pt_spec(y0.shape[1], Et), _pt_spec(yt.shape[1], Et),
                  _fs(*ws.shape), _fs(*wt.shape), _m_spec(Et),
                  _lj_spec(Et)],
        out_specs=_e_spec(Et, C),
        out_shape=jax.ShapeDtypeStruct((E_pad, C), x.dtype),
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(xk, bt, y0, yt, ws, wt, m2T3, ljg)
    return out[:E]


def _join_dpt(dbt, dy0, dyt, cfg, E):
    has_t = cfg[2]
    parts = [dbt, dy0] + ([dyt] if has_t else [])
    return jnp.concatenate([p[:, :, :E] for p in parts], axis=1)


def _run_bwd(x, pt, ws, wt, m2T, lj, ct, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    _, bwd_body, _ = _make_bodies(ns, nr, has_t)
    S, Et, Gt, E_pad, C, bt, y0, yt, xk, m2T3, ljg = _prep(
        x, pt, m2T, lj, A, K, cfg)
    SA = S * A
    ctp = _pad_e(ct, E_pad, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, body=bwd_body, A=SA),
        grid=(Gt, K),
        in_specs=[_x_spec(SA, C), _pt_spec(bt.shape[1], Et),
                  _pt_spec(y0.shape[1], Et), _pt_spec(yt.shape[1], Et),
                  _fs(*ws.shape), _fs(*wt.shape), _m_spec(Et),
                  _lj_spec(Et), _e_spec(Et, C)],
        out_specs=[_x_spec(SA, C), _pt_spec(bt.shape[1], Et),
                   _pt_spec(y0.shape[1], Et), _pt_spec(yt.shape[1], Et),
                   _fs(*ws.shape), _fs(*wt.shape)],
        out_shape=[
            jax.ShapeDtypeStruct(xk.shape, x.dtype),
            jax.ShapeDtypeStruct(bt.shape, pt.dtype),
            jax.ShapeDtypeStruct(y0.shape, pt.dtype),
            jax.ShapeDtypeStruct(yt.shape, pt.dtype),
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
        ],
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(xk, bt, y0, yt, ws, wt, m2T3, ljg, ctp)
    dxk, dbt, dy0, dyt, dws, dwt = outs
    dx = jnp.transpose(dxk, (1, 0, 2)).reshape(E_pad, C)[:E]
    return (dx, _join_dpt(dbt, dy0, dyt, cfg, E),
            dws.astype(ws.dtype), dwt.astype(wt.dtype))


def _run_bwd2(x, pt, ws, wt, m2T, lj, ct, u1, u2, u4, u5, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    _, _, bwd2_body = _make_bodies(ns, nr, has_t)
    S, Et, Gt, E_pad, C, bt, y0, yt, xk, m2T3, ljg = _prep(
        x, pt, m2T, lj, A, K, cfg)
    SA = S * A
    ctp = _pad_e(ct, E_pad, 0)
    u1k = jnp.transpose(_pad_e(u1, E_pad, 0).reshape(E_pad // K, K, C),
                        (1, 0, 2))
    nk = ns * nr
    u2p = _pad_e(u2, E_pad, 2)
    ub = u2p[:, :nk]
    uy0 = u2p[:, nk:nk + ns]
    uyt = (u2p[:, nk + ns:] if has_t
           else jnp.zeros((K, 1, E_pad), u2.dtype))
    outs = pl.pallas_call(
        functools.partial(_bwd2_kernel, body=bwd2_body, A=SA),
        grid=(Gt, K),
        in_specs=[_x_spec(SA, C), _pt_spec(bt.shape[1], Et),
                  _pt_spec(y0.shape[1], Et), _pt_spec(yt.shape[1], Et),
                  _fs(*ws.shape), _fs(*wt.shape), _m_spec(Et),
                  _lj_spec(Et), _e_spec(Et, C),
                  _x_spec(SA, C), _pt_spec(ub.shape[1], Et),
                  _pt_spec(uy0.shape[1], Et), _pt_spec(uyt.shape[1], Et),
                  _fs(*ws.shape), _fs(*wt.shape)],
        out_specs=[_x_spec(SA, C), _pt_spec(bt.shape[1], Et),
                   _pt_spec(y0.shape[1], Et), _pt_spec(yt.shape[1], Et),
                   _fs(*ws.shape), _fs(*wt.shape), _e_spec(Et, C)],
        out_shape=[
            jax.ShapeDtypeStruct(xk.shape, x.dtype),
            jax.ShapeDtypeStruct(bt.shape, pt.dtype),
            jax.ShapeDtypeStruct(y0.shape, pt.dtype),
            jax.ShapeDtypeStruct(yt.shape, pt.dtype),
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
            jax.ShapeDtypeStruct((E_pad, C), ct.dtype),
        ],
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(xk, bt, y0, yt, ws, wt, m2T3, ljg, ctp, u1k, ub, uy0, uyt,
      u4.astype(jnp.float32), u5.astype(jnp.float32))
    xb, btb, y0b, ytb, wsb, wtb, ctb = outs
    xbe = jnp.transpose(xb, (1, 0, 2)).reshape(E_pad, C)[:E]
    return (xbe, _join_dpt(btb, y0b, ytb, cfg, E),
            wsb.astype(ws.dtype), wtb.astype(wt.dtype), ctb[:E])


def _prep_g(x, geo, m2T, lj, A, K, has_t):
    """Like :func:`_prep` for the scalar-geometry interface: geo
    [K, NG, E] splits host-side into th/ph/dk [K, 1, E_pad] operands
    (in-body row slicing is Mosaic-hostile, see ``_make_bodies_geom``).
    """
    E, C = x.shape
    S, Et, Gt, E_pad = _layout(E, A, K)
    slot = jnp.arange(E, dtype=jnp.int32) // (A * K)
    ljg = _pad_e(lj + ((slot % S) * A)[None, :], E_pad, 1)
    m2T3 = _pad_e(m2T, E_pad, 1)[:, None, :]
    geop = _pad_e(geo, E_pad, 2)                           # [K, NG, E_pad]
    thp = geop[:, 0:1]
    php = (geop[:, 1:2] if has_t
           else jnp.zeros_like(thp))
    dkp = geop[:, -1:]
    xk = jnp.transpose(_pad_e(x, E_pad, 0).reshape(E_pad // K, K, C),
                       (1, 0, 2))
    return S, Et, Gt, E_pad, C, thp, php, dkp, xk, m2T3, ljg


def _join_geo(dth, dph, ddk, has_t, E):
    parts = [dth, dph, ddk] if has_t else [dth, ddk]
    return jnp.concatenate([p[:, :, :E] for p in parts], axis=1)


def _run_fwd_g(x, geo, ws, wt, m2T, lj, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    fwd_body, _, _ = _make_bodies_geom(ns, nr, has_t)
    S, Et, Gt, E_pad, C, thp, php, dkp, xk, m2T3, ljg = _prep_g(
        x, geo, m2T, lj, A, K, has_t)
    SA = S * A
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_g, body=fwd_body, A=SA),
        grid=(Gt, K),
        in_specs=[_x_spec(SA, C), _pt_spec(1, Et), _pt_spec(1, Et),
                  _pt_spec(1, Et), _fs(*ws.shape), _fs(*wt.shape),
                  _m_spec(Et), _lj_spec(Et)],
        out_specs=_e_spec(Et, C),
        out_shape=jax.ShapeDtypeStruct((E_pad, C), x.dtype),
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(xk, thp, php, dkp, ws, wt, m2T3, ljg)
    return out[:E]


def _run_bwd_g(x, geo, ws, wt, m2T, lj, ct, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    _, bwd_body, _ = _make_bodies_geom(ns, nr, has_t)
    S, Et, Gt, E_pad, C, thp, php, dkp, xk, m2T3, ljg = _prep_g(
        x, geo, m2T, lj, A, K, has_t)
    SA = S * A
    ctp = _pad_e(ct, E_pad, 0)
    g1 = jax.ShapeDtypeStruct(thp.shape, jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_g, body=bwd_body, A=SA),
        grid=(Gt, K),
        in_specs=[_x_spec(SA, C), _pt_spec(1, Et), _pt_spec(1, Et),
                  _pt_spec(1, Et), _fs(*ws.shape), _fs(*wt.shape),
                  _m_spec(Et), _lj_spec(Et), _e_spec(Et, C)],
        out_specs=[_x_spec(SA, C), _pt_spec(1, Et), _pt_spec(1, Et),
                   _pt_spec(1, Et), _fs(*ws.shape), _fs(*wt.shape)],
        out_shape=[
            jax.ShapeDtypeStruct(xk.shape, x.dtype),
            g1, g1, g1,
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
        ],
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(xk, thp, php, dkp, ws, wt, m2T3, ljg, ctp)
    dxk, dth, dph, ddk, dws, dwt = outs
    dx = jnp.transpose(dxk, (1, 0, 2)).reshape(E_pad, C)[:E]
    return (dx, _join_geo(dth, dph, ddk, has_t, E).astype(geo.dtype),
            dws.astype(ws.dtype), dwt.astype(wt.dtype))


def _run_bwd2_g(x, geo, ws, wt, m2T, lj, ct, u1, ug, u4, u5, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    _, _, bwd2_body = _make_bodies_geom(ns, nr, has_t)
    S, Et, Gt, E_pad, C, thp, php, dkp, xk, m2T3, ljg = _prep_g(
        x, geo, m2T, lj, A, K, has_t)
    SA = S * A
    ctp = _pad_e(ct, E_pad, 0)
    u1k = jnp.transpose(_pad_e(u1, E_pad, 0).reshape(E_pad // K, K, C),
                        (1, 0, 2))
    ugp = _pad_e(ug, E_pad, 2).astype(jnp.float32)
    uth = ugp[:, 0:1]
    uph = ugp[:, 1:2] if has_t else jnp.zeros_like(uth)
    udk = ugp[:, -1:]
    g1 = jax.ShapeDtypeStruct(thp.shape, jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_bwd2_kernel_g, body=bwd2_body, A=SA),
        grid=(Gt, K),
        in_specs=[_x_spec(SA, C), _pt_spec(1, Et), _pt_spec(1, Et),
                  _pt_spec(1, Et), _fs(*ws.shape), _fs(*wt.shape),
                  _m_spec(Et), _lj_spec(Et), _e_spec(Et, C),
                  _x_spec(SA, C), _pt_spec(1, Et), _pt_spec(1, Et),
                  _pt_spec(1, Et), _fs(*ws.shape), _fs(*wt.shape)],
        out_specs=[_x_spec(SA, C), _pt_spec(1, Et), _pt_spec(1, Et),
                   _pt_spec(1, Et), _fs(*ws.shape), _fs(*wt.shape),
                   _e_spec(Et, C)],
        out_shape=[
            jax.ShapeDtypeStruct(xk.shape, x.dtype),
            g1, g1, g1,
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
            jax.ShapeDtypeStruct((E_pad, C), ct.dtype),
        ],
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(xk, thp, php, dkp, ws, wt, m2T3, ljg, ctp, u1k, uth, uph, udk,
      u4.astype(jnp.float32), u5.astype(jnp.float32))
    xb, thb, phb, dkb, wsb, wtb, ctb = outs
    xbe = jnp.transpose(xb, (1, 0, 2)).reshape(E_pad, C)[:E]
    return (xbe, _join_geo(thb, phb, dkb, has_t, E).astype(geo.dtype),
            wsb.astype(ws.dtype), wtb.astype(wt.dtype), ctb[:E])


# ---------------------------------------------------------------------------
# custom_vjp tower: F (fwd) -> B (bwd op) -> bwd2 kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _B(x, pt, ws, wt, m2T, lj, ct, A, K, cfg):
    return _run_bwd(x, pt, ws, wt, m2T, lj, ct, A, K, cfg)


def _B_fwd(x, pt, ws, wt, m2T, lj, ct, A, K, cfg):
    return (_B(x, pt, ws, wt, m2T, lj, ct, A, K, cfg),
            (x, pt, ws, wt, m2T, lj, ct))


def _B_bwd(A, K, cfg, res, cts):
    x, pt, ws, wt, m2T, lj, ct = res
    u1, u2, u4, u5 = cts
    xb, ptb, wsb, wtb, ctb = _run_bwd2(
        x, pt, ws, wt, m2T, lj, ct, u1, u2, u4, u5, A, K, cfg)
    return xb, ptb, wsb, wtb, None, None, ctb


_B.defvjp(_B_fwd, _B_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_triplet_slot(x, pt, ws, wt, m2T, lj, A: int, K: int, cfg):
    """out[e] = sum_s m2T[s, e] * x[lj[e]*K + s (slot-local)]
    * (sbf[e, s] @ ws) * (tbf[e, s] @ wt)

    Slot-resident fused triplet interaction: ``x [E, C]`` edge features
    in the slot-aligned NK layout (E = G*A*K), ``pt [K, R, E]`` packed
    basis S-LEADING (:func:`basis_pt_k`), ``m2T [K, E]`` transposed
    triplet mask, ``lj [1, E]`` slot-local sender ids (senders -
    slot*A, int32). ``cfg`` = (num_spherical, num_radial, has_t)
    static. Differentiable to second order; no [T, C] tensor exists at
    any AD level. Returns [E, C] in x's dtype.
    """
    return _run_fwd(x, pt, ws, wt, m2T, lj, A, K, cfg)


def _F_fwd(x, pt, ws, wt, m2T, lj, A, K, cfg):
    # recursive call: reverse-over-reverse linearizes this rule — it must
    # re-enter the custom_vjp, not expose the raw pallas_call
    return (fused_triplet_slot(x, pt, ws, wt, m2T, lj, A, K, cfg),
            (x, pt, ws, wt, m2T, lj))


def _F_bwd(A, K, cfg, res, ct):
    x, pt, ws, wt, m2T, lj = res
    dx, dpt, dws, dwt = _B(x, pt, ws, wt, m2T, lj, ct, A, K, cfg)
    return dx, dpt, dws, dwt, None, None


fused_triplet_slot.defvjp(_F_fwd, _F_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _Bg(x, geo, ws, wt, m2T, lj, ct, A, K, cfg):
    return _run_bwd_g(x, geo, ws, wt, m2T, lj, ct, A, K, cfg)


def _Bg_fwd(x, geo, ws, wt, m2T, lj, ct, A, K, cfg):
    return (_Bg(x, geo, ws, wt, m2T, lj, ct, A, K, cfg),
            (x, geo, ws, wt, m2T, lj, ct))


def _Bg_bwd(A, K, cfg, res, cts):
    x, geo, ws, wt, m2T, lj, ct = res
    u1, ug, u4, u5 = cts
    xb, geob, wsb, wtb, ctb = _run_bwd2_g(
        x, geo, ws, wt, m2T, lj, ct, u1, ug, u4, u5, A, K, cfg)
    return xb, geob, wsb, wtb, None, None, ctb


_Bg.defvjp(_Bg_fwd, _Bg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_triplet_slot_geom(x, geo, ws, wt, m2T, lj, A: int, K: int, cfg):
    """Scalar-geometry slot kernel (round 5): same contraction as
    :func:`fused_triplet_slot`, but ``geo [K, NG, E]`` carries the raw
    per-triplet scalars (theta[, phi], d_kj/cutoff; NG = 2 + has_t) and
    the basis rows are evaluated inside the kernel
    (:func:`_make_bodies_geom`) — nothing [K, R, E]-sized exists in HBM
    at any AD level. Differentiable to second order.

    MEASURED NEGATIVE RESULT (round 5, real chip, flagship force config
    G=96/A=29/K=16/ns=3/nr=6): 78.0 ms/step vs 62.6 for the pt-table
    kernel — the ~30 closed-form [1, Et] row evaluations run at 1/8 VPU
    sublane utilization and are re-differentiated at each of the three
    derivative passes, outweighing the ~43 MB/layer/pass of basis
    values+cotangents the scalar interface removes from HBM. Kept (with
    full parity tests incl. grad-of-grad) as the documented ladder step;
    the model uses :func:`fused_triplet_slot`.
    """
    return _run_fwd_g(x, geo, ws, wt, m2T, lj, A, K, cfg)


def _Fg_fwd(x, geo, ws, wt, m2T, lj, A, K, cfg):
    return (fused_triplet_slot_geom(x, geo, ws, wt, m2T, lj, A, K, cfg),
            (x, geo, ws, wt, m2T, lj))


def _Fg_bwd(A, K, cfg, res, ct):
    x, geo, ws, wt, m2T, lj = res
    dx, dgeo, dws, dwt = _Bg(x, geo, ws, wt, m2T, lj, ct, A, K, cfg)
    return dx, dgeo, dws, dwt, None, None


fused_triplet_slot_geom.defvjp(_Fg_fwd, _Fg_bwd)


def fused_triplet_slot_ref(x, pt, ws, wt, m2T, lj, A, K, cfg):
    """XLA oracle: same math staged out of the kernel harness (global
    one-hot gather, one s at a time over the whole batch)."""
    ns, nr, has_t = cfg
    fwd_body, _, _ = _make_bodies(ns, nr, has_t)
    E, C = x.shape
    nk = ns * nr
    N = E // K
    xk = x.reshape(N, K, C).transpose(1, 0, 2)            # [K, N, C]
    slot = jnp.arange(E, dtype=jnp.int32) // (A * K)
    jg = slot * A + lj[0]                                 # global sender
    parts = []
    for s in range(K):
        oh = (jnp.arange(N)[:, None] == jg[None, :]).astype(jnp.float32)
        ohm = oh * m2T[s][None, :]
        parts.append(fwd_body(xk[s], pt[s, :nk], pt[s, nk:nk + ns],
                              (pt[s, nk + ns:] if has_t
                               else jnp.zeros((1, E), pt.dtype)),
                              ws, wt, ohm))
    return sum(parts).astype(x.dtype)
