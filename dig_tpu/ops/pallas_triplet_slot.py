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

Here the expand never reaches HBM. The kernel takes the EDGE-level
``x [E, C]`` (E = G*A*K rows in the slot-aligned NK layout: G molecule
slots x A atoms x K neighbors) and gathers in VMEM:

* grid = one step per slot; the slot's x block ``[A, K, C]`` is VMEM-
  resident (a molecule's neighbors live in its own slot —
  ``radius_graph_nk_blocked`` guarantees it);
* the triplet's K axis is a STATIC unrolled loop: per reference
  neighbor s, the gather is a transposed one-hot ``dot_general``
  ``xg_s [E_t, C] = (onehot * mask_s) [A, E_t] . x_s [A, C]`` — MXU
  work, whose adjoint is the transposed einsum (no scatter at any AD
  order), with the triplet mask folded into the one-hot;
* the packed basis table arrives S-MAJOR, ``pt [R, K, E]`` (edge axis
  minor, full lanes; rows as :func:`pallas_triplet_pt.basis_pt`), so
  the per-s slice is a cheap middle-axis reduction and sbf/tbf rows are
  assembled in VMEM exactly as in v3.

Differentiation strategy is v3's, unchanged: bodies are pure jnp, the
backward body is trace-time ``jax.vjp`` of the forward body, the
second-order body is ``jax.vjp`` of the backward body, and the
custom_vjp tower (F -> B -> bwd2) keeps reverse-over-reverse fused.
Per-pass HBM is x (read) + pt + masks + out and their cotangents — all
E-sized; nothing T-sized is ever materialized.
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


# ---------------------------------------------------------------------------
# bodies (pure jnp -> derivative bodies by trace-time jax.vjp)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_bodies(num_spherical: int, num_radial: int, has_t: bool, K: int):
    n, k = num_spherical, num_radial
    dn = (((0,), (0,)), ((), ()))

    def _contrib(s, xs, bt, y0, yt, ws, wt, oh, m2T):
        f32 = jnp.float32
        md = xs.dtype
        e_s = jnp.eye(K, dtype=f32)[s]
        x_s = jnp.sum(xs.astype(f32) * e_s[None, :, None], axis=1)
        b_s = jnp.sum(bt.astype(f32) * e_s[None, :, None], axis=1)
        y0_s = jnp.sum(y0.astype(f32) * e_s[None, :, None], axis=1)
        sbfT = b_s * jnp.repeat(y0_s, k, axis=0)             # [n*k, Et]
        sv = jax.lax.dot_general(sbfT.astype(md), ws, dn,
                                 preferred_element_type=f32)  # [Et, C]
        oh_s = oh * m2T[s:s + 1, :]                           # [A, Et]
        xg = jax.lax.dot_general(oh_s.astype(md), x_s.astype(md), dn,
                                 preferred_element_type=f32)  # [Et, C]
        prod = xg * sv
        if has_t:
            y_s = jnp.sum(yt.astype(f32) * e_s[None, :, None], axis=1)
            tbfT = (jnp.repeat(y_s, k, axis=0)
                    * jnp.concatenate([b_s] * n, axis=0))     # [n*n*k, Et]
            tv = jax.lax.dot_general(tbfT.astype(md), wt, dn,
                                     preferred_element_type=f32)
            prod = prod * tv
        return prod

    def fwd_body(xs, bt, y0, yt, ws, wt, oh, m2T):
        """xs [A, K, C]; bt [n*k, K, Et]; y0 [n, K, Et]; yt [n*n|1, K, Et];
        ws [n*k, C]; wt [n*n*k|1, C]; oh [A, Et] one-hot(sender);
        m2T [K, Et] triplet mask. oh/m2T are constants under
        differentiation. Returns [Et, C] f32."""
        Et = oh.shape[-1]
        C = xs.shape[-1]
        out = jnp.zeros((Et, C), jnp.float32)
        for s in range(K):
            out = out + _contrib(s, xs, bt, y0, yt, ws, wt, oh, m2T)
        return out

    def bwd_body(xs, bt, y0, yt, ws, wt, oh, m2T, ct):
        """Hand-structured reverse: out = sum_s contrib_s, so the input
        cotangents are sum_s vjp(contrib_s)(ct), with EACH s-block traced
        as its own forward-recompute + reverse region. jax.vjp of the
        whole K-loop would keep all K iterations' intermediates live
        across the reverse sweep — a 218 MB Mosaic spill at the flagship
        tile (VMEM is 128 MB; jax.checkpoint cannot lower inside a
        Pallas TPU body). Recompute is free here: the kernels are
        HBM-bound, remat re-does only VMEM-resident MXU/VPU work."""
        ctf = ct.astype(jnp.float32)
        grads = None
        for s in range(K):
            _, vjp = jax.vjp(
                lambda *a, s=s: _contrib(s, *a, oh, m2T),
                xs, bt, y0, yt, ws, wt)
            g = vjp(ctf)
            grads = g if grads is None else tuple(
                a + b for a, b in zip(grads, g))
        return grads

    def bwd2_terms(xs, bt, y0, yt, ws, wt, oh, m2T, ct, us):
        """Second order, same per-s structuring: bwd = sum_s bwd_s with
        bwd_s = vjp(contrib_s), so vjp(bwd)(us) = sum_s vjp(bwd_s)(us)."""
        ctf = ct.astype(jnp.float32)
        grads = None
        for s in range(K):
            def bwd_s(xs, bt, y0, yt, ws, wt, ct, s=s):
                _, vjp = jax.vjp(
                    lambda *a, s=s: _contrib(s, *a, oh, m2T),
                    xs, bt, y0, yt, ws, wt)
                return vjp(ct)

            outs_s, vjp2 = jax.vjp(bwd_s, xs, bt, y0, yt, ws, wt, ctf)
            g = vjp2(tuple(u.astype(o.dtype) for u, o in zip(us, outs_s)))
            grads = g if grads is None else tuple(
                a + b for a, b in zip(grads, g))
        return grads

    return fwd_body, bwd_body, bwd2_terms


def _oh(lj_ref, A: int):
    """[A, Et] one-hot from group-local sender ids [1, Et] (kernel-
    resident ints, constant under differentiation)."""
    Et = lj_ref.shape[-1]
    return (jax.lax.broadcasted_iota(jnp.int32, (A, Et), 0)
            == lj_ref[...]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, bt_ref, y0_ref, yt_ref, ws_ref, wt_ref, m2T_ref,
                lj_ref, out_ref, *, body, A):
    oh = _oh(lj_ref, A)
    out_ref[...] = body(x_ref[...], bt_ref[...], y0_ref[...], yt_ref[...],
                        ws_ref[...], wt_ref[...], oh,
                        m2T_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


def _bwd_kernel(x_ref, bt_ref, y0_ref, yt_ref, ws_ref, wt_ref, m2T_ref,
                lj_ref, ct_ref, dx_ref, dbt_ref, dy0_ref, dyt_ref, dws_ref,
                dwt_ref, *, body, A):
    oh = _oh(lj_ref, A)
    dx, dbt, dy0, dyt, dws, dwt = body(
        x_ref[...], bt_ref[...], y0_ref[...], yt_ref[...], ws_ref[...],
        wt_ref[...], oh, m2T_ref[...].astype(jnp.float32), ct_ref[...])
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dbt_ref[...] = dbt.astype(dbt_ref.dtype)
    dy0_ref[...] = dy0.astype(dy0_ref.dtype)
    dyt_ref[...] = dyt.astype(dyt_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    dws_ref[...] += dws
    dwt_ref[...] += dwt


def _bwd2_kernel(x_ref, bt_ref, y0_ref, yt_ref, ws_ref, wt_ref, m2T_ref,
                 lj_ref, ct_ref, u1_ref, ub_ref, uy0_ref, uyt_ref, u4_ref,
                 u5_ref, xb_ref, btb_ref, y0b_ref, ytb_ref, wsb_ref,
                 wtb_ref, ctb_ref, *, body2, A):
    oh = _oh(lj_ref, A)
    m2T = m2T_ref[...].astype(jnp.float32)
    us = (u1_ref[...], ub_ref[...], uy0_ref[...], uyt_ref[...],
          u4_ref[...], u5_ref[...])
    xb, btb, y0b, ytb, wsb, wtb, ctb = body2(
        x_ref[...], bt_ref[...], y0_ref[...], yt_ref[...], ws_ref[...],
        wt_ref[...], oh, m2T, ct_ref[...], us)
    xb_ref[...] = xb.astype(xb_ref.dtype)
    btb_ref[...] = btb.astype(btb_ref.dtype)
    y0b_ref[...] = y0b.astype(y0b_ref.dtype)
    ytb_ref[...] = ytb.astype(ytb_ref.dtype)
    ctb_ref[...] = ctb.astype(ctb_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        wsb_ref[...] = jnp.zeros_like(wsb_ref)
        wtb_ref[...] = jnp.zeros_like(wtb_ref)

    wsb_ref[...] += wsb
    wtb_ref[...] += wtb


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
    """Mosaic requires 128-divisible lane blocks, so a grid step covers S
    slots with S = 128/gcd(A*K, 128) (S=8 at the flagship A=29, K=16:
    8*464 = 29*128). Slots are zero-padded up to a multiple of S.
    Returns (S, Et, G_pad, E_pad)."""
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


def _split_pt3(pt, cfg, K, E):
    """pt [R, K*E] s-major -> (bt [nk,K,E], y0 [n,K,E], yt [nt|1,K,E])."""
    ns, nr, has_t = cfg
    nk = ns * nr
    pt3 = pt.reshape(pt.shape[0], K, E)
    bt = pt3[:nk]
    y0 = pt3[nk:nk + ns]
    yt = (pt3[nk + ns:] if has_t
          else jnp.zeros((1, K, E), pt.dtype))
    return bt, y0, yt


def _x_spec(A, K, C):
    return pl.BlockSpec((A, K, C), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _pt_spec(r, K, Et):
    return pl.BlockSpec((r, K, Et), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)


def _e_spec(Et, C):
    return pl.BlockSpec((Et, C), lambda g: (g, 0), memory_space=pltpu.VMEM)


def _k_spec(K, Et):
    return pl.BlockSpec((K, Et), lambda g: (0, g), memory_space=pltpu.VMEM)


def _lj_spec(Et):
    return pl.BlockSpec((1, Et), lambda g: (0, g), memory_space=pltpu.VMEM)


def _fs(r, c):
    return pl.BlockSpec((r, c), lambda g: (0, 0), memory_space=pltpu.VMEM)


def _prep(x, pt, m2T, lj, A, K, cfg):
    """Group slots to a 128-divisible lane tile, zero-pad trailing slots,
    and rebase lj to group-local ids."""
    E, C = x.shape
    S, Et, Gt, E_pad = _layout(E, A, K)
    ns, nr, has_t = cfg
    slot = jnp.arange(E, dtype=jnp.int32) // (A * K)
    ljg = _pad_e(lj + ((slot % S) * A)[None, :], E_pad, 1)
    m2Tp = _pad_e(m2T, E_pad, 1)
    pt3 = pt.reshape(pt.shape[0], K, E)
    nk = ns * nr
    bt = _pad_e(pt3[:nk], E_pad, 2)
    y0 = _pad_e(pt3[nk:nk + ns], E_pad, 2)
    yt = (_pad_e(pt3[nk + ns:], E_pad, 2) if has_t
          else jnp.zeros((1, K, E_pad), pt.dtype))
    x3 = _pad_e(x, E_pad, 0).reshape(E_pad // K, K, C)
    return S, Et, Gt, E_pad, C, bt, y0, yt, x3, m2Tp, ljg


def _run_fwd(x, pt, ws, wt, m2T, lj, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    fwd_body, _, _ = _make_bodies(ns, nr, has_t, K)
    S, Et, Gt, E_pad, C, bt, y0, yt, x3, m2Tp, ljg = _prep(
        x, pt, m2T, lj, A, K, cfg)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, body=fwd_body, A=S * A),
        grid=(Gt,),
        in_specs=[_x_spec(S * A, K, C), _pt_spec(bt.shape[0], K, Et),
                  _pt_spec(y0.shape[0], K, Et), _pt_spec(yt.shape[0], K, Et),
                  _fs(*ws.shape), _fs(*wt.shape), _k_spec(K, Et),
                  _lj_spec(Et)],
        out_specs=_e_spec(Et, C),
        out_shape=jax.ShapeDtypeStruct((E_pad, C), x.dtype),
        compiler_params=_vmem(64),
        interpret=not _on_tpu(),
    )(x3, bt, y0, yt, ws, wt, m2Tp, ljg)
    return out[:E]


def _join_dpt(dbt, dy0, dyt, cfg, K, E):
    ns, nr, has_t = cfg
    parts = [dbt, dy0] + ([dyt] if has_t else [])
    return jnp.concatenate(
        [p[:, :, :E] for p in parts], axis=0).reshape(-1, K * E)


def _run_bwd(x, pt, ws, wt, m2T, lj, ct, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    _, bwd_body, _ = _make_bodies(ns, nr, has_t, K)
    S, Et, Gt, E_pad, C, bt, y0, yt, x3, m2Tp, ljg = _prep(
        x, pt, m2T, lj, A, K, cfg)
    ctp = _pad_e(ct, E_pad, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, body=bwd_body, A=S * A),
        grid=(Gt,),
        in_specs=[_x_spec(S * A, K, C), _pt_spec(bt.shape[0], K, Et),
                  _pt_spec(y0.shape[0], K, Et), _pt_spec(yt.shape[0], K, Et),
                  _fs(*ws.shape), _fs(*wt.shape), _k_spec(K, Et),
                  _lj_spec(Et), _e_spec(Et, C)],
        out_specs=[_x_spec(S * A, K, C), _pt_spec(bt.shape[0], K, Et),
                   _pt_spec(y0.shape[0], K, Et),
                   _pt_spec(yt.shape[0], K, Et),
                   _fs(*ws.shape), _fs(*wt.shape)],
        out_shape=[
            jax.ShapeDtypeStruct((E_pad // K, K, C), x.dtype),
            jax.ShapeDtypeStruct(bt.shape, pt.dtype),
            jax.ShapeDtypeStruct(y0.shape, pt.dtype),
            jax.ShapeDtypeStruct(yt.shape, pt.dtype),
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
        ],
        compiler_params=_vmem(100),
        interpret=not _on_tpu(),
    )(x3, bt, y0, yt, ws, wt, m2Tp, ljg, ctp)
    dx3, dbt, dy0, dyt, dws, dwt = outs
    return (dx3.reshape(E_pad, C)[:E], _join_dpt(dbt, dy0, dyt, cfg, K, E),
            dws.astype(ws.dtype), dwt.astype(wt.dtype))


def _run_bwd2(x, pt, ws, wt, m2T, lj, ct, u1, u2, u4, u5, A, K, cfg):
    E = x.shape[0]
    ns, nr, has_t = cfg
    _, _, bwd2_terms = _make_bodies(ns, nr, has_t, K)
    S, Et, Gt, E_pad, C, bt, y0, yt, x3, m2Tp, ljg = _prep(
        x, pt, m2T, lj, A, K, cfg)
    ctp = _pad_e(ct, E_pad, 0)
    u13 = _pad_e(u1, E_pad, 0).reshape(E_pad // K, K, C)
    nk = ns * nr
    u23 = u2.reshape(u2.shape[0], K, E)
    ub = _pad_e(u23[:nk], E_pad, 2)
    uy0 = _pad_e(u23[nk:nk + ns], E_pad, 2)
    uyt = (_pad_e(u23[nk + ns:], E_pad, 2) if has_t
           else jnp.zeros((1, K, E_pad), u2.dtype))
    outs = pl.pallas_call(
        functools.partial(_bwd2_kernel, body2=bwd2_terms, A=S * A),
        grid=(Gt,),
        in_specs=[_x_spec(S * A, K, C), _pt_spec(bt.shape[0], K, Et),
                  _pt_spec(y0.shape[0], K, Et), _pt_spec(yt.shape[0], K, Et),
                  _fs(*ws.shape), _fs(*wt.shape), _k_spec(K, Et),
                  _lj_spec(Et), _e_spec(Et, C),
                  _x_spec(S * A, K, C), _pt_spec(ub.shape[0], K, Et),
                  _pt_spec(uy0.shape[0], K, Et),
                  _pt_spec(uyt.shape[0], K, Et),
                  _fs(*ws.shape), _fs(*wt.shape)],
        out_specs=[_x_spec(S * A, K, C), _pt_spec(bt.shape[0], K, Et),
                   _pt_spec(y0.shape[0], K, Et),
                   _pt_spec(yt.shape[0], K, Et),
                   _fs(*ws.shape), _fs(*wt.shape), _e_spec(Et, C)],
        out_shape=[
            jax.ShapeDtypeStruct((E_pad // K, K, C), x.dtype),
            jax.ShapeDtypeStruct(bt.shape, pt.dtype),
            jax.ShapeDtypeStruct(y0.shape, pt.dtype),
            jax.ShapeDtypeStruct(yt.shape, pt.dtype),
            jax.ShapeDtypeStruct(ws.shape, jnp.float32),
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
            jax.ShapeDtypeStruct((E_pad, C), ct.dtype),
        ],
        compiler_params=_vmem(120),
        interpret=not _on_tpu(),
    )(x3, bt, y0, yt, ws, wt, m2Tp, ljg, ctp, u13, ub, uy0, uyt,
      u4.astype(jnp.float32), u5.astype(jnp.float32))
    xb3, btb, y0b, ytb, wsb, wtb, ctb = outs
    return (xb3.reshape(E_pad, C)[:E], _join_dpt(btb, y0b, ytb, cfg, K, E),
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
    in the slot-aligned NK layout (E = G*A*K), ``pt [R, K*E]`` packed
    transposed basis S-MAJOR (column s*E + e; rows as
    :func:`pallas_triplet_pt.basis_pt`), ``m2T [K, E]`` transposed
    triplet mask, ``lj [1, E]`` slot-local sender ids
    (senders - slot*A, int32). ``cfg`` = (num_spherical, num_radial,
    has_t) static. Differentiable to second order; no [T, C] tensor
    exists at any AD level. Returns [E, C] in x's dtype.
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


def fused_triplet_slot_ref(x, pt, ws, wt, m2T, lj, A, K, cfg):
    """XLA oracle: same math staged out of the kernel harness (whole
    batch as one 'slot-tile' per slot, via vmap over slots)."""
    ns, nr, has_t = cfg
    fwd_body, _, _ = _make_bodies(ns, nr, has_t, K)
    E, C = x.shape
    G = E // (A * K)
    Et = A * K
    bt, y0, yt = _split_pt3(pt, cfg, K, E)
    x3 = x.reshape(G, A, K, C)

    def one(g):
        sl = slice(g * Et, (g + 1) * Et)
        oh = (jnp.arange(A)[:, None] == lj[0, sl][None, :])
        return fwd_body(x3[g], bt[:, :, sl], y0[:, :, sl], yt[:, :, sl],
                        ws, wt, oh.astype(jnp.float32),
                        m2T[:, sl].astype(jnp.float32))

    return jnp.concatenate([one(g) for g in range(G)], axis=0).astype(x.dtype)
