"""Fused continuous-filter convolution — Pallas TPU kernel.

The SchNet interaction's hot op (reference
``dig/threedgraph/method/schnet/schnet.py:26-60``: ``CFConv`` = Gaussian
smearing -> 2-layer filter MLP -> cutoff gate -> neighbor aggregate) is

    agg[g,i,f] = sum_j gate(d_gij) * W(d_gij)[f] * vj[g,j,f]
    W(d)       = sps(sps(rbf(d) @ W1 + b1) @ W2 + b2)

Under plain XLA the filter tensor ``W`` ([G, n, n, F]) is materialized to
HBM in the forward pass and again (twice) in the backward pass — at
batch 512 / n 32 / F 128 that is ~1 GB of traffic per layer per step and
was the measured bottleneck of the dense molecular path (BENCH_r01:
9.3% of roofline).

This kernel instead streams only the *distance matrix* ([G, n, n] f32)
and the node features ([G, n, F]) through HBM; the Gaussian RBF, the
cutoff gate, both filter matmuls (bf16 on the MXU, f32 accumulation) and
the j-contraction all live in VMEM. The custom VJP recomputes the filter
in VMEM and accumulates the weight gradients across grid steps inside
the kernel (constant output block), so the backward pass also touches
HBM only for [G, n, n]- and [G, n, F]-sized tensors. Per pair per layer
the HBM traffic drops from ~1 KB to ~8 B — the op becomes MXU-bound.

Geometry gradients (``d_dist``, needed for force training's
``-dE/dpos``, reference ``run.py:126``) are always produced: they cost
one extra small matmul (~7% of backward FLOPs) and avoid a silent-zero
footgun when callers differentiate w.r.t. positions.

Off TPU the kernels run in interpret mode, so tests exercise the same
code path everywhere; ``cfconv_reference`` is the pure-XLA equivalent
used for correctness checks (tests/test_pallas_cfconv.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2 = 0.6931471805599453
# Sentinel distance for invalid pairs (padding slots, diagonal): far beyond
# any cutoff, so the in-kernel gate and RBF both evaluate to exactly 0.
MASK_DIST = 1.0e9


def _sps(x):
    return jax.nn.softplus(x) - _LOG2


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pure-XLA reference (correctness oracle; also the fallback path)
# ---------------------------------------------------------------------------

def cfconv_reference(dist, vj, w1, b1, w2, b2, *, cutoff: float,
                     num_gaussians: int):
    """Reference cfconv from masked distances.

    dist: [G, n, n] with invalid pairs set to ``MASK_DIST``; vj: [G, n, F].
    """
    offset = jnp.linspace(0.0, cutoff, num_gaussians)
    coeff = -0.5 / float(cutoff / (num_gaussians - 1)) ** 2
    delta = dist[..., None] - offset
    rbf = jnp.exp(coeff * delta * delta)
    gate = 0.5 * (jnp.cos(dist * jnp.pi / cutoff) + 1.0)
    gate = jnp.where(dist < cutoff, gate, 0.0)
    h = _sps(jnp.einsum("gijr,rf->gijf", rbf, w1) + b1)
    w = jnp.einsum("gijf,fk->gijk", h, w2) + b2   # no act after last Linear
    w = w * gate[..., None]
    return jnp.einsum("gijf,gjf->gif", w, vj)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _rbf_gate(d3, R_pad: int, coeff: float, delta_mu: float, cutoff: float):
    """In-VMEM Gaussian RBF [MB*n*n, R_pad] and cutoff gate [MB, n, n].

    Mosaic cannot relayout between [MB, n*n] and [MB, n, n] shapes, so
    everything stays in the 3D [MB, n, n] layout; the RBF broadcasts the
    distance along a new trailing lane axis and merges only leading dims
    (both supported relayouts) to form the matmul operand.
    """
    MB, n, _ = d3.shape
    d4 = jnp.broadcast_to(d3[..., None], (MB, n, n, R_pad))
    mu4 = jax.lax.broadcasted_iota(jnp.int32, (MB, n, n, R_pad), 3)
    dd = d4 - mu4.astype(jnp.float32) * delta_mu
    rbf = jnp.exp(coeff * dd * dd).reshape(MB * n * n, R_pad)
    gate3 = 0.5 * (jnp.cos(d3 * (math.pi / cutoff)) + 1.0)
    gate3 = jnp.where(d3 < cutoff, gate3, 0.0)
    return rbf, gate3


def _fwd_kernel(dist_ref, vj_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                MB: int, n: int, R_pad: int, F: int, coeff: float,
                delta_mu: float, cutoff: float, mm_dtype):
    d3 = dist_ref[...]                                    # [MB, n, n]
    rbf, gate3 = _rbf_gate(d3, R_pad, coeff, delta_mu, cutoff)
    h = _sps(jnp.dot(rbf.astype(mm_dtype), w1_ref[...],
                     preferred_element_type=jnp.float32) + b1_ref[...])
    w = jnp.dot(h.astype(mm_dtype), w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    w4 = w.reshape(MB, n, n, F) * gate3[..., None]
    vjf = vj_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.sum(w4 * vjf[:, None, :, :], axis=2)


def _bwd_kernel(dist_ref, vj_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                d_dist_ref, d_vj_ref, d_w1_ref, d_b1_ref, d_w2_ref,
                d_b2_ref, *, MB: int, n: int, R_pad: int, F: int,
                coeff: float, delta_mu: float, cutoff: float, mm_dtype,
                need_ddist: bool = True):
    rows = MB * n * n
    d3 = dist_ref[...]                                    # [MB, n, n]
    rbf, gate3 = _rbf_gate(d3, R_pad, coeff, delta_mu, cutoff)
    rbf16 = rbf.astype(mm_dtype)
    pre1 = jnp.dot(rbf16, w1_ref[...],
                   preferred_element_type=jnp.float32) + b1_ref[...]
    h = _sps(pre1)
    h16 = h.astype(mm_dtype)
    w = jnp.dot(h16, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    # w is the pre-gate filter (no activation after the last Linear,
    # matching the reference CFConv mlp)

    g = g_ref[...].astype(jnp.float32)                    # [MB, n, F]
    vjf = vj_ref[...].astype(jnp.float32)                 # [MB, n, F]
    gate4 = gate3[..., None]
    w4 = w.reshape(MB, n, n, F)
    d_vj_ref[...] = jnp.sum(w4 * gate4 * g[:, :, None, :], axis=1)

    # d_wgated[mb, i, j, f] = g[mb, i, f] * vj[mb, j, f]
    d_wgated4 = g[:, :, None, :] * vjf[:, None, :, :]
    d_gate3 = jnp.sum(w4 * d_wgated4, axis=3)             # [MB, n, n]
    d_pre2 = (d_wgated4 * gate4).reshape(rows, F)
    d_pre2_16 = d_pre2.astype(mm_dtype)
    d_h = jnp.dot(d_pre2_16, w2_ref[...].T,
                  preferred_element_type=jnp.float32)
    d_pre1 = d_h * jax.nn.sigmoid(pre1)
    d_pre1_16 = d_pre1.astype(mm_dtype)

    if need_ddist:
        # geometry gradient: through the RBF and the cutoff gate
        d_rbf = jnp.dot(d_pre1_16, w1_ref[...].T,
                        preferred_element_type=jnp.float32)
        d4 = jnp.broadcast_to(d3[..., None], (MB, n, n, R_pad))
        mu4 = jax.lax.broadcasted_iota(jnp.int32, (MB, n, n, R_pad), 3)
        dmu4 = d4 - mu4.astype(jnp.float32) * delta_mu
        d_from_rbf = jnp.sum(
            (d_rbf * rbf).reshape(MB, n, n, R_pad) * (2.0 * coeff) * dmu4,
            axis=3)
        dgate_dd = (-0.5 * (math.pi / cutoff)
                    * jnp.sin(d3 * (math.pi / cutoff)))
        dgate_dd = jnp.where(d3 < cutoff, dgate_dd, 0.0)
        d_dist_ref[...] = d_from_rbf + d_gate3 * dgate_dd
    else:
        d_dist_ref[...] = jnp.zeros((MB, n, n), jnp.float32)

    # weight grads: accumulate across grid steps (constant output block)
    p_w1 = jnp.dot(rbf16.T, d_pre1_16, preferred_element_type=jnp.float32)
    p_b1 = jnp.sum(d_pre1, axis=0, keepdims=True)
    p_w2 = jnp.dot(h16.T, d_pre2_16, preferred_element_type=jnp.float32)
    p_b2 = jnp.sum(d_pre2, axis=0, keepdims=True)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        d_w1_ref[...] = p_w1
        d_b1_ref[...] = p_b1
        d_w2_ref[...] = p_w2
        d_b2_ref[...] = p_b2

    @pl.when(jnp.logical_not(first))
    def _():
        d_w1_ref[...] += p_w1
        d_b1_ref[...] += p_b1
        d_w2_ref[...] += p_w2
        d_b2_ref[...] += p_b2


# ---------------------------------------------------------------------------
# Wrapper with custom VJP
# ---------------------------------------------------------------------------

def _pick_mb(G: int, n2: int, target_rows: int = 8192) -> int:
    # The block is [MB, n, n]: Mosaic's tiling constraints bind the last two
    # dims (n, n), so MB is free. Sized so MB*n^2 matmul rows ~ target.
    mb = max(1, target_rows // n2)
    return min(mb, G)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def cfconv_fused(dist, vj, w1, b1, w2, b2, cutoff, num_gaussians,
                 precision="bf16", need_dist_grad=True):
    """Fused cfconv: dist [G,n,n] (invalid pairs = MASK_DIST), vj [G,n,F],
    w1 [R,F], b1 [F], w2 [F,F], b2 [F] -> agg [G,n,F] float32.

    ``cutoff``, ``num_gaussians`` and ``precision`` ("bf16"|"f32" matmul
    inputs; accumulation is always f32) are static. n is padded to a
    multiple of 8 internally; on TPU, F must be a multiple of 128.

    ``need_dist_grad=False`` skips the geometry-gradient branch of the
    backward kernel (~12% of backward FLOPs: the d_rbf matmul + the
    RBF/gate chain rules). ONLY for energy-only training: with it off, a
    ``jax.grad`` w.r.t. positions flowing through ``dist`` returns ZEROS
    from this op, silently — force training must leave it True.
    """
    return _fused_fwd(dist, vj, w1, b1, w2, b2, cutoff, num_gaussians,
                      precision, need_dist_grad)[0]


def _mm_dtype(precision):
    return jnp.float32 if precision == "f32" else jnp.bfloat16


def _prep(dist, vj, w1, b1, w2, b2, num_gaussians, target_rows=8192):
    G, n, _ = dist.shape
    F = vj.shape[-1]
    if F % 128 != 0 and _on_tpu():
        raise ValueError(f"F={F} must be a multiple of 128 on TPU")
    # Sublane-aligned slot size: n is free down to multiples of 8 (f32
    # sublane); per-pair-row throughput is flat across n=16/24/32 (measured
    # ~165 Mrows/s fwd+bwd), which is what makes size-bucketed batching pay.
    n_pad = _round_up(n, 8)
    R = w1.shape[0]
    R_pad = _round_up(max(R, num_gaussians), 64)
    if n_pad != n:
        dist = jnp.pad(dist, ((0, 0), (0, n_pad - n), (0, n_pad - n)),
                       constant_values=MASK_DIST)
        vj = jnp.pad(vj, ((0, 0), (0, n_pad - n), (0, 0)))
    if R_pad != R:
        w1 = jnp.pad(w1, ((0, R_pad - R), (0, 0)))
    MB = _pick_mb(G, n_pad * n_pad, target_rows)
    G_pad = _round_up(G, MB)
    if G_pad != G:
        dist = jnp.pad(dist, ((0, G_pad - G), (0, 0), (0, 0)),
                       constant_values=MASK_DIST)
        vj = jnp.pad(vj, ((0, G_pad - G), (0, 0), (0, 0)))
    return dist, vj, w1, b1, w2, b2, (G, n, F, G_pad, n_pad, R_pad, MB)


def _fused_fwd(dist, vj, w1, b1, w2, b2, cutoff, num_gaussians,
               precision="bf16", need_dist_grad=True):
    orig = (dist, vj, w1, b1, w2, b2)
    md = _mm_dtype(precision)
    dist_p, vj_p, w1_p, b1_, w2_, b2_, dims = _prep(
        dist, vj, w1, b1, w2, b2, num_gaussians)
    G, n, F, G_pad, n_pad, R_pad, MB = dims
    n2 = n_pad * n_pad
    coeff = -0.5 / float(cutoff / (num_gaussians - 1)) ** 2
    delta_mu = float(cutoff / (num_gaussians - 1))
    kern = functools.partial(_fwd_kernel, MB=MB, n=n_pad, R_pad=R_pad, F=F,
                             coeff=coeff, delta_mu=delta_mu, cutoff=cutoff,
                             mm_dtype=md)
    rows = MB * n2
    flops_mm = 2 * rows * R_pad * F + 2 * rows * F * F
    out = pl.pallas_call(
        kern,
        grid=(G_pad // MB,),
        in_specs=[
            pl.BlockSpec((MB, n_pad, n_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((MB, n_pad, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((R_pad, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((F, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((MB, n_pad, F), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G_pad, n_pad, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm * (G_pad // MB),
            bytes_accessed=(G_pad * n2 * 4 + 2 * G_pad * n_pad * F * 4),
            transcendentals=rows * (G_pad // MB) * (R_pad + 2 * F),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=not _on_tpu(),
    )(dist_p.astype(jnp.float32),
      vj_p.astype(md),
      w1_p.astype(md), b1_.reshape(1, F).astype(jnp.float32),
      w2_.astype(md), b2_.reshape(1, F).astype(jnp.float32))
    return out[:G, :n], orig


def _fused_bwd(cutoff, num_gaussians, precision, need_dist_grad, res,
               g_out):
    dist, vj, w1, b1, w2, b2 = res
    md = _mm_dtype(precision)
    dist_p, vj_p, w1_p, b1_, w2_, b2_, dims = _prep(
        dist, vj, w1, b1, w2, b2, num_gaussians, target_rows=4096)
    G, n, F, G_pad, n_pad, R_pad, MB = dims
    n2 = n_pad * n_pad
    R = w1.shape[0]
    coeff = -0.5 / float(cutoff / (num_gaussians - 1)) ** 2
    delta_mu = float(cutoff / (num_gaussians - 1))
    if n_pad != n or G_pad != G:
        g_out = jnp.pad(g_out, ((0, G_pad - G), (0, n_pad - n), (0, 0)))
    kern = functools.partial(_bwd_kernel, MB=MB, n=n_pad, R_pad=R_pad, F=F,
                             coeff=coeff, delta_mu=delta_mu, cutoff=cutoff,
                             mm_dtype=md, need_ddist=need_dist_grad)
    rows = MB * n2
    flops_mm = 2 * rows * F * (2 * R_pad + 3 * F)
    const = lambda g: (0, 0)
    outs = pl.pallas_call(
        kern,
        grid=(G_pad // MB,),
        in_specs=[
            pl.BlockSpec((MB, n_pad, n_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((MB, n_pad, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((R_pad, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((F, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((MB, n_pad, F), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((MB, n_pad, n_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((MB, n_pad, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((R_pad, F), const),
            pl.BlockSpec((1, F), const),
            pl.BlockSpec((F, F), const),
            pl.BlockSpec((1, F), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G_pad, n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((G_pad, n_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm * (G_pad // MB),
            bytes_accessed=(2 * G_pad * n2 * 4 + 4 * G_pad * n_pad * F * 4),
            transcendentals=rows * (G_pad // MB) * (R_pad + 2 * F),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=not _on_tpu(),
    )(dist_p.astype(jnp.float32),
      vj_p.astype(md),
      w1_p.astype(md), b1_.reshape(1, F).astype(jnp.float32),
      w2_.astype(md), b2_.reshape(1, F).astype(jnp.float32),
      g_out.astype(jnp.float32))
    d_dist, d_vj, d_w1, d_b1, d_w2, d_b2 = outs
    return (d_dist[:G, :n, :n],
            d_vj[:G, :n].astype(vj.dtype),
            d_w1[:R].astype(w1.dtype), d_b1.reshape(F).astype(b1.dtype),
            d_w2.astype(w2.dtype), d_b2.reshape(F).astype(b2.dtype))


cfconv_fused.defvjp(_fused_fwd, _fused_bwd)
