"""Fused continuous-filter convolution — Pallas TPU kernel.

The SchNet interaction's hot op is
``agg[g,i,f] = sum_j sps(sps(rbf[g,i,j] @ W1) @ W2)[f] * gate[g,i,j] * vj[g,j,f]``.
Under plain XLA the filter tensor ``W`` ([G, n, n, F]) is materialized to
HBM (and again in the backward pass) — at batch 512 that is multiple GB of
traffic per step and the measured bottleneck of the dense molecular path.

This kernel runs one molecule per grid step with every intermediate in
VMEM: the per-graph tile (n^2 x R basis, n^2 x F filter) is a few hundred
KB, so HBM only sees the inputs (rbf, gate, vj) and the [n, F] output.
A custom VJP recomputes the filter in VMEM for the backward pass and emits
per-graph weight-gradient partials the wrapper sums.

Off TPU the kernels run in interpret mode, so tests exercise the same code
path everywhere; ``cfconv_reference`` is the pure-XLA equivalent used for
correctness checks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2 = 0.6931471805599453


def _sps(x):
    return jax.nn.softplus(x) - _LOG2


def _sps_grad(pre):
    return jax.nn.sigmoid(pre)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def cfconv_reference(rbf, gate, vj, w1, b1, w2, b2):
    """Pure-XLA reference (and correctness oracle in tests)."""
    h = _sps(jnp.einsum("gijr,rf->gijf", rbf, w1) + b1)
    w = _sps(jnp.einsum("gijf,fk->gijk", h, w2) + b2)
    w = w * gate[..., None]
    return jnp.einsum("gijf,gjf->gif", w, vj)


def _fwd_kernel(rbf_ref, gate_ref, vj_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    rbf = rbf_ref[0]                                     # [n2, R]
    gate = gate_ref[0]                                   # [n2, 1]
    vj = vj_ref[0]                                       # [n, F]
    n, F = vj.shape
    n2 = rbf.shape[0]
    h = _sps(jnp.dot(rbf, w1_ref[...],
                     preferred_element_type=jnp.float32) + b1_ref[...])
    w = _sps(jnp.dot(h, w2_ref[...],
                     preferred_element_type=jnp.float32) + b2_ref[...])
    w = w * gate
    w = w.reshape(n, n, F)
    out_ref[0] = jnp.sum(w * vj[None, :, :], axis=1)


def _bwd_kernel(rbf_ref, gate_ref, vj_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, d_rbf_ref, d_gate_ref, d_vj_ref, d_w1_ref, d_b1_ref,
                d_w2_ref, d_b2_ref):
    rbf = rbf_ref[0]
    gate = gate_ref[0]
    vj = vj_ref[0]
    n, F = vj.shape
    n2 = rbf.shape[0]
    pre1 = jnp.dot(rbf, w1_ref[...],
                   preferred_element_type=jnp.float32) + b1_ref[...]
    h = _sps(pre1)
    pre2 = jnp.dot(h, w2_ref[...],
                   preferred_element_type=jnp.float32) + b2_ref[...]
    w_pre = _sps(pre2)                                   # [n2, F]
    gate2 = gate

    g_out = g_ref[0]                                     # [n, F]
    d_w = (g_out[:, None, :] * vj[None, :, :]).reshape(n2, F)
    w_full = (w_pre * gate2).reshape(n, n, F)
    d_vj_ref[0] = jnp.sum(w_full * g_out[:, None, :], axis=0)
    d_gate_ref[0] = jnp.sum(w_pre * d_w, axis=1, keepdims=True)
    d_wpre = d_w * gate2
    d_pre2 = d_wpre * _sps_grad(pre2)
    d_w2_ref[0] = jnp.dot(h.T, d_pre2,
                          preferred_element_type=jnp.float32)
    d_b2_ref[0] = jnp.sum(d_pre2, axis=0, keepdims=True)
    d_h = jnp.dot(d_pre2, w2_ref[...].T,
                  preferred_element_type=jnp.float32)
    d_pre1 = d_h * _sps_grad(pre1)
    d_w1_ref[0] = jnp.dot(rbf.T, d_pre1,
                          preferred_element_type=jnp.float32)
    d_b1_ref[0] = jnp.sum(d_pre1, axis=0, keepdims=True)
    d_rbf_ref[0] = jnp.dot(d_pre1, w1_ref[...].T,
                           preferred_element_type=jnp.float32)


@jax.custom_vjp
def cfconv(rbf, gate, vj, w1, b1, w2, b2):
    """Fused cfconv: rbf [G,n,n,R], gate [G,n,n], vj [G,n,F],
    w1 [R,F], b1 [F], w2 [F,F], b2 [F] -> agg [G,n,F]."""
    return _cfconv_fwd(rbf, gate, vj, w1, b1, w2, b2)[0]


def _cfconv_fwd(rbf, gate, vj, w1, b1, w2, b2):
    interpret = not _on_tpu()
    G, n, _, R = rbf.shape
    F = vj.shape[-1]
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, n * n, R), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n * n, 1), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((R, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((F, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, F), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, n, F), jnp.float32),
        interpret=interpret,
    )(rbf.reshape(G, n * n, R), gate.reshape(G, n * n, 1), vj,
      w1, b1.reshape(1, F), w2, b2.reshape(1, F))
    return out, (rbf, gate, vj, w1, b1, w2, b2)


def _cfconv_bwd(res, g_out):
    rbf, gate, vj, w1, b1, w2, b2 = res
    interpret = not _on_tpu()
    G, n, _, R = rbf.shape
    F = vj.shape[-1]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, n * n, R), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n * n, 1), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((R, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((F, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((1, n, F), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n * n, R), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n * n, 1), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, n, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, R, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, F, F), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, n * n, R), jnp.float32),
            jax.ShapeDtypeStruct((G, n * n, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, n, F), jnp.float32),
            jax.ShapeDtypeStruct((G, R, F), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((G, F, F), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, F), jnp.float32),
        ],
        interpret=interpret,
    )(rbf.reshape(G, n * n, R), gate.reshape(G, n * n, 1), vj, w1,
      b1.reshape(1, F), w2, b2.reshape(1, F), g_out)
    d_rbf, d_gate, d_vj, d_w1, d_b1, d_w2, d_b2 = outs
    return (d_rbf.reshape(G, n, n, R), d_gate.reshape(G, n, n), d_vj,
            jnp.sum(d_w1, 0), jnp.sum(d_b1, (0, 1)), jnp.sum(d_w2, 0),
            jnp.sum(d_b2, (0, 1)))


cfconv.defvjp(_cfconv_fwd, _cfconv_bwd)
