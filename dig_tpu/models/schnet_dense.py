"""SchNet on the dense per-graph layout — the speed-of-light molecular path.

Same math as :class:`dig_tpu.models.SchNet` (reference
``dig/threedgraph/method/schnet/schnet.py:9-168``) but on
``DenseGraphBatch`` ``[G, n_max, ...]`` tensors: the radius graph is a
masked dense adjacency (no sorting, no gather/scatter), the continuous-
filter convolution is one batched einsum per interaction
(``agg[g,i,f] = sum_j A[g,i,j] * W(rbf)[g,i,j,f] * v[g,j,f]``), and the
whole forward maps onto MXU batched matmuls. For QM9-sized molecules
(n_max <= 29) this dominates the flat segment-sum path by avoiding the
O((G*n)^2) edge extraction entirely (SURVEY.md §7 design note).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph_dense import DenseGraphBatch, radius_adjacency
from ..nn.blocks import MLP, shifted_softplus
from ..ops.basis import cosine_cutoff, gaussian_rbf

xavier = jax.nn.initializers.glorot_uniform()


class SchNetDense(nn.Module):
    """Per-graph predictions [G, out_channels]; numerically equivalent to
    the flat SchNet (see tests/test_dense_parity.py)."""

    cutoff: float = 10.0
    num_layers: int = 6
    hidden_channels: int = 128
    out_channels: int = 1
    num_filters: int = 128
    num_gaussians: int = 50
    compute_dtype: jnp.dtype = jnp.float32  # bf16: 2x MXU rate, same
    # params/readout in f32 (mixed precision; geometry stays f32)
    use_pallas: bool = False  # fused VMEM cfconv kernel (ops/pallas_cfconv)
    pos_grads: bool = True    # False: skip the kernel's geometry-gradient
    # branch (~12% of backward FLOPs). ONLY for energy-only training —
    # grads w.r.t. positions through the cfconv become silent zeros.

    @nn.compact
    def __call__(self, b: DenseGraphBatch):
        z = b.z
        pos = b.pos
        cd = self.compute_dtype
        mol_id = b.nodes.get("mol")  # packed batches: >1 molecule per slot
        dist, adj = radius_adjacency(pos, b.node_mask, self.cutoff,
                                     mol_id=mol_id)

        if self.use_pallas:
            from ..ops.pallas_cfconv import MASK_DIST
            dist_m = jnp.where(adj, dist, MASK_DIST)
        else:
            rbf = gaussian_rbf(dist, 0.0, self.cutoff, self.num_gaussians)
            C = cosine_cutoff(dist, self.cutoff)
            gate = (C * adj.astype(jnp.float32)).astype(cd)
            rbf = rbf.astype(cd)

        def dense(f, use_bias=True):
            return nn.Dense(f, use_bias=use_bias, kernel_init=xavier,
                            dtype=cd)

        v = nn.Embed(100, self.hidden_channels,
                     embedding_init=jax.nn.initializers.uniform(
                         scale=jnp.sqrt(3.0)), dtype=cd)(z)
        v = jnp.where(b.node_mask[..., None], v, 0)

        for _ in range(self.num_layers):
            vj = dense(self.num_filters, use_bias=False)(v)
            if self.use_pallas:
                from ..ops.pallas_cfconv import cfconv_fused
                w1 = self.param(f"cf_w1_{_}", xavier,
                                (self.num_gaussians, self.num_filters))
                b1 = self.param(f"cf_b1_{_}", jax.nn.initializers.zeros,
                                (self.num_filters,))
                w2 = self.param(f"cf_w2_{_}", xavier,
                                (self.num_filters, self.num_filters))
                b2 = self.param(f"cf_b2_{_}", jax.nn.initializers.zeros,
                                (self.num_filters,))
                prec = "bf16" if cd == jnp.bfloat16 else "f32"
                agg = cfconv_fused(dist_m, vj, w1, b1, w2, b2,
                                   self.cutoff, self.num_gaussians, prec,
                                   self.pos_grads)
                agg = agg.astype(cd)
            else:
                W = MLP([self.num_filters, self.num_filters],
                        act=shifted_softplus, kernel_init=xavier,
                        dtype=cd)(rbf)
                W = W * gate[..., None]                   # [G, n, n, F]
                agg = jnp.einsum("gijf,gjf->gif", W, vj,
                                 preferred_element_type=cd)
            out = dense(self.hidden_channels)(agg)
            out = shifted_softplus(out)
            out = dense(self.hidden_channels)(out)
            v = v + jnp.where(b.node_mask[..., None], out, 0)

        # readout in f32 for a stable energy sum
        v = v.astype(jnp.float32)
        h = nn.Dense(self.hidden_channels // 2, kernel_init=xavier)(v)
        h = shifted_softplus(h)
        h = nn.Dense(self.out_channels, kernel_init=xavier)(h)
        h = jnp.where(b.node_mask[..., None], h, 0.0)
        if mol_id is not None:
            # per-molecule readout within each packed slot: [G, M, out]
            M = b.globals["mol_mask"].shape[1]
            onehot = ((mol_id[:, :, None] == jnp.arange(M)[None, None])
                      & b.node_mask[:, :, None]).astype(jnp.float32)
            return jnp.einsum("gnm,gno->gmo", onehot, h)
        return jnp.sum(h, axis=1)                         # [G, out]
