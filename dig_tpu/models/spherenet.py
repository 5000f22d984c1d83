"""SphereNet & DimeNet++ — spherical/directional message passing, TPU-native.

Capability parity with ``dig/threedgraph/method/spherenet/spherenet.py:17-320``
and ``dig/threedgraph/method/dimenetpp/dimenetpp.py:20-293``. Same math
(dist/angle/torsion basis embeddings, edge-level message update with triplet
scatter idx_kj -> idx_ji, per-layer graph accumulation readout), re-designed
for XLA: static-cap radius graph + triplet tables with masks
(:mod:`dig_tpu.ops.triplets`), masked segment-sums everywhere, one jit trace.

The two models share every block; DimeNet++ is the no-torsion variant. Basis
tables come from :mod:`dig_tpu.ops.basis` (sympy -> closed-form jnp).

Reference layout notes preserved exactly (for weight-level parity):
* ``init``: e1 = act(W [x_i ; x_j ; act(W0 rbf)]), e2 = (W1 rbf) * e1
  (spherenet.py:53-93).
* ``update_e``: rbf/sbf/torsion two-stage basis projections, down-proj ->
  triplet gather-multiply -> segment-sum over idx_ji -> up-proj, residual
  stacks around a skip (spherenet.py:96-183).
* ``update_v``: segment-sum of e2 to receiver i, then output MLP
  (spherenet.py:186-216). The reference's ``scatter`` has no dim_size and
  can silently shrink; here output size is always num_nodes.
* ``update_u``: running per-graph sum across layers (spherenet.py:219-226).
* torsion basis reshape semantics: out[t,a,b,c] = Y[a*n+b](theta,phi) *
  j[b,c](d_kj) exactly as features.py:262-263's view/broadcast dance.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch
from ..nn.init import glorot_orthogonal
from ..ops.basis import Envelope, bessel_table, sph_full_table, sph_m0_table
from ..ops.radius import (radius_graph_flat, radius_graph_nk,
                          radius_graph_nk_blocked)
from ..ops.pallas_triplet import fused_angle_product, fused_triplet_product
from ..ops.pallas_triplet_pt import basis_pt, fused_triplet_pt
from ..ops.pallas_triplet_slot import (fused_triplet_slot,
                                       fused_triplet_slot_geom)
from ..ops.segment import segment_sum, segment_sum_sorted
from ..ops.triplets import (Triplets, build_triplets, build_triplets_nk,
                            edge_distances, edges_to_nodes_nk, expand_kj,
                            expand_kj_raw, nk_edge_distances,
                            nk_gather_nodes, torsion_angles,
                            triplet_geometry, triplet_kj_distances,
                            triplets_to_edges)

go2 = glorot_orthogonal(2.0)
zeros = jax.nn.initializers.zeros


def swish(x):
    return x * jax.nn.sigmoid(x)


def _uniform_sqrt3(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -np.sqrt(3.0), np.sqrt(3.0))


class DistEmb(nn.Module):
    """Learnable-frequency spherical-Bessel j0 RBF with polynomial envelope
    (reference features.py:166-181; freq init n*pi)."""

    num_radial: int
    cutoff: float
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, dist):
        freq = self.param(
            "freq", lambda key: jnp.arange(1, self.num_radial + 1,
                                           dtype=jnp.float32) * jnp.pi)
        d = (dist / self.cutoff)[:, None]
        env = Envelope(self.envelope_exponent)(d)
        return env * jnp.sin(freq * d)


class AngleEmb(nn.Module):
    """a_{l,m}(d_kj, theta): bessel(d_kj) x Y_l^0(theta) -> [T, n*k]
    (reference features.py:183-220)."""

    num_spherical: int
    num_radial: int
    cutoff: float

    def __call__(self, dist, angle, idx_kj, rbf_kj=None):
        # Gather the 1-D dist FIRST (compact [T] rows), not the [E, n, k]
        # basis rows: a [T]-row gather of an 18-wide (lane-padded to 128)
        # table ran at 27 GB/s and was 20% of the whole SphereNet train
        # step on TPU. ``rbf_kj`` lets the caller share one evaluation
        # between Angle and Torsion embeddings.
        if rbf_kj is None:
            rbf_kj = bessel_table(self.num_spherical, self.num_radial,
                                  dist[idx_kj] / self.cutoff)  # [T, n, k]
        cbf = sph_m0_table(self.num_spherical, angle)   # [T, n]
        out = rbf_kj * cbf[:, :, None]                  # [T, n, k]
        return out.reshape(out.shape[0], -1)


class TorsionEmb(nn.Module):
    """t_{l,m}(d_kj, theta, phi) -> [T, n*n*k] with the reference's exact
    broadcast layout (features.py:226-263)."""

    num_spherical: int
    num_radial: int
    cutoff: float

    def __call__(self, dist, angle, phi, idx_kj, rbf_kj=None):
        n, k = self.num_spherical, self.num_radial
        if rbf_kj is None:
            rbf_kj = bessel_table(n, k, dist[idx_kj] / self.cutoff)
        cbf = sph_full_table(n, angle, phi)             # [T, n*n]
        cbf = cbf.reshape(-1, n, n)
        # out[t, a, b, c] = cbf[t, a, b] * rbf_kj[t, b, c]
        out = cbf[:, :, :, None] * rbf_kj[:, None, :, :]
        return out.reshape(out.shape[0], n * n * k)


class ResidualLayer(nn.Module):
    hidden_channels: int
    act: callable = swish
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = self.act(nn.Dense(self.hidden_channels, kernel_init=go2,
                              bias_init=zeros, dtype=self.dtype)(x))
        h = self.act(nn.Dense(self.hidden_channels, kernel_init=go2,
                              bias_init=zeros, dtype=self.dtype)(h))
        return x + h


class InitBlock(nn.Module):
    """init_e (reference spherenet.py:53-93)."""

    hidden_channels: int
    act: callable = swish
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, rbf, senders, receivers, trip=None):
        x = nn.Embed(95, self.hidden_channels,
                     embedding_init=_uniform_sqrt3, dtype=self.dtype)(z)
        rbf0 = self.act(nn.Dense(self.hidden_channels,
                                 dtype=self.dtype)(rbf))
        if trip is not None and trip.nk_nbr is not None:
            # NK layout: x[senders] via the closed gather (scatter-free,
            # re-differentiable adjoint), x[receivers] as a broadcast
            # (receivers = repeat(arange(N), K) there). Garbage rows at
            # masked slots differ from the gather version — every
            # consumer masks.
            N, K = trip.nk_nbr.shape
            xs = nk_gather_nodes(x, trip)
            xr = jnp.broadcast_to(x[:, None, :],
                                  (N, K, x.shape[-1])).reshape(N * K, -1)
        else:
            xs, xr = x[senders], x[receivers]
        e1 = self.act(nn.Dense(self.hidden_channels, dtype=self.dtype)(
            jnp.concatenate([xr, xs, rbf0], axis=-1)))
        e2 = nn.Dense(self.hidden_channels, use_bias=False,
                      kernel_init=go2, dtype=self.dtype)(rbf) * e1
        return e1, e2


class UpdateE(nn.Module):
    """update_e (reference spherenet.py:96-183 / dimenetpp.py:81-160)."""

    hidden_channels: int
    int_emb_size: int
    basis_emb_size_dist: int
    basis_emb_size_angle: int
    basis_emb_size_torsion: int
    use_torsion: bool
    num_before_skip: int = 1
    num_after_skip: int = 2
    act: callable = swish
    dtype: Optional[jnp.dtype] = None
    pallas_triplet: bool = False  # fuse the triplet product + reduction
    # (ops/pallas_triplet.py) — NK layout only. Same parameters: the two
    # factorized basis projections are composed into one matrix per step
    # (rank-limited exactly as the factorized form), extracted from the
    # same Dense modules via identity application.
    pallas_basis_grads: bool = True  # False: skip the (lane-padded) basis
    # cotangent outputs in the fused kernel's backward — valid ONLY for
    # energy-only training (no dE/dpos in the loss)
    fuse_basis: bool = False  # evaluate the basis tables IN the kernel
    # from scalar geometry (ops/pallas_triplet_basis.py): sbf/tbf never
    # reach HBM; exact to second order (force training)
    num_spherical: int = 7  # static basis config for fuse_basis
    num_radial: int = 6
    slot_atoms: int = 0  # >0 (with fuse_basis, slot-aligned batches):
    # slot-resident kernel (ops/pallas_triplet_slot.py) — the expand
    # gather runs IN VMEM as a masked one-hot contraction, so no [T, C]
    # tensor exists at any AD level (the force-training layout)

    @nn.compact
    def __call__(self, e1, rbf0, sbf, tbf, trip: Triplets, geom=None):
        D = lambda f, b=False: nn.Dense(f, use_bias=b, kernel_init=go2,
                                        dtype=self.dtype)
        x_ji = self.act(nn.Dense(self.hidden_channels, kernel_init=go2,
                                 bias_init=zeros, dtype=self.dtype)(e1))
        x_kj = self.act(nn.Dense(self.hidden_channels, kernel_init=go2,
                                 bias_init=zeros, dtype=self.dtype)(e1))

        rbf = D(self.basis_emb_size_dist)(rbf0)
        rbf = D(self.hidden_channels)(rbf)
        x_kj = x_kj * rbf

        x_kj = self.act(D(self.int_emb_size)(x_kj))

        num_edges = e1.shape[0]
        fused = self.pallas_triplet and trip.nk_nbr is not None
        if fused:
            # identity application returns the kernels themselves without a
            # [T]-sized intermediate; module order matches the unfused
            # branch so parameters are interchangeable
            cdt = self.dtype or jnp.float32
            ns, nr = self.num_spherical, self.num_radial
            s_dim = sbf.shape[-1] if sbf is not None else ns * nr
            ws1 = D(self.basis_emb_size_angle)(jnp.eye(s_dim, dtype=cdt))
            ws2 = D(self.int_emb_size)(
                jnp.eye(self.basis_emb_size_angle, dtype=cdt))
            if self.use_torsion:
                t_dim = (tbf.shape[-1] if tbf is not None
                         else ns * ns * nr)
                wt1 = D(self.basis_emb_size_torsion)(
                    jnp.eye(t_dim, dtype=cdt))
                wt2 = D(self.int_emb_size)(
                    jnp.eye(self.basis_emb_size_torsion, dtype=cdt))
            K = trip.nk_nbr.shape[1]
            if self.fuse_basis:
                cfg = (ns, nr, self.use_torsion)
                wt = (wt1 @ wt2 if self.use_torsion
                      else jnp.zeros((1, self.int_emb_size), cdt))
                if self.slot_atoms > 0:
                    # geom = (pt_s [K, R, E], m2T [K, E], lj [1, E]); the
                    # expand gather runs inside the kernel — x_kj [E, C]
                    # is the kernel input, nothing [T, C]-sized exists
                    pt_s, m2t, lj = geom
                    x_kj = fused_triplet_slot(x_kj, pt_s, ws1 @ ws2, wt,
                                              m2t, lj, self.slot_atoms,
                                              K, cfg)
                else:
                    # geom IS the packed transposed basis table [R, T],
                    # built once in _SphericalMPNN, shared by all layers
                    xg = expand_kj_raw(x_kj, trip)
                    m2d = trip.mask.reshape(-1, K).astype(cdt)
                    x_kj = fused_triplet_pt(xg, geom, ws1 @ ws2, wt, m2d,
                                            K, 128, cfg)
            elif self.use_torsion:
                xg = expand_kj_raw(x_kj, trip)
                m2d = trip.mask.reshape(-1, K).astype(cdt)
                x_kj = fused_triplet_product(
                    xg, sbf, tbf, ws1 @ ws2, wt1 @ wt2, m2d, K,
                    basis_grads=self.pallas_basis_grads)
            else:
                xg = expand_kj_raw(x_kj, trip)
                m2d = trip.mask.reshape(-1, K).astype(cdt)
                x_kj = fused_angle_product(
                    xg, sbf, ws1 @ ws2, m2d, K,
                    basis_grads=self.pallas_basis_grads)
        else:
            s = D(self.basis_emb_size_angle)(sbf)
            s = D(self.int_emb_size)(s)
            x_kj = expand_kj(x_kj, trip) * s  # masked gather, fused VJP

            if self.use_torsion:
                t = D(self.basis_emb_size_torsion)(tbf)
                t = D(self.int_emb_size)(t)
                x_kj = x_kj * t

            # Triplets are [E, D] row-major, so the idx_ji reduction is a
            # dense reshape-sum (rows already zeroed by expand_kj's mask).
            x_kj = triplets_to_edges(x_kj, num_edges)
        x_kj = self.act(D(self.hidden_channels)(x_kj))

        e1_new = x_ji + x_kj
        h = self.hidden_channels
        for _ in range(self.num_before_skip):
            e1_new = ResidualLayer(h, self.act, dtype=self.dtype)(e1_new)
        e1_new = self.act(nn.Dense(h, kernel_init=go2, bias_init=zeros,
                                   dtype=self.dtype)(e1_new)) + e1
        for _ in range(self.num_after_skip):
            e1_new = ResidualLayer(h, self.act, dtype=self.dtype)(e1_new)
        e2 = D(self.hidden_channels)(rbf0) * e1_new
        return e1_new, e2


class UpdateV(nn.Module):
    """update_v (reference spherenet.py:186-216)."""

    hidden_channels: int
    out_emb_channels: int
    out_channels: int
    num_output_layers: int
    output_init: str
    act: callable = swish
    segment_eb: int = 0  # >0: Pallas sorted-CSR aggregation (receivers are
    # row-major sorted by ops/radius.adjacency_to_edges)
    nk: bool = False     # edges are [N, K] slots: aggregate by reshape-sum
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, e2, receivers, edge_mask, num_nodes):
        if self.nk:
            v = edges_to_nodes_nk(e2, num_nodes, mask=edge_mask)
        elif self.segment_eb > 0:
            v = segment_sum_sorted(e2, receivers, num_nodes, mask=edge_mask,
                                   max_edges_per_block=self.segment_eb)
        else:
            v = segment_sum(e2, receivers, num_nodes, mask=edge_mask)
        v = nn.Dense(self.out_emb_channels, kernel_init=go2,
                     dtype=self.dtype)(v)
        for _ in range(self.num_output_layers):
            v = self.act(nn.Dense(self.out_emb_channels, kernel_init=go2,
                                  bias_init=zeros, dtype=self.dtype)(v))
        out_init = zeros if self.output_init == "zeros" else go2
        # final projection in f32: the per-graph energy readout
        v = nn.Dense(self.out_channels, use_bias=False,
                     kernel_init=out_init)(v.astype(jnp.float32))
        return v


class _SphericalMPNN(nn.Module):
    """Shared body of SphereNet / DimeNet++."""

    use_torsion: bool = True
    cutoff: float = 5.0
    num_layers: int = 4
    hidden_channels: int = 128
    out_channels: int = 1
    int_emb_size: int = 64
    basis_emb_size_dist: int = 8
    basis_emb_size_angle: int = 8
    basis_emb_size_torsion: int = 8
    out_emb_channels: int = 256
    num_spherical: int = 7
    num_radial: int = 6
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3
    output_init: str = "GlorotOrthogonal"
    max_edges: int = 4096
    max_in_degree: int = 24
    segment_eb: int = 0  # >0: Pallas sorted-CSR edge->node aggregation
    nk_degree: int = 0   # >0: [N, K] neighbor-table layout (radius_graph_nk)
    # instead of the compacted edge list — zero sorts in the graph build and
    # a reshape-sum edge->node aggregation; K doubles as max_in_degree.
    block_size: int = 0  # >0 (with nk_degree > 0): slot-aligned batches
    # (MoleculeLoader(slot_size=block_size)) — the radius/top-k/symmetrize
    # tables run per [G, B, B] block instead of [N, N] (24x fewer pair
    # candidates at the flagship bench shape; see radius_graph_nk_blocked)
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16: run the
    # dense/embedding compute on the MXU in bf16 (params + geometry/basis
    # stay f32; the final readout projection is always f32)
    remat: bool = False  # rematerialize UpdateE in the backward pass: the
    # triplet-path [T, int_emb] tensors dominate HBM traffic, so recomputing
    # them beats storing them on this HBM-bound step (jax.checkpoint)
    pallas_triplet: bool = False  # fuse the triplet basis-product +
    # reduction in one Pallas kernel (ops/pallas_triplet.py; NK layout
    # only — falls back to the XLA chain otherwise). With
    # pallas_basis_grads=True the kernel's VJP is itself differentiable
    # (second-order kernel), so energy+force training runs fused.
    pallas_basis_grads: bool = True  # see UpdateE.pallas_basis_grads; set
    # False ONLY for energy-only training: it elides the basis cotangents,
    # so any dE/dpos silently drops the basis->position path (the trainer
    # rejects energy_and_force with this flag off)
    pallas_fuse_basis: bool = False  # with pallas_triplet: evaluate the
    # basis tables inside the kernel from scalar geometry
    # (ops/pallas_triplet_basis.py) — no [T, S] basis tensor in HBM, exact
    # to second order; the preferred layout for energy+force training
    pallas_slot: bool = False  # with pallas_fuse_basis + block_size > 0:
    # slot-resident kernel (ops/pallas_triplet_slot.py) — the triplet
    # expand gather runs IN VMEM over the slot's x block, so no [T, C]
    # tensor exists at any AD level (it was the majority of the
    # energy+force step's HBM traffic); requires slot-aligned batches

    @nn.compact
    def __call__(self, g: GraphBatch):
        z = g.nodes["z"]
        pos = g.nodes["pos"]
        N = g.num_nodes
        G = g.num_graphs

        if self.nk_degree > 0:
            if self.block_size > 0:
                nkg = radius_graph_nk_blocked(pos, g.node_mask, self.cutoff,
                                              self.nk_degree, self.block_size,
                                              node_graph=g.node_graph)
            else:
                nkg = radius_graph_nk(pos, g.node_graph, g.node_mask,
                                      self.cutoff, self.nk_degree)
            senders, receivers, edge_mask = (nkg.senders, nkg.receivers,
                                             nkg.edge_mask)
            trip = build_triplets_nk(nkg)
            # dist via the closed frame table, not pos[senders]: that
            # gather's transpose is a scatter-add under dE/dpos
            dist = nk_edge_distances(pos, trip)
        else:
            senders, receivers, edge_mask = radius_graph_flat(
                pos, g.node_graph, g.node_mask, self.cutoff, self.max_edges)
            dist = edge_distances(pos, senders, receivers, edge_mask)
            trip = build_triplets(senders, receivers, edge_mask, N,
                                  self.max_in_degree)
        angle = triplet_geometry(pos, trip)

        rbf0 = DistEmb(self.num_radial, self.cutoff,
                       self.envelope_exponent)(dist)
        dist_kj = triplet_kj_distances(pos, trip)
        fuse_basis = (self.pallas_fuse_basis and self.pallas_triplet
                      and trip.nk_nbr is not None)
        slot_fused = (fuse_basis and self.pallas_slot
                      and self.block_size > 0)
        geom = None
        if slot_fused:
            # slot-resident layout (ops/pallas_triplet_slot): the packed
            # basis table is built S-LEADING ([K, R, E] — edge axis
            # minor, full lanes) from transposed [K, E] scalar geometry,
            # and the kernel gathers x in VMEM via (senders - slot*A).
            # Round-5 measured negative result: the scalar-geometry
            # kernel variant (fused_triplet_slot_geom — basis rows
            # evaluated in-body from theta/phi/dk, pt never in HBM) is
            # 25% SLOWER end-to-end (78 vs 62.6 ms/force step, G=96):
            # the [1, Et] closed-form row evaluations run at 1/8 VPU
            # sublane utilization and are re-differentiated at every AD
            # level, costing more than the [K, R, E] interface traffic
            # they save. The pt interface stays the production path.
            from ..ops.pallas_triplet_slot import basis_pt_k
            A = self.block_size
            K = trip.nk_nbr.shape[1]
            E = senders.shape[0]

            def smaj(v):                       # [T] e-major -> [K, E]
                return v.reshape(E, K).T

            phi = torsion_angles(pos, trip) if self.use_torsion else None
            pt_s = basis_pt_k(self.num_spherical, self.num_radial,
                              smaj(angle),
                              None if phi is None else smaj(phi),
                              smaj(dist_kj) / self.cutoff,
                              self.use_torsion)
            cdt = self.compute_dtype or jnp.float32
            m2t = trip.mask.reshape(E, K).T.astype(cdt)
            lj = (senders - (jnp.arange(E, dtype=jnp.int32)
                             // (A * K)) * A).astype(jnp.int32)[None]
            geom = (pt_s.astype(cdt), m2t, lj)
            sbf = tbf = None
        elif fuse_basis:
            # packed transposed basis table [R, T] (ops/pallas_triplet_pt):
            # nothing [T, S]-sized is materialized — the triplet axis is
            # MINOR so the table stores dense (~8x less HBM than sbf+tbf),
            # and the kernels assemble sbf/tbf in VMEM. Built once, shared
            # by every interaction layer.
            phi = torsion_angles(pos, trip) if self.use_torsion else None
            geom = basis_pt(self.num_spherical, self.num_radial, angle,
                            phi, dist_kj / self.cutoff, self.use_torsion)
            if self.compute_dtype is not None:
                geom = geom.astype(self.compute_dtype)
            sbf = tbf = None
        else:
            # one shared bessel evaluation on triplet rows (see AngleEmb
            # note); the kj distance comes from the triplet frame table,
            # not a gather
            rbf_kj = bessel_table(self.num_spherical, self.num_radial,
                                  dist_kj / self.cutoff)
            sbf = AngleEmb(self.num_spherical, self.num_radial,
                           self.cutoff)(dist, angle, trip.idx_kj,
                                        rbf_kj=rbf_kj)
            if self.use_torsion:
                phi = torsion_angles(pos, trip)
                tbf = TorsionEmb(self.num_spherical, self.num_radial,
                                 self.cutoff)(dist, angle, phi,
                                              trip.idx_kj, rbf_kj=rbf_kj)
            else:
                tbf = None

        dt = self.compute_dtype
        if dt is not None:
            rbf0 = rbf0.astype(dt)
            sbf = None if sbf is None else sbf.astype(dt)
            tbf = None if tbf is None else tbf.astype(dt)
        e1, e2 = InitBlock(self.hidden_channels,
                           dtype=dt)(z, rbf0, senders, receivers, trip=trip)
        v = UpdateV(self.hidden_channels, self.out_emb_channels,
                    self.out_channels, self.num_output_layers,
                    self.output_init, segment_eb=self.segment_eb,
                    nk=self.nk_degree > 0,
                    dtype=dt)(e2, receivers, edge_mask, N)
        u = segment_sum(v, g.node_graph, G, mask=g.node_mask)

        UE = nn.remat(UpdateE, static_argnums=()) if self.remat else UpdateE
        for li in range(self.num_layers):
            # explicit name: remat-lifted modules otherwise get a
            # "CheckpointUpdateE_i" scope, breaking param interchange with
            # the non-remat path
            e1, e2 = UE(self.hidden_channels, self.int_emb_size,
                        self.basis_emb_size_dist,
                        self.basis_emb_size_angle,
                        self.basis_emb_size_torsion,
                        self.use_torsion,
                        self.num_before_skip,
                        self.num_after_skip,
                        dtype=dt,
                        pallas_triplet=self.pallas_triplet,
                        pallas_basis_grads=self.pallas_basis_grads,
                        fuse_basis=fuse_basis,
                        num_spherical=self.num_spherical,
                        num_radial=self.num_radial,
                        slot_atoms=self.block_size if slot_fused else 0,
                        name=f"UpdateE_{li}")(e1, rbf0, sbf, tbf, trip,
                                              geom=geom)
            v = UpdateV(self.hidden_channels, self.out_emb_channels,
                        self.out_channels, self.num_output_layers,
                        self.output_init, segment_eb=self.segment_eb,
                        nk=self.nk_degree > 0,
                        dtype=dt)(e2, receivers, edge_mask, N)
            u = u + segment_sum(v, g.node_graph, G, mask=g.node_mask)
        return u


class SphereNet(_SphericalMPNN):
    """SphereNet (dist + angle + torsion basis). Defaults mirror the
    reference's documented defaults (spherenet.py:253-259)."""
    use_torsion: bool = True


class DimeNetPP(_SphericalMPNN):
    """DimeNet++ (dist + angle basis; shared basis_emb_size). Defaults
    mirror dimenetpp.py:88-93."""
    use_torsion: bool = False
