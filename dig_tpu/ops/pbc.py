"""Periodic-boundary radius graphs for crystals (OC20-style workloads).

TPU-native replacement for the `radius_graph_pbc` / `get_pbc_distances`
pair the reference's ComENet-OCP variant pulls from the optional
`ocpmodels` dependency (dig/threedgraph/method/comenet/ocp/comenet-ocp.py:
9,344-358): instead of per-structure dynamic image enumeration, every
ordered pair is scored against a static set of lattice-image offsets
({-images..images}^3) in one masked [N, N, M] distance tensor — one
MXU/VPU-friendly kernel, no data-dependent shapes. Edges carry their
displacement VECTOR (minimum-image aware), so downstream geometry (local
frames, angles, forces via dE/dpos) treats periodic neighbors exactly like
open-boundary ones.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pbc_offsets(images: int = 1) -> np.ndarray:
    """Integer lattice offsets in {-images..images}^3, zero offset first."""
    r = np.arange(-images, images + 1)
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    order = np.argsort(np.abs(offs).sum(1), kind="stable")
    return offs[order].astype(np.float32)  # [M, 3], offs[0] == 0


def wrap_positions(pos: Array, cell: Array, node_graph: Array) -> Array:
    """Wrap cartesian positions into the unit cell (fractional [0, 1)).

    Gradient-safe: `floor` is piecewise-constant, so dE/dpos through
    wrapped coordinates equals dE/dpos through the originals."""
    cell_n = cell[node_graph]                             # [N, 3, 3]
    # closed-form 3x3 inverse via cross products: jnp.linalg.{inv,det} on
    # TPU run their inner matmuls at bf16 precision (~3e-3 relative, i.e.
    # ~0.03 A position error) — the adjugate form is exact f32 and cheap
    a, b, c = cell_n[:, 0], cell_n[:, 1], cell_n[:, 2]    # lattice rows
    cbc = jnp.cross(b, c)
    det = jnp.sum(a * cbc, axis=-1)                       # triple product
    singular = jnp.abs(det) <= 1e-8                       # padded graphs
    a = jnp.where(singular[:, None], jnp.array([1., 0., 0.]), a)
    b = jnp.where(singular[:, None], jnp.array([0., 1., 0.]), b)
    c = jnp.where(singular[:, None], jnp.array([0., 0., 1.]), c)
    cbc = jnp.cross(b, c)
    det = jnp.sum(a * cbc, axis=-1)
    inv = jnp.stack([cbc, jnp.cross(c, a), jnp.cross(a, b)],
                    axis=-1) / det[:, None, None]         # cell @ inv = I
    safe = jnp.stack([a, b, c], axis=1)
    hp = jax.lax.Precision.HIGHEST
    frac = jnp.einsum("nd,ndc->nc", pos, inv, precision=hp)
    frac = frac - jnp.floor(frac)
    return jnp.einsum("nc,ncd->nd", frac, safe, precision=hp)


class PBCGraph(NamedTuple):
    senders: Array    # [max_edges] j (source)
    receivers: Array  # [max_edges] i (destination)
    edge_mask: Array  # [max_edges]
    edge_vec: Array   # [max_edges, 3] pos[j] + off @ cell - pos[i]
    edge_dist: Array  # [max_edges]


def radius_graph_pbc_flat(pos: Array, cell: Array, node_graph: Array,
                          node_mask: Array, cutoff: float, max_edges: int,
                          images: int = 1) -> PBCGraph:
    """Periodic radius graph over a flat padded batch of crystals.

    Args:
      pos: [N, 3] cartesian positions.
      cell: [G, 3, 3] lattice vectors (rows) per graph.
      node_graph/node_mask: flat-batch bookkeeping.
      cutoff: radius. Correct as long as `images` lattice shells cover it
        (images=1 suffices when every cell dimension exceeds the cutoff;
        pass images=2 for very thin cells).
      max_edges: static edge cap (periodic neighborhoods are denser than
        molecular ones — size generously).

    Edge convention: j -> i ordered pairs, one edge per (i, j, image) whose
    displacement is inside the cutoff; self-pairs contribute only through
    non-zero images (a node sees its own periodic copies). Positions are
    wrapped into the unit cell first, so the `images` shells are counted
    from canonical coordinates.
    """
    pos = wrap_positions(pos, cell, node_graph)
    N = pos.shape[0]
    offs = jnp.asarray(pbc_offsets(images))               # [M, 3]
    M = offs.shape[0]
    cell_n = cell[node_graph]                             # [N, 3, 3]
    # shift[j, m, :] = offs[m] @ cell of j's graph
    shift = jnp.einsum("mc,jcd->jmd", offs, cell_n,
                       precision=jax.lax.Precision.HIGHEST)  # [N, M, 3]
    # disp[i, j, m] = pos[j] + shift[j, m] - pos[i]
    disp = (pos[None, :, None, :] + shift[None, :, :, :]
            - pos[:, None, None, :])                      # [N, N, M, 3]
    d2 = jnp.sum(disp * disp, axis=-1)                    # [N, N, M]

    same = node_graph[:, None] == node_graph[None, :]
    valid = node_mask[:, None] & node_mask[None, :] & same
    adj = valid[:, :, None] & (d2 < cutoff * cutoff)
    # exclude the true self-pair (zero image); periodic self-copies stay
    self_zero = jnp.eye(N, dtype=bool)[:, :, None] & (
        jnp.arange(M) == 0)[None, None, :]
    adj = adj & ~self_zero

    flat = adj.reshape(-1)
    order = jnp.argsort(~flat, stable=True)               # edges first,
    take = order[:max_edges]                              # (i, j, m) order
    edge_mask = flat[take]
    i_idx = (take // (N * M)).astype(jnp.int32)
    jm = take % (N * M)
    j_idx = (jm // M).astype(jnp.int32)
    m_idx = (jm % M).astype(jnp.int32)
    receivers = jnp.where(edge_mask, i_idx, 0)
    senders = jnp.where(edge_mask, j_idx, 0)
    vec = disp.reshape(N * N * M, 3)[take]
    vec = jnp.where(edge_mask[:, None], vec, 0.0)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, -1), 1e-12))
    dist = jnp.where(edge_mask, dist, 1.0)  # pad 1.0: safe for log/div
    # (the spherical-bessel radial basis has sin(a x)/x terms — x = 0 on
    # padded edges would be NaN in both primal and grad)
    del m_idx
    return PBCGraph(senders=senders, receivers=receivers,
                    edge_mask=edge_mask, edge_vec=vec, edge_dist=dist)


def pbc_overflow(pos: Array, cell: Array, node_graph: Array,
                 node_mask: Array, cutoff: float, max_edges: int,
                 images: int = 1) -> Array:
    """Edges dropped by the static cap (overflow accounting)."""
    pos = wrap_positions(pos, cell, node_graph)
    N = pos.shape[0]
    offs = jnp.asarray(pbc_offsets(images))
    M = offs.shape[0]
    cell_n = cell[node_graph]
    shift = jnp.einsum("mc,jcd->jmd", offs, cell_n,
                       precision=jax.lax.Precision.HIGHEST)
    disp = (pos[None, :, None, :] + shift[None, :, :, :]
            - pos[:, None, None, :])
    d2 = jnp.sum(disp * disp, axis=-1)
    same = node_graph[:, None] == node_graph[None, :]
    valid = node_mask[:, None] & node_mask[None, :] & same
    adj = valid[:, :, None] & (d2 < cutoff * cutoff)
    self_zero = jnp.eye(N, dtype=bool)[:, :, None] & (
        jnp.arange(M) == 0)[None, None, :]
    adj = adj & ~self_zero
    return jnp.maximum(jnp.sum(adj) - max_edges, 0)
