"""Contrastive objectives: InfoNCE / NT-Xent family and JSE family.

Parity with ``dig/sslgraph/method/contrastive/objectives/infonce.py`` and
``jse.py``; masked variants so padded graphs/nodes contribute nothing. All
losses consume lists of representations exactly like the reference's
``NCE_loss(zs, zs_n, batch, sigma, tau)`` / ``JSE_loss(...)`` surface.
"""
from __future__ import annotations

import itertools
from typing import List, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
_LOG2 = 0.6931471805599453


def _safe_norm(z, eps=1e-12):
    # sqrt(sum + eps): norm of an all-zero (padded) row has a well-defined
    # zero gradient; jnp.linalg.norm at 0 back-propagates NaN even through
    # a maximum() clamp.
    return jnp.sqrt(jnp.sum(z * z, axis=-1) + eps)


def _normalize(z, eps=1e-12):
    return z / _safe_norm(z, eps)[..., None]


def nt_xent(z1: Array, z2: Array, tau: float = 0.5, norm: bool = True,
            mask: Optional[Array] = None) -> Array:
    """NT-Xent over graph embeddings (reference infonce.py:130-150):
    loss = -log(exp(s_ii/tau) / (sum_j exp(s_ij/tau) - exp(s_ii/tau)))."""
    sim = jnp.einsum("ik,jk->ij", z1, z2)
    if norm:
        n1 = _safe_norm(z1)
        n2 = _safe_norm(z2)
        sim = sim / jnp.einsum("i,j->ij", n1, n2)
    sim = jnp.exp(sim / tau)
    if mask is not None:
        sim = jnp.where(mask[None, :], sim, 0.0)
    pos = jnp.diagonal(sim)
    denom = jnp.maximum(jnp.sum(sim, axis=1) - pos, 1e-12)
    losses = -jnp.log(jnp.maximum(pos, 1e-12) / denom)
    if mask is not None:
        return jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1)
    return jnp.mean(losses)


def intra_node_nce(z1_n: Array, z2_n: Array, tau: float = 0.5,
                   norm: bool = True,
                   mask: Optional[Array] = None) -> Array:
    """GRACE's intra/inter node-level InfoNCE (reference
    infonce.py:72-113, unbatched branch): denominator = intra-view sims
    (minus self) + all inter-view sims."""
    if norm:
        z1 = _normalize(z1_n)
        z2 = _normalize(z2_n)
    else:
        z1, z2 = z1_n, z2_n
    ex = lambda a, b: jnp.exp(jnp.einsum("ik,jk->ij", a, b) / tau)
    refl = ex(z1, z1)
    between = ex(z1, z2)
    if mask is not None:
        refl = jnp.where(mask[None, :], refl, 0.0)
        between = jnp.where(mask[None, :], between, 0.0)
    pos = jnp.diagonal(between)
    denom = (jnp.sum(refl, 1) - jnp.diagonal(refl) + jnp.sum(between, 1))
    losses = -jnp.log(jnp.maximum(pos, 1e-12)
                      / jnp.maximum(denom, 1e-12))
    if mask is not None:
        return jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1)
    return jnp.mean(losses)


def nce_loss(zs: Optional[List[Array]] = None,
             zs_n: Optional[List[Array]] = None,
             batch: Optional[Array] = None,
             sigma=None, tau: float = 0.5, norm: bool = True,
             graph_mask: Optional[Array] = None,
             node_mask: Optional[Array] = None) -> Array:
    """Dispatcher matching reference NCE_loss (infonce.py:6-68)."""
    if zs_n is not None and zs is None:
        assert len(zs_n) == 2
        return 0.5 * (intra_node_nce(zs_n[0], zs_n[1], tau, norm, node_mask)
                      + intra_node_nce(zs_n[1], zs_n[0], tau, norm,
                                       node_mask))
    assert zs is not None
    if len(zs) == 2:
        return nt_xent(zs[0], zs[1], tau, norm, graph_mask)
    loss = 0.0
    for (i, j) in itertools.combinations(range(len(zs)), 2):
        if sigma is None or sigma[i][j]:
            loss += nt_xent(zs[i], zs[j], tau, norm, graph_mask)
    return loss


def _jse_expectation(d: Array, positive: bool) -> Array:
    """f-divergence JSE scores with the -2log2 shift (jse.py:155-168)."""
    if positive:
        return _LOG2 - jax.nn.softplus(-d)
    return jax.nn.softplus(-d) + d - _LOG2


def jse_local_global(z_g: Array, z_n: Array, node_graph: Array,
                     graph_mask: Optional[Array] = None,
                     node_mask: Optional[Array] = None) -> Array:
    """JSE between node and graph embeddings (jse.py:100-131): positive
    pairs (node, its graph), negatives (node, other graphs)."""
    G = z_g.shape[0]
    N = z_n.shape[0]
    d = z_n @ z_g.T                                   # [N, G]
    own = jax.nn.one_hot(node_graph, G, dtype=bool)
    valid = jnp.ones((N, G), bool)
    if node_mask is not None:
        valid &= node_mask[:, None]
    if graph_mask is not None:
        valid &= graph_mask[None, :]
    pos_mask = own & valid
    neg_mask = (~own) & valid
    n_nodes = (jnp.sum(node_mask) if node_mask is not None
               else jnp.asarray(N, jnp.float32))
    n_graphs = (jnp.sum(graph_mask) if graph_mask is not None
                else jnp.asarray(G, jnp.float32))
    E_pos = jnp.sum(jnp.where(pos_mask,
                              _jse_expectation(d * pos_mask, True), 0.0))
    E_pos = E_pos / jnp.maximum(n_nodes, 1)
    E_neg = jnp.sum(jnp.where(neg_mask,
                              _jse_expectation(d * neg_mask, False), 0.0))
    E_neg = E_neg / jnp.maximum(n_nodes * (n_graphs - 1), 1)
    return E_neg - E_pos


def jse_global_global(z1: Array, z2: Array,
                      graph_mask: Optional[Array] = None) -> Array:
    """JSE between two graph-level views (jse.py:134-152)."""
    G = z1.shape[0]
    d = z1 @ z2.T
    eye = jnp.eye(G, dtype=bool)
    valid = jnp.ones((G, G), bool)
    if graph_mask is not None:
        valid &= graph_mask[:, None] & graph_mask[None, :]
    pos_mask = eye & valid
    neg_mask = (~eye) & valid
    n = (jnp.sum(graph_mask) if graph_mask is not None
         else jnp.asarray(G, jnp.float32))
    E_pos = jnp.sum(jnp.where(pos_mask,
                              _jse_expectation(d * pos_mask, True), 0.0))
    E_pos = E_pos / jnp.maximum(n, 1)
    E_neg = jnp.sum(jnp.where(neg_mask,
                              _jse_expectation(d * neg_mask, False), 0.0))
    E_neg = E_neg / jnp.maximum(n * (n - 1), 1)
    return E_neg - E_pos


def jse_loss(zs: Optional[List[Array]] = None,
             zs_n: Optional[List[Array]] = None,
             batch: Optional[Array] = None, sigma=None,
             graph_mask: Optional[Array] = None,
             node_mask: Optional[Array] = None) -> Array:
    """Dispatcher matching reference JSE_loss (jse.py:8-63)."""
    if zs_n is not None:
        assert zs is not None and batch is not None
        if len(zs) == 1:
            return jse_local_global(zs[0], zs_n[0], batch, graph_mask,
                                    node_mask)
        if len(zs) == 2:
            return (jse_local_global(zs[0], zs_n[1], batch, graph_mask,
                                     node_mask)
                    + jse_local_global(zs[1], zs_n[0], batch, graph_mask,
                                       node_mask))
        loss = 0.0
        for (i, j) in itertools.combinations(range(len(zs)), 2):
            if sigma is None or sigma[i][j]:
                loss += (jse_local_global(zs[i], zs_n[j], batch, graph_mask,
                                          node_mask)
                         + jse_local_global(zs[j], zs_n[i], batch,
                                            graph_mask, node_mask))
        return loss
    assert zs is not None
    if len(zs) == 2:
        return jse_global_global(zs[0], zs[1], graph_mask)
    loss = 0.0
    for (i, j) in itertools.combinations(range(len(zs)), 2):
        if sigma is None or sigma[i][j]:
            loss += jse_global_global(zs[i], zs[j], graph_mask)
    return loss


def jse_local_global_neg_paired(z_g, z_n, node_graph,
                                graph_mask=None, node_mask=None):
    """JSE with corruption negatives (jse.py:67-97): the first halves of
    z_g / z_n are clean, the second halves corrupted; positives pair each
    graph with its own clean nodes, negatives with its corrupted nodes."""
    G2 = z_g.shape[0]
    N2 = z_n.shape[0]
    G, N = G2 // 2, N2 // 2
    zg = z_g[:G]
    zn, zn_c = z_n[:N], z_n[N:]
    own = jax.nn.one_hot(node_graph[:N], G, dtype=bool)
    valid = jnp.ones((N, G), bool)
    if node_mask is not None:
        valid &= node_mask[:N, None]
    if graph_mask is not None:
        valid &= graph_mask[None, :G]
    mask = own & valid
    d_pos = zn @ zg.T
    d_neg = zn_c @ zg.T
    n_pairs = jnp.maximum(jnp.sum(mask), 1)
    # BCE with logits: pos label 1, neg label 0 (reference uses
    # BCEWithLogitsLoss over the concatenated scores)
    pos_ls = jax.nn.softplus(-d_pos)
    neg_ls = jax.nn.softplus(d_neg)
    loss = (jnp.sum(jnp.where(mask, pos_ls, 0.0))
            + jnp.sum(jnp.where(mask, neg_ls, 0.0))) / (2 * n_pairs)
    return 0.5 * loss
