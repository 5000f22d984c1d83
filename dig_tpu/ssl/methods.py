"""Pre-configured contrastive methods: GraphCL, InfoGraph, MVGRL, GRACE,
pGRACE. Parity with ``dig/sslgraph/method/contrastive/model/*.py``."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment_mean, segment_sum
from .adaptive import AdaEdgePerturbation, AdaNodeAttrMask
from .contrastive import Contrastive
from .views import (Diffusion, EdgePerturbation, NodeAttrMask, RandomView,
                    RWSample, SequentialView, UniformSample, identity_view)

xavier = jax.nn.initializers.glorot_uniform()


class GraphCL(Contrastive):
    """Graph Contrastive Learning with Augmentations
    (reference graphcl.py:6-72): NT-Xent over two augmented views with an
    MLP projection head (discarded after pretraining)."""

    def __init__(self, dim: int, aug_1: Optional[str] = None,
                 aug_2: Optional[str] = None, aug_ratio: float = 0.2,
                 **kwargs):
        views_fn = []
        for aug in (aug_1, aug_2):
            if aug is None:
                views_fn.append(identity_view)
            elif aug == "dropN":
                views_fn.append(UniformSample(ratio=aug_ratio))
            elif aug == "permE":
                views_fn.append(EdgePerturbation(ratio=aug_ratio))
            elif aug == "subgraph":
                views_fn.append(RWSample(ratio=aug_ratio))
            elif aug == "maskN":
                views_fn.append(NodeAttrMask(mask_ratio=aug_ratio))
            elif aug == "random2":
                views_fn.append(RandomView([UniformSample(aug_ratio),
                                            RWSample(aug_ratio)]))
            elif aug == "random4":
                views_fn.append(RandomView([UniformSample(aug_ratio),
                                            RWSample(aug_ratio),
                                            EdgePerturbation(ratio=aug_ratio)]))
            elif aug == "random3":
                views_fn.append(RandomView([
                    UniformSample(aug_ratio), RWSample(aug_ratio),
                    EdgePerturbation(ratio=aug_ratio),
                    NodeAttrMask(mask_ratio=aug_ratio)]))
            else:
                raise ValueError(
                    "aug must be from ['dropN','permE','subgraph','maskN',"
                    "'random2','random3','random4'] or None")
        super().__init__(objective="NCE", views_fn=views_fn, z_dim=dim,
                         proj="MLP", node_level=False, **kwargs)


class InfoGraph(Contrastive):
    """InfoGraph (reference infograph.py): local-global JSE between node
    and graph embeddings of a single (identity) view, with projection
    heads on both levels."""

    def __init__(self, g_dim: int, n_dim: int, **kwargs):
        super().__init__(objective="JSE", views_fn=[identity_view],
                         graph_level=True, node_level=True,
                         z_dim=g_dim, z_n_dim=n_dim,
                         proj="MLP", proj_n="MLP", **kwargs)


class DenseDiffusionEncoder(nn.Module):
    """GCN over the dense diffusion matrix (MVGRL's second view). The
    aggregation S @ (X W) is one batched matmul — the MXU-native form of
    the reference's weighted sparse conv over the diffusion edge list
    (mvgrl.py:26-35 + structure.py:110-160)."""

    hidden_dim: int
    n_layers: int = 2
    mode: str = "ppr"
    alpha: float = 0.2
    t: float = 5.0
    pool: str = "sum"

    @nn.compact
    def __call__(self, g: GraphBatch):
        diff = Diffusion(self.mode, self.alpha, self.t)
        _, S = diff(None, g)
        x = g.nodes["x"]
        xs = []
        for _ in range(self.n_layers):
            h = nn.Dense(self.hidden_dim, kernel_init=xavier)(x)
            x = jax.nn.relu(S @ h)
            x = jnp.where(g.node_mask[:, None], x, 0.0)
            xs.append(x)
        pool = segment_sum if self.pool == "sum" else segment_mean
        zg = jnp.concatenate(
            [pool(h, g.node_graph, g.num_graphs, mask=g.node_mask)
             for h in xs], axis=1)
        return zg, x


class MVGRL(Contrastive):
    """Multi-View Graph Representation Learning (reference mvgrl.py:63-):
    contrasts an adjacency view vs a diffusion view with local-global JSE.
    Pass a *list* of two encoders to ``train`` — typically a GCN for the
    adjacency view and :class:`DenseDiffusionEncoder` for the diffusion
    view."""

    def __init__(self, g_dim: int, n_dim: int, diffusion_type: str = "ppr",
                 alpha: float = 0.2, t: float = 5.0, **kwargs):
        self.diffusion_type = diffusion_type
        self.alpha = alpha
        self.t = t
        super().__init__(objective="JSE",
                         views_fn=[identity_view, identity_view],
                         graph_level=True, node_level=True,
                         z_dim=g_dim, z_n_dim=n_dim,
                         proj="linear", proj_n="linear", **kwargs)

    def make_diffusion_encoder(self, hidden_dim: int, n_layers: int = 2):
        return DenseDiffusionEncoder(hidden_dim, n_layers,
                                     self.diffusion_type, self.alpha, self.t)


class GRACE(Contrastive):
    """GRACE (reference grace.py:5-44): node-level NT-Xent over two
    (edge-drop + feature-mask) views."""

    def __init__(self, dim: int, dropE_rate_1: float, dropE_rate_2: float,
                 maskN_rate_1: float, maskN_rate_2: float, **kwargs):
        v1 = SequentialView([
            EdgePerturbation(add=False, drop=True, ratio=dropE_rate_1),
            NodeAttrMask(mask_ratio=maskN_rate_1)])
        v2 = SequentialView([
            EdgePerturbation(add=False, drop=True, ratio=dropE_rate_2),
            NodeAttrMask(mask_ratio=maskN_rate_2)])
        super().__init__(objective="NCE", views_fn=[v1, v2],
                         graph_level=False, node_level=True,
                         z_n_dim=dim, proj_n="MLP", **kwargs)


class pGRACE(Contrastive):
    """GCA / probabilistic GRACE (reference pgrace.py): adaptive
    centrality-weighted edge dropping + feature masking."""

    def __init__(self, dim: int, centrality_measure: str = "degree",
                 prob_1: float = 0.3, prob_2: float = 0.4,
                 threshold: float = 0.7, dense: bool = False, **kwargs):
        v1 = SequentialView([
            AdaEdgePerturbation(centrality_measure, prob_1, threshold),
            AdaNodeAttrMask(centrality_measure, prob_1, threshold, dense)])
        v2 = SequentialView([
            AdaEdgePerturbation(centrality_measure, prob_2, threshold),
            AdaNodeAttrMask(centrality_measure, prob_2, threshold, dense)])
        super().__init__(objective="NCE", views_fn=[v1, v2],
                         graph_level=False, node_level=True,
                         z_n_dim=dim, proj_n="MLP", **kwargs)


class NodeMVGRL(MVGRL):
    """Node-level MVGRL (reference node_mvgrl.py): same two-view JSE
    contrast but with corruption negatives and subgraph-sampled diffusion
    views for large graphs."""

    def __init__(self, g_dim: int, n_dim: int, sample_size: int = 2000,
                 diffusion_type: str = "ppr", alpha: float = 0.2,
                 t: float = 5.0, **kwargs):
        super().__init__(g_dim, n_dim, diffusion_type, alpha, t,
                         neg_by_crpt=True, **kwargs)
        self.sample_size = sample_size
